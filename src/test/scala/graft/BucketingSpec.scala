package graft

import graft.util.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins over bucketed tables must plan without any shuffle
  * exchange — the write-once-shuffle-never property that makes repeated
  * fact-fact joins viable at 100 TB. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  override def beforeAll(): Unit = {
    val orders = Tables(spark, sf).orders.select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables(spark, sf).lineitem.select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("same-bucketed join plans with zero shuffle exchanges") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(!Bucketing.hasShuffle(joined),
        joined.queryExecution.executedPlan.toString)
      // and it is actually a sort-merge join over the bucketed scans
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    }
  }

  test("the same join on unbucketed parquet shuffles both sides") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val o = Tables(spark, sf).orders
      val l = Tables(spark, sf).lineitem
      val joined = o.join(l, col("o_orderkey") === col("l_orderkey"))
      assert(Bucketing.hasShuffle(joined))
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val agg = spark.table("b_orders").groupBy("o_orderkey")
        .agg(sum("o_totalprice").as("s"))
      assert(!Bucketing.hasShuffle(agg),
        agg.queryExecution.executedPlan.toString)
    }
  }

  test("join results match the unbucketed join row-for-row") {
    val bucketed = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      .select("o_orderkey", "l_quantity")
    val o = Tables(spark, sf).orders
    val l = Tables(spark, sf).lineitem
    val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_quantity"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
