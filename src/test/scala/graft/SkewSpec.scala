package graft

import graft.util.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val skewed = {
    // 90% of rows share one key
    val hot = Seq.fill(900)((1L, "hot"))
    val rest = (2L to 101L).map(k => (k, s"cold$k"))
    (hot ++ rest).toDF("k", "payload")
  }
  private lazy val dim = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("salted join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(skewed, dim, "k", saltBuckets = 8)
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("salted left join preserves unmatched rows") {
    val withOrphans = skewed.union(Seq((999L, "orphan")).toDF("k", "payload"))
    val plain = withOrphans.join(dim, Seq("k"), "left")
      .select("k", "payload", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(withOrphans, dim, "k", 4, "left")
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("salt actually spreads the hot key (even identical duplicate rows)") {
    val saltCounts = skewed
      .withColumn("salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .filter(col("k") === 1).groupBy("salt").count().collect()
    assert(saltCounts.length > 4, s"hot key not spread: ${saltCounts.mkString(",")}")
    val max = saltCounts.map(_.getLong(1)).max
    assert(max < 900, "all hot rows in one bucket")
  }

  test("salted join refuses right/full outer (salt would duplicate null rows)") {
    Seq("right", "full", "full_outer", "right_outer").foreach { jt =>
      val e = intercept[IllegalArgumentException](
        Skew.saltedJoin(skewed, dim, "k", 4, jt))
      assert(e.getMessage.contains("saltedJoin"))
    }
    // allowed types still work
    assert(Skew.saltedJoin(skewed, dim, "k", 4, "left_semi").count() > 0)
  }

  test("heavy hitters surfaces the skew") {
    val top = Skew.heavyHitters(skewed, "k", 3).collect()
    assert(top.head.getLong(0) == 1L && top.head.getLong(1) == 900L)
  }
}
