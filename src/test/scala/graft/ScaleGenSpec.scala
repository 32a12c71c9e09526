package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-up generator behind the sf0.5 probe (BASELINE.md): fact
  * tables replicate into DISJOINT key ranges, dimensions ride along,
  * and the headline queries' per-group aggregates scale exactly
  * linearly by construction. */
class ScaleGenSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ScaleGen replicates facts with disjoint keys; aggregates scale linearly") {
    val dst = java.nio.file.Files.createTempDirectory("scalegen").toString
    ScaleGen.run(spark, sf, dst, 3)
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = spark.read.parquet(s"$dst/lineitem.parquet")
    assert(out.count() == 3 * src.count())
    // key ranges are disjoint: each copy's orderkeys shift by max+1
    val srcOrders = spark.read.parquet(s"$sf/orders.parquet")
    val outOrders = spark.read.parquet(s"$dst/orders.parquet")
    assert(outOrders.count() == 3 * srcOrders.count())
    assert(outOrders.select("o_orderkey").distinct().count() ==
      outOrders.count(), "replicated order keys collide")
    // every lineitem still joins its order (referential integrity holds
    // across replicas — the property that keeps Q3/Q10 meaningful)
    assert(out.join(outOrders,
      out("l_orderkey") === outOrders("o_orderkey"), "left_anti")
      .count() == 0, "orphaned lineitems after replication")
    // Q1-shaped aggregate scales EXACTLY 3x per group
    import org.apache.spark.sql.functions._
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val (a, b) = (agg(src), agg(out))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(b(k).compareTo(v.multiply(new java.math.BigDecimal(3))) == 0,
        s"group $k did not scale 3x: ${b(k)} vs 3*$v")
    }
    // dimensions are NOT replicated
    assert(spark.read.parquet(s"$dst/customer.parquet").count() ==
      spark.read.parquet(s"$sf/customer.parquet").count())
  }
}
