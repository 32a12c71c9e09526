package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the TPC-H-ish testdata: replicate the fact
  * tables `factor`× with disjoint key ranges (copy c shifts every order
  * key by c·(max+1)), keeping dimension tables as-is — the dbgen-style
  * trick for probing headline-query scaling past the largest driver-
  * provided SF. Join semantics survive exactly: each replicated order
  * keeps its lineitems (same shifted key) and its original customer, so
  * Q1/Q3/Q6/Q10 results scale linearly by construction and their
  * wall-clock SHOULD too — a super-linear bench curve is an engine
  * problem (spill, shuffle blow-up), which is what the probe detects.
  *
  * Usage: `runMain graft.ScaleGen <srcSfDir> <dstDir> <factor>`
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcSfDir> <dstDir> <factor>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }

  /** The generator itself, on a caller-owned session. */
  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    require(factor >= 1, "factor must be >= 1")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val off = orders.agg(max("o_orderkey")).head().getLong(0) + 1L

    /** `factor` copies with `keyCol` shifted into disjoint ranges. */
    def rep(df: DataFrame, keyCol: String): DataFrame = df
      .withColumn("__c", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn(keyCol, col(keyCol) + col("__c").cast("long") * off)
      .drop("__c")

    rep(orders, "o_orderkey")
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    rep(spark.read.parquet(s"$src/lineitem.parquet"), "l_orderkey")
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    // dimensions ride along unchanged (every replica joins the originals)
    Seq("customer", "nation", "region", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    val n = spark.read.parquet(s"$dst/lineitem.parquet").count()
    println(s"""{"scalegen":"$dst","factor":$factor,"lineitem_rows":$n}""")
  }
}
