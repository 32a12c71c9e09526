package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time one registered query N times (plan + execute
  * split) to separate one-time planning/codegen cost from execution. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    if (args(0) == "--sql") {
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.sql(args(1)).show(30, false)
      spark.stop()
      return
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    SparkEntry.queries("q6_forecast_revenue")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    if (sys.env.contains("TIMEONE_WARM_SHAPE")) {
      // warm the same plan SHAPE on a different table: scan+project+upper
      val t0 = System.nanoTime()
      graft.Tables(spark, sfDir).nation
        .select(org.apache.spark.sql.functions.upper(
          org.apache.spark.sql.functions.col("n_name")).as("x"))
        .write.format("noop").mode("overwrite").save()
      println(f"[shape-warm] ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[$name $i] build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
