package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registered query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("--run")) {
      df.write.format("noop").mode("overwrite").save()
      println("=== AFTER AQE ===")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
