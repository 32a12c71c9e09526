package graft.session

import org.apache.spark.sql.DataFrame

/** Execution trace report: formatted physical plan with pushdown
  * indicators, wall-clock timing, and a result sample — the engine's
  * answer to the reference's "STRAKE QUERY REPORT"
  * (/root/reference/crates/runtime/src/query/trace.rs:7-72) and its
  * pushdown-annotated plan tree (query/plan_tree.rs).
  */
object TraceReport {

  final case class Trace(
      report: String, durationMillis: Long, rowCount: Long,
      pushedFilters: Seq[String], scannedColumns: Seq[String])

  /** Execute the frame (count + sample) and render the report. */
  def run(df: DataFrame, sampleRows: Int = 10): Trace = {
    val t0 = System.nanoTime()
    val rows = df.count()
    val durationMillis = (System.nanoTime() - t0) / 1000000
    val sample = df.limit(sampleRows)
    val sampleText = sample.showString(sampleRows)
    val planText = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushed = "PushedFilters: \\[(.*?)\\]".r
      .findAllMatchIn(planText).map(_.group(1)).filter(_.nonEmpty).toSeq
    val readSchemas = "ReadSchema: struct<(.*?)>".r
      .findAllMatchIn(planText)
      .flatMap(_.group(1).split(",").map(_.takeWhile(_ != ':').trim))
      .filter(_.nonEmpty).toSeq.distinct

    val sb = new StringBuilder
    sb.append("GRAFT QUERY REPORT\n")
    sb.append("==================\n")
    sb.append(s"duration_ms: $durationMillis\n")
    sb.append(s"rows: $rows\n")
    sb.append(s"pushed_filters: ${if (pushed.isEmpty) "(none)" else pushed.mkString("; ")}\n")
    sb.append(s"scanned_columns: ${if (readSchemas.isEmpty) "(n/a)" else readSchemas.mkString(", ")}\n")
    sb.append("\n--- first rows ---\n").append(sampleText)
    sb.append("\n--- physical plan ---\n").append(planText)
    Trace(sb.toString, durationMillis, rows, pushed, readSchemas)
  }

  /** Spark 4 keeps Dataset.showString private; rebuild a small sample
    * rendering from collected rows. */
  private implicit class Shows(df: DataFrame) {
    def showString(n: Int): String = {
      val rows = df.collect()
      val header = df.columns.mkString(" | ")
      val body = rows.map(_.toSeq.map {
        case null => "NULL"
        case b: Array[Byte] => s"<${b.length} bytes>"
        case v => v.toString.take(40)
      }.mkString(" | "))
      (header +: body).mkString("\n")
    }
  }
}
