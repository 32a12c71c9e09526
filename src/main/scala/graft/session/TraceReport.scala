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
      pushedFilters: Seq[String], scannedColumns: Seq[String],
      nodeMetrics: Seq[NodeMetrics] = Nil)

  /** Post-execution per-operator metrics — the EXPLAIN ANALYZE half of
    * the reference report (trace.rs renders DataFusion's analyzed plan
    * with per-node row counts). */
  final case class NodeMetrics(node: String, metrics: Map[String, Long])

  /** Walk the EXECUTED plan and pull each node's populated SQLMetric
    * values. AQE wraps materialized subtrees in QueryStageExec LEAF
    * nodes (and reuse in ReusedExchangeExec), so a plain TreeNode
    * traversal stops at every exchange — exactly where the interesting
    * metrics live; this walk descends through them explicitly. */
  private def collectMetrics(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[NodeMetrics] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(node: SparkPlan): Seq[NodeMetrics] = {
      val here = {
        val vals = node.metrics.collect {
          case (name, m) if m.value > 0 => name -> m.value
        }.toMap
        if (vals.isEmpty) Nil else Seq(NodeMetrics(node.nodeName, vals))
      }
      val below = node match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        case p => p.children.flatMap(walk)
      }
      here ++ below
    }
    walk(plan)
  }

  /** Execute the frame (count + sample) and render the report. */
  def run(df: DataFrame, sampleRows: Int = 10): Trace = {
    val t0 = System.nanoTime()
    // run the frame's OWN physical plan (df.count() would execute a
    // different, aggregated plan whose metrics don't describe this one);
    // the RDD count is a distributed action — nothing materializes on
    // the driver beyond per-partition counts
    val rows = df.queryExecution.executedPlan.execute().count()
    val durationMillis = (System.nanoTime() - t0) / 1000000
    val nodeMetrics = collectMetrics(df.queryExecution.executedPlan)
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
    if (nodeMetrics.nonEmpty) {
      sb.append("\n--- runtime metrics (analyze) ---\n")
      nodeMetrics.foreach { nm =>
        val ms = nm.metrics.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(", ")
        sb.append(s"${nm.node}: $ms\n")
      }
    }
    sb.append("\n--- physical plan ---\n").append(planText)
    Trace(sb.toString, durationMillis, rows, pushed, readSchemas, nodeMetrics)
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
