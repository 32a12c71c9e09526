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
      nodeMetrics: Seq[NodeMetrics] = Nil,
      /** formatted sample cells — exposed so serving edges can run the
        * outgoing-data guard over exactly what the report embeds */
      sampleCells: Seq[Array[String]] = Nil)

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
    // different, aggregated plan whose metrics don't describe this one).
    // Count AND sample in ONE distributed pass: each partition ships its
    // row count plus up to `sampleRows` pre-formatted cells — a separate
    // limit(n).collect() would re-execute the whole plan (doubling
    // remote I/O on federated sources).
    val fields = df.schema.fields
    val nSample = sampleRows
    val perPartition = df.queryExecution.executedPlan.execute()
      .mapPartitions { it =>
        var n = 0L
        val buf = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
        while (it.hasNext) {
          val r = it.next()
          if (buf.size < nSample) {
            buf += fields.indices.map { i =>
              if (r.isNullAt(i)) "NULL"
              // Catalyst internal values render unreadably (DateType is an
              // epoch-day Int, TimestampType a micros Long, strings are
              // UTF8String) — convert to external Scala values first.
              else org.apache.spark.sql.catalyst.CatalystTypeConverters
                .convertToScala(r.get(i, fields(i).dataType),
                  fields(i).dataType) match {
                case b: Array[Byte] => s"<${b.length} bytes>"
                case v => String.valueOf(v).take(40)
              }
            }.toArray
          }
          n += 1
        }
        Iterator.single((n, buf.toArray))
      }.collect()
    val rows = perPartition.map(_._1).sum
    val sampleCells = perPartition.iterator.flatMap(_._2).take(nSample).toSeq
    val durationMillis = (System.nanoTime() - t0) / 1000000
    val nodeMetrics = collectMetrics(df.queryExecution.executedPlan)
    val sampleText =
      (df.columns.mkString(" | ") +:
        sampleCells.map(_.mkString(" | "))).mkString("\n")
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
    Trace(sb.toString, durationMillis, rows, pushed, readSchemas,
      nodeMetrics, sampleCells)
  }
}
