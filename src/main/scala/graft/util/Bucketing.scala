package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the co-located join path.
  *
  * A shuffle on a 100 TB fact table is the single most expensive step a
  * repeated join pipeline can take. Bucketing pays that shuffle ONCE at
  * write time — both tables hash-partitioned into the same number of
  * buckets on the join key, sorted within buckets — after which every
  * join/aggregation on that key plans with zero Exchange nodes: Spark's
  * `FileSourceScanExec` reports the bucket `HashPartitioning` as its
  * output partitioning and sort-merge join consumes the bucketed sides
  * directly (verified by spec: the physical plan contains no shuffle).
  *
  * Reference context: the engine delegates physical layout to its remote
  * sources; on Spark, layout IS the engine's concern, and bucketing is
  * the idiomatic co-location tool (SURVEY.md §2.3 file sources,
  * §7 phase 2 "pre-partitioning").
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans without a
    * shuffle when both sides were written with the same bucket count. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** True when the physical plan of `df` contains any shuffle exchange —
    * the assertion tool for co-location tests and plan reviews. */
  def hasShuffle(df: DataFrame): Boolean = {
    // string-match the rendered plan: TreeNode traversal can't see inside
    // AdaptiveSparkPlanExec (its children are materialized lazily), but
    // toString renders the full current plan either way. Shuffle exchanges
    // render as "Exchange <partitioning>"; broadcast as "BroadcastExchange"
    // (not a shuffle).
    val rendered = df.queryExecution.executedPlan.toString
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition").exists(rendered.contains)
  }
}
