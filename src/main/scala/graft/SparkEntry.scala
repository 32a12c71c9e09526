package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, CorpusOps, Curation, Extended, Layout, Training, Multimodal, Relational, Retrieval, Similarity, SpmTokenizer, Temporal, TextPipeline, Tokenizer, WpTokenizer}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's verifiable surface: every operator family from SURVEY.md §2
  * plus the training-data pipeline extensions, each as a named query with a
  * DuckDB oracle where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Full registry, grouped by module. */
  val registry: Seq[GraftQuery] =
    Relational.defs ++ Analytics.defs ++ Extended.defs ++ Temporal.defs ++
      TextPipeline.defs ++ CorpusOps.defs ++ Curation.defs ++
      Retrieval.defs ++ Tokenizer.defs ++ SpmTokenizer.defs ++
      WpTokenizer.defs ++ Layout.defs ++ Training.defs ++
      Similarity.defs ++ Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hash pipelines) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
