package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-subplan federation: unparse a logical plan to the remote
  * dialect's SQL and execute it THERE, reading only the result — the
  * reference federation layer's use of `get_sql_for_plan`
  * (/root/reference/crates/sql/src/sql_gen.rs:20-23 "Used by the
  * federation layer when pushing subqueries to remote databases").
  *
  * Spark's own DSv2 JDBC pushdown handles filters/aggregates/limits per
  * scan; this path goes further when an ENTIRE subplan (joins of remote
  * tables, grouped aggregates, CTEs) belongs on the remote engine: ship
  * one SQL text, get back the small result, and let Spark take over from
  * there. Falls back to None when the source has no SQL dialect (local
  * execution) — same contract as the reference router.
  */
object FederatedQuery {

  /** Push `df`'s plan to the remote engine behind `url` as dialect SQL.
    * Returns None when the source type routes to local execution. The
    * generated SQL arrives as the JDBC `query` option, so Spark still
    * owns partitioning of the RESULT read (a single small partition by
    * default — the push is for plans whose result is dimension-sized). */
  def viaJdbc(spark: SparkSession, df: DataFrame, sourceType: String,
      url: String, options: Map[String, String] = Map.empty): Option[DataFrame] =
    (try GraftSqlGen.forDataFrame(df, sourceType)
     catch {
       // a plan the dialect can't express (rollup, correlated subquery,
       // semi join, ...) falls back to local execution, same as an
       // unknown source — the documented contract of the dialect layer
       case _: SqlGenError => None
     }).map { sql =>
      val reader = spark.read.format("jdbc")
        .option("url", url)
        .option("query", sql)
      options.foreach { case (k, v) => reader.option(k, v) }
      reader.load()
    }
}
