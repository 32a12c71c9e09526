package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine capability.
  *
  * @param name   stable id; becomes the key in `SparkEntry.queries`
  * @param run    Spark-first implementation over the parquet tables in `dir`
  * @param oracle equivalent DuckDB SQL over the same tables, when the
  *               semantics are SQL-expressible; `None` → driver records a
  *               weaker rows-only check (used for engine-specific hash
  *               pipelines like MinHash/SimHash whose exact output depends
  *               on the hash function).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))

  def unverified(name: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)

  /** Run SQL against per-invocation temp views: each `{name}` placeholder
    * binds to a UNIQUE view over the given DataFrame, so query builders
    * never clobber a shared SparkSession's global temp views (two serving
    * sessions building the same query concurrently would otherwise race
    * on `createOrReplaceTempView("orders")`). The views are dropped again
    * once the plan is analyzed — the resolved relations live inside the
    * plan, not the catalog. */
  def sqlOn(s: SparkSession, tables: Map[String, DataFrame],
      sql: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val viewNames = tables.keys.map(n => n -> s"graft_${n}_$suffix").toMap
    viewNames.foreach { case (n, vn) => tables(n).createOrReplaceTempView(vn) }
    try {
      val text = viewNames.foldLeft(sql) { case (acc, (n, vn)) =>
        acc.replace("{" + n + "}", vn)
      }
      val df = s.sql(text)
      df.queryExecution.analyzed // force resolution before the views drop
      df
    } finally viewNames.values.foreach(s.catalog.dropTempView)
  }
}
