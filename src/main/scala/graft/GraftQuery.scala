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
}
