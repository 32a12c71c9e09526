package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Degenerate-bucket cap for LSH-style candidate generation: drop every
  * bucket past `max` members before the within-bucket self-join — one
  * pathological bucket (empty strings, all-zero vectors, trivial
  * payloads) would otherwise go quadratic. One count-over-window pass on
  * the already-banded relation; the banded exchange is computed once and
  * reused by both self-join sides (measured against aggregate +
  * broadcast-anti-join and collect_list expansion in the minhash
  * pipeline — this shape won). Every use keeps an embedded SQL-oracle
  * twin in its query definition; the cap threshold must stay identical
  * on both sides. */
object Buckets {
  def cap(banded: DataFrame, max: Int, cols: Column*): DataFrame =
    banded.withColumn("bsize",
        count(lit(1)).over(Window.partitionBy(cols: _*)))
      .filter(col("bsize") <= max).drop("bsize")
}
