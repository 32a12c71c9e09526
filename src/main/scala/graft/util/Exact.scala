package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine hash-stable aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent: Spark's partial/final aggregation
  * order differs from DuckDB's, so `sum(double)` can differ in the last few
  * ULPs between engines — enough to break the driver's hash comparison.
  * The fix: round each addend to a fixed decimal scale (exactly representable
  * in Decimal), sum exactly (Decimal addition is associative), and cast the
  * final result back to double. Both engines then produce bit-identical
  * doubles regardless of aggregation order or parallelism.
  *
  * This also mirrors classic TPC-H semantics where money columns are
  * DECIMAL(15,2) (the reference's declared-schema default — see
  * /root/reference/crates/connectors/src/sources/file.rs:370-394).
  */
object Exact {
  // Precision 18 (not higher) keeps Spark's Decimal in its compact-long
  // representation, so the sum's inner loop is a long add instead of a
  // per-row BigDecimal allocation. Addends are money-like (≤ 12 integer
  // digits at scale 6); the 28-digit sum buffer still widens exactly.

  /** Exact sum of a money-like double column; result as double. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average: exact decimal sum divided by count, in double. */
  def davg(c: Column, scale: Int = 6): Column =
    (sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Two-phase split of dsum for multi-phase aggregations (rollup/cube/
    * grouping sets): keep the partial as DECIMAL so the re-aggregation
    * stays exact; cast to double only at the very end. */
  def dsumPart(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale)))
  def dsumFinal(partial: Column): Column =
    sum(partial).cast(DoubleType)

  /** DuckDB-side SQL for the same exact sum, for oracle parity. */
  def dsumSql(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  def davgSql(expr: String, scale: Int = 6): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"
}
