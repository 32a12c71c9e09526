package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The portable-HLL register derivation — ONE definition shared by the
  * batch sketch (`q_hll_portable` in [[graft.operators.Extended]]) and
  * its streaming twin ([[graft.streaming.EventStream.hllRegisters]]),
  * so the bucket/rho split cannot drift between the two.
  *
  * p=9 → m=512 registers: bucket = top 9 bits of the 63-bit portable
  * integer hash; rho = leading-zero rank of the remaining 54 bits + 1,
  * computed as 55 − bitlength via the binary-string length (exact in
  * any engine; float log2 would misround near powers of two).
  * `groupBy(bucket).max(rho)` IS the HLL merge operator expressed
  * relationally — duplicate-insensitive, associative, map-side
  * combined — which is also exactly what makes it streamable: the
  * running aggregation state is the ≤ m registers themselves, so
  * distinct-counting state does NOT grow with distinct keys.
  *
  * Callers must have `graft_fmix63` registered
  * ([[VectorFunctions.register]]).
  */
object HllSketch {

  val P = 9
  val M = 512

  private val RhoSql =
    """CASE WHEN (h & ((CAST(1 AS BIGINT) << 54) - 1)) = 0 THEN 55
      |ELSE 55 - length(conv(h & ((CAST(1 AS BIGINT) << 54) - 1), 10, 2)) END""".stripMargin

  /** `(groupCols*, bucket, reg)` registers of the sketch over
    * `keyExpr`'s fmix63 hash, one row per non-empty (group, bucket). */
  def registers(df: DataFrame, keyExpr: String,
      groupCols: Seq[String]): DataFrame =
    df.selectExpr(groupCols :+ s"graft_fmix63($keyExpr) AS h": _*)
      .selectExpr(groupCols ++ Seq("shiftright(h, 54) AS bucket",
        s"$RhoSql AS rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("reg"))
}
