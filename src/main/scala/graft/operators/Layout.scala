package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan locality — the Z-order (Morton
  * curve) clustering pass a 100 TB table needs so that multi-dimensional
  * predicates prune files instead of scanning everything (the algorithm
  * behind Delta's OPTIMIZE ZORDER BY and ClickHouse's
  * `ORDER BY mortonEncode(...)`; Morton 1966).
  *
  * `d_zorder_layout` lays `lineitem` out along the interleaved-bit curve
  * of (l_partkey, l_suppkey) and emits the resulting FILE MANIFEST —
  * per-file row counts and per-dimension min/max — i.e. exactly the
  * data-skipping statistics a scan planner consults. Because Z-order
  * keeps both dimensions locally dense, a predicate on EITHER column
  * overlaps only ~sqrt(files) of the manifest; a single-column sort
  * layout serves one dimension and shreds the other (spec-proven).
  *
  * Scale shape (100 TB): per-dimension min/max is ONE 1-row aggregate
  * broadcast to the scan; cell normalization + bit interleave + file
  * assignment are map-only integer arithmetic; the manifest is a
  * map-side-combined aggregate on the BOUNDED file id (top 10 bits →
  * ≤1024 groups). The real write path would `repartitionByRange` on the
  * same z value before writing — the manifest here is the part whose
  * correctness matters and is cross-engine checkable.
  *
  * Cross-engine exactness: everything is BIGINT arithmetic — scaling
  * uses integer floor division on non-negative values (identical `div`
  * vs `//` semantics), interleave is 32 shift/mask terms generated from
  * one Scala formatter into both engines' spellings (`shiftleft` vs
  * `<<`), so the manifest hash-matches.
  *
  * Reference anchors: the reference has no layout optimizer (it reads
  * what it's given — crates/connectors file sources); Z-order is the
  * standard lakehouse-side companion a curation pipeline runs before
  * handing a corpus to 1000 executors.
  */
object Layout {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** Morton interleave of two 16-bit cells `a`, `b` (a's bits land on
    * odd positions), emitted in either engine's spelling. */
  private def zExpr(a: String, b: String, spark: Boolean): String =
    (0 until 16).map { i =>
      if (spark)
        s"(shiftleft(shiftright($a, $i) & 1, ${2 * i + 1}) + " +
          s"shiftleft(shiftright($b, $i) & 1, ${2 * i}))"
      else
        s"(((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " + ", ")")

  /** 0..65535 cell from a value and its corpus min/max — integer floor
    * division, exact in both engines on non-negative operands. */
  private def cellExpr(v: String, lo: String, hi: String,
      spark: Boolean): String = {
    val divOp = if (spark) "div" else "//"
    s"((($v - $lo) * 65535) $divOp (CASE WHEN $hi > $lo THEN $hi - $lo ELSE 1 END))"
  }

  private def manifestSelect(spark: Boolean): String = {
    // stage the two cell normalizations in a derived relation so the 32
    // interleave terms read plain columns — inlining the division into
    // every term would re-evaluate it 16× per dimension per row in an
    // engine without cross-term CSE, and balloon the SQL text to match
    val pc = cellExpr("l_partkey", "pmin", "pmax", spark)
    val sc = cellExpr("l_suppkey", "smin", "smax", spark)
    val z = zExpr("pc", "sc", spark)
    val shr = if (spark) s"shiftright($z, 22)" else s"($z >> 22)"
    s"""SELECT $shr AS file_id,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  min(l_partkey) AS min_partkey, max(l_partkey) AS max_partkey,
       |  min(l_suppkey) AS min_suppkey, max(l_suppkey) AS max_suppkey
       |FROM (SELECT l_partkey, l_suppkey, $pc AS pc, $sc AS sc
       |      FROM li CROSS JOIN mm) cells
       |GROUP BY 1""".stripMargin
  }

  private val zorderOracle: String =
    s"""WITH li AS (SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       |              CAST(l_suppkey AS BIGINT) AS l_suppkey FROM lineitem),
       |mm AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |              min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM li)
       |${manifestSelect(spark = false)}""".stripMargin

  val defs: Seq[GraftQuery] = Seq(

    GraftQuery("d_zorder_layout", zorderOracle) { (s, dir) =>
      val li = t(s, dir).lineitem
        .select(col("l_partkey").cast("bigint").as("l_partkey"),
          col("l_suppkey").cast("bigint").as("l_suppkey"))
      val mm = li.agg(
        min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
        min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
      GraftQuery.sqlOn(s,
        Map("li" -> li, "mm" -> mm),
        manifestSelect(spark = true)
          .replace("FROM li CROSS JOIN mm", "FROM {li} CROSS JOIN {mm}"))
    }
  )
}
