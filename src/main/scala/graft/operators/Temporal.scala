package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the `events` table — as-of join and
  * bounded range (interval) self-join. Spark has neither natively; both
  * are built from shuffle-minimal compositions of operators Catalyst
  * understands, which keeps pushdown/codegen intact (SURVEY.md §2.1 lists
  * the reference's join surface; these extend it the way a time-series /
  * training-data pipeline needs).
  *
  * Scale design (100 TB of events):
  *  - the as-of join is ONE shuffle by user_id: tag the two sides, union,
  *    and carry the most recent purchase forward with a running
  *    last(ignoreNulls) window — the canonical distributed as-of. No
  *    per-row subqueries, no range join, no broadcast of a corpus-sized
  *    side.
  *  - the range join buckets time into window-sized cells and equi-joins
  *    on (user, cell), replicating the LEFT side to its 3 neighbor cells.
  *    Every qualifying pair matches on exactly one key (the right row's
  *    own cell), so no post-join dedup is needed; shuffle volume is 3×ids,
  *    never a cross product.
  */
object Temporal {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  val defs: Seq[GraftQuery] = Seq(

    // As-of join: each click paired with the same user's most recent
    // purchase at-or-before it. Purchases are pre-aggregated to one row
    // per (user, ts) so the at-tie value is deterministic in both engines.
    // Oracle uses DuckDB's native ASOF LEFT JOIN.
    GraftQuery("q_join_asof",
      """WITH p AS (SELECT user_id, ts, max(value) AS purchase_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |     c AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts,
        |       p.purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin) { (s, dir) =>
      val ev = t(s, dir).events
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
        .select(col("user_id"), col("ts"), col("purchase_value"),
          lit(0).as("kind"), lit(null).cast("bigint").as("event_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          lit(null).cast("double").as("purchase_value"),
          lit(1).as("kind"), col("event_id"))
      // purchases sort before clicks at equal ts (kind 0 < 1) — the
      // inclusive `c.ts >= p.ts` bound of ASOF.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(c)
        .withColumn("purchase_ts",
          last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
        .withColumn("pv",
          last(when(col("kind") === 0, col("purchase_value")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("purchase_ts"), col("pv").as("purchase_value"))
    },

    // Bounded range self-join: pairs of error events from the same user
    // within 1 hour of each other. Bucket width = the window, LEFT side
    // replicated to its 3 neighbor cells.
    GraftQuery("q_join_range",
      """WITH e AS (SELECT event_id, user_id,
        |             epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
        |           FROM events WHERE event_type = 'error')
        |SELECT a.event_id AS id_a, b.event_id AS id_b, b.ms - a.ms AS dt_ms
        |FROM e a, e b
        |WHERE a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(b.ms - a.ms) <= 3600000""".stripMargin) { (s, dir) =>
      val windowMs = 3600000L
      val e = t(s, dir).events.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("cell", floor(col("ms") / windowMs))
      val a = e.select(col("event_id").as("id_a"), col("user_id"),
          col("ms").as("ms_a"), col("cell"))
        .withColumn("jcell",
          explode(array(col("cell") - 1, col("cell"), col("cell") + 1)))
        .drop("cell")
      val b = e.select(col("event_id").as("id_b"), col("user_id"),
        col("ms").as("ms_b"), col("cell").as("jcell"))
      a.join(b, Seq("user_id", "jcell"))
        .filter(col("id_a") < col("id_b") &&
          abs(col("ms_b") - col("ms_a")) <= windowMs)
        .select(col("id_a"), col("id_b"), (col("ms_b") - col("ms_a")).as("dt_ms"))
    }
  )
}
