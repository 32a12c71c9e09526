package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming extension over the `events` table.
  *
  * The reference engine is strictly batch (every custom ExecutionPlan
  * declares Boundedness::Bounded — e.g.
  * /root/reference/crates/connectors/src/sources/rest.rs:398-403), so none
  * of this is required for parity; it extends the engine the way a
  * training-data pipeline needs: the same event analytics computed
  * incrementally, with watermarks bounding state.
  *
  * At scale: the windowed aggregate is partial-aggregated per micro-batch
  * and keyed-state is bounded by the watermark, so state size tracks
  * (active keys × window), not history.
  */
object EventStream {

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts has shipped as TIMESTAMP(NANOS) (→ long under nanosAsLong) and as
    // timestamp[us] (→ TIMESTAMP_NTZ); take the schema from the batch
    // footer and normalize to session-zoned TimestampType, same as
    // graft.Tables.events.
    // a stream may be DEFINED before its first file exists; fall back to
    // the long-ts shape (the fixture default) instead of throwing at
    // definition time
    val rawSchema =
      try spark.read.parquet(s"$dir/events.parquet").schema
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          StructType(Seq(
            StructField("event_id", LongType), StructField("ts", LongType),
            StructField("user_id", LongType),
            StructField("event_type", StringType),
            StructField("value", DoubleType), StructField("props", StringType)))
      }
    // streaming file sources list directories; select just the events file
    val raw = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    rawSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour windowed counts/sums per event type, 2-hour watermark
    * for late data. Streaming twin of the batch `q_events_window` query. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact-dedup — the incremental twin of `d_dedup_exact`.
    * State holds one key per distinct id and the watermark bounds it:
    * duplicates arriving within the watermark horizon are dropped, state
    * older than the horizon is evicted. At 100 TB/day of events this is
    * the only dedup shape whose state doesn't grow with history. */
  def dedupedEvents(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Native session windows: per-user sessions closed by a 30-minute
    * event-time gap, aggregated incrementally (Spark's session_window
    * merges adjacent windows in state; the watermark closes and emits
    * them). The streaming twin of the batch gap-detection query
    * `q_events_sessions` — per-user session counts match it exactly once
    * all input is processed (verified by spec). */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
      horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming portable-HLL registers: distinct users per event type as
    * an INCREMENTAL cardinality sketch — the streaming twin of the batch
    * `q_hll_portable` (one shared register definition,
    * [[graft.functions.HllSketch]]). No watermark and none needed: this
    * is the sketch's whole point — the running aggregation state is the
    * ≤ 512 registers per event type, so distinct-counting state does NOT
    * grow with distinct users (exact streaming distinct state grows
    * forever or needs a horizon). max(rho) is associative and
    * duplicate-insensitive, so micro-batch partials merge into exactly
    * the batch sketch — spec-pinned register-for-register. */
  def hllRegisters(events: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(events.sparkSession)
    graft.functions.HllSketch.registers(events, "user_id", Seq("event_type"))
  }

  /** Stream-static enrichment join: the static dimension is re-read per
    * micro-batch and broadcast — no streaming state at all. */
  def enriched(events: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** Watermarked stream-stream join: each click paired with the same
    * user's purchases in the hour AFTER it (the streaming attribution
    * twin of the batch as-of/range joins in `operators/Temporal.scala`).
    * Both sides carry a watermark and the join condition bounds event time
    * in BOTH directions, so each side's buffered state is evicted once the
    * other side's watermark passes `click_ts + 1 hour` — state tracks the
    * horizon, not history. Self-joining one stream via two filtered reads
    * is the standard shape. */
  def clickAttribution(events: DataFrame, horizon: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", horizon)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }

  final case class SessionUpdate(
      userId: Long, nEvents: Long, sessionSeconds: Long, expired: Boolean)
  // public: the state encoder's generated code constructs it reflectively
  final case class SessionState(nEvents: Long, firstTs: Long, lastTs: Long)

  /** Custom stateful operator: per-user session tracking with a 30-minute
    * event-time inactivity gap, via mapGroupsWithState (the Spark-native
    * form of a custom stateful streaming operator). Emits one update per
    * user per micro-batch. A production deployment would add
    * `GroupStateTimeout.EventTimeTimeout` + watermark to expire idle
    * state; with timeouts enabled `processAllAvailable()` cannot settle,
    * so the test-drivable form keeps state explicit. */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionUpdate] = {
    import spark.implicits._
    val gapMicros = 30L * 60 * 1000 * 1000
    events
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val ts = rows.map(_._2).toSeq.sorted
          val merged = state.getOption match {
            case Some(s) if ts.nonEmpty && ts.head - s.lastTs <= gapMicros =>
              SessionState(s.nEvents + ts.size, s.firstTs, ts.last)
            case _ if ts.nonEmpty => SessionState(ts.size, ts.head, ts.last)
            case Some(s) => s
            case None => SessionState(0, 0, 0)
          }
          state.update(merged)
          SessionUpdate(userId, merged.nEvents,
            (merged.lastTs - merged.firstTs) / 1000000, expired = false)
      }
  }
}
