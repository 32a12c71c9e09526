package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extension: drive the event stream synchronously with a memory
  * sink and check the windowed aggregate matches its batch twin. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("windowed counts match the batch computation") {
    val events = EventStream.readEvents(spark, sf)
    val q = EventStream.windowedCounts(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      // append mode only emits closed windows (watermark passed); with a
      // bounded file the final watermark closes all but the tail windows —
      // compare against the batch result restricted to emitted windows
      val streamed = spark.table("win_out")
        .select(col("window_start"), col("event_type"), col("n"))
      val batch = Tables(spark, sf).events
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val joined = streamed.alias("s").join(batch.alias("b"),
        Seq("window_start", "event_type"))
      assert(streamed.count() > 0, "no windows emitted")
      assert(joined.filter(col("s.n") =!= col("b.n")).count() == 0,
        "streamed window counts diverge from batch")
    } finally q.stop()
  }

  test("stateful sessionization emits per-user updates") {
    val events = EventStream.readEvents(spark, sf)
    val sessions = EventStream.sessionize(spark, events)
    val q = sessions.writeStream.outputMode("update")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt2").toString)
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("sess_out")
      val users = Tables(spark, sf).events
        .select(countDistinct(col("user_id"))).head().getLong(0)
      assert(out.select("userId").distinct().count() == users)
      assert(out.filter(col("nEvents") <= 0).count() == 0)
    } finally q.stop()
  }
}
