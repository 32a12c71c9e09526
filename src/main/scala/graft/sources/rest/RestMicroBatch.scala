package graft.sources.rest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Streaming (micro-batch) read path for the REST source: each trigger
  * admits newly-available ROWS of the paginated endpoint, so a REST API
  * becomes an unbounded source — `readStream.format(...)` with the exact
  * same options as the batch read. The reference only streams result pages
  * inside one bounded scan
  * (/root/reference/crates/connectors/src/sources/rest.rs:465-547, every
  * exec declares Boundedness::Bounded); continuous ingestion is a
  * Spark-native extension.
  *
  * Offsets count rows (`indices` pagination only — a continuation token
  * can't be replayed from an arbitrary position, which Spark's recovery
  * contract requires), so a short tail page that later grows is picked up
  * exactly where it left off. Admission control: `latestOffset` probes
  * forward from the known tail until it sees a short page (or hits the
  * page cap), so a backlogged endpoint catches up multiple pages per
  * trigger. Each probed page is cached and shipped inside its
  * InputPartition, so admitted data is fetched from the endpoint exactly
  * once; only partitions planned without a cached probe (e.g. re-planned
  * after a driver restart) re-fetch their range.
  *
  * Restart recovery: the high-water mark is re-learned from Spark's
  * checkpoint via `deserializeOffset`/`planInputPartitions` (monotonic
  * max), so a fresh stream instance never reports an offset below what a
  * previous run committed — no re-delivery of already-emitted rows.
  *
  * Standard REST-streaming caveat: the endpoint must be append-only at
  * stable offsets for replay to be exact (the same assumption every
  * offset-replayable source makes of its log).
  */
final class RestMicroBatchStream(schema: StructType, opts: RestOptions,
    params: Map[String, String]) extends MicroBatchStream {
  require(opts.pagination == "indices",
    "streaming REST reads require pagination=indices (replayable offsets)")

  @volatile private var knownRows: Long = 0L
  // Pages fetched by the latestOffset probe, keyed by their row offset and
  // handed to planInputPartitions so the reader doesn't re-hit the endpoint.
  private val probed = scala.collection.concurrent.TrieMap[Long, Seq[String]]()

  /** Monotonically advance the high-water mark from checkpointed offsets. */
  private def advance(rows: Long): Unit = synchronized {
    if (rows > knownRows) knownRows = rows
  }

  override def initialOffset(): Offset = RestRowOffset(0)

  override def latestOffset(): Offset = {
    // Probe forward from the known tail, one page at a time, until a short
    // page (tail reached), the per-trigger admission cap, or the global
    // page cap. The cap (maxPagesPerTrigger, like Kafka's
    // maxOffsetsPerTrigger) bounds how much backlog the driver fetches
    // and buffers in one trigger — catch-up proceeds across triggers.
    var growing = true
    var pagesThisTrigger = 0
    while (growing && pagesThisTrigger < opts.maxPagesPerTrigger &&
      knownRows < opts.maxPages.toLong * opts.pageSize) {
      val page = RestClient.rowsOf(
        RestClient.fetch(opts, params +
          (opts.paramOffset -> knownRows.toString,
            opts.paramLimit -> opts.pageSize.toString)), opts.dataPath)
      if (page.nonEmpty) probed.put(knownRows, page.map(_.toString))
      knownRows += page.size
      pagesThisTrigger += 1
      growing = page.size >= opts.pageSize
    }
    RestRowOffset(knownRows)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RestRowOffset].rows
    val e = end.asInstanceOf[RestRowOffset].rows
    advance(e) // checkpoint replay after restart: never regress below `end`
    Iterator.iterate(s)(_ + opts.pageSize).takeWhile(_ < e)
      .map { lo =>
        val hi = math.min(lo + opts.pageSize, e)
        // Only reuse a probe that covers the exact planned range. Spark
        // re-plans the same batch several times (analysis, physical plan,
        // execution), so entries must stay until commit() prunes them —
        // a remove here would starve the planning pass that actually runs.
        val cached = probed.get(lo).filter(_.size >= (hi - lo))
          .map(_.take((hi - lo).toInt))
        RestRangePartition(opts, params, lo, hi, cached): InputPartition
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestRangeReaderFactory(schema)

  override def deserializeOffset(json: String): Offset = {
    val rows = json.replaceAll("[^0-9]", "").toLong
    advance(rows) // restart: adopt the committed high-water mark
    RestRowOffset(rows)
  }

  override def commit(end: Offset): Unit = {
    // Drop cached probes below the committed offset (skipped/empty batches).
    val e = end.asInstanceOf[RestRowOffset].rows
    probed.keys.filter(_ < e).foreach(probed.remove)
  }

  override def stop(): Unit = probed.clear()
}

final case class RestRowOffset(rows: Long) extends Offset {
  override def json(): String = s"""{"rows":$rows}"""
}

final case class RestRangePartition(opts: RestOptions,
    params: Map[String, String], lo: Long, hi: Long,
    prefetched: Option[Seq[String]] = None) extends InputPartition

final class RestRangeReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RestRangePartition]
    new PartitionReader[InternalRow] {
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      private val rows = rp.prefetched match {
        case Some(cached) => cached.iterator.map(mapper.readTree)
        case None => RestClient.rowsOf(
          RestClient.fetch(rp.opts, rp.params +
            (rp.opts.paramOffset -> rp.lo.toString,
              rp.opts.paramLimit -> (rp.hi - rp.lo).toString)),
          rp.opts.dataPath).iterator
      }
      private var current: com.fasterxml.jackson.databind.JsonNode = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = RestClient.toRow(current, schema)
      override def close(): Unit = ()
    }
  }
}
