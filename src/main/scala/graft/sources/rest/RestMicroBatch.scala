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
  * exactly where it left off. Admission control: `latestOffset` probes one
  * page beyond the known tail per trigger. Each admitted page-sized row
  * range is one InputPartition, so a backlogged stream fans out across
  * executors page-parallel.
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

  override def initialOffset(): Offset = RestRowOffset(0)

  override def latestOffset(): Offset = {
    // probe one page past the known tail; the endpoint may have grown
    if (knownRows < opts.maxPages.toLong * opts.pageSize) {
      val probe = RestClient.rowsOf(
        RestClient.fetch(opts, params +
          (opts.paramOffset -> knownRows.toString,
            opts.paramLimit -> opts.pageSize.toString)), opts.dataPath)
      knownRows += probe.size
    }
    RestRowOffset(knownRows)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RestRowOffset].rows
    val e = end.asInstanceOf[RestRowOffset].rows
    Iterator.iterate(s)(_ + opts.pageSize).takeWhile(_ < e)
      .map(lo => RestRangePartition(opts, params, lo,
        math.min(lo + opts.pageSize, e)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestRangeReaderFactory(schema)

  override def deserializeOffset(json: String): Offset =
    RestRowOffset(json.replaceAll("[^0-9]", "").toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class RestRowOffset(rows: Long) extends Offset {
  override def json(): String = s"""{"rows":$rows}"""
}

final case class RestRangePartition(opts: RestOptions,
    params: Map[String, String], lo: Long, hi: Long) extends InputPartition

final class RestRangeReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RestRangePartition]
    new PartitionReader[InternalRow] {
      private val rows = RestClient.rowsOf(
        RestClient.fetch(rp.opts, rp.params +
          (rp.opts.paramOffset -> rp.lo.toString,
            rp.opts.paramLimit -> (rp.hi - rp.lo).toString)),
        rp.opts.dataPath).iterator
      private var current: com.fasterxml.jackson.databind.JsonNode = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = RestClient.toRow(current, schema)
      override def close(): Unit = ()
    }
  }
}
