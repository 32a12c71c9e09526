package graft.sources.kafka

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => StreamOffset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Kafka topic reads over the hand-built wire client, batch AND
  * Structured Streaming micro-batch — `spark.read.format("graft.sources
  * .kafka.KafkaDataSource")` / `spark.readStream.format(...)` with no
  * kafka-clients or spark-sql-kafka jar. Output schema mirrors the
  * stock Kafka source (key/value binary, topic, partition, offset,
  * timestamp as epoch millis) so downstream pipelines port unchanged.
  *
  * Options: `bootstrap` (host:port), `topic`, `startingOffsets`
  * (earliest|latest, default earliest for batch / latest for streams
  * matching the stock source), `endingOffsets` (batch only:
  * earliest|latest, default latest), `maxBytesPerFetch`.
  *
  * Scale shape: one input partition per Kafka partition — the broker's
  * own parallelism unit; each task fetches its partition's offset range
  * from that partition's leader with bounded-size Fetch loops. Offsets
  * are the stream checkpoint state (JSON `{partition: nextOffset}`), so
  * recovery resumes exactly where the last batch ended. */
class KafkaDataSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSourceOptions.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaTable(KafkaSourceOptions(properties.asScala.toMap))
}

final case class KafkaSourceOptions(conf: Map[String, String]) {
  private def req(k: String): String = conf.getOrElse(k,
    throw new IllegalArgumentException(s"graft-kafka: missing option '$k'"))
  val bootstrap: String = req("bootstrap")
  val topic: String = req("topic")
  val startingOffsets: String = conf.getOrElse("startingOffsets", "earliest")
  val endingOffsets: String = conf.getOrElse("endingOffsets", "latest")
  val maxBytesPerFetch: Int =
    conf.getOrElse("maxBytesPerFetch", (4 * 1024 * 1024).toString).toInt
  /** Frame cap follows the configured fetch size (plus header room). */
  def maxFrame: Int = math.max(1 << 26, maxBytesPerFetch + (1 << 16))
  /** Stock-source default: a planned offset that is no longer readable
    * (retention, unclean leader election) FAILS the query; opt out to
    * skip the lost span with the gap recorded in the task logs. */
  val failOnDataLoss: Boolean =
    conf.getOrElse("failOnDataLoss", "true").toBoolean

  def partitions(): Seq[Int] = {
    val (h, p) = KafkaWireClient.parseBootstrap(bootstrap)
    val c = new KafkaWireClient(h, p)
    try {
      val t = c.metadata(Seq(topic)).topics.find(_.name == topic).getOrElse(
        throw new IllegalArgumentException(s"graft-kafka: unknown topic $topic"))
      if (t.errorCode != 0)
        throw new java.io.IOException(s"kafka: topic $topic error ${t.errorCode}")
      t.partitions.map(_.partition).sorted
    } finally c.close()
  }

  private def tsOf(spec: String): Long = spec match {
    case "earliest" => -2L
    case "latest" => -1L
    case other => throw new IllegalArgumentException(
      s"graft-kafka: offsets spec must be earliest|latest, got '$other'")
  }

  /** Offsets for several specs over ONE connection and ONE metadata
    * fetch — batch planning asks for (starting, ending) together and a
    * stream's trigger asks every micro-batch, so per-spec dial+metadata
    * costs add up fast. */
  def offsetsMulti(specs: Seq[String]): Seq[Map[Int, Long]] = {
    val (h, p) = KafkaWireClient.parseBootstrap(bootstrap)
    val c = new KafkaWireClient(h, p)
    try {
      val t = c.metadata(Seq(topic)).topics.find(_.name == topic).getOrElse(
        throw new IllegalArgumentException(s"graft-kafka: unknown topic $topic"))
      if (t.errorCode != 0)
        throw new java.io.IOException(s"kafka: topic $topic error ${t.errorCode}")
      val parts = t.partitions.map(_.partition).sorted
      specs.map(s => c.listOffsets(topic, parts, tsOf(s)))
    } finally c.close()
  }

  def offsetsAt(spec: String): Map[Int, Long] = offsetsMulti(Seq(spec)).head
}

object KafkaSourceOptions {
  /** The stock Kafka source's column set (timestamp as epoch millis). */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false)))
}

final class KafkaTable(opts: KafkaSourceOptions)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"kafka:${opts.bootstrap}/${opts.topic}"
  override def schema(): StructType = KafkaSourceOptions.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      // appends to a log: "truncate" has no meaning, but Spark's
      // overwrite-mode guard wants the flag absent — leave it off
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaScan(opts)
    }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new KafkaWriteBuilder(opts, info.schema())
}

/** Stream/batch offsets: partition → NEXT offset to read. */
final case class KafkaOffsets(next: Map[Int, Long]) extends StreamOffset {
  override def json(): String =
    next.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object KafkaOffsets {
  def parse(json: String): KafkaOffsets = KafkaOffsets(
    "\"(\\d+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

final class KafkaScan(opts: KafkaSourceOptions) extends Scan {
  override def readSchema(): StructType = KafkaSourceOptions.Schema
  override def description(): String = s"KafkaScan(${opts.topic})"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val Seq(from, until) =
        opts.offsetsMulti(Seq(opts.startingOffsets, opts.endingOffsets))
      from.toSeq.sortBy(_._1).map { case (p, lo) =>
        KafkaRange(opts, p, lo, until.getOrElse(p, lo))
          : InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      KafkaReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def latestOffset(): StreamOffset =
        KafkaOffsets(opts.offsetsAt("latest"))
      override def initialOffset(): StreamOffset = {
        // stock-source semantics: streams default to latest (only new
        // data), batch to earliest
        val spec = opts.conf.getOrElse("startingOffsets", "latest")
        KafkaOffsets(opts.offsetsAt(spec))
      }
      override def deserializeOffset(json: String): StreamOffset =
        KafkaOffsets.parse(json)
      override def planInputPartitions(start: StreamOffset,
          end: StreamOffset): Array[InputPartition] = {
        val from = start.asInstanceOf[KafkaOffsets].next
        val until = end.asInstanceOf[KafkaOffsets].next
        until.toSeq.sortBy(_._1).map { case (p, hi) =>
          KafkaRange(opts, p, from.getOrElse(p, 0L), hi): InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        KafkaReaderFactory
      override def commit(end: StreamOffset): Unit = ()
      override def stop(): Unit = ()
    }
}

final case class KafkaRange(opts: KafkaSourceOptions, partition: Int,
    from: Long, until: Long) extends InputPartition

object KafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KafkaPartitionReader(p.asInstanceOf[KafkaRange])
}

final class KafkaPartitionReader(range: KafkaRange)
    extends PartitionReader[InternalRow] {

  private var clientOpt: Option[KafkaWireClient] = None
  private def client: KafkaWireClient = clientOpt.getOrElse {
    val c = KafkaWireClient.forLeader(range.opts.bootstrap,
      range.opts.topic, range.partition, maxFrame = range.opts.maxFrame)
    clientOpt = Some(c)
    c
  }
  private var pos = range.from
  private var buffer: Iterator[KafkaWire.Record] = Iterator.empty
  private var current: InternalRow = _
  private val topicUtf8 = UTF8String.fromString(range.opts.topic)
  // empty-fetch retry state: an empty response at a valid offset below
  // the high watermark is usually transient (broker hiccup) or a first
  // batch larger than maxBytes — retry with a doubled fetch size before
  // concluding anything is lost
  private var fetchBytes = range.opts.maxBytesPerFetch
  private var emptyFetches = 0

  private def dataLoss(detail: String): Boolean = {
    val msg = s"kafka: offsets [$pos, ${range.until}) of " +
      s"${range.opts.topic}/${range.partition} are gone ($detail)"
    if (range.opts.failOnDataLoss)
      throw new java.io.IOException(
        s"$msg — set failOnDataLoss=false to skip lost spans")
    System.err.println(s"[graft-kafka] WARN $msg — skipping")
    false
  }

  private def refill(): Boolean = {
    while (!buffer.hasNext && pos < range.until) {
      val res =
        try client.fetch(range.opts.topic, range.partition, pos,
          maxBytes = fetchBytes)
        catch {
          case _: KafkaOffsetOutOfRange =>
            // retention moved the log start past the planned offset —
            // data loss; with failOnDataLoss=false skip forward to the
            // earliest offset the broker still has
            dataLoss("offset out of range — log start moved past it")
            val earliest = client
              .listOffsets(range.opts.topic, Seq(range.partition), -2L)
              .getOrElse(range.partition, range.until)
            pos =
              if (earliest > pos) math.min(earliest, range.until)
              else range.until // can't advance: treat the rest as lost
            null
        }
      if (res != null) {
        val recs = res.records.filter(r => r.offset >= pos && r.offset < range.until)
        // batchEnd counts control batches (transaction markers), which
        // carry no records — without it a trailing COMMIT marker below
        // `until` would read as an empty fetch and spurious data loss
        val end = math.min(res.batchEnd, range.until)
        if (recs.nonEmpty) {
          buffer = recs.iterator
          pos = math.max(recs.map(_.offset).max + 1, math.max(end, pos))
          emptyFetches = 0
        } else if (end > pos) {
          pos = end // only control markers / below-range batches here
          emptyFetches = 0
        } else if (res.highWatermark <= pos) {
          // the bounded range [from, until) came from ListOffsets, so an
          // empty result with pos < until means the span vanished
          // (retention, or an unclean election truncated the log below
          // the planned end) — DATA LOSS, not a clean end
          return dataLoss(s"high watermark ${res.highWatermark}")
        } else {
          // pos is below the high watermark, so the records exist on the
          // broker — an empty response is a too-small maxBytes for the
          // next batch or a transient hiccup, NOT loss. Retry with a
          // doubled fetch size; only repeated no-progress rounds give up
          // (and with failOnDataLoss=false that skips just this fetch's
          // span boundary, not silently — dataLoss logs it).
          emptyFetches += 1
          // grow toward the frame ceiling (maxFrame already covers
          // maxBytesPerFetch + headroom), never below the configured size
          fetchBytes = math.min(fetchBytes * 2L,
            (range.opts.maxFrame - (1 << 16)).toLong).toInt
          if (emptyFetches >= 5)
            return dataLoss(
              s"5 empty fetches below the range end (hw ${res.highWatermark})")
        }
      }
    }
    buffer.hasNext
  }

  override def next(): Boolean = {
    if (!refill()) return false
    val r = buffer.next()
    current = new GenericInternalRow(Array[Any](
      r.key.orNull, r.value.orNull, topicUtf8,
      range.partition, r.offset, r.timestampMs))
    true
  }

  override def get(): InternalRow = current
  // close only what was opened: an empty range's task never dialed the
  // leader, and forcing the connection here just to close it would cost
  // a metadata round trip per idle partition per trigger
  override def close(): Unit =
    clientOpt.foreach(c => try c.close() catch { case _: Exception => () })
}
