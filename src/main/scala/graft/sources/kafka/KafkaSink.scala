package graft.sources.kafka

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** Kafka Produce sink — `df.write`/`writeStream.format("graft.sources
  * .kafka.KafkaDataSource")` publishes rows to a topic through the
  * hand-built wire client (Produce v3, acks=all), closing the pipeline
  * loop the source opened: curated documents stream back OUT to a
  * topic as readily as raw ones stream in.
  *
  * Input contract (the stock kafka sink's): a required `value` column
  * (binary or string), optional `key` (binary or string), optional
  * `partition` (int). Partition resolution per record: explicit column
  * → keyed records via Kafka's OWN default-partitioner hash (murmur2,
  * sign cleared, mod partition count — byte-compatible with the Java
  * client, so co-partitioning with stock producers holds) → unkeyed
  * records stick to one partition per Spark task (the task id mod
  * partition count — batch-efficient round robin).
  *
  * Scale shape: each task buffers per partition with a bounded batch
  * size — a buffer reaching ~900 KB (under the broker's 1 MB
  * message.max.bytes default) flushes early, so no single Produce
  * batch can exceed what a stock broker accepts, and executor memory
  * per task stays bounded regardless of task output size. On flush,
  * ONE metadata lookup groups the touched partitions by leader and
  * each leader gets ONE connection carrying every batch it owns
  * (O(brokers) dials, not O(partitions)). Delivery is at-least-once
  * (Produce acks before commit; a retried task re-sends its buffer —
  * the log is append-only, the standard non-transactional sink
  * semantics). */
final class KafkaWriteBuilder(opts: KafkaSourceOptions, schema: StructType)
    extends WriteBuilder {

  private def colIdx(name: String): Option[Int] = {
    val i = schema.fieldIndex _
    scala.util.Try(i(name)).toOption
  }

  override def build(): Write = {
    val valueIdx = colIdx("value").getOrElse(
      throw new IllegalArgumentException(
        "graft-kafka sink: input needs a 'value' column"))
    Seq("value" -> valueIdx).foreach { case (n, i) =>
      schema.fields(i).dataType match {
        case BinaryType | StringType => ()
        case dt => throw new IllegalArgumentException(
          s"graft-kafka sink: column '$n' must be binary or string, got $dt")
      }
    }
    val keyIdx = colIdx("key")
    keyIdx.foreach { i =>
      schema.fields(i).dataType match {
        case BinaryType | StringType => ()
        case dt => throw new IllegalArgumentException(
          s"graft-kafka sink: column 'key' must be binary or string, got $dt")
      }
    }
    val partIdx = colIdx("partition")
    // validate the type up front: getInt on (say) a LongType column
    // would silently read the low word and misroute records
    partIdx.foreach { i =>
      if (schema.fields(i).dataType != IntegerType)
        throw new IllegalArgumentException(
          "graft-kafka sink: column 'partition' must be int, got " +
            schema.fields(i).dataType)
    }
    val nPartitions = opts.partitions().length
    val factory = KafkaWriterFactory(opts, schema, valueIdx, keyIdx,
      partIdx, nPartitions)
    new Write {
      override def toBatch: BatchWrite = new BatchWrite {
        override def createBatchWriterFactory(
            info: PhysicalWriteInfo): DataWriterFactory = factory
        override def commit(messages: Array[WriterCommitMessage]): Unit = ()
        override def abort(messages: Array[WriterCommitMessage]): Unit = ()
      }
      override def toStreaming: StreamingWrite = new StreamingWrite {
        override def createStreamingWriterFactory(
            info: PhysicalWriteInfo): StreamingDataWriterFactory = factory
        override def commit(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = ()
        override def abort(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = ()
      }
    }
  }
}

final case class KafkaWriterFactory(opts: KafkaSourceOptions,
    schema: StructType, valueIdx: Int, keyIdx: Option[Int],
    partIdx: Option[Int], nPartitions: Int)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new KafkaDataWriter(this, partitionId)
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new KafkaDataWriter(this, partitionId)
}

final case class KafkaWriteCommitted(records: Long)
    extends WriterCommitMessage

final class KafkaDataWriter(f: KafkaWriterFactory, sparkPartition: Int)
    extends DataWriter[InternalRow] {

  /** Stay under the broker's default 1 MB message.max.bytes with room
    * for batch framing. */
  private val MaxBatchBytes = 900 * 1024

  private val buffers = scala.collection.mutable.Map
    .empty[Int, scala.collection.mutable.ArrayBuffer[(Option[Array[Byte]], Array[Byte])]]
  private val bufferedBytes = scala.collection.mutable.Map.empty[Int, Long]
  private var n = 0L

  private def cell(row: InternalRow, i: Int): Option[Array[Byte]] =
    if (row.isNullAt(i)) None
    else f.schema.fields(i).dataType match {
      case BinaryType => Some(row.getBinary(i))
      case StringType => Some(row.getUTF8String(i).getBytes)
      case dt => throw new IllegalArgumentException(
        s"graft-kafka sink: unsupported type $dt")
    }

  override def write(row: InternalRow): Unit = {
    val value = cell(row, f.valueIdx).getOrElse(
      throw new IllegalArgumentException("graft-kafka sink: null value"))
    val key = f.keyIdx.flatMap(cell(row, _))
    val partition = f.partIdx match {
      case Some(pi) if !row.isNullAt(pi) => row.getInt(pi)
      case _ => key match {
        case Some(k) =>
          (KafkaWire.murmur2(k) & 0x7fffffff) % f.nPartitions
        case None => sparkPartition % f.nPartitions
      }
    }
    buffers.getOrElseUpdate(partition,
      scala.collection.mutable.ArrayBuffer.empty) += ((key, value))
    val sz = bufferedBytes.getOrElse(partition, 0L) +
      value.length + key.map(_.length).getOrElse(0) + 32
    bufferedBytes(partition) = sz
    n += 1
    if (sz >= MaxBatchBytes) flushPartitions(Set(partition))
  }

  // Leader map and connections cache, per writer: leadership rarely
  // changes mid-task, so re-dialing the bootstrap and re-fetching
  // Metadata on every ~900 KB flush (thousands of round trips on a
  // multi-GB task) is pure overhead. Invalidated and retried once on
  // any produce failure — the NOT_LEADER case after an election.
  private var cachedMeta: Option[
    (KafkaWireClient#Metadata, KafkaWireClient#TopicMeta)] = None
  private val conns = scala.collection.mutable.Map
    .empty[(String, Int), KafkaWireClient]

  private def connTo(host: String, port: Int): KafkaWireClient =
    conns.getOrElseUpdate((host, port),
      new KafkaWireClient(host, port, maxFrame = f.opts.maxFrame))

  private def invalidate(): Unit = {
    conns.values.foreach(c => try c.close() catch { case _: Exception => () })
    conns.clear()
    cachedMeta = None
  }

  private def topicMeta(): (KafkaWireClient#Metadata, KafkaWireClient#TopicMeta) =
    cachedMeta.getOrElse {
      val (h, p0) = KafkaWireClient.parseBootstrap(f.opts.bootstrap)
      val boot = connTo(h, p0)
      val md = boot.metadata(Seq(f.opts.topic))
      val tm = md.topics.find(_.name == f.opts.topic).getOrElse(
        throw new java.io.IOException(s"kafka: unknown topic ${f.opts.topic}"))
      cachedMeta = Some((md, tm))
      (md, tm)
    }

  /** Send the named partitions' buffers: cached leader map, one open
    * connection per LEADER, every batch that leader owns in one
    * Produce request. */
  private def flushPartitions(parts: Set[Int]): Unit = {
    val todo = buffers.view.filterKeys(parts).toMap
      .filter(_._2.nonEmpty)
    if (todo.isEmpty) return
    val ts = System.currentTimeMillis()
    try sendBatches(todo, ts)
    catch {
      case _: Exception =>
        // stale leadership or a dropped connection: refresh and retry
        // once (at-least-once delivery — a duplicate beats a loss)
        invalidate()
        sendBatches(todo, ts)
    }
    parts.foreach { p => buffers.remove(p); bufferedBytes.remove(p) }
  }

  private def sendBatches(
      todo: Map[Int, scala.collection.mutable.ArrayBuffer[(Option[Array[Byte]], Array[Byte])]],
      ts: Long): Unit = {
    val (md, topicMd) = topicMeta()
    val byLeader = todo.groupBy { case (p, _) =>
      topicMd.partitions.find(_.partition == p).map(_.leader).getOrElse(
        throw new java.io.IOException(s"kafka: no leader for partition $p"))
    }
    byLeader.foreach { case (leader, batches) =>
      val broker = md.brokers.find(_.nodeId == leader).getOrElse(
        throw new java.io.IOException(s"kafka: unknown broker $leader"))
      connTo(broker.host, broker.port).produceMany(f.opts.topic,
        batches.toSeq.sortBy(_._1).map { case (p, r) => p -> r.toSeq }, ts)
    }
  }

  override def commit(): WriterCommitMessage = {
    flushPartitions(buffers.keySet.toSet)
    invalidate() // the task is done with its connections
    KafkaWriteCommitted(n)
  }

  override def abort(): Unit = { buffers.clear(); invalidate() }
  override def close(): Unit = invalidate()
}
