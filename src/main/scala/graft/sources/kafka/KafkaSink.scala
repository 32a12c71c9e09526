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
  * Scale shape: each task buffers per partition and emits ONE Produce
  * batch per partition per task on commit; leader connections are
  * dialed once per touched partition. Delivery is at-least-once (the
  * Produce acks before commit; a retried task re-sends its buffer —
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
    val partIdx = colIdx("partition")
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

  private val buffers = scala.collection.mutable.Map
    .empty[Int, scala.collection.mutable.ArrayBuffer[(Option[Array[Byte]], Array[Byte])]]
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
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    val ts = System.currentTimeMillis()
    buffers.toSeq.sortBy(_._1).foreach { case (p, recs) =>
      val c = KafkaWireClient.forLeader(f.opts.bootstrap, f.opts.topic, p,
        maxFrame = f.opts.maxFrame)
      try c.produce(f.opts.topic, p, recs.toSeq, ts)
      finally c.close()
    }
    buffers.clear()
    KafkaWriteCommitted(n)
  }

  override def abort(): Unit = buffers.clear()
  override def close(): Unit = ()
}
