package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}

import KafkaWire._

/** Blocking Kafka protocol client over a plain socket: Metadata v1 /
  * ListOffsets v1 / Fetch v4, request header v1 + response header v0 —
  * the read path a consumer needs, one connection per use (the pg/
  * clickhouse client discipline). Broker redirection: Metadata names
  * each partition's leader; [[KafkaWireClient.forLeader]] reconnects
  * there when it differs from the bootstrap address. */
final class KafkaWireClient(host: String, port: Int,
    clientId: String = "graft",
    maxFrame: Int = 1 << 26) extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), 15000)
  socket.setSoTimeout(60000)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  private var correlation = 0

  override def close(): Unit = socket.close()

  private def exchange(apiKey: Int, apiVersion: Int,
      body: Array[Byte]): Reader = {
    correlation += 1
    val w = new Writer
    w.i16(apiKey); w.i16(apiVersion); w.i32(correlation)
    w.nullableStr(Some(clientId))
    w.raw(body)
    sendFrame(out, w.result())
    val r = new Reader(recvFrame(in, maxFrame))
    val cid = r.i32()
    if (cid != correlation)
      throw new IOException(s"kafka: correlation $cid, expected $correlation")
    r
  }

  final case class PartitionMeta(partition: Int, leader: Int,
      errorCode: Int)
  final case class TopicMeta(name: String, errorCode: Int,
      partitions: Seq[PartitionMeta])
  final case class BrokerMeta(nodeId: Int, host: String, port: Int)
  final case class Metadata(brokers: Seq[BrokerMeta], topics: Seq[TopicMeta])

  /** Metadata v1 for the named topics. Protocol note: a NULL array
    * (length −1) means "all topics"; an EMPTY array means none — pass
    * `None` explicitly via [[allMetadata]] for the former. */
  def metadata(topics: Seq[String]): Metadata = {
    require(topics.nonEmpty,
      "kafka: Metadata v1 needs topic names (empty array = NO topics; " +
        "use allMetadata() for the null-array all-topics form)")
    val w = new Writer
    w.i32(topics.length)
    topics.foreach(w.str)
    parseMetadata(exchange(ApiMetadata, 1, w.result()))
  }

  /** Metadata v1 for ALL topics (the null-array form). */
  def allMetadata(): Metadata =
    parseMetadata(exchange(ApiMetadata, 1, new Writer().i32(-1).result()))

  private def parseMetadata(r: Reader): Metadata = {
    val brokers = Seq.fill(r.i32()) {
      val id = r.i32(); val h = r.str(); val p = r.i32()
      r.nullableStr() // rack
      BrokerMeta(id, h, p)
    }
    r.i32() // controller id
    val ts = Seq.fill(r.i32()) {
      val err = r.i16()
      val name = r.str()
      r.i8() // is_internal
      val parts = Seq.fill(r.i32()) {
        val perr = r.i16()
        val pid = r.i32()
        val leader = r.i32()
        Seq.fill(r.i32())(r.i32()) // replicas
        Seq.fill(r.i32())(r.i32()) // isr
        PartitionMeta(pid, leader, perr)
      }
      TopicMeta(name, err, parts)
    }
    Metadata(brokers, ts)
  }

  /** ListOffsets v1: timestamp −1 = latest (the next offset to be
    * produced), −2 = earliest. */
  def listOffsets(topic: String, partitions: Seq[Int],
      timestamp: Long): Map[Int, Long] = {
    val w = new Writer
    w.i32(-1) // replica id: consumer
    w.i32(1); w.str(topic)
    w.i32(partitions.length)
    partitions.foreach { p => w.i32(p); w.i64(timestamp) }
    val r = exchange(ApiListOffsets, 1, w.result())
    var res = Map.empty[Int, Long]
    (0 until r.i32()).foreach { _ =>
      r.str() // topic
      (0 until r.i32()).foreach { _ =>
        val pid = r.i32()
        val err = r.i16()
        if (err != 0)
          throw new IOException(s"kafka: ListOffsets $topic/$pid error $err")
        r.i64() // timestamp
        res += pid -> r.i64()
      }
    }
    res
  }

  /** Produce v3 (acks=-1: all in-sync replicas — the durable default)
    * of one uncompressed v2 record batch per partition, several
    * partitions per request (the per-leader batching the sink uses).
    * Returns each partition's assigned base offset. */
  def produceMany(topic: String,
      batches: Seq[(Int, Seq[(Option[Array[Byte]], Array[Byte])])],
      timestampMs: Long): Map[Int, Long] = {
    require(batches.nonEmpty && batches.forall(_._2.nonEmpty),
      "kafka: empty produce")
    val w = new Writer
    w.nullableStr(None) // transactional id
    w.i16(-1) // acks: all
    w.i32(30000) // timeout
    w.i32(1); w.str(topic)
    w.i32(batches.length)
    batches.foreach { case (p, recs) =>
      w.i32(p)
      w.bytes(KafkaWire.encodeBatch(0L, timestampMs, recs))
    }
    val r = exchange(ApiProduce, 3, w.result())
    var base = Map.empty[Int, Long]
    (0 until r.i32()).foreach { _ =>
      r.str() // topic
      (0 until r.i32()).foreach { _ =>
        val pid = r.i32()
        val err = r.i16()
        if (err != 0)
          throw new IOException(s"kafka: Produce $topic/$pid error $err")
        val off = r.i64()
        r.i64() // log append time
        base += pid -> off
      }
    }
    r.i32() // throttle
    base
  }

  def produce(topic: String, partition: Int,
      records: Seq[(Option[Array[Byte]], Array[Byte])],
      timestampMs: Long): Long =
    produceMany(topic, Seq(partition -> records), timestampMs)(partition)

  /** `batchEnd`: offset after the last COMPLETE batch in the response
    * (−1 when none) — includes control batches, so a caller advancing
    * by record offsets alone can still step past transaction markers. */
  final case class FetchResult(records: Seq[Record], highWatermark: Long,
      batchEnd: Long)

  /** Fetch v4 from one partition starting at `offset`. */
  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 4 * 1024 * 1024, maxWaitMs: Int = 500): FetchResult = {
    val w = new Writer
    w.i32(-1) // replica id
    w.i32(maxWaitMs)
    w.i32(1) // min bytes
    w.i32(maxBytes)
    w.i8(0) // isolation level: read uncommitted
    w.i32(1); w.str(topic)
    w.i32(1); w.i32(partition); w.i64(offset); w.i32(maxBytes)
    val r = exchange(ApiFetch, 4, w.result())
    r.i32() // throttle ms
    var result: Option[FetchResult] = None
    (0 until r.i32()).foreach { _ =>
      r.str() // topic
      (0 until r.i32()).foreach { _ =>
        val pid = r.i32()
        val err = r.i16()
        val hw = r.i64()
        r.i64() // last stable offset
        val nAborted = r.i32()
        (0 until math.max(0, nAborted)).foreach { _ => r.i64(); r.i64() }
        val recordSet = r.bytesOpt().getOrElse(Array.emptyByteArray)
        if (err == 1)
          // typed: the reader's failOnDataLoss=false path must be able
          // to catch retention truncation and skip to the log start
          throw new KafkaOffsetOutOfRange(
            s"kafka: Fetch $topic/$pid offset $offset out of range")
        if (err != 0)
          throw new IOException(s"kafka: Fetch $topic/$pid error $err")
        if (pid == partition) {
          val decoded = decodeRecordSet(recordSet)
          result = Some(FetchResult(
            // the broker may return batches starting BELOW the requested
            // offset (batch granularity); trim to the ask
            decoded.records.filter(_.offset >= offset), hw,
            decoded.endOffset))
        }
      }
    }
    result.getOrElse(
      throw new IOException(s"kafka: Fetch response missing $topic/$partition"))
  }
}

/** The planned offset predates the log start (retention) or exceeds the
  * log end — Kafka error code 1. */
final class KafkaOffsetOutOfRange(msg: String) extends IOException(msg)

object KafkaWireClient {
  /** Parse `host:port` (the single-bootstrap form; a list's first entry
    * is used — metadata redirects to leaders from there). */
  def parseBootstrap(s: String): (String, Int) = {
    val first = s.split(',').head.trim
    val i = first.lastIndexOf(':')
    require(i > 0, s"kafka: bootstrap must be host:port, got '$s'")
    (first.substring(0, i), first.substring(i + 1).toInt)
  }

  /** Connect to the leader of (topic, partition): bootstrap metadata
    * names it; same address ⇒ reuse shape, else dial the leader. */
  def forLeader(bootstrap: String, topic: String, partition: Int,
      maxFrame: Int = 1 << 26): KafkaWireClient = {
    val (h, p) = parseBootstrap(bootstrap)
    val boot = new KafkaWireClient(h, p, maxFrame = maxFrame)
    val md =
      try boot.metadata(Seq(topic))
      catch { case e: Throwable => boot.close(); throw e }
    val leader = md.topics.find(_.name == topic)
      .flatMap(_.partitions.find(_.partition == partition))
      .map(_.leader)
    val broker = leader.flatMap(l => md.brokers.find(_.nodeId == l))
    broker match {
      case Some(b) if b.host == h && b.port == p => boot
      case Some(b) => boot.close()
        new KafkaWireClient(b.host, b.port, maxFrame = maxFrame)
      case None => boot.close()
        throw new IOException(s"kafka: no leader for $topic/$partition")
    }
  }
}
