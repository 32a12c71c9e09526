package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream, IOException}
import java.nio.charset.StandardCharsets.UTF_8

/** The Apache Kafka wire protocol, client-read subset — hand-built from
  * the public protocol guide (kafka.apache.org/protocol), the pg/mysql/
  * clickhouse-client pattern: no kafka-clients or spark-sql-kafka jar.
  *
  * Covered: the size-prefixed request/response envelope (request header
  * v1, response header v0), Metadata v1, ListOffsets v1, Fetch v4, and
  * the RecordBatch v2 on-disk/wire format (magic 2: CRC32C over the
  * bytes from `attributes` on, zigzag-varint record fields, headers).
  * Compression is accepted only as NONE — a compressed batch fails
  * loudly (codec jars are out of scope by design, as with the image
  * codecs).
  *
  * Reference anchor: the reference has no streaming-broker source —
  * this extends the engine's intake surface for the training-data
  * pipeline (SURVEY.md's beyond-reference extension set), where a
  * Kafka-compatible log is the canonical document firehose.
  */
object KafkaWire {

  // api keys
  val ApiProduce = 0
  val ApiFetch = 1
  val ApiListOffsets = 2
  val ApiMetadata = 3

  /** Kafka's default-partitioner hash (murmur2, seed 0x9747b28c, sign
    * cleared) — byte-compatible with the Java client so keyed records
    * land on the same partitions a stock producer would pick. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val tail = data.length & 3
    if (tail == 3) h ^= (data(data.length - 1) & 0xff) << 16
    if (tail >= 2) h ^= (data(data.length - (tail - 1)) & 0xff) << 8
    if (tail >= 1) { h ^= data(data.length - tail) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  final class Writer {
    private val buf = new java.io.ByteArrayOutputStream()
    private val out = new DataOutputStream(buf)
    def i8(v: Int): Writer = { out.writeByte(v); this }
    def i16(v: Int): Writer = { out.writeShort(v); this }
    def i32(v: Int): Writer = { out.writeInt(v); this }
    def i64(v: Long): Writer = { out.writeLong(v); this }
    def str(s: String): Writer = {
      val b = s.getBytes(UTF_8); i16(b.length); out.write(b); this
    }
    def nullableStr(s: Option[String]): Writer =
      s match { case Some(v) => str(v); case None => i16(-1) }
    def bytes(b: Array[Byte]): Writer = { i32(b.length); out.write(b); this }
    def raw(b: Array[Byte]): Writer = { out.write(b); this }
    def varint(v: Int): Writer = varlong(v.toLong)
    def varlong(v: Long): Writer = {
      // zigzag + LEB128 (the record-format varint)
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0) {
        out.writeByte(((z & 0x7f) | 0x80).toInt); z >>>= 7
      }
      out.writeByte(z.toInt); this
    }
    def result(): Array[Byte] = { out.flush(); buf.toByteArray }
  }

  final class Reader(b: Array[Byte]) {
    private var p = 0
    def pos: Int = p
    def remaining: Int = b.length - p
    private def need(n: Int): Unit =
      if (p + n > b.length)
        throw new IOException(s"kafka: truncated frame (need $n at $p/${b.length})")
    def i8(): Int = { need(1); val v = b(p); p += 1; v.toInt }
    def i16(): Int = { need(2)
      val v = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff); p += 2; v.toShort.toInt }
    def i32(): Int = { need(4)
      var v = 0; var i = 0
      while (i < 4) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
      p += 4; v }
    def i64(): Long = { need(8)
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
      p += 8; v }
    def u32(): Long = i32().toLong & 0xffffffffL
    def str(): String = {
      val n = i16()
      if (n < 0) throw new IOException("kafka: null string where required")
      need(n); val s = new String(b, p, n, UTF_8); p += n; s
    }
    def nullableStr(): Option[String] = {
      val n = i16()
      if (n < 0) None
      else { need(n); val s = new String(b, p, n, UTF_8); p += n; Some(s) }
    }
    def bytesOpt(): Option[Array[Byte]] = {
      val n = i32()
      if (n < 0) None
      else { need(n); val r = java.util.Arrays.copyOfRange(b, p, p + n); p += n; Some(r) }
    }
    def rawBytes(n: Int): Array[Byte] = {
      need(n); val r = java.util.Arrays.copyOfRange(b, p, p + n); p += n; r
    }
    def varlong(): Long = {
      var z = 0L; var shift = 0; var more = true
      while (more) {
        need(1); val x = b(p) & 0xff; p += 1
        z |= (x & 0x7fL) << shift
        more = (x & 0x80) != 0
        shift += 7
        if (shift > 70) throw new IOException("kafka: varint too long")
      }
      (z >>> 1) ^ -(z & 1) // un-zigzag
    }
    def varint(): Int = varlong().toInt
  }

  /** One decoded record. */
  final case class Record(offset: Long, timestampMs: Long,
      key: Option[Array[Byte]], value: Option[Array[Byte]])

  /** A decoded record set: the data records plus `endOffset`, the
    * offset AFTER the last complete batch (−1 when none decoded).
    * Control batches contribute no records but DO advance endOffset —
    * a reader that tracks position by record offsets alone can never
    * step past a trailing transaction marker and misreads the
    * resulting empty fetch as data loss. */
  final case class DecodedSet(records: Seq[Record], endOffset: Long)

  /** Decode every RecordBatch (magic 2) in a Fetch partition's record
    * set; a trailing partial batch (the broker may truncate at
    * maxBytes) is skipped, matching client behavior. Control batches
    * (transaction COMMIT/ABORT markers) are skipped — they are not
    * data, and the stock consumer filters them the same way. */
  def decodeRecordSet(bytes: Array[Byte]): DecodedSet = {
    val out = Vector.newBuilder[Record]
    var end = -1L
    var p = 0
    while (bytes.length - p >= 12) {
      // read the 12-byte header in place — copying the remaining set
      // per batch would be O(n·batches) allocation on the hot path
      var baseOffset = 0L
      var i = 0
      while (i < 8) { baseOffset = (baseOffset << 8) | (bytes(p + i) & 0xff); i += 1 }
      var batchLength = 0
      i = 0
      while (i < 4) { batchLength = (batchLength << 8) | (bytes(p + 8 + i) & 0xff); i += 1 }
      if (batchLength < 0 || bytes.length - p - 12 < batchLength) {
        p = bytes.length // partial trailing batch: stop
      } else {
        val (recs, lastOffsetDelta) = decodeBatch(new Reader(
          java.util.Arrays.copyOfRange(bytes, p, p + 12 + batchLength)),
          baseOffset)
        out ++= recs
        end = math.max(end, baseOffset + lastOffsetDelta + 1)
        p += 12 + batchLength
      }
    }
    DecodedSet(out.result(), end)
  }

  private def decodeBatch(r: Reader,
      baseOffset: Long): (Seq[Record], Int) = {
    r.i64() // baseOffset (again, from the copied slice)
    r.i32() // batchLength
    r.i32() // partitionLeaderEpoch
    val magic = r.i8()
    if (magic != 2)
      throw new IOException(s"kafka: unsupported record-batch magic $magic " +
        "(only the v2 format is implemented)")
    val crcClaimed = r.u32()
    // CRC32C covers everything from `attributes` to the batch end —
    // verify BEFORE trusting any length field inside (corrupt lengths
    // would otherwise surface as pseudo-random decode errors)
    val covered = r.rawBytes(r.remaining)
    val crc = new java.util.zip.CRC32C
    crc.update(covered)
    if (crc.getValue != crcClaimed)
      throw new IOException(f"kafka: record-batch CRC mismatch " +
        f"(computed ${crc.getValue}%08x, claimed $crcClaimed%08x)")
    val rr = new Reader(covered)
    val attrs = rr.i16()
    if ((attrs & 0x7) != 0)
      throw new IOException(s"kafka: compressed record batch (codec " +
        s"${attrs & 0x7}) — only uncompressed batches are supported")
    val lastOffsetDelta = rr.i32()
    // bit 5 = control batch: transaction COMMIT/ABORT markers, not data
    // — but its offset span still counts toward the consumed position
    if ((attrs & 0x20) != 0) return (Nil, lastOffsetDelta)
    val firstTimestamp = rr.i64()
    rr.i64() // maxTimestamp
    rr.i64() // producerId
    rr.i16() // producerEpoch
    rr.i32() // baseSequence
    val n = rr.i32()
    val recs = Vector.newBuilder[Record]
    var i = 0
    while (i < n) {
      val len = rr.varint()
      val start = rr.pos
      rr.i8() // record attributes
      val tsDelta = rr.varlong()
      val offDelta = rr.varint()
      val key = readVarBytes(rr)
      val value = readVarBytes(rr)
      val nHeaders = rr.varint()
      var h = 0
      while (h < nHeaders) { readVarBytes(rr); readVarBytes(rr); h += 1 }
      if (rr.pos - start != len)
        throw new IOException(s"kafka: record length mismatch " +
          s"(${rr.pos - start} decoded, $len declared)")
      recs += Record(baseOffset + offDelta, firstTimestamp + tsDelta,
        key, value)
      i += 1
    }
    (recs.result(), lastOffsetDelta)
  }

  private def readVarBytes(r: Reader): Option[Array[Byte]] = {
    val n = r.varint()
    if (n < 0) None else Some(r.rawBytes(n))
  }

  /** Encode one RecordBatch v2 (used by the in-repo stub broker and any
    * future sink): uncompressed, create-time timestamps, no headers. */
  def encodeBatch(baseOffset: Long, firstTimestampMs: Long,
      records: Seq[(Option[Array[Byte]], Array[Byte])]): Array[Byte] = {
    val body = new Writer
    body.i16(0) // attributes: no compression
    body.i32(records.length - 1) // lastOffsetDelta
    body.i64(firstTimestampMs)
    body.i64(firstTimestampMs) // maxTimestamp
    body.i64(-1L); body.i16(-1); body.i32(-1) // producer id/epoch/sequence
    body.i32(records.length)
    records.zipWithIndex.foreach { case ((k, v), i) =>
      val rec = new Writer
      rec.i8(0) // record attributes
      rec.varlong(0L) // timestampDelta
      rec.varint(i) // offsetDelta
      k match {
        case Some(kb) => rec.varint(kb.length); rec.raw(kb)
        case None => rec.varint(-1)
      }
      rec.varint(v.length); rec.raw(v)
      rec.varint(0) // headers
      val rb = rec.result()
      body.varint(rb.length); body.raw(rb)
    }
    val bodyBytes = body.result()
    val crc = new java.util.zip.CRC32C
    crc.update(bodyBytes)
    val batch = new Writer
    batch.i64(baseOffset)
    batch.i32(4 + 1 + 4 + bodyBytes.length) // partitionLeaderEpoch+magic+crc+body
    batch.i32(-1) // partitionLeaderEpoch
    batch.i8(2) // magic
    batch.i32(crc.getValue.toInt)
    batch.raw(bodyBytes)
    batch.result()
  }

  /** Size-prefixed frame IO over a data stream pair. */
  def sendFrame(out: DataOutputStream, payload: Array[Byte]): Unit = {
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
  }

  /** `maxFrame` tracks the configured fetch size (plus response
    * overhead) — a fixed cap would reject legal responses when the user
    * raises maxBytesPerFetch past it. */
  def recvFrame(in: DataInputStream,
      maxFrame: Int = 1 << 26): Array[Byte] = {
    val n = in.readInt()
    if (n < 0 || n > maxFrame)
      throw new IOException(s"kafka: frame length $n out of range (cap $maxFrame)")
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }
}
