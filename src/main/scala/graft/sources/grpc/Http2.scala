package graft.sources.grpc

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException, InputStream, OutputStream}
import java.net.{Socket, URI}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Minimal HTTP/2 cleartext (h2c) carrier for the gRPC source, built
  * directly from the public RFCs — 7540 (framing, stream lifecycle,
  * flow control) and 7541 (HPACK) — because the usual carrier jars
  * (grpc-netty) are not in this build. With it,
  * [[GrpcDataSource]] speaks the ACTUAL gRPC wire protocol end to end:
  * connection preface, SETTINGS exchange, HPACK-compressed headers,
  * DATA-framed LENGTH_PREFIXED_MESSAGEs, and grpc-status trailers.
  *
  * Deliberate bounds, stated honestly:
  *  - cleartext h2c for `http://`, and h2-over-TLS with ALPN `h2` for
  *    `https://` (self-signed in tests via an injected SSLContext; the
  *    JVM truststore for the CA-signed real world);
  *  - one concurrent stream per connection (a unary source call);
  *  - send-side flow control IS honored (§5.2/§6.9): [[SendWindows]]
  *    tracks the peer's connection+stream windows from SETTINGS and
  *    WINDOW_UPDATE, so requests and responses larger than 65535 bytes
  *    interop with conforming peers instead of risking
  *    FLOW_CONTROL_ERROR resets;
  *  - HPACK encoding uses literal-without-indexing exclusively (legal
  *    per RFC 7541 §6.2.2, zero table state to corrupt) and raw strings
  *    by default (Huffman is sender-optional); decoding implements the
  *    full static table, dynamic-table insertion, indexed lookups, AND
  *    Huffman-coded strings (§5.2 + Appendix B), so the client interops
  *    with real gRPC/Flight servers, which Huffman-encode response
  *    headers by default.
  */
private[graft] object Hpack {

  /** RFC 7541 §5.2 + Appendix B — the HTTP/2 static Huffman code.
    * Decode is required for interop (most servers Huffman-encode);
    * encode exists so the in-repo server edge and the spec's
    * independent peers exercise the decode path for real. Validated
    * against the RFC's Appendix C vectors in GrpcSourceSpec. */
  object Huffman {
    // (code, bit-length) per symbol 0..255, in symbol order. EOS (256)
    // is never emitted; its prefix is the mandated all-ones padding.
    private val Table: Array[(Int, Int)] = Array(
      (0x1ff8, 13), (0x7fffd8, 23), (0xfffffe2, 28), (0xfffffe3, 28),
      (0xfffffe4, 28), (0xfffffe5, 28), (0xfffffe6, 28), (0xfffffe7, 28),
      (0xfffffe8, 28), (0xffffea, 24), (0x3ffffffc, 30), (0xfffffe9, 28),
      (0xfffffea, 28), (0x3ffffffd, 30), (0xfffffeb, 28), (0xfffffec, 28),
      (0xfffffed, 28), (0xfffffee, 28), (0xfffffef, 28), (0xffffff0, 28),
      (0xffffff1, 28), (0xffffff2, 28), (0x3ffffffe, 30), (0xffffff3, 28),
      (0xffffff4, 28), (0xffffff5, 28), (0xffffff6, 28), (0xffffff7, 28),
      (0xffffff8, 28), (0xffffff9, 28), (0xffffffa, 28), (0xffffffb, 28),
      (0x14, 6), (0x3f8, 10), (0x3f9, 10), (0xffa, 12),
      (0x1ff9, 13), (0x15, 6), (0xf8, 8), (0x7fa, 11),
      (0x3fa, 10), (0x3fb, 10), (0xf9, 8), (0x7fb, 11),
      (0xfa, 8), (0x16, 6), (0x17, 6), (0x18, 6),
      (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
      (0x1a, 6), (0x1b, 6), (0x1c, 6), (0x1d, 6),
      (0x1e, 6), (0x1f, 6), (0x5c, 7), (0xfb, 8),
      (0x7ffc, 15), (0x20, 6), (0xffb, 12), (0x3fc, 10),
      (0x1ffa, 13), (0x21, 6), (0x5d, 7), (0x5e, 7),
      (0x5f, 7), (0x60, 7), (0x61, 7), (0x62, 7),
      (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
      (0x67, 7), (0x68, 7), (0x69, 7), (0x6a, 7),
      (0x6b, 7), (0x6c, 7), (0x6d, 7), (0x6e, 7),
      (0x6f, 7), (0x70, 7), (0x71, 7), (0x72, 7),
      (0xfc, 8), (0x73, 7), (0xfd, 8), (0x1ffb, 13),
      (0x7fff0, 19), (0x1ffc, 13), (0x3ffc, 14), (0x22, 6),
      (0x7ffd, 15), (0x3, 5), (0x23, 6), (0x4, 5),
      (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
      (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
      (0x28, 6), (0x29, 6), (0x2a, 6), (0x7, 5),
      (0x2b, 6), (0x76, 7), (0x2c, 6), (0x8, 5),
      (0x9, 5), (0x2d, 6), (0x77, 7), (0x78, 7),
      (0x79, 7), (0x7a, 7), (0x7b, 7), (0x7ffe, 15),
      (0x7fc, 11), (0x3ffd, 14), (0x1ffd, 13), (0xffffffc, 28),
      (0xfffe6, 20), (0x3fffd2, 22), (0xfffe7, 20), (0xfffe8, 20),
      (0x3fffd3, 22), (0x3fffd4, 22), (0x3fffd5, 22), (0x7fffd9, 23),
      (0x3fffd6, 22), (0x7fffda, 23), (0x7fffdb, 23), (0x7fffdc, 23),
      (0x7fffdd, 23), (0x7fffde, 23), (0xffffeb, 24), (0x7fffdf, 23),
      (0xffffec, 24), (0xffffed, 24), (0x3fffd7, 22), (0x7fffe0, 23),
      (0xffffee, 24), (0x7fffe1, 23), (0x7fffe2, 23), (0x7fffe3, 23),
      (0x7fffe4, 23), (0x1fffdc, 21), (0x3fffd8, 22), (0x7fffe5, 23),
      (0x3fffd9, 22), (0x7fffe6, 23), (0x7fffe7, 23), (0xffffef, 24),
      (0x3fffda, 22), (0x1fffdd, 21), (0xfffe9, 20), (0x3fffdb, 22),
      (0x3fffdc, 22), (0x7fffe8, 23), (0x7fffe9, 23), (0x1fffde, 21),
      (0x7fffea, 23), (0x3fffdd, 22), (0x3fffde, 22), (0xfffff0, 24),
      (0x1fffdf, 21), (0x3fffdf, 22), (0x7fffeb, 23), (0x7fffec, 23),
      (0x1fffe0, 21), (0x1fffe1, 21), (0x3fffe0, 22), (0x1fffe2, 21),
      (0x7fffed, 23), (0x3fffe1, 22), (0x7fffee, 23), (0x7fffef, 23),
      (0xfffea, 20), (0x3fffe2, 22), (0x3fffe3, 22), (0x3fffe4, 22),
      (0x7ffff0, 23), (0x3fffe5, 22), (0x3fffe6, 22), (0x7ffff1, 23),
      (0x3ffffe0, 26), (0x3ffffe1, 26), (0xfffeb, 20), (0x7fff1, 19),
      (0x3fffe7, 22), (0x7ffff2, 23), (0x3fffe8, 22), (0x1ffffec, 25),
      (0x3ffffe2, 26), (0x3ffffe3, 26), (0x3ffffe4, 26), (0x7ffffde, 27),
      (0x7ffffdf, 27), (0x3ffffe5, 26), (0xfffff1, 24), (0x1ffffed, 25),
      (0x7fff2, 19), (0x1fffe3, 21), (0x3ffffe6, 26), (0x7ffffe0, 27),
      (0x7ffffe1, 27), (0x3ffffe7, 26), (0x7ffffe2, 27), (0xfffff2, 24),
      (0x1fffe4, 21), (0x1fffe5, 21), (0x3ffffe8, 26), (0x3ffffe9, 26),
      (0xffffffd, 28), (0x7ffffe3, 27), (0x7ffffe4, 27), (0x7ffffe5, 27),
      (0xfffec, 20), (0xfffff3, 24), (0xfffed, 20), (0x1fffe6, 21),
      (0x3fffe9, 22), (0x1fffe7, 21), (0x1fffe8, 21), (0x7ffff3, 23),
      (0x3fffea, 22), (0x3fffeb, 22), (0x1ffffee, 25), (0x1ffffef, 25),
      (0xfffff4, 24), (0xfffff5, 24), (0x3ffffea, 26), (0x7ffff4, 23),
      (0x3ffffeb, 26), (0x7ffffe6, 27), (0x3ffffec, 26), (0x3ffffed, 26),
      (0x7ffffe7, 27), (0x7ffffe8, 27), (0x7ffffe9, 27), (0x7ffffea, 27),
      (0x7ffffeb, 27), (0xffffffe, 28), (0x7ffffec, 27), (0x7ffffed, 27),
      (0x7ffffee, 27), (0x7ffffef, 27), (0x7fffff0, 27), (0x3ffffee, 26))

    // Decoding trie as flat arrays: child0/child1 hold the next node id
    // or -1; sym holds the decoded symbol at a leaf or -1. Built once.
    private val (child0, child1, leafSym) = {
      val c0 = mutable.ArrayBuffer(-1)
      val c1 = mutable.ArrayBuffer(-1)
      val sy = mutable.ArrayBuffer(-1)
      def newNode(): Int = { c0 += -1; c1 += -1; sy += -1; c0.length - 1 }
      var s = 0
      while (s < Table.length) {
        val (code, bits) = Table(s)
        var node = 0
        var i = bits - 1
        while (i >= 0) {
          val bit = (code >>> i) & 1
          val kids = if (bit == 0) c0 else c1
          if (kids(node) == -1) kids(node) = newNode()
          node = kids(node)
          i -= 1
        }
        sy(node) = s
        s += 1
      }
      (c0.toArray, c1.toArray, sy.toArray)
    }

    def encode(raw: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(raw.length)
      var acc = 0L
      var nbits = 0
      var i = 0
      while (i < raw.length) {
        val (code, bits) = Table(raw(i) & 0xff)
        acc = (acc << bits) | (code & 0xffffffffL)
        nbits += bits
        while (nbits >= 8) {
          nbits -= 8
          out.write(((acc >>> nbits) & 0xff).toInt)
        }
        i += 1
      }
      // pad the final partial byte with the EOS prefix (all ones)
      if (nbits > 0)
        out.write((((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt)
      out.toByteArray
    }

    /** Canonical bit-walk decode. Padding must be a <8-bit all-ones EOS
      * prefix (RFC 7541 §5.2); anything else is a decode error, never a
      * silent mis-parse. */
    def decode(coded: Array[Byte], off: Int, len: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream(len * 2)
      var node = 0
      var depth = 0
      var pathAllOnes = true
      var i = off
      val end = off + len
      while (i < end) {
        val b = coded(i) & 0xff
        var bit = 7
        while (bit >= 0) {
          val v = (b >>> bit) & 1
          node = if (v == 0) child0(node) else child1(node)
          if (node == -1)
            throw new IOException("hpack: invalid Huffman code from peer")
          if (v == 0) pathAllOnes = false
          depth += 1
          if (leafSym(node) >= 0) {
            out.write(leafSym(node))
            node = 0; depth = 0; pathAllOnes = true
          }
          bit -= 1
        }
        i += 1
      }
      if (depth >= 8 || !pathAllOnes)
        throw new IOException(
          "hpack: Huffman padding is not a <8-bit EOS prefix")
      out.toByteArray
    }
  }

  /** RFC 7541 Appendix A — the complete static table. */
  val Static: IndexedSeq[(String, String)] = IndexedSeq(
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""), ("access-control-allow-origin", ""),
    ("age", ""), ("allow", ""), ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""), ("content-location", ""),
    ("content-range", ""), ("content-type", ""), ("cookie", ""), ("date", ""),
    ("etag", ""), ("expect", ""), ("expires", ""), ("from", ""), ("host", ""),
    ("if-match", ""), ("if-modified-since", ""), ("if-none-match", ""),
    ("if-range", ""), ("if-unmodified-since", ""), ("last-modified", ""),
    ("link", ""), ("location", ""), ("max-forwards", ""),
    ("proxy-authenticate", ""), ("proxy-authorization", ""), ("range", ""),
    ("referer", ""), ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""), ("via", ""),
    ("www-authenticate", ""))

  /** Prefix-N integer encoding (RFC 7541 §5.1). `first` carries the
    * pattern bits above the prefix. */
  def writeInt(out: ByteArrayOutputStream, first: Int, prefixBits: Int,
      value: Int): Unit = {
    val max = (1 << prefixBits) - 1
    if (value < max) out.write(first | value)
    else {
      out.write(first | max)
      var v = value - max
      while (v >= 128) { out.write((v % 128) + 128); v /= 128 }
      out.write(v)
    }
  }

  private def writeString(out: ByteArrayOutputStream, s: String,
      huffman: Boolean): Unit = {
    val raw = s.getBytes(StandardCharsets.UTF_8)
    val b = if (huffman) Huffman.encode(raw) else raw
    writeInt(out, if (huffman) 0x80 else 0x00, 7, b.length)
    out.write(b, 0, b.length)
  }

  /** Encode a header list as literal-without-indexing with new names
    * (§6.2.2) — stateless and legal for every header incl. pseudo.
    * `huffman = true` emits §5.2 Huffman-coded strings (what real
    * servers send); the client's own requests stay raw. */
  def encode(headers: Seq[(String, String)],
      huffman: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    headers.foreach { case (n, v) =>
      out.write(0x00)
      writeString(out, n, huffman)
      writeString(out, v, huffman)
    }
    out.toByteArray
  }

  final class Reader(buf: Array[Byte]) {
    private var i = 0
    def hasNext: Boolean = i < buf.length
    def byte(): Int = { val b = buf(i) & 0xff; i += 1; b }
    def peek: Int = buf(i) & 0xff
    def int(prefixBits: Int): Int = {
      val max = (1 << prefixBits) - 1
      var v = byte() & max
      if (v == max) {
        var shift = 0
        var b = 0
        do {
          b = byte()
          v += (b & 0x7f) << shift
          shift += 7
        } while ((b & 0x80) != 0)
      }
      v
    }
    def string(): String = {
      val huffman = (peek & 0x80) != 0
      val len = int(7)
      if (len < 0 || i + len > buf.length)
        throw new IOException(
          s"hpack: string length $len exceeds header block (${buf.length - i} left)")
      val s =
        if (huffman)
          new String(Huffman.decode(buf, i, len), StandardCharsets.UTF_8)
        else new String(buf, i, len, StandardCharsets.UTF_8)
      i += len
      s
    }
  }

  /** Decode a complete header block. Maintains a per-block dynamic table
    * (a fresh Decoder per CONNECTION is the RFC model; the unary client
    * keeps one per connection). */
  final class Decoder {
    private val dynamic = mutable.ArrayDeque.empty[(String, String)]

    private def lookup(idx: Int): (String, String) =
      if (idx >= 1 && idx <= Static.length) Static(idx - 1)
      else if (idx > Static.length && idx <= Static.length + dynamic.length)
        dynamic(idx - Static.length - 1)
      else throw new IOException(s"hpack: index $idx out of table range")

    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val r = new Reader(block)
      val out = Seq.newBuilder[(String, String)]
      while (r.hasNext) {
        val b = r.peek
        if ((b & 0x80) != 0) { // indexed field
          out += lookup(r.int(7))
        } else if ((b & 0xc0) == 0x40) { // literal, incremental indexing
          val idx = r.int(6)
          val name = if (idx == 0) r.string() else lookup(idx)._1
          val value = r.string()
          dynamic.prepend((name, value))
          if (dynamic.length > 256) dynamic.removeLast() // safety bound
          out += ((name, value))
        } else if ((b & 0xe0) == 0x20) { // dynamic table size update
          r.int(5) // accepted; our bound above governs actual retention
        } else { // literal without indexing (0x0) or never indexed (0x1)
          val idx = r.int(4)
          val name = if (idx == 0) r.string() else lookup(idx)._1
          out += ((name, r.string()))
        }
      }
      out.result()
    }
  }
}

/** Peer-advertised SEND windows (RFC 7540 §5.2, §6.9): one connection
  * window plus one per open stream, all starting at 65535. A writer
  * consumes window before each DATA frame; the frame-reading side
  * replenishes on WINDOW_UPDATE and rebases open streams when the peer's
  * SETTINGS_INITIAL_WINDOW_SIZE changes (§6.9.2 — the delta applies to
  * every open stream, and a window may legally go negative). Without
  * this a conforming peer that stops replenishing could be overrun and
  * would answer with FLOW_CONTROL_ERROR. */
private[graft] final class SendWindows {
  import scala.collection.mutable
  private var conn: Long = 65535L
  private var initial: Long = 65535L
  private val streams = mutable.Map.empty[Int, Long]

  private def streamWindow(sid: Int): Long =
    streams.getOrElseUpdate(sid, initial)

  /** Peer SETTINGS_INITIAL_WINDOW_SIZE: rebase every open stream. */
  def setInitial(n: Long): Unit = synchronized {
    val delta = n - initial
    initial = n
    streams.mapValuesInPlace((_, w) => w + delta)
    notifyAll()
  }

  /** WINDOW_UPDATE on stream 0 (connection) or a stream. */
  def update(sid: Int, inc: Int): Unit = synchronized {
    if (sid == 0) conn += inc
    else streams.update(sid, streamWindow(sid) + inc)
    notifyAll()
  }

  /** Take up to `want` bytes for `sid`, BLOCKING until the peer opens
    * some window (for writers whose connection has a concurrent frame
    * reader calling update). Returns the granted chunk size. */
  def reserve(sid: Int, want: Int, timeoutMs: Long = 30000): Int =
    synchronized {
      if (want <= 0) return 0
      val deadline = System.currentTimeMillis() + timeoutMs
      var avail = math.min(conn, streamWindow(sid))
      while (avail <= 0) {
        val left = deadline - System.currentTimeMillis()
        if (left <= 0) throw new IOException(
          "http2: send window exhausted and peer sent no WINDOW_UPDATE " +
            s"in ${timeoutMs}ms (stream $sid)")
        wait(left)
        avail = math.min(conn, streamWindow(sid))
      }
      grant(sid, want, avail)
    }

  /** Non-blocking take for single-threaded writers that pump the frame
    * stream themselves while the window is closed. 0 = closed. */
  def tryReserve(sid: Int, want: Int): Int = synchronized {
    if (want <= 0) return 0
    val avail = math.min(conn, streamWindow(sid))
    if (avail <= 0) 0 else grant(sid, want, avail)
  }

  private def grant(sid: Int, want: Int, avail: Long): Int = {
    val g = math.min(want.toLong, avail).toInt
    conn -= g
    streams.update(sid, streamWindow(sid) - g)
    g
  }

  def release(sid: Int): Unit = synchronized { streams.remove(sid) }
}

/** RFC 7540 frame I/O. */
private[graft] object Http2Frames {
  val Data = 0x0; val Headers = 0x1; val Priority = 0x2; val RstStream = 0x3
  val Settings = 0x4; val PushPromise = 0x5; val Ping = 0x6; val GoAway = 0x7
  val WindowUpdate = 0x8; val Continuation = 0x9

  val FlagEndStream = 0x1; val FlagEndHeaders = 0x4; val FlagAck = 0x1

  val SettingsInitialWindowSize = 0x4

  /** SETTINGS payload: (identifier, value) pairs, 6 bytes each (§6.5.1). */
  def settings(payload: Array[Byte]): Seq[(Int, Long)] = {
    val out = Seq.newBuilder[(Int, Long)]
    var i = 0
    while (i + 6 <= payload.length) {
      out += ((((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff),
        ((payload(i + 2) & 0xffL) << 24) | ((payload(i + 3) & 0xffL) << 16) |
          ((payload(i + 4) & 0xffL) << 8) | (payload(i + 5) & 0xffL)))
      i += 6
    }
    out.result()
  }

  /** WINDOW_UPDATE payload for `inc` bytes (§6.9). */
  def windowUpdatePayload(inc: Int): Array[Byte] = Array(
    (inc >> 24).toByte, (inc >> 16).toByte, (inc >> 8).toByte, inc.toByte)

  /** WINDOW_UPDATE payload: 31-bit increment (§6.9). */
  def windowIncrement(payload: Array[Byte]): Int = {
    if (payload.length < 4)
      throw new IOException("http2: truncated WINDOW_UPDATE")
    ((payload(0) & 0x7f) << 24) | ((payload(1) & 0xff) << 16) |
      ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
  }

  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Default SETTINGS_MAX_FRAME_SIZE — we never negotiate larger. */
  val MaxFrame = 16384

  final case class Frame(tpe: Int, flags: Int, streamId: Int,
      payload: Array[Byte])

  def write(out: OutputStream, tpe: Int, flags: Int, streamId: Int,
      payload: Array[Byte]): Unit = {
    require(payload.length <= MaxFrame, s"frame too big: ${payload.length}")
    val h = new Array[Byte](9)
    h(0) = (payload.length >> 16).toByte
    h(1) = (payload.length >> 8).toByte
    h(2) = payload.length.toByte
    h(3) = tpe.toByte
    h(4) = flags.toByte
    h(5) = ((streamId >> 24) & 0x7f).toByte
    h(6) = (streamId >> 16).toByte
    h(7) = (streamId >> 8).toByte
    h(8) = streamId.toByte
    out.write(h); out.write(payload); out.flush()
  }

  def read(in: DataInputStream): Frame = {
    val h = new Array[Byte](9)
    in.readFully(h)
    val len = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
    if (len > MaxFrame * 4)
      throw new IOException(s"http2: peer frame length $len exceeds sane bound")
    val payload = new Array[Byte](len)
    in.readFully(payload)
    Frame(h(3) & 0xff, h(4) & 0xff,
      ((h(5) & 0x7f) << 24) | ((h(6) & 0xff) << 16) | ((h(7) & 0xff) << 8)
        | (h(8) & 0xff),
      payload)
  }

  /** DATA payload split into ≤ MaxFrame chunks. `endStream` marks the
    * last chunk — true for a client request (nothing follows), false
    * for a gRPC response body (trailers follow in a HEADERS frame). */
  def writeData(out: OutputStream, streamId: Int, data: Array[Byte],
      endStream: Boolean = true): Unit = {
    var off = 0
    do {
      val n = math.min(MaxFrame, data.length - off)
      val last = off + n >= data.length
      write(out, Data, if (last && endStream) FlagEndStream else 0, streamId,
        java.util.Arrays.copyOfRange(data, off, off + n))
      off += n
    } while (off < data.length)
  }

  /** Flow-controlled DATA write: each chunk first reserves send-window
    * bytes (blocking until a concurrent frame reader replenishes via
    * WINDOW_UPDATE), then writes under `lock` so frames from concurrent
    * streams never interleave inside a single frame write. This is the
    * path a peer-conforming server MUST use for responses that may
    * exceed the default 65535-byte window (RFC 7540 §6.9.1). */
  def writeDataFlow(out: OutputStream, streamId: Int, data: Array[Byte],
      endStream: Boolean, windows: SendWindows, lock: AnyRef): Unit = {
    var off = 0
    do {
      val want = math.min(MaxFrame, data.length - off)
      val n = if (want == 0) 0 else windows.reserve(streamId, want)
      val last = off + n >= data.length
      lock.synchronized {
        write(out, Data, if (last && endStream) FlagEndStream else 0,
          streamId, java.util.Arrays.copyOfRange(data, off, off + n))
      }
      off += n
    } while (off < data.length)
  }
}

/** The unary gRPC-over-h2c exchange. */
private[graft] object Http2Grpc {
  import Http2Frames._

  /** SSLContext trusting exactly the PKCS12 truststore at `path` — how
    * a deployment pins a private CA / self-signed edge certificate for
    * `https://` sources without touching the JVM truststore. Built on
    * demand per read (SSLContext is not serializable; options are). */
  def trustContext(path: String, password: String): javax.net.ssl.SSLContext = {
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try store.load(in, password.toCharArray) finally in.close()
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Client-side TLS parameters for an h2 socket: ALPN `h2`, plus RFC
    * 2818 endpoint identification whenever trust comes from the JVM
    * default truststore — without it ANY CA-signed certificate for ANY
    * host would pass, letting an active MITM impersonate the server. A
    * `pinned` context (explicit PKCS12 truststore naming exactly the
    * edge's cert) is the verify-ca posture and skips the hostname
    * check, matching the self-signed-edge deployment model. */
  private[graft] def clientTlsParams(s: javax.net.ssl.SSLSocket,
      pinned: Boolean): javax.net.ssl.SSLParameters = {
    val params = s.getSSLParameters
    params.setApplicationProtocols(Array("h2"))
    if (!pinned) params.setEndpointIdentificationAlgorithm("HTTPS")
    params
  }

  /** POST `framedRequest` (already gRPC-length-prefixed) to `fullUrl`'s
    * path; returns the response's DATA bytes (the framed gRPC
    * response). Enforces :status 200 and grpc-status 0. `extraHeaders`
    * ride after the required set (e.g. authorization).
    *
    * `http://` is cleartext h2c; `https://` runs the same HTTP/2
    * exchange over TLS with ALPN `h2` (what real gRPC servers
    * negotiate) — `ssl` supplies the trust context (None = the JVM
    * default truststore, the CA-signed real-world case). */
  def unaryCall(fullUrl: String, framedRequest: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil,
      ssl: Option[javax.net.ssl.SSLContext] = None): Array[Byte] = {
    val uri = new URI(fullUrl)
    require(uri.getScheme == "http" || uri.getScheme == "https",
      s"expected http(s) url, got '${uri.getScheme}'")
    val tls = uri.getScheme == "https"
    val port = if (uri.getPort == -1) { if (tls) 443 else 80 } else uri.getPort
    val socket: Socket =
      if (!tls) new Socket(uri.getHost, port)
      else {
        val ctx = ssl.getOrElse(javax.net.ssl.SSLContext.getDefault)
        val s = ctx.getSocketFactory.createSocket(uri.getHost, port)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        s.setSSLParameters(clientTlsParams(s, pinned = ssl.isDefined))
        s.startHandshake()
        val negotiated = s.getApplicationProtocol
        if (negotiated != null && negotiated.nonEmpty && negotiated != "h2")
          throw new IOException(
            s"https: server negotiated ALPN '$negotiated', need h2")
        s
      }
    socket.setSoTimeout(30000)
    try {
      val out = socket.getOutputStream
      val in = new DataInputStream(socket.getInputStream)
      val windows = new SendWindows
      // frames that arrive while we're still sending (early response,
      // headers before the request completes) wait here for the
      // response loop; control frames are consumed on the spot
      val deferred = mutable.Queue.empty[Frame]
      def control(f: Frame): Boolean = f.tpe match {
        case Settings =>
          if ((f.flags & FlagAck) == 0) {
            settings(f.payload).foreach { case (id, v) =>
              if (id == SettingsInitialWindowSize) windows.setInitial(v)
            }
            write(out, Settings, FlagAck, 0, Array.emptyByteArray)
          }
          true
        case Ping =>
          if ((f.flags & FlagAck) == 0) write(out, Ping, FlagAck, 0, f.payload)
          true
        case WindowUpdate =>
          windows.update(f.streamId, windowIncrement(f.payload)); true
        case Priority => true
        case GoAway =>
          throw new IOException("http2: server sent GOAWAY before response")
        case RstStream =>
          throw new IOException("http2: stream reset by server")
        case _ => false
      }
      out.write(Preface)
      write(out, Settings, 0, 0, Array.emptyByteArray)
      // the server connection preface is a SETTINGS frame (RFC 7540
      // §3.5); read it before sending DATA so a non-default
      // SETTINGS_INITIAL_WINDOW_SIZE is honored from the first byte
      var sawServerSettings = false
      while (!sawServerSettings) {
        val f = read(in)
        if (f.tpe == Settings && (f.flags & FlagAck) == 0)
          sawServerSettings = true
        if (!control(f)) deferred += f
      }
      val headers = Hpack.encode(Seq(
        ":method" -> "POST", ":scheme" -> uri.getScheme,
        ":path" -> uri.getPath,
        ":authority" -> s"${uri.getHost}:$port",
        "content-type" -> "application/grpc+proto", "te" -> "trailers")
        ++ extraHeaders)
      write(out, Headers, FlagEndHeaders, 1, headers)
      // send the request body under flow control; while the window is
      // closed, pump incoming frames (the single-threaded writer IS the
      // frame reader) until a WINDOW_UPDATE reopens it
      var off = 0
      var sentEnd = false
      while (!sentEnd) {
        val want = math.min(MaxFrame, framedRequest.length - off)
        val n = windows.tryReserve(1, want)
        if (want > 0 && n == 0) {
          val f = read(in)
          if (!control(f)) deferred += f
        } else {
          val last = off + n >= framedRequest.length
          write(out, Data, if (last) FlagEndStream else 0, 1,
            java.util.Arrays.copyOfRange(framedRequest, off, off + n))
          off += n
          sentEnd = last
        }
      }

      val decoder = new Hpack.Decoder
      val data = new ByteArrayOutputStream()
      val headerBlock = new ByteArrayOutputStream()
      var sawHeaders = false
      var trailers: Seq[(String, String)] = Nil
      var blockEndStream = false
      var done = false
      while (!done) {
        val f = if (deferred.nonEmpty) deferred.dequeue() else read(in)
        if (!control(f)) f.tpe match {
          case Headers | Continuation if f.streamId == 1 =>
            // HEADERS may carry a priority block only with a flag we never
            // request; payload is the header fragment
            headerBlock.write(f.payload, 0, f.payload.length)
            if ((f.flags & FlagEndStream) != 0) blockEndStream = true
            if ((f.flags & FlagEndHeaders) != 0) {
              val decoded = decoder.decode(headerBlock.toByteArray)
              headerBlock.reset()
              if (!sawHeaders) {
                sawHeaders = true
                val status = decoded.collectFirst {
                  case (":status", v) => v
                }.getOrElse("?")
                if (status != "200")
                  throw new IOException(s"http2: :status $status")
                // trailers-only response (e.g. immediate error)
                if (blockEndStream) { trailers = decoded; done = true }
              } else { trailers = decoded; done = true }
            }
          case Data if f.streamId == 1 =>
            data.write(f.payload, 0, f.payload.length)
            if (f.payload.nonEmpty) {
              // replenish both flow-control windows
              val inc = windowUpdatePayload(f.payload.length)
              write(out, WindowUpdate, 0, 0, inc)
              write(out, WindowUpdate, 0, 1, inc)
            }
            if ((f.flags & FlagEndStream) != 0) done = true
          case _ => // unknown/unrelated frame types are ignorable per RFC
        }
      }
      val grpcStatus = trailers.collectFirst { case ("grpc-status", v) => v }
      if (done && trailers.nonEmpty && !grpcStatus.contains("0")) {
        val msg = trailers.collectFirst { case ("grpc-message", v) => v }
        throw new IOException(
          s"grpc-status ${grpcStatus.getOrElse("?")}: ${msg.getOrElse("")}")
      }
      data.toByteArray
    } finally socket.close()
  }
}
