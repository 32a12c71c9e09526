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
  *  - h2c only (no TLS/ALPN — the sandbox has no CA infrastructure);
  *  - one concurrent stream per connection (a unary source call);
  *  - HPACK encoding uses literal-without-indexing exclusively (legal
  *    per RFC 7541 §6.2.2, zero table state to corrupt); decoding
  *    implements the full static table, dynamic-table insertion and
  *    indexed lookups, but NOT Huffman strings — a peer that sends
  *    Huffman-coded headers gets a clear error, not a mis-parse
  *    (Huffman is sender-optional; our encoder never emits it).
  */
private[graft] object Hpack {

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

  private def writeString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    writeInt(out, 0x00, 7, b.length) // H=0: raw, never Huffman
    out.write(b, 0, b.length)
  }

  /** Encode a header list as literal-without-indexing with new names
    * (§6.2.2) — stateless and legal for every header incl. pseudo. */
  def encode(headers: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    headers.foreach { case (n, v) =>
      out.write(0x00)
      writeString(out, n)
      writeString(out, v)
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
      if (huffman) throw new IOException(
        "hpack: Huffman-coded string from peer not supported by this decoder")
      val s = new String(buf, i, len, StandardCharsets.UTF_8)
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

/** RFC 7540 frame I/O. */
private[graft] object Http2Frames {
  val Data = 0x0; val Headers = 0x1; val Priority = 0x2; val RstStream = 0x3
  val Settings = 0x4; val PushPromise = 0x5; val Ping = 0x6; val GoAway = 0x7
  val WindowUpdate = 0x8; val Continuation = 0x9

  val FlagEndStream = 0x1; val FlagEndHeaders = 0x4; val FlagAck = 0x1

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
}

/** The unary gRPC-over-h2c exchange. */
private[graft] object Http2Grpc {
  import Http2Frames._

  /** POST `framedRequest` (already gRPC-length-prefixed) to `fullUrl`'s
    * path over a fresh h2c connection; returns the response's DATA bytes
    * (the framed gRPC response). Enforces :status 200 and grpc-status 0.
    * `extraHeaders` ride after the required set (e.g. authorization). */
  def unaryCall(fullUrl: String, framedRequest: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val uri = new URI(fullUrl)
    require(uri.getScheme == "http",
      s"h2c transport is cleartext http, got '${uri.getScheme}'")
    val port = if (uri.getPort == -1) 80 else uri.getPort
    val socket = new Socket(uri.getHost, port)
    socket.setSoTimeout(30000)
    try {
      val out = socket.getOutputStream
      val in = new DataInputStream(socket.getInputStream)
      out.write(Preface)
      write(out, Settings, 0, 0, Array.emptyByteArray)
      val headers = Hpack.encode(Seq(
        ":method" -> "POST", ":scheme" -> "http", ":path" -> uri.getPath,
        ":authority" -> s"${uri.getHost}:$port",
        "content-type" -> "application/grpc+proto", "te" -> "trailers")
        ++ extraHeaders)
      write(out, Headers, FlagEndHeaders, 1, headers)
      writeData(out, 1, framedRequest)

      val decoder = new Hpack.Decoder
      val data = new ByteArrayOutputStream()
      val headerBlock = new ByteArrayOutputStream()
      var sawHeaders = false
      var trailers: Seq[(String, String)] = Nil
      var blockEndStream = false
      var done = false
      while (!done) {
        val f = read(in)
        f.tpe match {
          case Settings =>
            if ((f.flags & FlagAck) == 0)
              write(out, Settings, FlagAck, 0, Array.emptyByteArray)
          case Ping =>
            if ((f.flags & FlagAck) == 0) write(out, Ping, FlagAck, 0, f.payload)
          case WindowUpdate | Priority => // enough window for a unary call
          case GoAway =>
            throw new IOException("http2: server sent GOAWAY before response")
          case RstStream =>
            throw new IOException("http2: stream reset by server")
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
              val inc = new Array[Byte](4)
              val n = f.payload.length
              inc(0) = (n >> 24).toByte; inc(1) = (n >> 16).toByte
              inc(2) = (n >> 8).toByte; inc(3) = n.toByte
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
