package graft.sources.grpc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.mutable

/** Minimal h2c gRPC SERVER over the same RFC-7540/7541 implementation as
  * the client ([[Http2Grpc]]): connection preface, SETTINGS exchange,
  * HPACK header decode (full static table + dynamic insertions +
  * Huffman strings — see [[Hpack]]), per-stream request assembly, and
  * grpc-status trailers. Response headers are Huffman-encoded, like
  * real gRPC servers, so every in-repo client call exercises the
  * decode path. Unary, server-streaming, AND client-streaming methods:
  * the handler receives every request message of the stream (one
  * element for unary calls, the full FlightData sequence for DoPut)
  * and returns one payload per response message.
  *
  * Loopback-only, like the embedded API server — a local serving edge,
  * not a hardened network listener. Errors map to gRPC status codes:
  * [[GrpcStatusException]] carries an explicit code (16 UNAUTHENTICATED
  * for auth failures); anything else surfaces as 13 INTERNAL with the
  * exception message in grpc-message. */
final class Http2Server(
    handler: (String, Map[String, String], Seq[Array[Byte]]) => Seq[Array[Byte]],
    ssl: Option[javax.net.ssl.SSLContext] = None) {

  // With a certificate, the carrier serves h2-over-TLS with ALPN (the
  // shape real gRPC clients require — the reference serves TLS gRPC);
  // without one, cleartext h2c as before.
  private val server: ServerSocket = ssl match {
    case Some(ctx) =>
      val s = ctx.getServerSocketFactory.createServerSocket(
        0, 16, InetAddress.getLoopbackAddress)
        .asInstanceOf[javax.net.ssl.SSLServerSocket]
      val params = s.getSSLParameters
      params.setApplicationProtocols(Array("h2"))
      s.setSSLParameters(params)
      s
    case None => new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  }
  @volatile private var running = true

  def start(): Int = {
    val t = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val w = new Thread(() => serve(s))
          w.setDaemon(true); w.start()
        } catch { case _: IOException => /* closed */ }
      }
    })
    t.setDaemon(true); t.start()
    server.getLocalPort
  }

  def stop(): Unit = { running = false; server.close() }

  private def serve(sock: Socket): Unit = {
    import Http2Frames._
    // peer SEND windows: consumed by response writers (worker threads),
    // replenished here as the read loop sees WINDOW_UPDATE / SETTINGS
    val windows = new SendWindows
    // all frame writes go through this lock — responders run on worker
    // threads so the read loop stays free to replenish windows while a
    // large response is blocked mid-stream
    val writeLock = new Object
    val workers = mutable.ArrayBuffer.empty[Thread]
    try {
      sock.setSoTimeout(30000)
      val in = new DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      val preface = new Array[Byte](Preface.length)
      in.readFully(preface)
      require(preface.sameElements(Preface), "bad h2c preface")
      write(out, Settings, 0, 0, Array.emptyByteArray)
      val decoder = new Hpack.Decoder
      val headers = mutable.Map.empty[Int, Map[String, String]]
      val blocks = mutable.Map.empty[Int, ByteArrayOutputStream]
      val bodies = mutable.Map.empty[Int, ByteArrayOutputStream]
      def dispatch(sid: Int): Unit = {
        val hs = headers.getOrElse(sid, Map.empty)
        val body = bodies.get(sid).map(_.toByteArray)
          .getOrElse(Array.emptyByteArray)
        headers.remove(sid); blocks.remove(sid); bodies.remove(sid)
        val w = new Thread(() => {
          try respond(out, sid, hs, body, windows, writeLock)
          finally windows.release(sid)
        }, s"h2-respond-$sid")
        w.setDaemon(true); w.start()
        workers += w
      }
      var open = true
      while (open) {
        val f =
          try read(in)
          catch { case _: EOFException => open = false; null }
        if (f != null) f.tpe match {
          case Settings =>
            if ((f.flags & FlagAck) == 0) {
              settings(f.payload).foreach { case (id, v) =>
                if (id == SettingsInitialWindowSize) windows.setInitial(v)
              }
              writeLock.synchronized {
                write(out, Settings, FlagAck, 0, Array.emptyByteArray)
              }
            }
          case Ping =>
            if ((f.flags & FlagAck) == 0) writeLock.synchronized {
              write(out, Ping, FlagAck, 0, f.payload)
            }
          case WindowUpdate =>
            windows.update(f.streamId, windowIncrement(f.payload))
          case Headers | Continuation =>
            blocks.getOrElseUpdate(f.streamId, new ByteArrayOutputStream())
              .write(f.payload, 0, f.payload.length)
            if ((f.flags & FlagEndHeaders) != 0)
              headers(f.streamId) =
                decoder.decode(blocks(f.streamId).toByteArray).toMap
            if ((f.flags & FlagEndStream) != 0) dispatch(f.streamId)
          case Data =>
            bodies.getOrElseUpdate(f.streamId, new ByteArrayOutputStream())
              .write(f.payload, 0, f.payload.length)
            if (f.payload.nonEmpty) {
              // replenish OUR receive windows so a window-conforming
              // client can keep sending a >65535-byte request
              val inc = windowUpdatePayload(f.payload.length)
              writeLock.synchronized {
                write(out, WindowUpdate, 0, 0, inc)
                write(out, WindowUpdate, 0, f.streamId, inc)
              }
            }
            if ((f.flags & FlagEndStream) != 0) dispatch(f.streamId)
          case GoAway => open = false
          case _ => // PRIORITY, ... — ignorable here
        }
      }
      // clean shutdown: let in-flight responses drain before closing
      workers.foreach(_.join(5000))
    } catch {
      case _: IOException => // connection torn down mid-exchange
    } finally sock.close()
  }

  private def respond(out: java.io.OutputStream, sid: Int,
      hs: Map[String, String], body: Array[Byte],
      windows: SendWindows, writeLock: AnyRef): Unit = {
    import Http2Frames._
    try {
      val payload =
        if (body.isEmpty) Seq.empty[Array[Byte]]
        else GrpcFraming.unframeAll(body)
      val responses = handler(hs.getOrElse(":path",
        throw new IOException("no :path")), hs, payload)
      val framed = responses.map(GrpcFraming.frame)
        .foldLeft(Array.emptyByteArray)(_ ++ _)
      writeLock.synchronized {
        write(out, Headers, FlagEndHeaders, sid, Hpack.encode(Seq(
          ":status" -> "200", "content-type" -> "application/grpc+proto"),
          huffman = true))
      }
      if (framed.nonEmpty)
        writeDataFlow(out, sid, framed, endStream = false, windows, writeLock)
      writeLock.synchronized {
        write(out, Headers, FlagEndHeaders | FlagEndStream, sid,
          Hpack.encode(Seq("grpc-status" -> "0"), huffman = true))
      }
    } catch {
      case e: Throwable =>
        val code = e match {
          case g: GrpcStatusException => g.code
          case _ => 13 // INTERNAL
        }
        // trailers-only error response, the gRPC failure shape
        writeLock.synchronized {
          write(out, Headers, FlagEndHeaders | FlagEndStream, sid,
            Hpack.encode(Seq(":status" -> "200", "grpc-status" -> code.toString,
              "grpc-message" -> String.valueOf(e.getMessage).take(512))))
        }
    }
  }
}

/** An error with an explicit gRPC status code (RFC-defined registry:
  * 7 PERMISSION_DENIED, 16 UNAUTHENTICATED, ...). */
final class GrpcStatusException(val code: Int, msg: String)
    extends RuntimeException(msg)
