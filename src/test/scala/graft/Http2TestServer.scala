package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.mutable

import graft.sources.grpc.{GrpcFraming, Hpack, Http2Frames}

/** Minimal h2c gRPC server for exercising [[graft.sources.grpc.Http2Grpc]]
  * against a real RFC-7540 peer: connection preface, SETTINGS exchange,
  * HPACK header decode, gRPC framing, and grpc-status trailers. The
  * handler maps (path, unframed request payload) → the response's
  * unframed payloads — one element for a unary method, several for a
  * server-streaming one (each is its own LENGTH_PREFIXED_MESSAGE, the
  * Flight DoGet shape). Test-only — the engine side under test is the
  * CLIENT. */
final class Http2TestServer(handler: (String, Array[Byte]) => Seq[Array[Byte]]) {
  private val server =
    new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
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
    try {
      sock.setSoTimeout(15000)
      val in = new DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      val preface = new Array[Byte](Preface.length)
      in.readFully(preface)
      require(preface.sameElements(Preface), "bad h2c preface")
      write(out, Settings, 0, 0, Array.emptyByteArray)
      val decoder = new Hpack.Decoder
      val paths = mutable.Map.empty[Int, String]
      val blocks = mutable.Map.empty[Int, ByteArrayOutputStream]
      val bodies = mutable.Map.empty[Int, ByteArrayOutputStream]
      var open = true
      while (open) {
        val f =
          try read(in)
          catch { case _: EOFException => open = false; null }
        if (f != null) f.tpe match {
          case Settings =>
            if ((f.flags & FlagAck) == 0)
              write(out, Settings, FlagAck, 0, Array.emptyByteArray)
          case Ping =>
            if ((f.flags & FlagAck) == 0) write(out, Ping, FlagAck, 0, f.payload)
          case Headers | Continuation =>
            blocks.getOrElseUpdate(f.streamId, new ByteArrayOutputStream())
              .write(f.payload, 0, f.payload.length)
            if ((f.flags & FlagEndHeaders) != 0) {
              val hs = decoder.decode(blocks(f.streamId).toByteArray)
              paths(f.streamId) = hs.collectFirst { case (":path", v) => v }
                .getOrElse(throw new IOException("no :path"))
            }
            if ((f.flags & FlagEndStream) != 0) respond(out, f.streamId, paths, bodies)
          case Data =>
            bodies.getOrElseUpdate(f.streamId, new ByteArrayOutputStream())
              .write(f.payload, 0, f.payload.length)
            if ((f.flags & FlagEndStream) != 0) respond(out, f.streamId, paths, bodies)
          case GoAway => open = false
          case _ => // WINDOW_UPDATE, PRIORITY, ... — ignorable here
        }
      }
    } catch {
      case _: IOException => // connection torn down mid-exchange
    } finally sock.close()
  }

  private def respond(out: java.io.OutputStream, sid: Int,
      paths: mutable.Map[Int, String],
      bodies: mutable.Map[Int, ByteArrayOutputStream]): Unit = {
    import Http2Frames._
    val body = bodies.get(sid).map(_.toByteArray).getOrElse(Array.emptyByteArray)
    val reqPayload = GrpcFraming.unframe(new ByteArrayInputStream(body))
    val respFramed = handler(paths(sid), reqPayload)
      .map(GrpcFraming.frame).foldLeft(Array.emptyByteArray)(_ ++ _)
    write(out, Headers, FlagEndHeaders, sid, Hpack.encode(Seq(
      ":status" -> "200", "content-type" -> "application/grpc+proto")))
    writeData(out, sid, respFramed, endStream = false)
    write(out, Headers, FlagEndHeaders | FlagEndStream, sid,
      Hpack.encode(Seq("grpc-status" -> "0")))
  }
}
