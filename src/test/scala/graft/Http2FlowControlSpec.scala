package graft

import java.io.{ByteArrayOutputStream, DataInputStream}
import java.net.{InetAddress, ServerSocket, Socket}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.grpc._

/** RFC 7540 §5.2/§6.9 flow control, driven by independent raw-socket
  * peers (not the in-repo client/server pair talking to itself): a peer
  * that advertises a SMALL window and replenishes lazily must never be
  * overrun — every DATA frame must fit inside the window it granted.
  * Before round 8 the stack wrote DATA unconditionally, so any
  * conforming peer could legally RST_STREAM a >64 KiB transfer with
  * FLOW_CONTROL_ERROR. */
class Http2FlowControlSpec extends AnyFunSuite {
  import Http2Frames._

  private def settingsPayload(id: Int, value: Long): Array[Byte] = Array(
    (id >> 8).toByte, id.toByte, (value >> 24).toByte, (value >> 16).toByte,
    (value >> 8).toByte, value.toByte)

  private def windowUpdatePayload(inc: Int): Array[Byte] = Array(
    (inc >> 24).toByte, (inc >> 16).toByte, (inc >> 8).toByte, inc.toByte)

  test("server respects a peer-advertised 2 KiB stream window on a 200 KiB response") {
    val big = Array.tabulate(200 * 1024)(i => (i * 31 + 7).toByte)
    val server = new Http2Server((_, _, _) => Seq(big))
    val port = server.start()
    try {
      val sock = new Socket(InetAddress.getLoopbackAddress, port)
      sock.setSoTimeout(30000)
      try {
        val out = sock.getOutputStream
        val in = new DataInputStream(sock.getInputStream)
        out.write(Preface)
        // advertise a tiny per-stream window: forces ~100 blocked resumes
        write(out, Settings, 0, 0,
          settingsPayload(SettingsInitialWindowSize, 2048))
        write(out, Headers, FlagEndHeaders | FlagEndStream, 1,
          Hpack.encode(Seq(":method" -> "POST", ":scheme" -> "http",
            ":path" -> "/big/Get", ":authority" -> "test",
            "content-type" -> "application/grpc+proto")))
        var streamWin = 2048L
        var connWin = 65535L
        var maxFrameSeen = 0
        val body = new ByteArrayOutputStream()
        val decoder = new Hpack.Decoder
        var sawHeaders = false
        var trailers: Seq[(String, String)] = Nil
        var done = false
        while (!done) {
          val f = read(in)
          f.tpe match {
            case Settings =>
              if ((f.flags & FlagAck) == 0)
                write(out, Settings, FlagAck, 0, Array.emptyByteArray)
            case Data =>
              assert(f.payload.length <= streamWin,
                s"DATA ${f.payload.length}B overran stream window $streamWin")
              assert(f.payload.length <= connWin,
                s"DATA ${f.payload.length}B overran connection window $connWin")
              streamWin -= f.payload.length
              connWin -= f.payload.length
              maxFrameSeen = math.max(maxFrameSeen, f.payload.length)
              body.write(f.payload, 0, f.payload.length)
              // replenish ONLY once fully drained, so the server provably
              // blocks and resumes instead of streaming ahead
              if (streamWin == 0) {
                write(out, WindowUpdate, 0, 1, windowUpdatePayload(2048))
                streamWin += 2048
              }
              if (connWin < MaxFrame) {
                write(out, WindowUpdate, 0, 0, windowUpdatePayload(65535))
                connWin += 65535
              }
            case Headers | Continuation =>
              val decoded = decoder.decode(f.payload)
              if (!sawHeaders) {
                sawHeaders = true
                assert(decoded.contains((":status", "200")))
              } else trailers = decoded
              if ((f.flags & FlagEndStream) != 0) done = true
            case _ => ()
          }
        }
        assert(trailers.contains(("grpc-status", "0")), trailers.toString)
        val expected = GrpcFraming.frame(big)
        assert(body.toByteArray.sameElements(expected),
          s"body ${body.size} != expected ${expected.length}")
        assert(maxFrameSeen <= 2048, s"frame $maxFrameSeen exceeds the window")
      } finally sock.close()
    } finally server.stop()
  }

  test("client respects the server's 1000-byte initial window on a 100 KiB request") {
    val bigRequest = Array.tabulate(100 * 1024)(i => (i * 17 + 3).toByte)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val received = new ByteArrayOutputStream()
    val ss = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val peer = new Thread(() => {
      val s = ss.accept()
      s.setSoTimeout(30000)
      try {
        val in = new DataInputStream(s.getInputStream)
        val out = s.getOutputStream
        val preface = new Array[Byte](Preface.length)
        in.readFully(preface)
        // server connection preface: SETTINGS with a small initial window
        write(out, Settings, 0, 0,
          settingsPayload(SettingsInitialWindowSize, 1000))
        var streamWin = 1000L
        var connWin = 65535L
        var done = false
        while (!done) {
          val f = read(in)
          f.tpe match {
            case Settings =>
              if ((f.flags & FlagAck) == 0)
                write(out, Settings, FlagAck, 0, Array.emptyByteArray)
            case Data =>
              if (f.payload.length > streamWin)
                violations.add(s"DATA ${f.payload.length}B > stream window $streamWin")
              if (f.payload.length > connWin)
                violations.add(s"DATA ${f.payload.length}B > connection window $connWin")
              streamWin -= f.payload.length
              connWin -= f.payload.length
              received.write(f.payload, 0, f.payload.length)
              if ((f.flags & FlagEndStream) != 0) {
                // trailers-only OK response ends the unary exchange
                write(out, Headers, FlagEndHeaders | FlagEndStream, 1,
                  Hpack.encode(Seq(":status" -> "200", "grpc-status" -> "0")))
                done = true
              } else {
                if (streamWin == 0) {
                  write(out, WindowUpdate, 0, 1, windowUpdatePayload(1000))
                  streamWin += 1000
                }
                if (connWin < MaxFrame) {
                  write(out, WindowUpdate, 0, 0, windowUpdatePayload(65535))
                  connWin += 65535
                }
              }
            case _ => ()
          }
        }
      } catch {
        case e: Throwable => violations.add(s"peer died: $e")
      } finally s.close()
    }, "flow-control-peer")
    peer.setDaemon(true); peer.start()
    try {
      val resp = Http2Grpc.unaryCall(
        s"http://127.0.0.1:${ss.getLocalPort}/svc/Put", bigRequest)
      peer.join(30000)
      assert(violations.isEmpty, violations.toString)
      assert(received.toByteArray.sameElements(bigRequest),
        s"received ${received.size} != sent ${bigRequest.length}")
      assert(resp.isEmpty)
    } finally ss.close()
  }

  test("in-repo client/server round-trip a >64 KiB gRPC response intact") {
    val big = Array.tabulate(300 * 1024)(i => (i * 13 + 11).toByte)
    val server = new Http2Server((_, _, payload) => Seq(payload.head ++ big))
    val port = server.start()
    try {
      val echoIn = Array.tabulate(70 * 1024)(i => (i * 7 + 1).toByte)
      val framed = GrpcFraming.frame(echoIn)
      val respFramed = Http2Grpc.unaryCall(
        s"http://127.0.0.1:$port/echo/Big", framed)
      val resp = GrpcFraming.unframe(
        new java.io.ByteArrayInputStream(respFramed))
      assert(resp.sameElements(echoIn ++ big))
    } finally server.stop()
  }
}
