package graft

import java.nio.file.Files
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.grpc._

/** h2 over TLS with ALPN: the carrier the reference's TLS gRPC serving
  * uses. Same self-signed-PKCS12 pattern as PgTlsSpec; the client
  * negotiates ALPN `h2` and runs the full gRPC exchange (flow control
  * included) over the encrypted session. */
class Http2TlsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var serverCtx: SSLContext = _
  private var clientCtx: SSLContext = _
  private var keystorePath: String = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("h2-tls")
    val ks = dir.resolve("edge.p12")
    keystorePath = ks.toString
    val keytool = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "keytool").toString
    val cmd = Array(keytool, "-genkeypair", "-alias", "h2-edge",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ks.toString, "-storepass", "changeit",
      "-dname", "CN=127.0.0.1", "-validity", "1")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"keytool failed: $out")

    val store = java.security.KeyStore.getInstance("PKCS12")
    val fis = Files.newInputStream(ks)
    try store.load(fis, "changeit".toCharArray) finally fis.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    serverCtx = SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store)
    clientCtx = SSLContext.getInstance("TLS")
    clientCtx.init(null, tmf.getTrustManagers, null)
  }

  test("a gRPC unary call round-trips over h2-TLS with ALPN h2") {
    val server = new Http2Server((_, _, payload) => Seq(payload.head),
      ssl = Some(serverCtx))
    val port = server.start()
    try {
      val echoIn = Array.tabulate(100 * 1024)(i => (i * 7 + 1).toByte)
      val respFramed = Http2Grpc.unaryCall(
        s"https://127.0.0.1:$port/echo/Tls",
        GrpcFraming.frame(echoIn), ssl = Some(clientCtx))
      val resp = GrpcFraming.unframe(
        new java.io.ByteArrayInputStream(respFramed))
      assert(resp.sameElements(echoIn)) // >64 KiB: flow control under TLS
    } finally server.stop()
  }

  test("default-truststore clients demand RFC 2818 hostname verification") {
    // with the JVM truststore any CA-signed cert for ANY host would
    // otherwise pass — the client must set endpoint identification;
    // a pinned context (exactly one trusted cert) is verify-ca posture
    val sock = javax.net.ssl.SSLSocketFactory.getDefault.createSocket()
      .asInstanceOf[javax.net.ssl.SSLSocket]
    try {
      val open = Http2Grpc.clientTlsParams(sock, pinned = false)
      assert(open.getEndpointIdentificationAlgorithm == "HTTPS")
      assert(open.getApplicationProtocols.toSeq == Seq("h2"))
      val pinned = Http2Grpc.clientTlsParams(sock, pinned = true)
      assert(pinned.getEndpointIdentificationAlgorithm == null)
      assert(pinned.getApplicationProtocols.toSeq == Seq("h2"))
    } finally sock.close()
  }

  test("an untrusting client fails the TLS handshake") {
    val server = new Http2Server((_, _, payload) => Seq(payload.head),
      ssl = Some(serverCtx))
    val port = server.start()
    try {
      intercept[Exception] {
        Http2Grpc.unaryCall(s"https://127.0.0.1:$port/echo/Tls",
          GrpcFraming.frame(Array[Byte](1)),
          ssl = Some(SSLContext.getDefault))
      }
    } finally server.stop()
  }

  test("spark.read reads an https Flight edge with a pinned truststore") {
    import graft.server.{ApiKeyAuthenticator, FlightSqlEdge}
    import graft.session._
    import SparkTestSession._
    Tables(spark, sf).registerAll()
    val engine = new GraftSession(spark, GraftConfig(defensiveLimit = 1000))
    val auth = new ApiKeyAuthenticator(Map(
      "k" -> AuthenticatedUser("admin", permissions = Set("admin"))))
    val edge = new FlightSqlEdge(engine, auth.apply, ssl = Some(serverCtx))
    val port = edge.start()
    try {
      val rows = spark.read.format("graft.sources.flight.FlightDataSource")
        .option("url", s"https://127.0.0.1:$port")
        .option("query", "SELECT n_regionkey, count(*) AS n FROM nation " +
          "GROUP BY n_regionkey ORDER BY n_regionkey")
        .option("authToken", "k")
        .option("truststore", keystorePath)
        .option("truststorePassword", "changeit")
        .load().collect()
      assert(rows.length == 5)
      assert(rows.map(_.getLong(1)).sum == 25L)
    } finally edge.stop()
  }

  test("the Flight SQL edge serves over TLS end to end") {
    import graft.server.{ApiKeyAuthenticator, FlightSqlEdge}
    import graft.session._
    import SparkTestSession._
    Tables(spark, sf).registerAll()
    val engine = new GraftSession(spark, GraftConfig(defensiveLimit = 1000))
    val auth = new ApiKeyAuthenticator(Map(
      "k" -> AuthenticatedUser("admin", permissions = Set("admin"))))
    val edge = new FlightSqlEdge(engine, auth.apply, ssl = Some(serverCtx))
    val port = edge.start()
    try {
      // drive GetFlightInfo directly over the TLS carrier: the protobuf
      // command built the same way the Flight client builds it
      import org.sparkproject.spark_core.protobuf.{Any => PAny, ByteString, DynamicMessage}
      import graft.sources.flight.FlightProto._
      val cmd = DynamicMessage.newBuilder(CommandStatementQueryD)
        .setField(CommandStatementQueryD.findFieldByName("query"),
          "SELECT n_name FROM nation LIMIT 3").build()
      val any = PAny.newBuilder()
        .setTypeUrl("type.googleapis.com/arrow.flight.protocol.sql.CommandStatementQuery")
        .setValue(cmd.toByteString).build()
      val desc = DynamicMessage.newBuilder(FlightDescriptorD)
        .setField(FlightDescriptorD.findFieldByName("type"),
          FlightDescriptorD.findFieldByName("type").getEnumType
            .findValueByName("CMD"))
        .setField(FlightDescriptorD.findFieldByName("cmd"),
          ByteString.copyFrom(any.toByteArray)).build()
      val respFramed = Http2Grpc.unaryCall(
        s"https://127.0.0.1:$port/arrow.flight.protocol.FlightService/GetFlightInfo",
        GrpcFraming.frame(desc.toByteArray),
        extraHeaders = Seq("authorization" -> "Bearer k"),
        ssl = Some(clientCtx))
      val info = DynamicMessage.parseFrom(FlightInfoD,
        GrpcFraming.unframe(new java.io.ByteArrayInputStream(respFramed)))
      val schema = info.getField(FlightInfoD.findFieldByName("schema"))
        .asInstanceOf[ByteString]
      assert(!schema.isEmpty, "FlightInfo must carry the IPC schema")
    } finally edge.stop()
  }
}
