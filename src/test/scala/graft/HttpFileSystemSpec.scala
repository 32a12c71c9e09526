package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.io.IOException
import java.net.InetSocketAddress
import java.nio.file.{Files, Path => JPath, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `http://` file paths end-to-end: a local server with byte-range
  * support serves parquet/CSV written by Spark, and the engine reads
  * them back through `sources/HttpFileSystem` — a footer-led parquet
  * read (ranged GETs observed), a Range-ignoring server (skip
  * fallback), per-read auth headers, and read-only enforcement. */
class HttpFileSystemSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private var server: HttpServer = _
  private var port: Int = _
  private var dir: JPath = _
  // (path, Range header) per GET
  private val requests = new ConcurrentLinkedQueue[(String, String)]()
  @volatile private var honorRange = true
  // chunked transfer (no Content-Length) with only half / none of the
  // body: the dropped-keep-alive shape where the client sees a CLEAN EOF
  // mid-file rather than an error
  @volatile private var chunkedHalf = false
  @volatile private var chunkedEmpty = false

  private def serve(ex: HttpExchange): Unit = {
    val rel = ex.getRequestURI.getPath.stripPrefix("/files/")
    requests.add((rel,
      Option(ex.getRequestHeaders.getFirst("Range")).getOrElse("")))
    val f = dir.resolve(rel)
    if (!Files.isRegularFile(f)) {
      ex.sendResponseHeaders(404, -1); ex.close(); return
    }
    if (rel.startsWith("auth/") &&
        Option(ex.getRequestHeaders.getFirst("Authorization")).isEmpty) {
      ex.sendResponseHeaders(401, -1); ex.close(); return
    }
    val bytes = Files.readAllBytes(f)
    val range = Option(ex.getRequestHeaders.getFirst("Range"))
      .filter(_ => honorRange)
      .map { r =>
        val spec = r.stripPrefix("bytes=")
        val Array(a, b) = (spec + " ").split("-", 2)
        val from = a.toLong
        val to = b.trim.toLongOption.getOrElse(bytes.length - 1L)
        (from, math.min(to, bytes.length - 1L))
      }
    // real range-honoring servers answer 416 when the range starts past
    // the last byte — which for bytes=0-0 means the file is empty
    if (range.exists { case (from, _) => from >= bytes.length }) {
      ex.getResponseHeaders.set("Content-Range", s"bytes */${bytes.length}")
      ex.sendResponseHeaders(416, -1); ex.close(); return
    }
    try range match {
      case Some((from, to)) =>
        val body = bytes.slice(from.toInt, to.toInt + 1)
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $from-$to/${bytes.length}")
        if (chunkedHalf || chunkedEmpty) {
          ex.sendResponseHeaders(206, 0) // chunked: early close = clean EOF
          ex.getResponseBody.write(
            if (chunkedEmpty) Array.emptyByteArray
            else body.take((body.length + 1) / 2)) // ceil: always progress
        } else {
          ex.sendResponseHeaders(206, body.length.toLong)
          ex.getResponseBody.write(body)
        }
      case None =>
        if (chunkedHalf || chunkedEmpty) {
          ex.sendResponseHeaders(200, 0)
          ex.getResponseBody.write(
            if (chunkedEmpty) Array.emptyByteArray
            else bytes.take((bytes.length + 1) / 2))
        } else {
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        }
    } catch {
      // the client legitimately disconnects mid-body (size probe, early
      // stream close after a footer read) — not a test failure
      case _: IOException => ()
    } finally ex.close()
  }

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("httpfs")
    def copySingleParquet(src: String, dest: String): Unit = {
      val tmp = Files.createTempDirectory("httpfs-w")
      spark.read.parquet(src).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val pq = Files.list(tmp).iterator.asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.createDirectories(dir.resolve(dest).getParent)
      Files.copy(pq, dir.resolve(dest))
    }
    copySingleParquet(s"$sf/nation.parquet", "nation.parquet")
    copySingleParquet(s"$sf/nation.parquet", "auth/nation.parquet")
    copySingleParquet(s"$sf/lineitem.parquet", "lineitem.parquet")
    Files.write(dir.resolve("tiny.csv"), "a,b\n1,x\n2,y\n".getBytes)
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    server.createContext("/files", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = serve(ex)
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def base = s"http://127.0.0.1:$port/files"

  test("parquet over http matches the local read, via ranged requests") {
    requests.clear(); honorRange = true
    val local = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey").collect().toSeq
    val remote = spark.read.parquet(s"$base/nation.parquet")
      .orderBy("n_nationkey").collect().toSeq
    assert(remote == local)
    assert(requests.asScala.exists(_._2.startsWith("bytes=")),
      s"no ranged GET observed: ${requests.asScala.toSeq}")
  }

  test("a wide file is read footer-first, not front-to-back") {
    requests.clear(); honorRange = true
    val sum = spark.read.parquet(s"$base/lineitem.parquet")
      .selectExpr("sum(l_quantity)").collect()(0).getDouble(0)
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("sum(l_quantity)").collect()(0).getDouble(0)
    assert(math.abs(sum - want) < 1e-6)
    val len = Files.size(dir.resolve("lineitem.parquet"))
    val starts = requests.asScala.toSeq.collect {
      case (p, r) if p == "lineitem.parquet" && r.startsWith("bytes=") =>
        r.stripPrefix("bytes=").takeWhile(_ != '-').toLong
    }
    // the first ranged request lands in the file's tail (footer), and
    // offset-0 full-body streaming never happens once the size is known
    assert(starts.nonEmpty && starts.exists(_ > len / 2),
      s"no tail read in $starts (len=$len)")
  }

  test("a server that ignores Range still yields correct bytes (skip fallback)") {
    honorRange = false
    try {
      val rows = spark.read.parquet(s"$base/nation.parquet").count()
      assert(rows == 25)
    } finally honorRange = true
  }

  test("csv over http") {
    val df = spark.read.option("header", "true").csv(s"$base/tiny.csv")
    assert(df.collect().map(_.getString(1)).sorted.toSeq == Seq("x", "y"))
  }

  test("fs.http.header.* auth headers travel with every request") {
    intercept[Exception] {
      spark.read.parquet(s"$base/auth/nation.parquet").count()
    }
    val df = spark.read
      .option("fs.http.header.Authorization", "Bearer tok-123")
      .parquet(s"$base/auth/nation.parquet")
    assert(df.count() == 25)
  }

  test("a zero-length file statuses as len 0 (416 from range-honoring servers)") {
    Files.write(dir.resolve("empty.bin"), Array.emptyByteArray)
    val fs = new graft.sources.HttpFileSystem
    fs.initialize(new java.net.URI(base),
      new org.apache.hadoop.conf.Configuration())
    val st = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$base/empty.bin"))
    assert(st.getLen == 0, st)
  }

  test("a connection dropped mid-body is resumed at pos, not a silent EOF") {
    chunkedHalf = true
    try {
      val fs = new graft.sources.HttpFileSystem
      fs.initialize(new java.net.URI(base),
        new org.apache.hadoop.conf.Configuration())
      val p = new org.apache.hadoop.fs.Path(s"$base/tiny.csv")
      val want = Files.readAllBytes(dir.resolve("tiny.csv"))
      val in = fs.open(p, 4096)
      try {
        val buf = new Array[Byte](want.length)
        in.readFully(0, buf) // every request serves only half — must resume
        assert(buf.toSeq == want.toSeq)
      } finally in.close()
    } finally chunkedHalf = false
  }

  test("a server that can never serve the body raises EOF, not empty rows") {
    chunkedEmpty = true
    try {
      val fs = new graft.sources.HttpFileSystem
      fs.initialize(new java.net.URI(base),
        new org.apache.hadoop.conf.Configuration())
      val in = fs.open(
        new org.apache.hadoop.fs.Path(s"$base/tiny.csv"), 4096)
      try intercept[java.io.EOFException] {
        in.read(new Array[Byte](8), 0, 8)
      } finally in.close()
    } finally chunkedEmpty = false
  }

  test("https reads honor the documented fs.http.header.* keys, with " +
      "fs.https.header.* overriding by name") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.http.header.Authorization", "Bearer generic")
    conf.set("fs.http.header.X-Trace", "t1")
    conf.set("fs.https.header.Authorization", "Bearer tls-only")
    val fs = new graft.sources.HttpsFileSystem
    fs.initialize(new java.net.URI("https://example.invalid"), conf)
    val h = fs.requestHeaders.toMap
    assert(h("Authorization") == "Bearer tls-only", h)
    assert(h("X-Trace") == "t1", h)
    // and plain http never picks up the https-only credential
    val plain = new graft.sources.HttpFileSystem
    plain.initialize(new java.net.URI(base), conf)
    val ph = plain.requestHeaders.toMap[String, String]
    assert(ph("Authorization") == "Bearer generic", ph)
  }

  test("missing file is a clean FileNotFound, writes are refused") {
    val e = intercept[Exception] {
      spark.read.parquet(s"$base/nope.parquet").count()
    }
    assert(e.getMessage.toLowerCase.contains("path does not exist") ||
      e.toString.contains("FileNotFound"), e.toString)
    val fs = new graft.sources.HttpFileSystem
    fs.initialize(new java.net.URI(base),
      new org.apache.hadoop.conf.Configuration())
    intercept[UnsupportedOperationException] {
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/nation.parquet"), false)
    }
  }
}
