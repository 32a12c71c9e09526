package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.azure.AzureSharedKey

/** In-repo Azure-Blob-compatible store + live loop for the `abfss://`
  * client: every request's SharedKey signature is recomputed from the
  * raw request with the known account key (Azure's server side of the
  * algorithm); parquet reads must go through ranged GETs and paginated
  * List Blobs, never full-object downloads. */
class AzureSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private val Account = "graftacct"
  private val Container = "corpus"
  private val Key = java.util.Base64.getEncoder
    .encodeToString("a-test-account-key-of-decent-length".getBytes("UTF-8"))

  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, Array[Byte]]()
  private val rangedGets = new AtomicInteger
  private val fullGets = new AtomicInteger
  private val listPages = new AtomicInteger
  private val sigFailures = new AtomicInteger

  private var server: HttpServer = _
  private var tmp: java.io.File = _

  private def endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def azOptions: Map[String, String] = Map(
    "fs.abfss.impl" -> classOf[graft.sources.azure.AbfsFileSystem].getName,
    "fs.abfss.impl.disable.cache" -> "true",
    "fs.abfss.endpoint" -> endpoint,
    "fs.abfss.account.key" -> Key)

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    tmp = java.nio.file.Files.createTempDirectory("azspec").toFile
    spark.range(0, 500).select(col("id"), (col("id") % 7).as("m"))
      .repartition(2)
      .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/data")
    new java.io.File(tmp, "data").listFiles().filter(_.isFile).foreach(f =>
      objects.put(s"warehouse/data/${f.getName}",
        java.nio.file.Files.readAllBytes(f.toPath)))
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    if (tmp != null) org.apache.commons.io.FileUtils.deleteQuietly(tmp)
  }

  // ------------------------------------------------------- the stub store

  private def handle(ex: HttpExchange): Unit = try {
    if (!verify(ex)) {
      sigFailures.incrementAndGet()
      respond(ex, 403, "<Error><Code>AuthenticationFailed</Code></Error>")
      return
    }
    // Azurite shape: the account may ride as a path prefix before the
    // container when the endpoint carries one
    val path = java.net.URLDecoder.decode(ex.getRequestURI.getRawPath, "UTF-8")
      .stripPrefix(PathPrefix)
    if (!path.startsWith(s"/$Container")) { respond(ex, 404, ""); return }
    val key = path.stripPrefix(s"/$Container").stripPrefix("/")
    val q = Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split('&')).map(_.split("=", 2))
      .map(a => a(0) -> (if (a.length > 1)
        java.net.URLDecoder.decode(a(1), "UTF-8") else "")).toMap
    if (q.get("comp").contains("list")) list(ex, q)
    else get(ex, key)
  } catch {
    case e: Exception => respond(ex, 500, e.toString)
  } finally ex.close()

  private val SasSig = "sastestsig123"

  /** Optional endpoint path prefix the prefix test serves under. */
  private val PathPrefix = "/devstoreaccount1"

  /** Azure's server side: rebuild the StringToSign from the raw request
    * and compare signatures; a SAS request authorizes by its pre-signed
    * query parameters instead (no Authorization header). */
  private def verify(ex: HttpExchange): Boolean = {
    val rawQ = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    if (Option(ex.getRequestHeaders.getFirst("Authorization")).isEmpty &&
        rawQ.contains("sig=")) {
      val sig = rawQ.split('&').collectFirst {
        case p if p.startsWith("sig=") =>
          java.net.URLDecoder.decode(p.stripPrefix("sig="), "UTF-8")
      }
      return sig.contains(SasSig) && rawQ.contains("sv=2021-08-06") &&
        rawQ.contains("sp=r")
    }
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .getOrElse(return false)
    val xms = {
      import scala.jdk.CollectionConverters._
      ex.getRequestHeaders.entrySet().asScala.toSeq
        .map(e => e.getKey.toLowerCase -> e.getValue.get(0))
        .filter(_._1.startsWith("x-ms-"))
    }
    val range = Option(ex.getRequestHeaders.getFirst("Range"))
    // real Azure canonicalizes the ENCODED URI path exactly as sent —
    // decoding here would hide a client that signs the decoded form
    // (which 403s on any blob name needing percent-escaping)
    val path = ex.getRequestURI.getRawPath
    val q = Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split('&')).map(_.split("=", 2))
      .map(a => a(0) -> (if (a.length > 1)
        java.net.URLDecoder.decode(a(1), "UTF-8") else ""))
    val sts = AzureSharedKey.stringToSign(ex.getRequestMethod, xms, range,
      AzureSharedKey.canonicalizedResource(Account, path, q))
    auth == AzureSharedKey.authorization(Account, Key, sts)
  }

  private def get(ex: HttpExchange, key: String): Unit = {
    val b = objects.get(key)
    if (b == null) { respond(ex, 404, ""); return }
    Option(ex.getRequestHeaders.getFirst("Range")) match {
      case Some(r) =>
        rangedGets.incrementAndGet()
        val m = "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r).get
        val from = m.group(1).toLong
        if (from >= b.length) { respond(ex, 416, ""); return }
        val to = Option(m.group(2)).filter(_.nonEmpty).map(_.toLong)
          .getOrElse(b.length - 1L).min(b.length - 1L)
        val slice = java.util.Arrays.copyOfRange(b, from.toInt, to.toInt + 1)
        ex.getResponseHeaders.set("Content-Range", s"bytes $from-$to/${b.length}")
        ex.sendResponseHeaders(206, slice.length)
        val os = ex.getResponseBody; os.write(slice); os.close()
      case None =>
        fullGets.incrementAndGet()
        ex.sendResponseHeaders(200, b.length)
        val os = ex.getResponseBody; os.write(b); os.close()
    }
  }

  private def list(ex: HttpExchange, q: Map[String, String]): Unit = {
    listPages.incrementAndGet()
    val prefix = q.getOrElse("prefix", "")
    val delimiter = q.get("delimiter")
    val marker = q.get("marker").filter(_.nonEmpty)
    val pageSize = 2 // force NextMarker pagination
    import scala.jdk.CollectionConverters._
    val all = objects.keySet().asScala.toSeq.sorted
      .filter(_.startsWith(prefix)).filter(k => marker.forall(k > _))
    val blobs = scala.collection.mutable.LinkedHashSet.empty[String]
    val prefixes = scala.collection.mutable.LinkedHashSet.empty[String]
    var consumed = 0
    var last: Option[String] = None
    val it = all.iterator
    while (it.hasNext && consumed < pageSize) {
      val k = it.next()
      val rest = k.stripPrefix(prefix)
      delimiter.map(rest.indexOf).filter(_ >= 0) match {
        case Some(i) => prefixes += prefix + rest.take(i + 1)
        case None => blobs += k
      }
      consumed += 1
      last = Some(k)
    }
    val next = if (it.hasNext) last else None
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    val xml = new StringBuilder
    xml ++= """<?xml version="1.0" encoding="utf-8"?>"""
    xml ++= s"""<EnumerationResults ContainerName="$Container"><Blobs>"""
    blobs.foreach(k => xml ++= s"<Blob><Name>${esc(k)}</Name><Properties>" +
      s"<Content-Length>${objects.get(k).length}</Content-Length>" +
      "<Last-Modified>Wed, 01 Jan 2025 00:00:00 GMT</Last-Modified>" +
      "</Properties></Blob>")
    prefixes.foreach(p =>
      xml ++= s"<BlobPrefix><Name>${esc(p)}</Name></BlobPrefix>")
    xml ++= "</Blobs>"
    next.foreach(n => xml ++= s"<NextMarker>${esc(n)}</NextMarker>")
    xml ++= "</EnumerationResults>"
    respond(ex, 200, xml.toString)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) { val os = ex.getResponseBody; os.write(b); os.close() }
  }

  // ---------------------------------------------------------------- tests

  test("parquet reads over abfss:// verify SharedKey signatures, ranged access") {
    val df = spark.read.options(azOptions)
      .parquet(s"abfss://$Container@$Account.dfs.core.windows.net/warehouse/data")
    assert(df.count() == 500)
    assert(df.agg(sum("m")).head.getLong(0) ==
      (0L until 500).map(_ % 7).sum)
    assert(sigFailures.get == 0)
    assert(rangedGets.get > 0, "no ranged reads")
    assert(fullGets.get == 0, s"full downloads: ${fullGets.get}")
    assert(listPages.get >= 2, s"listing did not paginate: ${listPages.get}")
  }

  test("a wrong account key is rejected with 403") {
    val badKey = java.util.Base64.getEncoder
      .encodeToString("wrong-key".getBytes("UTF-8"))
    val e = intercept[Exception] {
      spark.read.options(azOptions + ("fs.abfss.account.key" -> badKey))
        .parquet(s"abfss://$Container@$Account.dfs.core.windows.net/warehouse/data")
        .count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(msgs.contains("403") || msgs.contains("Authentication"), msgs)
    assert(sigFailures.get > 0)
  }

  test("a missing blob path is a clean FileNotFound") {
    val e = intercept[Exception] {
      spark.read.options(azOptions)
        .parquet(s"abfss://$Container@$Account.dfs.core.windows.net/warehouse/nope")
        .count()
    }
    val all = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).toSeq
    assert(all.exists(t => t.isInstanceOf[java.io.FileNotFoundException] ||
      Option(t.getMessage).exists(m =>
        m.contains("nope") || m.contains("PATH_NOT_FOUND"))),
      all.map(_.toString))
  }

  test("SAS-token auth rides as query parameters, no Authorization header") {
    val opts = azOptions - "fs.abfss.account.key" +
      ("fs.abfss.sas.token" -> s"?sv=2021-08-06&sp=r&sig=$SasSig")
    val df = spark.read.options(opts)
      .parquet(s"abfss://$Container@$Account.dfs.core.windows.net/warehouse/data")
    assert(df.count() == 500)
    // and a bad SAS signature is refused
    val e = intercept[Exception] {
      spark.read.options(azOptions - "fs.abfss.account.key" +
        ("fs.abfss.sas.token" -> "?sv=2021-08-06&sp=r&sig=WRONG"))
        .parquet(s"abfss://$Container@$Account.dfs.core.windows.net/warehouse/data")
        .count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(msgs.contains("403") || msgs.contains("Authentication"), msgs)
  }

  test("hadoop-azure account-key spelling is accepted as an alias") {
    val opts = azOptions - "fs.abfss.account.key" +
      (s"fs.azure.account.key.$Account.dfs.core.windows.net" -> Key)
    val df = spark.read.options(opts)
      .parquet(s"abfss://$Container@$Account.dfs.core.windows.net/warehouse/data")
    assert(df.count() == 500)
  }

  test("an endpoint path prefix (Azurite shape) rides the URL and the signature") {
    val before = sigFailures.get
    val opts = azOptions + ("fs.abfss.endpoint" -> s"$endpoint$PathPrefix")
    val df = spark.read.options(opts)
      .parquet(s"abfss://$Container@$Account.dfs.core.windows.net/warehouse/data")
    assert(df.count() == 500)
    assert(sigFailures.get == before, "prefix requests failed signing")
  }

  test("blob names needing percent-escaping sign over the encoded path") {
    val before = sigFailures.get
    objects.put("warehouse/esc/my file+pct%.bin", Array[Byte](1, 2, 3, 4))
    val conf = new org.apache.hadoop.conf.Configuration()
    azOptions.foreach { case (k, v) => conf.set(k, v) }
    // the URI multi-arg ctor percent-encodes the space; the client must
    // sign the encoded form or the stub (like real Azure) answers 403
    val p = new org.apache.hadoop.fs.Path(new java.net.URI(
      "abfss", s"$Container@$Account.dfs.core.windows.net",
      "/warehouse/esc/my file+pct%.bin", null))
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val buf = new Array[Byte](4)
    in.readFully(0, buf)
    in.close()
    assert(buf.toSeq == Seq[Byte](1, 2, 3, 4))
    assert(sigFailures.get == before, "escaped-name request failed signing")
  }
}
