package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.s3.SigV4

/** Minimal in-repo S3-compatible store for the [[S3SourceSpec]] live
  * loop: objects in memory, HEAD / ranged GET / ListObjectsV2 with
  * delimiter + continuation-token pagination, and REAL SigV4
  * verification — every request's signature is recomputed from the raw
  * request exactly as AWS does (same canonical-request algorithm, known
  * secret) and a mismatch answers 403 SignatureDoesNotMatch. Counters
  * expose what the client did (ranged reads, listings, pages) so the
  * spec can pin the access pattern, not just the bytes. */
final class S3TestServer(bucket: String, accessKey: String,
    secretKey: String, pageSize: Int = 1000,
    pathPrefix: String = "") {

  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, Array[Byte]]()
  val rangedGets = new AtomicInteger
  val fullGets = new AtomicInteger
  val heads = new AtomicInteger
  val lists = new AtomicInteger
  val listPages = new AtomicInteger
  val signatureFailures = new AtomicInteger
  @volatile var sawUnsigned = false

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.start()

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  def put(key: String, bytes: Array[Byte]): Unit = objects.put(key, bytes)

  /** Upload every file under a local directory as `<prefix>/<name>`. */
  def putDir(dir: java.io.File, prefix: String): Unit =
    dir.listFiles().filter(_.isFile).foreach(f =>
      put(s"$prefix/${f.getName}", java.nio.file.Files.readAllBytes(f.toPath)))

  private def handle(ex: HttpExchange): Unit = try {
    if (!verifySignature(ex)) {
      signatureFailures.incrementAndGet()
      respond(ex, 403, xmlError("SignatureDoesNotMatch"))
      return
    }
    val rawPath = ex.getRequestURI.getRawPath
    // reverse-proxy shape: the store may be served under a path prefix
    // (the signature covers the path AS SENT, so verification above is
    // prefix-agnostic; only routing strips it)
    val path = java.net.URLDecoder.decode(rawPath, "UTF-8")
      .stripPrefix(pathPrefix)
    // path-style: /<bucket>/<key...>
    if (path != s"/$bucket" && !path.startsWith(s"/$bucket/")) {
      respond(ex, 404, xmlError("NoSuchBucket")); return
    }
    val key = path.stripPrefix(s"/$bucket").stripPrefix("/")
    val query = parseQuery(Option(ex.getRequestURI.getRawQuery))
    (ex.getRequestMethod, key) match {
      case (_, "") if query.get("list-type").contains("2") => list(ex, query)
      case ("HEAD", k) => head(ex, k)
      case ("GET", k) => get(ex, k)
      case _ => respond(ex, 405, xmlError("MethodNotAllowed"))
    }
  } catch {
    case e: Exception => respond(ex, 500, xmlError(e.toString))
  } finally ex.close()

  /** Recompute the SigV4 signature from the raw request (AWS's server
    * side of the algorithm). Unsigned requests are flagged and refused
    * unless the server was built with an empty accessKey. */
  private def verifySignature(ex: HttpExchange): Boolean = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
    if (auth.isEmpty) {
      sawUnsigned = true
      return accessKey.isEmpty
    }
    val re = ("AWS4-HMAC-SHA256 Credential=([^/]+)/(\\d{8})/([^/]+)/s3/" +
      "aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]+)").r
    auth.get match {
      case re(ak, dateStamp, region, signedHeaders, sig) =>
        if (ak != accessKey) return false
        val amzDate = Option(
          ex.getRequestHeaders.getFirst("x-amz-date")).getOrElse(return false)
        val payloadHash = Option(
          ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
          .getOrElse(SigV4.UnsignedPayload)
        val headers = signedHeaders.split(';').toSeq.map { h =>
          val v = if (h == "host")
            Option(ex.getRequestHeaders.getFirst("Host")).getOrElse("")
          else Option(ex.getRequestHeaders.getFirst(h)).getOrElse("")
          h -> v
        }
        val query = parseQuery(Option(ex.getRequestURI.getRawQuery))
          .toSeq.map { case (k, v) =>
            (java.net.URLDecoder.decode(k, "UTF-8"),
              java.net.URLDecoder.decode(v, "UTF-8"))
          }
        val cr = SigV4.canonicalRequest(ex.getRequestMethod,
          ex.getRequestURI.getRawPath, query, headers, payloadHash)
        val sts = s"${SigV4.Algorithm}\n$amzDate\n" +
          s"$dateStamp/$region/s3/aws4_request\n${SigV4.sha256Hex(cr)}"
        val expected = SigV4.hmac(
          SigV4.signingKey(secretKey, dateStamp, region, "s3"), sts)
          .map(x => f"${x & 0xff}%02x").mkString
        expected == sig
      case _ => false
    }
  }

  private def head(ex: HttpExchange, key: String): Unit = {
    heads.incrementAndGet()
    val b = objects.get(key)
    if (b == null) { respond(ex, 404, Array.emptyByteArray); return }
    ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
    ex.getResponseHeaders.set("Last-Modified", "Wed, 01 Jan 2025 00:00:00 GMT")
    // HEAD: content-length header with -1 body per HttpServer contract
    ex.getResponseHeaders.set("Content-Length", b.length.toString)
    ex.sendResponseHeaders(200, -1)
  }

  private def get(ex: HttpExchange, key: String): Unit = {
    val b = objects.get(key)
    if (b == null) { respond(ex, 404, xmlError("NoSuchKey")); return }
    Option(ex.getRequestHeaders.getFirst("Range")) match {
      case Some(r) =>
        rangedGets.incrementAndGet()
        val m = "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r).getOrElse {
          respond(ex, 416, xmlError("InvalidRange")); return
        }
        val from = m.group(1).toLong
        val to = Option(m.group(2)).filter(_.nonEmpty).map(_.toLong)
          .getOrElse(b.length - 1L)
        if (from >= b.length) {
          respond(ex, 416, xmlError("InvalidRange")); return
        }
        val hi = math.min(to, b.length - 1L)
        val slice = java.util.Arrays.copyOfRange(b, from.toInt, hi.toInt + 1)
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $from-$hi/${b.length}")
        respond(ex, 206, slice)
      case None =>
        fullGets.incrementAndGet()
        respond(ex, 200, b)
    }
  }

  private def list(ex: HttpExchange,
      query: Map[String, String]): Unit = {
    lists.incrementAndGet()
    listPages.incrementAndGet()
    val prefix = query.get("prefix")
      .map(java.net.URLDecoder.decode(_, "UTF-8")).getOrElse("")
    val delimiter = query.get("delimiter")
      .map(java.net.URLDecoder.decode(_, "UTF-8"))
    val startAfter = query.get("continuation-token")
      .map(java.net.URLDecoder.decode(_, "UTF-8"))
      .map(t => new String(java.util.Base64.getDecoder.decode(t), "UTF-8"))
    val maxKeys = query.get("max-keys").flatMap(_.toIntOption)
      .getOrElse(1000).min(pageSize)
    import scala.jdk.CollectionConverters._
    val all = objects.keySet().asScala.toSeq.sorted
      .filter(_.startsWith(prefix))
      .filter(k => startAfter.forall(k > _))
    val files = scala.collection.mutable.LinkedHashSet.empty[String]
    val prefixes = scala.collection.mutable.LinkedHashSet.empty[String]
    var consumed = 0
    var lastKey: Option[String] = None
    val it = all.iterator
    while (it.hasNext && consumed < maxKeys) {
      val k = it.next()
      val rest = k.stripPrefix(prefix)
      delimiter.flatMap(d => Option(rest.indexOf(d)).filter(_ >= 0)) match {
        case Some(i) => prefixes += prefix + rest.take(i + 1)
        case None => files += k
      }
      consumed += 1
      lastKey = Some(k)
    }
    val truncated = it.hasNext
    val nextToken = if (truncated)
      lastKey.map(k => java.util.Base64.getEncoder
        .encodeToString(k.getBytes("UTF-8")))
    else None
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val xml = new StringBuilder
    xml ++= """<?xml version="1.0" encoding="UTF-8"?>"""
    xml ++= s"<ListBucketResult><Name>${esc(bucket)}</Name>"
    xml ++= s"<Prefix>${esc(prefix)}</Prefix>"
    xml ++= s"<KeyCount>$consumed</KeyCount>"
    xml ++= s"<IsTruncated>$truncated</IsTruncated>"
    nextToken.foreach(t =>
      xml ++= s"<NextContinuationToken>$t</NextContinuationToken>")
    files.foreach { k =>
      xml ++= s"<Contents><Key>${esc(k)}</Key>" +
        s"<Size>${objects.get(k).length}</Size>" +
        "<LastModified>2025-01-01T00:00:00.000Z</LastModified></Contents>"
    }
    prefixes.foreach(p =>
      xml ++= s"<CommonPrefixes><Prefix>${esc(p)}</Prefix></CommonPrefixes>")
    xml ++= "</ListBucketResult>"
    ex.getResponseHeaders.set("Content-Type", "application/xml")
    respond(ex, 200, xml.toString.getBytes("UTF-8"))
  }

  private def parseQuery(raw: Option[String]): Map[String, String] =
    raw.toSeq.flatMap(_.split('&')).filter(_.nonEmpty).map { p =>
      p.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }
    }.toMap

  private def xmlError(code: String): Array[Byte] =
    s"""<?xml version="1.0"?><Error><Code>$code</Code></Error>"""
      .getBytes("UTF-8")

  private def respond(ex: HttpExchange, code: Int,
      body: Array[Byte]): Unit = {
    if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) {
        val os = ex.getResponseBody
        os.write(body); os.close()
      }
    }
  }
}
