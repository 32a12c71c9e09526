package graft.sources.s3

import java.io.IOException
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration

import graft.sources.ObjectStoreFileSystem

/** Read-only Hadoop `FileSystem` speaking the S3 REST API directly —
  * `spark.read.parquet("s3://bucket/dir")` works against AWS or any
  * S3-compatible store (MinIO, Ceph RGW, R2) with no hadoop-aws or SDK
  * jar, the way the reference reads object stores through OpenDAL's s3
  * operator (crates/connectors/src/sources/file.rs:124-207). Every
  * request is SigV4-signed ([[SigV4]]); with no access key configured,
  * requests go unsigned (public buckets).
  *
  * Operations used (shared skeleton: [[ObjectStoreFileSystem]]):
  * ranged GET for random access — seek maps to `Range: bytes=pos-`, so
  * a parquet footer read fetches the object tail and scan bytes stay
  * proportional to the pruned read schema at 100 TB — the
  * `GET bytes=0-0` size probe, and ListObjectsV2 with `/` delimiter +
  * continuation-token pagination for directory listings.
  *
  * Configuration (per-read via reader options or per-source via
  * `SourceDef.options`, both merge into the per-read Hadoop conf; the
  * `fs.s3a.*` spellings are accepted as aliases so existing hadoop-aws
  * configs drop in):
  *  - `fs.s3.endpoint`   — e.g. `http://127.0.0.1:9000`; unset ⇒ AWS
  *    (`https://<bucket>.s3.<region>.amazonaws.com`, virtual-host style)
  *  - `fs.s3.region`     — SigV4 scope region, default `us-east-1`
  *  - `fs.s3.access.key` / `fs.s3.secret.key` / `fs.s3.session.token`
  *  - `fs.s3.path.style.access` — force path-style URLs (default: on
  *    exactly when an endpoint is set — custom endpoints rarely resolve
  *    virtual-host buckets; AWS default resolves them natively)
  *
  * Writes are unsupported by design (the engine's file parity is
  * read-only, README.md). */
class S3FileSystem extends ObjectStoreFileSystem {
  import ObjectStoreFileSystem._

  protected def schemeName: String = "s3"
  /** Conf spellings consulted for `<suffix>` lookups, highest first. */
  protected def aliasSchemes: Seq[String] = Seq(schemeName, "s3", "s3a")
  /** Endpoint when neither conf nor AWS applies (None ⇒ AWS virtual-host). */
  protected def defaultEndpoint: Option[URI] = None
  /** Path-style default when no endpoint conf is set. */
  protected def defaultPathStyle: Boolean = false

  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: Option[URI] = None
  private var region: String = "us-east-1"
  private var accessKey: String = ""
  private var secretKey: String = ""
  private var sessionToken: Option[String] = None
  private var pathStyle: Boolean = false

  /** `fs.s3.<suffix>` with `fs.s3a.<suffix>` accepted as an alias (the
    * scheme-specific spelling wins so one conf can carry both).
    * hadoop-common's bundled core-default.xml predefines many fs.s3a.*
    * properties (e.g. path.style.access=false); a value whose ONLY
    * source is core-default is a shipped default, not user intent, and
    * must not shadow this client's own defaults. */
  private def opt(conf: Configuration, suffix: String): Option[String] = {
    def userSet(key: String): Option[String] =
      Option(conf.get(key)).filter { _ =>
        val srcs = Option(conf.getPropertySources(key)).getOrElse(Array.empty)
        srcs.isEmpty || srcs.exists(_ != "core-default.xml")
      }
    aliasSchemes.distinct.iterator
      .flatMap(a => userSet(s"fs.$a.$suffix"))
      .map(_.trim).find(_.nonEmpty)
  }

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    bucket = Option(name.getAuthority).getOrElse(
      throw new IOException(s"$schemeName URI needs a bucket: $name"))
    fsUri = URI.create(s"$schemeName://$bucket")
    endpoint = opt(conf, "endpoint").map(URI.create)
    region = opt(conf, "region").getOrElse("us-east-1")
    accessKey = opt(conf, "access.key").getOrElse("")
    secretKey = opt(conf, "secret.key").getOrElse("")
    sessionToken = opt(conf, "session.token")
    pathStyle = opt(conf, "path.style.access")
      .map(_.toBoolean).getOrElse(endpoint.isDefined || defaultPathStyle)
  }

  override def getUri: URI = fsUri

  override protected def displayName(key: String): String =
    s"$schemeName://$bucket/$key"

  private def baseUri: URI = endpoint.orElse(defaultEndpoint).getOrElse(
    URI.create(s"https://$bucket.s3.$region.amazonaws.com"))

  /** (request URL, canonical path, Host header value) for an object key
    * or a bucket-level listing (key = None). */
  private[s3] def requestTarget(key: Option[String]): (URL, String, String) = {
    val base = baseUri
    val defaultPort = if (base.getScheme == "https") 443 else 80
    val host =
      if (base.getPort == -1 || base.getPort == defaultPort) base.getHost
      else s"${base.getHost}:${base.getPort}"
    val rawPath =
      (if (pathStyle) s"/$bucket" else "") + "/" + key.getOrElse("")
    // a configured endpoint may carry a path prefix (reverse-proxied
    // MinIO at https://gw/minio, localstack behind a route) — it rides
    // on the request path AND the SigV4 canonical path, which covers
    // the absolute path exactly as sent
    val prefix = Option(base.getRawPath).getOrElse("").stripSuffix("/")
    val encPath = prefix + SigV4.uriEncode(rawPath, keepSlash = true)
    val url = new URI(base.getScheme, null, base.getHost,
      base.getPort, null, null, null).toURL
    (new URL(url, encPath), encPath, host)
  }

  /** Signed request. `query` raw pairs; the URL gets the encoded query
    * appended in the same sorted order the signature covers. */
  private def request(method: String, key: Option[String],
      query: Seq[(String, String)],
      range: Option[String]): HttpURLConnection = {
    val (urlNoQuery, encPath, host) = requestTarget(key)
    val encQ = query
      .map { case (k, v) => (SigV4.uriEncode(k, keepSlash = false),
        SigV4.uriEncode(v, keepSlash = false)) }
      .sortBy(identity)
      .map { case (k, v) => s"$k=$v" }.mkString("&")
    val url = if (encQ.isEmpty) urlNoQuery
      else new URL(urlNoQuery.toString + "?" + encQ)
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(15000)
    c.setReadTimeout(60000)
    c.setInstanceFollowRedirects(false)
    val amzDate = SigV4.amzDateNow()
    var headers = Seq(
      "host" -> host,
      "x-amz-content-sha256" -> SigV4.UnsignedPayload,
      "x-amz-date" -> amzDate)
    sessionToken.foreach(t => headers :+= ("x-amz-security-token" -> t))
    range.foreach(r => headers :+= ("range" -> r))
    headers.foreach { case (k, v) =>
      if (k != "host") c.setRequestProperty(k, v)
    }
    if (accessKey.nonEmpty)
      c.setRequestProperty("Authorization", SigV4.authorization(
        method, encPath, query, headers, SigV4.UnsignedPayload,
        accessKey, secretKey, region, amzDate))
    c
  }

  override protected def objectRequest(key: String,
      range: Option[String]): HttpURLConnection =
    request("GET", Some(key), Nil, range)

  /** One ListObjectsV2 page: a flat schema (Contents/Key/Size/
    * LastModified, CommonPrefixes/Prefix, NextContinuationToken). */
  override protected def listPage(prefix: String, delimiter: Option[String],
      token: Option[String], maxKeys: Option[Int]): Page = {
    var query = Seq("list-type" -> "2", "prefix" -> prefix)
    delimiter.foreach(d => query :+= ("delimiter" -> d))
    token.foreach(t => query :+= ("continuation-token" -> t))
    maxKeys.foreach(m => query :+= ("max-keys" -> m.toString))
    val c = request("GET", None, query, None)
    try {
      val code = c.getResponseCode
      if (code != 200) {
        val err = Option(c.getErrorStream).map(s =>
          new String(s.readAllBytes(), "UTF-8").take(500)).getOrElse("")
        throw new IOException(
          s"ListObjectsV2 ${displayName(prefix)}: HTTP $code $err")
      }
      val doc = parseXml(c.getInputStream)
      val keys = elems(doc, "Contents").flatMap { e =>
        childText(e, "Key").map { k =>
          val size = childText(e, "Size").flatMap(_.trim.toLongOption)
            .getOrElse(0L)
          val mtime = childText(e, "LastModified").flatMap(t =>
            scala.util.Try(java.time.Instant.parse(t.trim).toEpochMilli)
              .toOption).getOrElse(0L)
          Obj(k, size, mtime)
        }
      }
      val prefixes = elems(doc, "CommonPrefixes").flatMap(childText(_, "Prefix"))
      val truncated = elems(doc, "IsTruncated").headOption
        .exists(_.getTextContent.trim == "true")
      val next = if (!truncated) None
        else elems(doc, "NextContinuationToken").headOption
          .map(_.getTextContent.trim).filter(_.nonEmpty)
      Page(keys, prefixes, next)
    } finally c.disconnect()
  }
}

/** The `s3a://` registration of [[S3FileSystem]], so existing hadoop-aws
  * spellings (and [[graft.sources.SourceRegistry.normalizeScheme]]'s
  * s3→s3a mapping) resolve to the in-repo client. A deployment that
  * ships hadoop-aws overrides `fs.s3a.impl` per read/source and wins. */
class S3aFileSystem extends S3FileSystem {
  override protected def schemeName: String = "s3a"
}

/** The `gs://` registration: Google Cloud Storage's XML API in HMAC
  * interoperability mode accepts exactly this AWS-style V4 signing
  * (Credential scope `.../s3/aws4_request`, documented under "Simple
  * migration" in the GCS interoperability guide) against
  * `storage.googleapis.com` path-style URLs, so the same client serves
  * `gs://bucket/...` with an HMAC key pair in `fs.gs.access.key`/
  * `fs.gs.secret.key`. A deployment shipping the GCS connector
  * overrides `fs.gs.impl` per read/source and wins. */
class GsFileSystem extends S3FileSystem {
  override protected def schemeName: String = "gs"
  override protected def aliasSchemes: Seq[String] = Seq("gs")
  override protected def defaultEndpoint: Option[URI] =
    Some(URI.create("https://storage.googleapis.com"))
  override protected def defaultPathStyle: Boolean = true
}

object S3FileSystem {
  /** Session-conf registration for all three spellings (cache disabled:
    * a cached instance would pin the credentials of whichever read came
    * first — the HttpFileSystem discipline). */
  val confEntries: Seq[(String, String)] = Seq(
    "fs.s3.impl" -> classOf[S3FileSystem].getName,
    "fs.s3a.impl" -> classOf[S3aFileSystem].getName,
    "fs.gs.impl" -> classOf[GsFileSystem].getName,
    "fs.s3.impl.disable.cache" -> "true",
    "fs.s3a.impl.disable.cache" -> "true",
    "fs.gs.impl.disable.cache" -> "true")
}
