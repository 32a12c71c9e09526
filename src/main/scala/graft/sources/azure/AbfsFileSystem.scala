package graft.sources.azure

import java.io.IOException
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration

import graft.sources.ObjectStoreFileSystem

/** Read-only Hadoop `FileSystem` for Azure Blob Storage speaking the
  * Blob REST API directly with Shared Key auth ([[AzureSharedKey]]) —
  * `spark.read.parquet("abfss://container@account.dfs.core.windows.net
  * /dir")` works with no hadoop-azure jar, the abfss triple of the
  * in-repo s3/gs clients (reference: OpenDAL's azblob operator,
  * crates/connectors/src/sources/file.rs:124-207). The ADLS-Gen2-style
  * URI maps onto the account's BLOB endpoint (`.dfs.` ⇒ `.blob.`; flat
  * namespace semantics match the hierarchical one for reads).
  *
  * Operations (shared skeleton: [[ObjectStoreFileSystem]]): ranged GET
  * random access (seeks fetch tails, the parquet-footer property), the
  * `GET bytes=0-0` size probe, and List Blobs
  * (`restype=container&comp=list`) with `/` delimiter + marker
  * pagination for directory listings.
  *
  * Configuration (per-read options or per-source `SourceDef.options`):
  *  - `fs.abfss.account.key` — the base64 account key (alias spelling
  *    `fs.azure.account.key.<host>` from hadoop-azure also accepted)
  *  - `fs.abfss.endpoint` — override, e.g. the Azurite emulator or a
  *    stub (`http://127.0.0.1:port`); path gains `/container/...` as on
  *    the real endpoint
  * With no key configured requests go unauthenticated (public
  * containers). Writes are unsupported by design (read-only parity). */
class AbfsFileSystem extends ObjectStoreFileSystem {
  import ObjectStoreFileSystem._

  protected def schemeName: String = "abfss"

  private var fsUri: URI = _
  private var container: String = _
  private var account: String = _
  private var host: String = _
  private var endpoint: Option[URI] = None
  private var accountKey: String = ""
  private var sasToken: Seq[(String, String)] = Nil

  private def opt(conf: Configuration, keys: Seq[String]): Option[String] =
    keys.iterator.flatMap(k => Option(conf.get(k)))
      .map(_.trim).find(_.nonEmpty)

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    container = Option(name.getUserInfo).getOrElse(
      throw new IOException(
        s"$schemeName URI needs container@account.host: $name"))
    host = Option(name.getHost).getOrElse(
      throw new IOException(s"$schemeName URI needs a host: $name"))
    account = host.takeWhile(_ != '.')
    fsUri = URI.create(s"$schemeName://$container@$host")
    endpoint = opt(conf, Seq(s"fs.$schemeName.endpoint",
      "fs.abfss.endpoint", "fs.abfs.endpoint")).map(URI.create)
    accountKey = opt(conf, Seq(s"fs.$schemeName.account.key",
      "fs.abfss.account.key", "fs.abfs.account.key",
      s"fs.azure.account.key.$host",
      s"fs.azure.account.key.${host.replaceFirst("\\.dfs\\.", ".blob.")}"))
      .getOrElse("")
    // SAS auth: the token (with or without a leading '?') is a bundle of
    // pre-signed query parameters appended to every request — no
    // Authorization header at all. Takes precedence over the account key
    // when both are set (a SAS is the narrower grant).
    sasToken = opt(conf, Seq(s"fs.$schemeName.sas.token",
      "fs.abfss.sas.token", "fs.abfs.sas.token")).toSeq
      .flatMap(_.stripPrefix("?").split('&')).filter(_.nonEmpty)
      .map { p =>
        p.split("=", 2) match {
          // %XX escapes decode, but a literal '+' must SURVIVE — SAS
          // signatures are base64 and URLDecoder's +-as-space would
          // corrupt them into permanent 403s
          case Array(k, v) => k ->
            java.net.URLDecoder.decode(v.replace("+", "%2B"), "UTF-8")
          case Array(k) => k -> ""
        }
      }
  }

  override def getUri: URI = fsUri

  override protected def displayName(key: String): String =
    s"$schemeName://$container@$host/$key"

  private def baseUri: URI = endpoint.getOrElse(
    URI.create(s"https://${host.replaceFirst("\\.dfs\\.", ".blob.")}"))

  /** Signed Blob-API request; `blob` None = container-level (listing). */
  private def request(method: String, blob: Option[String],
      query: Seq[(String, String)],
      range: Option[String]): HttpURLConnection = {
    val base = baseUri
    val rawPath = "/" + container + blob.map("/" + _).getOrElse("")
    val encPath = graft.sources.s3.SigV4.uriEncode(rawPath, keepSlash = true)
    // an endpoint may carry a path prefix (Azurite serves the account at
    // http://host:10000/devstoreaccount1; reverse proxies add their own)
    // — the request path keeps it, and the canonicalized resource is
    // /account + the URI path AS SENT (per the Shared Key docs; for the
    // emulator form the account name appears twice, once as the account
    // component and once inside the path)
    val prefix = Option(base.getRawPath).getOrElse("").stripSuffix("/")
    val sendPath = prefix + encPath
    val fullQuery = query ++ sasToken
    val encQ = fullQuery.map { case (k, v) =>
      (graft.sources.s3.SigV4.uriEncode(k, keepSlash = false),
        graft.sources.s3.SigV4.uriEncode(v, keepSlash = false))
    }.sortBy(identity).map { case (k, v) => s"$k=$v" }.mkString("&")
    val root = new URI(base.getScheme, null, base.getHost,
      base.getPort, null, null, null).toURL
    val url = new URL(root,
      if (encQ.isEmpty) sendPath else s"$sendPath?$encQ")
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(15000)
    c.setReadTimeout(60000)
    c.setInstanceFollowRedirects(false)
    val xms = Seq(
      "x-ms-date" -> AzureSharedKey.xmsDateNow(),
      "x-ms-version" -> "2021-08-06")
    xms.foreach { case (k, v) => c.setRequestProperty(k, v) }
    range.foreach(r => c.setRequestProperty("Range", r))
    if (sasToken.isEmpty && accountKey.nonEmpty) {
      // sign over the ENCODED path exactly as the request line carries
      // it — Azure canonicalizes "the resource's encoded URI path", so
      // signing the decoded form 403s every blob whose name needs
      // percent-escaping (space, '+', '%', non-ASCII)
      val sts = AzureSharedKey.stringToSign(method, xms, range,
        AzureSharedKey.canonicalizedResource(account, sendPath, query))
      c.setRequestProperty("Authorization",
        AzureSharedKey.authorization(account, accountKey, sts))
    }
    c
  }

  override protected def objectRequest(key: String,
      range: Option[String]): HttpURLConnection =
    request("GET", Some(key), Nil, range)

  /** One List Blobs page (`restype=container&comp=list`):
    * EnumerationResults/Blobs/Blob{Name, Properties/Content-Length,
    * Properties/Last-Modified}, BlobPrefix/Name, NextMarker. */
  override protected def listPage(prefix: String, delimiter: Option[String],
      token: Option[String], maxKeys: Option[Int]): Page = {
    var query = Seq("restype" -> "container", "comp" -> "list",
      "prefix" -> prefix)
    delimiter.foreach(d => query :+= ("delimiter" -> d))
    token.foreach(m => query :+= ("marker" -> m))
    maxKeys.foreach(m => query :+= ("maxresults" -> m.toString))
    val c = request("GET", None, query, None)
    try {
      val code = c.getResponseCode
      if (code != 200) {
        val err = Option(c.getErrorStream).map(s =>
          new String(s.readAllBytes(), "UTF-8").take(500)).getOrElse("")
        throw new IOException(
          s"ListBlobs ${displayName(prefix)}: HTTP $code $err")
      }
      val doc = parseXml(c.getInputStream)
      val blobs = elems(doc, "Blob").flatMap { e =>
        childText(e, "Name").map { n =>
          val size = childText(e, "Content-Length")
            .flatMap(_.trim.toLongOption).getOrElse(0L)
          val mtime = childText(e, "Last-Modified").flatMap(t =>
            scala.util.Try(java.time.ZonedDateTime.parse(t.trim,
              java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
              .toInstant.toEpochMilli).toOption).getOrElse(0L)
          Obj(n, size, mtime)
        }
      }
      val prefixes = elems(doc, "BlobPrefix").flatMap(childText(_, "Name"))
      val next = elems(doc, "NextMarker").headOption
        .map(_.getTextContent.trim).filter(_.nonEmpty)
      Page(blobs, prefixes, next)
    } finally c.disconnect()
  }
}

/** The `abfs://` (non-TLS spelling) registration of [[AbfsFileSystem]]. */
class AbfsPlainFileSystem extends AbfsFileSystem {
  override protected def schemeName: String = "abfs"
}

object AbfsFileSystem {
  val confEntries: Seq[(String, String)] = Seq(
    "fs.abfss.impl" -> classOf[AbfsFileSystem].getName,
    "fs.abfs.impl" -> classOf[AbfsPlainFileSystem].getName,
    "fs.abfss.impl.disable.cache" -> "true",
    "fs.abfs.impl.disable.cache" -> "true")
}
