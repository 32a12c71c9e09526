package graft.sources.azure

import java.io.{FileNotFoundException, IOException}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop `FileSystem` for Azure Blob Storage speaking the
  * Blob REST API directly with Shared Key auth ([[AzureSharedKey]]) —
  * `spark.read.parquet("abfss://container@account.dfs.core.windows.net
  * /dir")` works with no hadoop-azure jar, the abfss triple of the
  * in-repo s3/gs clients (reference: OpenDAL's azblob operator,
  * crates/connectors/src/sources/file.rs:124-207). The ADLS-Gen2-style
  * URI maps onto the account's BLOB endpoint (`.dfs.` ⇒ `.blob.`; flat
  * namespace semantics match the hierarchical one for reads).
  *
  * Operations: ranged GET (random access — seeks fetch tails, the
  * parquet-footer property), the `GET bytes=0-0` size probe, and List
  * Blobs (`restype=container&comp=list`) with `/` delimiter + marker
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
class AbfsFileSystem extends FileSystem {
  protected def schemeName: String = "abfss"

  private var fsUri: URI = _
  private var container: String = _
  private var account: String = _
  private var host: String = _
  private var endpoint: Option[URI] = None
  private var accountKey: String = ""

  override def getScheme: String = schemeName

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
  }

  override def getUri: URI = fsUri

  private def keyOf(f: Path): String = f.toUri.getPath.stripPrefix("/")

  private def baseUri: URI = endpoint.getOrElse(
    URI.create(s"https://${host.replaceFirst("\\.dfs\\.", ".blob.")}"))

  /** Signed Blob-API request; `blob` None = container-level (listing). */
  private def request(method: String, blob: Option[String],
      query: Seq[(String, String)],
      range: Option[String]): HttpURLConnection = {
    val base = baseUri
    val rawPath = "/" + container + blob.map("/" + _).getOrElse("")
    val encPath = graft.sources.s3.SigV4.uriEncode(rawPath, keepSlash = true)
    val encQ = query.map { case (k, v) =>
      (graft.sources.s3.SigV4.uriEncode(k, keepSlash = false),
        graft.sources.s3.SigV4.uriEncode(v, keepSlash = false))
    }.sortBy(identity).map { case (k, v) => s"$k=$v" }.mkString("&")
    val root = new URI(base.getScheme, null, base.getHost,
      base.getPort, null, null, null).toURL
    val url = new URL(root,
      if (encQ.isEmpty) encPath else s"$encPath?$encQ")
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
    if (accountKey.nonEmpty) {
      val sts = AzureSharedKey.stringToSign(method, xms, range,
        AzureSharedKey.canonicalizedResource(account, rawPath, query))
      c.setRequestProperty("Authorization",
        AzureSharedKey.authorization(account, accountKey, sts))
    }
    c
  }

  private val statusCache =
    new java.util.concurrent.ConcurrentHashMap[Path, FileStatus]()

  override def getFileStatus(f: Path): FileStatus = {
    val q = makeQualified(f)
    val cached = statusCache.get(q)
    if (cached != null) return cached
    val st = fetchStatus(q)
    statusCache.put(q, st)
    st
  }

  private def dirStatus(f: Path): FileStatus =
    new FileStatus(0L, true, 1, 0L, 0L, makeQualified(f))

  private def fetchStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty || key.endsWith("/")) return dirStatus(f)
    val c = request("GET", Some(key), Nil, Some("bytes=0-0"))
    try {
      val code = c.getResponseCode
      if (code == 416)
        return new FileStatus(0L, false, 1, 128L * 1024 * 1024,
          math.max(0L, c.getLastModified), makeQualified(f))
      if (code == 206 || code == 200) {
        val len =
          if (code == 206)
            Option(c.getHeaderField("Content-Range")).flatMap { cr =>
              val slash = cr.lastIndexOf('/')
              if (slash < 0) None
              else cr.substring(slash + 1).trim.toLongOption
            }.getOrElse(-1L)
          else c.getContentLengthLong
        if (len < 0)
          throw new IOException(s"$f: no usable Content-Range/Length")
        return new FileStatus(len, false, 1, 128L * 1024 * 1024,
          math.max(0L, c.getLastModified), makeQualified(f))
      }
      if (code != 404)
        throw new IOException(s"GET $f: HTTP $code")
    } finally c.disconnect()
    val probe = listPage(key + "/", delimiter = None, marker = None,
      maxResults = Some(1))
    if (probe.blobs.nonEmpty || probe.prefixes.nonEmpty) dirStatus(f)
    else throw new FileNotFoundException(f.toString)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val st = getFileStatus(f)
    if (!st.isDirectory) return Array(st)
    val key = keyOf(f)
    val prefix = if (key.isEmpty) "" else key.stripSuffix("/") + "/"
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    var marker: Option[String] = None
    var more = true
    while (more) {
      val page = listPage(prefix, delimiter = Some("/"), marker = marker,
        maxResults = None)
      page.blobs.foreach { b =>
        if (b.name != prefix) {
          val p = makeQualified(new Path("/" + b.name))
          out += new FileStatus(b.size, false, 1, 128L * 1024 * 1024,
            b.mtime, p)
          statusCache.put(p, out.last)
        }
      }
      page.prefixes.foreach(cp =>
        out += dirStatus(new Path("/" + cp.stripSuffix("/"))))
      marker = page.nextMarker
      more = marker.isDefined
    }
    out.toArray
  }

  private[azure] case class ListedBlob(name: String, size: Long, mtime: Long)
  private[azure] case class BlobPage(blobs: Seq[ListedBlob],
      prefixes: Seq[String], nextMarker: Option[String])

  /** One List Blobs page (`restype=container&comp=list`), parsed with
    * the JDK DOM parser (doctype disabled): EnumerationResults/Blobs/
    * Blob{Name, Properties/Content-Length, Properties/Last-Modified},
    * BlobPrefix/Name, NextMarker. */
  private def listPage(prefix: String, delimiter: Option[String],
      marker: Option[String], maxResults: Option[Int]): BlobPage = {
    var query = Seq("restype" -> "container", "comp" -> "list",
      "prefix" -> prefix)
    delimiter.foreach(d => query :+= ("delimiter" -> d))
    marker.foreach(m => query :+= ("marker" -> m))
    maxResults.foreach(m => query :+= ("maxresults" -> m.toString))
    val c = request("GET", None, query, None)
    try {
      val code = c.getResponseCode
      if (code != 200) {
        val err = Option(c.getErrorStream).map(s =>
          new String(s.readAllBytes(), "UTF-8").take(500)).getOrElse("")
        throw new IOException(
          s"ListBlobs $schemeName://$container@$host/$prefix: HTTP $code $err")
      }
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.setExpandEntityReferences(false)
      val doc = dbf.newDocumentBuilder().parse(c.getInputStream)
      def elems(tag: String): Seq[org.w3c.dom.Element] = {
        val nl = doc.getElementsByTagName(tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
      }
      def childText(e: org.w3c.dom.Element, tag: String): Option[String] = {
        val nl = e.getElementsByTagName(tag)
        if (nl.getLength == 0) None else Option(nl.item(0).getTextContent)
      }
      val blobs = elems("Blob").flatMap { e =>
        childText(e, "Name").map { n =>
          val size = childText(e, "Content-Length")
            .flatMap(_.trim.toLongOption).getOrElse(0L)
          val mtime = childText(e, "Last-Modified").flatMap(t =>
            scala.util.Try(java.time.ZonedDateTime.parse(t.trim,
              java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
              .toInstant.toEpochMilli).toOption).getOrElse(0L)
          ListedBlob(n, size, mtime)
        }
      }
      val prefixes = elems("BlobPrefix").flatMap(childText(_, "Name"))
      val next = elems("NextMarker").headOption
        .map(_.getTextContent.trim).filter(_.nonEmpty)
      BlobPage(blobs, prefixes, next)
    } catch {
      case e: org.xml.sax.SAXException =>
        throw new IOException(s"ListBlobs: malformed XML: ${e.getMessage}")
    } finally c.disconnect()
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val st = getFileStatus(f)
    if (st.isDirectory) throw new FileNotFoundException(s"$f is a directory")
    val key = keyOf(f)
    new FSDataInputStream(new BufferedFSInputStream(
      new graft.sources.RangedObjectStream(
        s"$schemeName://$container@$host/$key", st.getLen,
        r => request("GET", Some(key), Nil, r)), bufferSize))
  }

  override def setWorkingDirectory(d: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(fsUri.toString + "/")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  override def delete(f: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
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
