package graft.sources

import java.io.{FileNotFoundException, IOException}
import java.net.HttpURLConnection

import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Shared read-only Hadoop `FileSystem` skeleton for the REST
  * object-store clients ([[graft.sources.s3.S3FileSystem]],
  * [[graft.sources.azure.AbfsFileSystem]]): status probing via a
  * `GET Range: bytes=0-0` (206 ⇒ total after the `/` in Content-Range,
  * 416 ⇒ empty object, 404 ⇒ try a directory-prefix listing — HEAD
  * support varies across stores), paginated delimiter listings, ranged
  * streaming reads ([[RangedObjectStream]]), a per-read status cache,
  * and the read-only write stubs. Concrete stores contribute exactly
  * two things: a signed object request and a signed listing page. */
abstract class ObjectStoreFileSystem extends FileSystem {
  import ObjectStoreFileSystem._

  protected def schemeName: String
  /** Human-readable object name for errors, e.g. `s3://bucket/key`. */
  protected def displayName(key: String): String
  /** A signed GET of the object, optionally ranged. */
  protected def objectRequest(key: String,
      range: Option[String]): HttpURLConnection
  /** One signed listing page under `prefix`. */
  protected def listPage(prefix: String, delimiter: Option[String],
      token: Option[String], maxKeys: Option[Int]): Page

  final override def getScheme: String = schemeName

  /** Object key for a path (no leading slash; "" = root). */
  protected final def keyOf(f: Path): String =
    f.toUri.getPath.stripPrefix("/")

  private val statusCache =
    new java.util.concurrent.ConcurrentHashMap[Path, FileStatus]()

  final override def getFileStatus(f: Path): FileStatus = {
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
    val c = objectRequest(key, Some("bytes=0-0"))
    try {
      val code = c.getResponseCode
      if (code == 416)
        return new FileStatus(0L, false, 1, BlockSize,
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
          throw new IOException(
            s"${displayName(key)}: no usable Content-Range/Length")
        return new FileStatus(len, false, 1, BlockSize,
          math.max(0L, c.getLastModified), makeQualified(f))
      }
      if (code != 404)
        throw new IOException(s"GET ${displayName(key)}: HTTP $code")
    } finally c.disconnect()
    // not an object — a "directory" exists iff any key has this prefix
    val probe = listPage(key + "/", delimiter = None, token = None,
      maxKeys = Some(1))
    if (probe.objects.nonEmpty || probe.prefixes.nonEmpty) dirStatus(f)
    else throw new FileNotFoundException(displayName(key))
  }

  final override def listStatus(f: Path): Array[FileStatus] = {
    val st = getFileStatus(f)
    if (!st.isDirectory) return Array(st)
    val key = keyOf(f)
    val prefix = if (key.isEmpty) "" else key.stripSuffix("/") + "/"
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    var token: Option[String] = None
    var more = true
    while (more) {
      val page = listPage(prefix, delimiter = Some("/"), token = token,
        maxKeys = None)
      page.objects.foreach { o =>
        // the zero-byte "directory marker" some writers leave at the
        // prefix itself is not a file
        if (o.key != prefix) {
          val p = makeQualified(new Path("/" + o.key))
          out += new FileStatus(o.size, false, 1, BlockSize, o.mtime, p)
          statusCache.put(p, out.last)
        }
      }
      page.prefixes.foreach(cp =>
        out += dirStatus(new Path("/" + cp.stripSuffix("/"))))
      token = page.nextToken
      more = token.isDefined
    }
    out.toArray
  }

  final override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val st = getFileStatus(f)
    if (st.isDirectory)
      throw new FileNotFoundException(s"$f is a directory")
    val key = keyOf(f)
    new FSDataInputStream(new BufferedFSInputStream(
      new RangedObjectStream(displayName(key), st.getLen,
        r => objectRequest(key, r)), bufferSize))
  }

  final override def setWorkingDirectory(d: Path): Unit = ()
  final override def getWorkingDirectory: Path = new Path(getUri.toString + "/")
  final override def mkdirs(f: Path, permission: FsPermission): Boolean =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  final override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  final override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  final override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
  final override def delete(f: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException(s"$schemeName is read-only")
}

object ObjectStoreFileSystem {
  private val BlockSize = 128L * 1024 * 1024

  /** One listed object. */
  final case class Obj(key: String, size: Long, mtime: Long)
  /** One listing page: objects, common prefixes, continuation token. */
  final case class Page(objects: Seq[Obj], prefixes: Seq[String],
      nextToken: Option[String])

  /** Parse a listing response with the JDK DOM parser, doctype and
    * external entities disabled (both stores' listing schemas are flat
    * tag soup). */
  def parseXml(in: java.io.InputStream): org.w3c.dom.Document = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setExpandEntityReferences(false)
    try dbf.newDocumentBuilder().parse(in)
    catch {
      case e: org.xml.sax.SAXException =>
        throw new IOException(s"object-store listing: malformed XML: ${e.getMessage}")
    }
  }

  def elems(doc: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  def childText(e: org.w3c.dom.Element, tag: String): Option[String] = {
    val nl = e.getElementsByTagName(tag)
    if (nl.getLength == 0) None else Option(nl.item(0).getTextContent)
  }
}
