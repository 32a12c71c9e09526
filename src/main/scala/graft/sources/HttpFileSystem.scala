package graft.sources

import java.io.{EOFException, FileNotFoundException, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop `FileSystem` over HTTP(S), so `spark.read.parquet
  * ("https://host/x.parquet")` works like the reference's scheme'd file
  * URIs (OpenDAL's http operator, `crates/connectors/src/sources/file.rs:
  * 124-207`). Columnar formats need random access; this maps `seek` to
  * `Range: bytes=pos-` requests (falling back to a skip when a server
  * ignores Range and answers 200), so a parquet footer read fetches the
  * file tail, not the whole object — the property that keeps a remote
  * scan's bytes proportional to the pruned read schema at 100 TB.
  *
  * Auth mirrors the REST source's header model: every `fs.http.header.
  * <Name>` conf entry (per-read via reader options, per-source via
  * `SourceDef.options`) is sent with each request — on BOTH schemes, so
  * the documented keys work for the common https case; scheme-specific
  * `fs.https.header.<Name>` entries override by name. Covers bearer,
  * basic, and api-key schemes without bespoke config keys.
  *
  * Writes are unsupported by design — the engine's file parity is
  * read-only (README.md). Directory listings don't exist over plain
  * HTTP, so paths must name files (no globs); `listStatus` of a file
  * returns that file, matching how Spark's file index resolves
  * non-glob leaf paths. */
class HttpFileSystem extends FileSystem {
  protected def schemeName: String = "http"

  private var fsUri: URI = _
  private var headers: Seq[(String, String)] = Nil

  override def getScheme: String = schemeName

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(
      s"$schemeName://${Option(name.getAuthority).getOrElse("")}")
    // generic prefix first, scheme-specific second so an fs.https.header.X
    // overrides fs.http.header.X by name (and plain http reads never see
    // an https-only credential)
    val prefixes = Seq("fs.http.header.", s"fs.$schemeName.header.").distinct
    import scala.jdk.CollectionConverters._
    val keys = conf.iterator().asScala.map(_.getKey).toSeq
    val byName = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (prefix <- prefixes; k <- keys.filter(_.startsWith(prefix)).sorted)
      byName(k.stripPrefix(prefix)) = conf.get(k)
    headers = byName.toSeq
  }

  override def getUri: URI = fsUri

  private[graft] def requestHeaders: Seq[(String, String)] = headers

  private def urlOf(f: Path): URL = {
    val p = f.toUri
    new URI(schemeName, p.getAuthority, p.getPath,
      p.getQuery, p.getFragment).toURL
  }

  private def connect(u: URL, range: Option[String]): HttpURLConnection = {
    val c = u.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("GET")
    c.setConnectTimeout(15000)
    c.setReadTimeout(60000)
    c.setInstanceFollowRedirects(true)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    range.foreach(r => c.setRequestProperty("Range", r))
    c
  }

  /** Size probe as `GET Range: bytes=0-0` rather than HEAD: a ranged
    * server answers 206 with the total after the `/` in Content-Range; a
    * Range-ignoring one answers 200 with the full Content-Length (the
    * body is never consumed). HEAD is unreliable in the wild (refused,
    * or served without a length). */
  override def getFileStatus(f: Path): FileStatus = {
    val q = makeQualified(f)
    val cached = statusCache.get(q)
    if (cached != null) return cached
    val st = fetchStatus(q)
    statusCache.put(q, st)
    st
  }

  // statuses are immutable within one read (instances aren't cached across
  // reads — see confEntries), so the listing-time probe can be reused by
  // open() instead of paying a second bytes=0-0 round trip per stream
  private val statusCache =
    new java.util.concurrent.ConcurrentHashMap[Path, FileStatus]()

  private def fetchStatus(f: Path): FileStatus = {
    val u = urlOf(f)
    val c = connect(u, Some("bytes=0-0"))
    try {
      val code = c.getResponseCode
      if (code == 404) throw new FileNotFoundException(u.toString)
      // bytes=0-0 is unsatisfiable exactly when the object is empty — a
      // range-honoring server answers 416 for a valid zero-length file
      if (code == 416)
        return new FileStatus(0L, false, 1, 128L * 1024 * 1024,
          math.max(0L, c.getLastModified), makeQualified(f))
      if (code >= 400)
        throw new IOException(s"GET $u failed: HTTP $code")
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
          s"$u has no usable Content-Range/Content-Length; " +
            "seekable reads need a known size")
      val mtime = math.max(0L, c.getLastModified)
      new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime,
        makeQualified(f))
    } finally c.disconnect()
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val len = getFileStatus(f).getLen
    new FSDataInputStream(new BufferedFSInputStream(
      new HttpFileSystem.HttpInputStream(urlOf(f), len, connect), bufferSize))
  }

  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))

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

/** The `https://` registration of [[HttpFileSystem]]. */
class HttpsFileSystem extends HttpFileSystem {
  override protected def schemeName: String = "https"
}

object HttpFileSystem {
  /** Conf entries registering both schemes plus cache disable (a cached
    * instance would pin the headers of whichever read came first). */
  val confEntries: Seq[(String, String)] = Seq(
    "fs.http.impl" -> classOf[HttpFileSystem].getName,
    "fs.https.impl" -> classOf[HttpsFileSystem].getName,
    "fs.http.impl.disable.cache" -> "true",
    "fs.https.impl.disable.cache" -> "true")

  /** Seekable stream over HTTP ranges: a seek invalidates the current
    * body; the next read opens one connection at the new offset and
    * streams forward from it, so sequential column-chunk reads cost one
    * request each, not one per read() call. */
  private final class HttpInputStream(u: URL, len: Long,
      conn: (URL, Option[String]) => HttpURLConnection)
      extends FSInputStream {
    private var pos = 0L
    private var in: InputStream = _
    private var c: HttpURLConnection = _

    private def ensureOpen(): Boolean = {
      if (pos >= len) return false
      if (in == null) {
        c = conn(u, if (pos > 0) Some(s"bytes=$pos-") else None)
        val code = c.getResponseCode
        if (code == 404) throw new FileNotFoundException(u.toString)
        if (code >= 400) throw new IOException(s"GET $u: HTTP $code")
        in = c.getInputStream
        // a server that ignores Range answers 200 with the full body:
        // drop the prefix so the stream still lands on `pos`
        if (pos > 0 && code == 200) {
          var left = pos
          while (left > 0) {
            val skipped = in.skip(left)
            if (skipped <= 0) {
              if (in.read() < 0) throw new EOFException(u.toString)
              left -= 1
            } else left -= skipped
          }
        }
      }
      true
    }

    private def closeBody(): Unit = {
      if (in != null) { try in.close() catch { case _: IOException => () } }
      if (c != null) c.disconnect()
      in = null; c = null
    }

    override def seek(target: Long): Unit = {
      if (target < 0 || target > len)
        throw new EOFException(s"seek($target) outside [0,$len] for $u")
      if (target != pos) { closeBody(); pos = target }
    }
    override def getPos: Long = pos
    override def seekToNewSource(target: Long): Boolean = false

    // After ensureOpen() returns true, pos < len — so a -1 from the body
    // is a connection dropped mid-response, NOT end-of-file (len is
    // authoritative). Passing it through would let line readers treat a
    // truncated body as a clean EOF and silently lose rows; instead
    // reopen once at pos, and treat a second immediate EOF as an error.
    override def read(): Int = {
      if (!ensureOpen()) return -1
      var b = in.read()
      if (b < 0) {
        closeBody(); ensureOpen()
        b = in.read()
        if (b < 0) throw new EOFException(s"$u truncated at $pos/$len")
      }
      pos += 1
      b
    }

    override def read(buf: Array[Byte], off: Int, n: Int): Int = {
      if (n == 0) return 0
      if (!ensureOpen()) return -1
      var got = in.read(buf, off, n)
      if (got < 0) {
        closeBody(); ensureOpen()
        got = in.read(buf, off, n)
        if (got < 0) throw new EOFException(s"$u truncated at $pos/$len")
      }
      pos += got
      got
    }

    override def available(): Int =
      math.min(len - pos, Int.MaxValue.toLong).toInt

    override def close(): Unit = closeBody()
  }
}
