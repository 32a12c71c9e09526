package graft.sources

import java.io.{EOFException, FileNotFoundException, IOException, InputStream}
import java.net.HttpURLConnection

import org.apache.hadoop.fs.FSInputStream

/** Seekable ranged-GET stream shared by the object-store clients
  * ([[graft.sources.s3.S3FileSystem]], [[graft.sources.azure
  * .AbfsFileSystem]]) — the HttpFileSystem contract: a seek invalidates
  * the body; the next read opens one signed connection at the new offset
  * and streams forward, so sequential column-chunk reads cost one
  * request each; a mid-body disconnect reopens once (the known length is
  * authoritative — a truncated body must never read as a clean EOF). */
private[sources] final class RangedObjectStream(name: String, len: Long,
    conn: Option[String] => HttpURLConnection) extends FSInputStream {
  private var pos = 0L
  private var in: InputStream = _
  private var c: HttpURLConnection = _

  private def ensureOpen(): Boolean = {
    if (pos >= len) return false
    if (in == null) {
      c = conn(if (pos > 0) Some(s"bytes=$pos-") else None)
      val code = c.getResponseCode
      if (code == 404) throw new FileNotFoundException(name)
      if (code >= 400) throw new IOException(s"GET $name: HTTP $code")
      in = c.getInputStream
      if (pos > 0 && code == 200) {
        // a Range-ignoring store answered with the full body
        var left = pos
        while (left > 0) {
          val skipped = in.skip(left)
          if (skipped <= 0) {
            if (in.read() < 0) throw new EOFException(name)
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
      throw new EOFException(s"seek($target) outside [0,$len] for $name")
    if (target != pos) { closeBody(); pos = target }
  }
  override def getPos: Long = pos
  override def seekToNewSource(target: Long): Boolean = false

  override def read(): Int = {
    if (!ensureOpen()) return -1
    var b = in.read()
    if (b < 0) {
      closeBody(); ensureOpen()
      b = in.read()
      if (b < 0) throw new EOFException(s"$name truncated at $pos/$len")
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
      if (got < 0) throw new EOFException(s"$name truncated at $pos/$len")
    }
    pos += got
    got
  }

  override def available(): Int =
    math.min(len - pos, Int.MaxValue.toLong).toInt

  override def close(): Unit = closeBody()
}
