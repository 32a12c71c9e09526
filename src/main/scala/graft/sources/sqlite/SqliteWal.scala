package graft.sources.sqlite

import java.io.RandomAccessFile

/** Clean-room reader for SQLite's write-ahead log (-wal) file — the
  * published format (sqlite.org/fileformat2 §"WAL File Format"): a
  * 32-byte header then frames of (24-byte header + one page image).
  * This module recovers the LAST COMMITTED snapshot: the valid frame
  * prefix (salts match the header, cumulative checksum chains), cut at
  * the last commit frame; for each page the LATEST such frame wins.
  *
  * With this, a WAL-mode database reads consistently WITHOUT a
  * checkpoint: main-file pages are overlaid by their newest committed
  * WAL frame, and the database size comes from the commit frame. A
  * torn/stale WAL tail (from a crash or checkpoint-restart) fails its
  * checksum chain and is ignored — exactly the recovery rule the
  * format document prescribes. Frames are indexed by OFFSET and read
  * lazily, so memory is O(frames counted), not O(WAL bytes).
  *
  * Out of scope (documented): a concurrently WRITING process — the
  * scan reads a point-in-time snapshot, same stance as the main-file
  * reader.
  */
object SqliteWal {

  /** Page overlay of the last committed WAL snapshot: page number →
    * byte offset of the page image inside the -wal file, plus the
    * database size in pages at that commit. */
  final case class Overlay(frames: Map[Int, Long], dbSizePages: Int)

  private val MagicLittle = 0x377f0682
  private val MagicBig = 0x377f0683
  private val HeaderSize = 32
  private val FrameHeaderSize = 24

  /** Scan the -wal file; None when it contains no committed frames
    * (empty or torn from the first frame — the main file alone is then
    * the consistent snapshot). */
  def overlay(walPath: String, pageSize: Int): Option[Overlay] = {
    val raf = new RandomAccessFile(walPath, "r")
    try {
      if (raf.length() < HeaderSize + FrameHeaderSize + pageSize)
        return None
      val hdr = new Array[Byte](HeaderSize)
      raf.seek(0)
      raf.readFully(hdr)
      val magic = be32(hdr, 0)
      require(magic == MagicLittle || magic == MagicBig,
        f"$walPath%s has an invalid WAL magic 0x$magic%08x")
      // checksum WORD ORDER is the magic's low bit: ...82 = little
      val bigEndianWords = magic == MagicBig
      require(be32(hdr, 4) == 3007000,
        s"$walPath declares WAL format version ${be32(hdr, 4)}")
      val walPageSize = be32(hdr, 8)
      require(walPageSize == pageSize,
        s"$walPath page size $walPageSize != database page size $pageSize")
      val salt1 = be32(hdr, 16)
      val salt2 = be32(hdr, 20)
      // the header's own checksum covers its first 24 bytes
      var (s0, s1) = checksum(hdr, 0, 24, 0, 0, bigEndianWords)
      if (be32(hdr, 24) != s0 || be32(hdr, 28) != s1) return None

      val frameBuf = new Array[Byte](FrameHeaderSize)
      val pageBuf = new Array[Byte](pageSize)
      val live = scala.collection.mutable.Map.empty[Int, Long]
      val committed = scala.collection.mutable.Map.empty[Int, Long]
      var dbSize = 0
      var off = HeaderSize.toLong
      var ok = true
      while (ok && off + FrameHeaderSize + pageSize <= raf.length()) {
        raf.seek(off)
        raf.readFully(frameBuf)
        raf.readFully(pageBuf)
        val pageNo = be32(frameBuf, 0)
        val commitSize = be32(frameBuf, 4)
        // a frame belongs to this WAL generation iff its salts match
        if (be32(frameBuf, 8) != salt1 || be32(frameBuf, 12) != salt2)
          ok = false
        else {
          // cumulative: first 8 frame-header bytes, then the page image
          val (n0, n1) = checksum(frameBuf, 0, 8, s0, s1, bigEndianWords)
          val (c0, c1) = checksum(pageBuf, 0, pageSize, n0, n1, bigEndianWords)
          if (be32(frameBuf, 16) != c0 || be32(frameBuf, 20) != c1)
            ok = false
          else {
            s0 = c0; s1 = c1
            live(pageNo) = off + FrameHeaderSize
            if (commitSize > 0) {
              // commit frame: everything so far becomes visible
              committed ++= live
              live.clear()
              dbSize = commitSize
            }
            off += FrameHeaderSize + pageSize
          }
        }
      }
      if (dbSize == 0) None
      else Some(Overlay(committed.toMap, dbSize))
    } finally raf.close()
  }

  /** The WAL checksum: s0 += w[i] + s1; s1 += w[i+1] + s0 over pairs
    * of 32-bit words whose BYTE ORDER follows the header magic. `len`
    * must be a multiple of 8. */
  private def checksum(b: Array[Byte], off: Int, len: Int,
      init0: Int, init1: Int, bigEndianWords: Boolean): (Int, Int) = {
    var s0 = init0
    var s1 = init1
    var i = off
    val end = off + len
    while (i < end) {
      val w0 = if (bigEndianWords) be32(b, i) else le32(b, i)
      val w1 = if (bigEndianWords) be32(b, i + 4) else le32(b, i + 4)
      s0 += w0 + s1
      s1 += w1 + s0
      i += 8
    }
    (s0, s1)
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
}
