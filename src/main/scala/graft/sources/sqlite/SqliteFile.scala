package graft.sources.sqlite

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets

/** Clean-room reader for the SQLite 3 on-disk file format — the last
  * named reference connector (reference
  * crates/connectors/src/sources/sql/sqlite.rs:30-195 registers `.sqlite`
  * files as queryable tables through a driver pool) that was unreachable
  * here without a driver jar. The format is public and famously stable
  * (sqlite.org/fileformat2): a paged b-tree file — this module decodes
  * the header, walks table b-trees (interior 0x05 / leaf 0x0D pages)
  * and index b-trees (0x02 / 0x0A — WITHOUT ROWID tables), parses
  * record serial types, follows overflow-page chains, and overlays the
  * last committed WAL snapshot for WAL-mode databases ([[SqliteWal]]).
  * No SQLite code is linked or consulted; everything derives from the
  * published format document.
  *
  * Scale stance: one `.sqlite` file is a single-node artifact, but the
  * b-tree root's children give natural SPLIT POINTS — the DSv2 scan
  * (see [[SqliteDataSource]]) plans one partition per root subtree so a
  * multi-gigabyte file reads in parallel from shared storage, and
  * rowid-range pushdown prunes whole subtrees by the interior keys
  * before a page is touched.
  */
object SqliteFile {

  final case class Header(
      pageSize: Int,
      reservedBytes: Int,
      pageCount: Int,
      textEncoding: Int)

  /** One column as declared by the table's CREATE TABLE statement.
    * `affinity` follows the published affinity rules: INTEGER, TEXT,
    * BLOB, REAL, NUMERIC. `rowidAlias` marks the INTEGER PRIMARY KEY
    * column — its record slot is NULL on disk and its value is the
    * b-tree rowid. */
  /** `collated` = the declaration carries a COLLATE other than BINARY
    * (NOCASE/RTRIM/custom): text comparisons — and therefore text
    * index ORDER — then differ from byte order, so byte-compare band
    * pruning must stay off for that column (numeric pruning is
    * unaffected; collation only applies to text). */
  final case class ColumnDef(name: String, declaredType: String,
      affinity: String, rowidAlias: Boolean, collated: Boolean = false)

  /** `pkCols` is the PRIMARY KEY columns in KEY order (declaration
    * order of the PK clause, not the table) — for a WITHOUT ROWID
    * table this is the index b-tree's key prefix and decides the
    * on-disk record column order. `pkDesc` is each key part's sort
    * direction: a DESC leading key stores the index in REVERSE order,
    * which disables ascending-band prefix pruning. `pkCollated` is each
    * key part's effective collation: a table-level
    * `PRIMARY KEY (k COLLATE NOCASE)` orders the PK index by NOCASE even
    * when the column DEFINITION carries no COLLATE, so text band pruning
    * must consult this flag alongside the column's own `collated`. */
  final case class TableDef(name: String, rootPage: Int, sql: String,
      columns: Seq[ColumnDef], withoutRowid: Boolean,
      pkCols: Seq[String], pkDesc: Seq[Boolean],
      pkCollated: Seq[Boolean] = Seq.empty)

  /** A decoded value: null, Long, Double, String, or Array[Byte] —
    * the four SQLite storage classes besides NULL. */
  type Value = Any

  // ---------------------------------------------------------------
  // file access

  /** `cachePages` > 0 keeps an LRU of decoded pages — the secondary-
    * index lookback path re-reads the table b-tree's interior pages
    * once per matched row without it (a point lookup per index entry).
    * `pagesRead` counts PHYSICAL page reads (cache hits excluded), the
    * observable the pruning specs pin. */
  final class Db(path: String, cachePages: Int = 0) extends AutoCloseable {
    private val raf = new RandomAccessFile(path, "r")
    var pagesRead: Long = 0L
    private val cache =
      if (cachePages <= 0) null
      else new java.util.LinkedHashMap[Integer, Array[Byte]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Integer, Array[Byte]]): Boolean =
          size() > cachePages
      }
    val header: Header = readHeader()
    /** Committed WAL snapshot overlay (page → offset in the -wal
      * file), present only for a WAL-mode database with committed,
      * uncheckpointed frames — see [[SqliteWal]]. */
    private val wal: Option[(RandomAccessFile, SqliteWal.Overlay)] = {
      val walPath = path + "-wal"
      val hasWal = java.nio.file.Files.exists(
        java.nio.file.Paths.get(walPath)) &&
        java.nio.file.Files.size(java.nio.file.Paths.get(walPath)) > 0
      if (!hasWal) None
      else SqliteWal.overlay(walPath, header.pageSize)
        .map(o => (new RandomAccessFile(walPath, "r"), o))
    }

    private def readHeader(): Header = {
      val h = new Array[Byte](100)
      raf.seek(0)
      raf.readFully(h)
      val magic = new String(h, 0, 15, StandardCharsets.ISO_8859_1)
      require(magic == "SQLite format 3" && h(15) == 0,
        s"$path is not a SQLite 3 database (bad magic)")
      val rawPs = ((h(16) & 0xff) << 8) | (h(17) & 0xff)
      val pageSize = if (rawPs == 1) 65536 else rawPs
      require(pageSize >= 512 && (pageSize & (pageSize - 1)) == 0,
        s"illegal page size $rawPs")
      // file format versions (header bytes 18/19): 1 = rollback
      // journal, 2 = WAL. WAL-mode databases are read CONSISTENTLY by
      // overlaying the last committed -wal snapshot ([[SqliteWal]]);
      // a rollback-mode file with a stray non-empty -wal sibling is a
      // state real SQLite never produces — refuse rather than guess
      require((h(18) == 1 && h(19) == 1) || (h(18) == 2 && h(19) == 2),
        s"$path uses file format version ${h(18) & 0xff}/${h(19) & 0xff}" +
          " — only rollback (1) and WAL (2) formats exist")
      val walSide = java.nio.file.Paths.get(path + "-wal")
      require(h(18) == 2 || !java.nio.file.Files.exists(walSide) ||
          java.nio.file.Files.size(walSide) == 0,
        s"$path is a rollback-journal database with a non-empty -wal" +
          " sibling; recover it with sqlite3 first")
      // a -journal is HOT only with a well-formed journal-header magic
      // (interrupted transaction needing rollback); journal_mode=PERSIST
      // leaves a non-empty journal with a ZEROED header after a clean
      // commit — that database is consistent and must read fine
      val journalSide = java.nio.file.Paths.get(path + "-journal")
      val journalHot =
        java.nio.file.Files.exists(journalSide) &&
          java.nio.file.Files.size(journalSide) >= 8 && {
            val magic = Array[Byte](0xd9.toByte, 0xd5.toByte, 0x05, 0xf9.toByte,
              0x20, 0xa1.toByte, 0x63, 0xd7.toByte)
            val head = new Array[Byte](8)
            val in = java.nio.file.Files.newInputStream(journalSide)
            try { in.readNBytes(head, 0, 8); java.util.Arrays.equals(head, magic) }
            finally in.close()
          }
      require(!journalHot,
        s"$path has a HOT -journal sibling (interrupted transaction);" +
          " recover it with sqlite3 first")
      val reserved = h(20) & 0xff
      val pageCount = be32(h, 28)
      val enc = be32(h, 56)
      require(enc == 1,
        s"only UTF-8 databases are supported (text encoding $enc)")
      Header(pageSize, reserved, pageCount, enc)
    }

    /** usable bytes per page (page size minus the reserved region). */
    def usable: Int = header.pageSize - header.reservedBytes

    def page(no: Int): Array[Byte] = {
      require(no >= 1, s"page numbers are 1-based, got $no")
      if (cache != null) {
        val hit = cache.get(Integer.valueOf(no))
        if (hit != null) return hit
      }
      pagesRead += 1
      val buf = new Array[Byte](header.pageSize)
      wal.flatMap { case (wraf, o) => o.frames.get(no).map((wraf, _)) } match {
        case Some((wraf, off)) => // newest committed WAL image wins
          wraf.seek(off)
          wraf.readFully(buf)
        case None =>
          raf.seek((no.toLong - 1) * header.pageSize)
          raf.readFully(buf)
      }
      if (cache != null) cache.put(Integer.valueOf(no), buf)
      buf
    }

    override def close(): Unit = {
      wal.foreach(_._1.close())
      raf.close()
    }
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Big-endian base-128 varint (1-9 bytes; byte 9 contributes all 8
    * bits). Returns (value, bytesConsumed). */
  def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xff), 9)
  }

  // ---------------------------------------------------------------
  // b-tree pages

  private final case class PageHeader(pageType: Int, cellCount: Int,
      rightMost: Int, headerOff: Int)

  private def pageHeader(pg: Array[Byte], pageNo: Int): PageHeader = {
    // page 1 carries the 100-byte file header before the b-tree header
    val off = if (pageNo == 1) 100 else 0
    val t = pg(off) & 0xff
    val cells = be16(pg, off + 3)
    val right = if (t == 0x05 || t == 0x02) be32(pg, off + 8) else 0
    PageHeader(t, cells, right, off)
  }

  private def cellPointer(pg: Array[Byte], ph: PageHeader, i: Int): Int = {
    val arrayStart =
      ph.headerOff + (if (ph.pageType == 0x05 || ph.pageType == 0x02) 12
                      else 8)
    be16(pg, arrayStart + 2 * i)
  }

  /** The children of a table-interior page, in key order, each with
    * the MAX rowid its subtree can contain (Long.MaxValue for the
    * rightmost pointer) — the split points the partitioned scan and
    * the rowid-range pruning both use. */
  def interiorChildren(db: Db, pageNo: Int): Seq[(Int, Long)] = {
    val pg = db.page(pageNo)
    val ph = pageHeader(pg, pageNo)
    require(ph.pageType == 0x05,
      s"page $pageNo is not a table interior page (type ${ph.pageType})")
    val kids = (0 until ph.cellCount).map { i =>
      val off = cellPointer(pg, ph, i)
      val child = be32(pg, off)
      val (key, _) = varint(pg, off + 4)
      (child, key)
    }
    kids :+ (ph.rightMost, Long.MaxValue)
  }

  def isLeaf(db: Db, pageNo: Int): Boolean = {
    val pg = db.page(pageNo)
    pageHeader(pg, pageNo).pageType match {
      case 0x0d => true
      case 0x05 => false
      case t => throw new IllegalStateException(
        s"page $pageNo is not a table b-tree page (type $t) — " +
          "index b-trees (WITHOUT ROWID layout) go through indexPageStep")
    }
  }

  /** Walk one table b-tree subtree, invoking `f(rowid, payload)` per
    * row in rowid order. `minRowid`/`maxRowid` prune interior descent:
    * a subtree whose key range falls outside [min, max] is never read
    * — the pushed-down rowid filter costs page reads proportional to
    * the SELECTED range, not the table. */
  def walk(db: Db, pageNo: Int, minRowid: Long, maxRowid: Long)(
      f: (Long, Array[Byte]) => Unit): Unit = {
    val pg = db.page(pageNo)
    val ph = pageHeader(pg, pageNo)
    ph.pageType match {
      case 0x0d => // table leaf
        var i = 0
        while (i < ph.cellCount) {
          val off = cellPointer(pg, ph, i)
          val (payloadLen, n1) = varint(pg, off)
          val (rowid, n2) = varint(pg, off + n1)
          if (rowid >= minRowid && rowid <= maxRowid)
            f(rowid, readPayload(db, pg, off + n1 + n2, payloadLen))
          i += 1
        }
      case 0x05 => // table interior: all rowids in child(i) are <= key(i)
        var lowerBound = Long.MinValue
        var i = 0
        while (i < ph.cellCount) {
          val off = cellPointer(pg, ph, i)
          val child = be32(pg, off)
          val (key, _) = varint(pg, off + 4)
          if (key >= minRowid && lowerBound <= maxRowid)
            walk(db, child, minRowid, maxRowid)(f)
          lowerBound = key + 1
          i += 1
        }
        if (lowerBound <= maxRowid)
          walk(db, ph.rightMost, minRowid, maxRowid)(f)
      case t => throw new IllegalStateException(
        s"page $pageNo is not a table b-tree page (type $t) — " +
          "index b-trees (WITHOUT ROWID layout) go through indexPageStep")
    }
  }

  /** Assemble a cell's payload, following the overflow chain when the
    * record spills. The local/spill split is the published formula:
    * U = usable size, X = U-35 for table leaves or ((U-12)*64/255)-23
    * for index pages, M = ((U-12)*32/255)-23,
    * K = M+((P-M) mod (U-4)); local = P if P<=X else (K if K<=X else M). */
  private def readPayload(db: Db, pg: Array[Byte], payloadOff: Int,
      payloadLen: Long, indexPage: Boolean = false): Array[Byte] = {
    val u = db.usable
    val x = if (indexPage) (u - 12) * 64 / 255 - 23 else u - 35
    val p = payloadLen.toInt
    require(payloadLen <= Int.MaxValue, s"payload too large: $payloadLen")
    val local =
      if (p <= x) p
      else {
        val m = (u - 12) * 32 / 255 - 23
        val k = m + (p - m) % (u - 4)
        if (k <= x) k else m
      }
    val out = new Array[Byte](p)
    System.arraycopy(pg, payloadOff, out, 0, local)
    if (local < p) {
      var next = be32(pg, payloadOff + local)
      var written = local
      while (next != 0 && written < p) {
        val opg = db.page(next)
        next = be32(opg, 0)
        val take = math.min(u - 4, p - written)
        System.arraycopy(opg, 4, out, written, take)
        written += take
      }
      require(written == p,
        s"overflow chain ended early: $written of $p bytes")
    }
    out
  }

  // ---------------------------------------------------------------
  // index b-trees (WITHOUT ROWID tables)

  /** ONE parse of an index b-tree root: None when the root is a leaf
    * (single-partition scan), Some(leading key values of the root
    * cells) when interior — slices 0..size (inclusive; the last is the
    * rightmost subtree) are the disjoint partition units, and the
    * leading keys are the planner's slice-prune bands. */
  def indexRoot(db: Db, pageNo: Int): Option[Seq[Value]] = {
    val pg = db.page(pageNo)
    val ph = pageHeader(pg, pageNo)
    ph.pageType match {
      case 0x0a => None
      case 0x02 => Some((0 until ph.cellCount).map { i =>
        val off = cellPointer(pg, ph, i)
        val (payloadLen, n1) = varint(pg, off + 4)
        firstValue(readPayload(db, pg, off + 4 + n1, payloadLen,
          indexPage = true))
      })
      case t => throw new IllegalStateException(
        s"page $pageNo is not an index b-tree page (type $t)")
    }
  }

  /** The FIRST column of a record — for index b-trees this is the
    * leading PRIMARY KEY value, the prune key of PK-prefix pushdown. */
  def firstValue(payload: Array[Byte]): Value = {
    val (headerLen, n0) = varint(payload, 0)
    val (st, _) = varint(payload, n0)
    decodeValue(payload, headerLen.toInt, st)
  }

  /** Whether a leading-key value can lie in [lo, hi]. Numeric storage
    * classes compare numerically; anything else answers TRUE — the
    * pushdown is INEXACT by contract (Spark re-evaluates the filter),
    * so "don't know" must keep the row/subtree, never drop it. */
  def keyInRange(v: Value, lo: Long, hi: Long): Boolean = v match {
    case l: Long => l >= lo && l <= hi
    case d: Double => d >= lo && d <= hi
    case _ => true
  }

  /** A pushed leading-key prune range, generic over the key's storage
    * class. `contains` filters entries (INEXACT: unknown → true);
    * `mayOverlap` prunes child subtrees whose implied band misses the
    * range. Every prune decision is CLASS-SAFE: a band is only dropped
    * when its endpoints prove no key of another storage class — which
    * coerces differently or fails loudly — can hide inside it. */
  sealed trait KeyRange extends Serializable {
    def contains(v: Value): Boolean
    def mayOverlap(prev: Option[Value], cur: Option[Value]): Boolean
    def describe: String
    /** Provably empty (contradictory bounds): the scan plans no
      * partitions at all. */
    def isEmpty: Boolean
  }

  /** Numeric [lo, hi] (both inclusive). Below-lo pruning is class-safe
    * with a numeric upper endpoint alone (numeric is the lowest
    * storage class after NULL, and NULL never matches a range);
    * above-hi needs BOTH endpoints numeric — text/blob sort above
    * every numeric and must stay visible to fail loudly. */
  final case class NumRange(lo: Long, hi: Long) extends KeyRange {
    def contains(v: Value): Boolean = keyInRange(v, lo, hi)
    def mayOverlap(prev: Option[Value], cur: Option[Value]): Boolean =
      bandMayOverlap(prev, cur, lo, hi)
    def describe: String = s"[${
      if (lo == Long.MinValue) "-inf" else lo}, ${
      if (hi == Long.MaxValue) "+inf" else hi}]"
    def isEmpty: Boolean = lo > hi
  }

  /** Text range under BINARY collation (UTF-8 byte order; the planner
    * only builds one for non-collated columns). `hiExclusive` serves
    * prefix pushdown ([p, nextPrefix(p))). Pruning requires BOTH band
    * endpoints to be text: below a lone text endpoint there can be
    * NUMERIC keys (which coerce to strings that compare differently
    * than their index position), above one there can be BLOBs (which
    * fail loudly on coerce) — both must survive the prune for the
    * residual filter / loud-failure contract to see them. */
  final case class TextRange(lo: Option[Array[Byte]],
      hi: Option[Array[Byte]], hiExclusive: Boolean) extends KeyRange {
    private def cmp(a: Array[Byte], b: Array[Byte]): Int =
      java.util.Arrays.compareUnsigned(a, b)
    def contains(v: Value): Boolean = v match {
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        lo.forall(l => cmp(b, l) >= 0) &&
          hi.forall(h => if (hiExclusive) cmp(b, h) < 0 else cmp(b, h) <= 0)
      case _ => true // unknown class: keep (numerics coerce, blobs fail loudly)
    }
    def mayOverlap(prev: Option[Value], cur: Option[Value]): Boolean = {
      val p = prev.collect { case s: String => s.getBytes(StandardCharsets.UTF_8) }
      val c = cur.collect { case s: String => s.getBytes(StandardCharsets.UTF_8) }
      (p, c) match {
        case (Some(pb), Some(cb)) =>
          val belowLo = lo.exists(l => cmp(cb, l) < 0)
          val aboveHi = hi.exists(h =>
            if (hiExclusive) cmp(pb, h) >= 0 else cmp(pb, h) > 0)
          !belowLo && !aboveHi
        case _ => true
      }
    }
    def describe: String = {
      def str(b: Array[Byte]) = new String(b, StandardCharsets.UTF_8)
      s"[${lo.map(str).getOrElse("-inf")}, ${
        hi.map(str).getOrElse("+inf")}${if (hiExclusive) ")" else "]"}"
    }
    def isEmpty: Boolean = (lo, hi) match {
      case (Some(l), Some(h)) =>
        val c = cmp(l, h)
        c > 0 || (c == 0 && hiExclusive)
      case _ => false
    }
  }

  /** The seed of one root SLICE — the disjoint partition unit of an
    * index-rooted scan. Slice i < cellCount yields cell i's own entry
    * (index b-trees are b-trees, not b+-trees: interior cells ARE
    * rows) plus its left-child subtree; slice i == cellCount is the
    * rightmost subtree. Together the slices visit every entry exactly
    * once. */
  def indexSliceSeed(db: Db, rootPage: Int,
      slice: Int): (Seq[Array[Byte]], Seq[Int]) = {
    val pg = db.page(rootPage)
    val ph = pageHeader(pg, rootPage)
    require(ph.pageType == 0x02,
      s"page $rootPage is not an index interior page (type ${ph.pageType})")
    require(slice >= 0 && slice <= ph.cellCount,
      s"slice $slice out of range 0..${ph.cellCount}")
    if (slice == ph.cellCount) (Seq.empty, Seq(ph.rightMost))
    else {
      val off = cellPointer(pg, ph, slice)
      val (payloadLen, n1) = varint(pg, off + 4)
      (Seq(readPayload(db, pg, off + 4 + n1, payloadLen, indexPage = true)),
        Seq(be32(pg, off)))
    }
  }

  /** Decode ONE index b-tree page: its entry records plus its child
    * page numbers (empty for a leaf). Pull-driven scans keep a page
    * stack and call this per pop — memory stays O(tree depth + one
    * page), same stance as the rowid reader. Row ORDER is not
    * preserved across interior entries (Spark scans are unordered).
    *
    * [lo, hi] is the pushed leading-PK range: entries outside it are
    * dropped and child subtrees whose implied leading-key band misses
    * it are never pushed — page reads proportional to the selected
    * range, like the rowid pruning. Non-numeric keys stay (INEXACT
    * pushdown; Spark re-evaluates). */
  def indexPageStep(db: Db, pageNo: Int, lo: Long,
      hi: Long): (Seq[Array[Byte]], Seq[Int]) =
    indexPageStep(db, pageNo, NumRange(lo, hi))

  def indexPageStep(db: Db, pageNo: Int,
      range: KeyRange): (Seq[Array[Byte]], Seq[Int]) = {
    val pg = db.page(pageNo)
    val ph = pageHeader(pg, pageNo)
    ph.pageType match {
      case 0x0a => // index leaf: varint payloadLen, payload [, overflow]
        val entries = (0 until ph.cellCount).map { i =>
          val off = cellPointer(pg, ph, i)
          val (payloadLen, n1) = varint(pg, off)
          readPayload(db, pg, off + n1, payloadLen, indexPage = true)
        }.filter(e => range.contains(firstValue(e)))
        (entries, Seq.empty)
      case 0x02 => // index interior: child, varint payloadLen, payload
        val cells = (0 until ph.cellCount).map { i =>
          val off = cellPointer(pg, ph, i)
          val (payloadLen, n1) = varint(pg, off + 4)
          (readPayload(db, pg, off + 4 + n1, payloadLen, indexPage = true),
            be32(pg, off))
        }
        // child_i holds keys BETWEEN entry_{i-1} and entry_i in full-key
        // order, so its leading keys lie in [first(e_{i-1}), first(e_i)];
        // each entry's leading key is decoded ONCE (an overflow-chained
        // separator would otherwise re-read its spill pages)
        var prev: Option[Value] = None
        val kids = scala.collection.mutable.ArrayBuffer.empty[Int]
        val entries = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        cells.foreach { case (entry, child) =>
          val cur = firstValue(entry)
          if (range.mayOverlap(prev, Some(cur))) kids += child
          if (range.contains(cur)) entries += entry
          prev = Some(cur)
        }
        if (range.mayOverlap(prev, None)) kids += ph.rightMost
        (entries.toSeq, kids.toSeq)
      case t => throw new IllegalStateException(
        s"page $pageNo is not an index b-tree page (type $t)")
    }
  }

  /** Can a subtree whose leading keys lie in [prev, cur] (either side
    * open when None/non-numeric) intersect [lo, hi]? Unknown → true.
    *
    * Below-lo pruning is class-safe on its own: numeric is the LOWEST
    * storage class, so every key under a numeric upper bound is itself
    * numeric. Above-hi pruning is not — a band like (5, 'zzz') starts
    * above a numeric hi yet can hold TEXT/BLOB keys (they sort above
    * every numeric), keys the unpruned scan fails loudly on with
    * "cannot coerce". So the band is pruned above ONLY when both
    * endpoints are numeric (then every key between them is numeric
    * too), keeping the loud-failure affinity contract; the rightmost
    * child (cur = None) is never pruned above, costing one extra
    * right-spine path of O(tree depth) pages per scan. */
  def bandMayOverlap(prev: Option[Value], cur: Option[Value],
      lo: Long, hi: Long): Boolean = {
    val belowLo = cur.exists {
      case l: Long => l < lo
      case d: Double => d < lo
      case _ => false
    }
    val numericCur = cur.exists {
      case _: Long | _: Double => true
      case _ => false
    }
    val aboveHi = numericCur && prev.exists {
      case l: Long => l > hi
      case d: Double => d > hi
      case _ => false
    }
    !belowLo && !aboveHi
  }

  // ---------------------------------------------------------------
  // record format

  /** Decode the i-th..(n-1)-th values of a record payload into `out`
    * at positions given by `want` (column index → output slot; -1 =
    * skip without materializing). Serial types: 0 NULL; 1-6 big-endian
    * two's-complement ints of 1,2,3,4,6,8 bytes; 7 float64; 8/9 the
    * constants 0/1; N>=12 even BLOB of (N-12)/2; N>=13 odd TEXT of
    * (N-13)/2. */
  def decodeRecord(payload: Array[Byte], want: Array[Int],
      out: Array[Value]): Unit = {
    val (headerLen, n0) = varint(payload, 0)
    var hoff = n0
    var body = headerLen.toInt
    var col = 0
    while (hoff < headerLen && col < want.length) {
      val (st, n) = varint(payload, hoff)
      hoff += n
      val slot = want(col)
      val size = serialSize(st)
      if (slot >= 0)
        out(slot) = decodeValue(payload, body, st)
      body += size
      col += 1
    }
    // columns added by ALTER TABLE after this row was written are
    // absent from the record: they read as NULL (slots pre-cleared by
    // the caller) — the same semantics SQLite applies.
  }

  private def serialSize(st: Long): Int = st match {
    case 0 | 8 | 9 => 0
    case 1 => 1
    case 2 => 2
    case 3 => 3
    case 4 => 4
    case 5 => 6
    case 6 | 7 => 8
    case n if n >= 12 => ((n - 12) / 2).toInt
    case n => throw new IllegalStateException(s"reserved serial type $n")
  }

  private def decodeValue(b: Array[Byte], off: Int, st: Long): Value =
    st match {
      case 0 => null
      case 1 => b(off).toLong
      case 2 => ((b(off) << 8) | (b(off + 1) & 0xff)).toLong
      case 3 => ((b(off) << 16) | ((b(off + 1) & 0xff) << 8) |
        (b(off + 2) & 0xff)).toLong
      case 4 => be32(b, off).toLong
      case 5 =>
        (be32(b, off).toLong << 16) | (be16(b, off + 4) & 0xffffL)
      case 6 | 7 =>
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
        if (st == 6) v else java.lang.Double.longBitsToDouble(v)
      case 8 => 0L
      case 9 => 1L
      case n if n >= 13 && n % 2 == 1 =>
        new String(b, off, ((n - 13) / 2).toInt, StandardCharsets.UTF_8)
      case n if n >= 12 =>
        val len = ((n - 12) / 2).toInt
        val out = new Array[Byte](len)
        System.arraycopy(b, off, out, 0, len)
        out
      case n => throw new IllegalStateException(s"reserved serial type $n")
    }

  // ---------------------------------------------------------------
  // schema

  /** Read sqlite_schema (root = page 1): rows are (type, name,
    * tbl_name, rootpage, sql). Only `type='table'` entries with a
    * rootpage are returned — views have rootpage 0, indexes are index
    * b-trees. */
  def tables(db: Db): Seq[TableDef] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[TableDef]
    val want = Array(0, 1, 2, 3, 4)
    walk(db, 1, Long.MinValue, Long.MaxValue) { (_, payload) =>
      val out = new Array[Value](5)
      decodeRecord(payload, want, out)
      (out(0), out(1), out(3), out(4)) match {
        case ("table", name: String, root: Long, sql: String)
            if root > 0 =>
          val (cols, noRowid, pk) = parseCreateTable(sql)
          rows += TableDef(name, root.toInt, sql, cols, noRowid,
            pk.map(_._1), pk.map(_._2), pk.map(_._3))
        case _ => ()
      }
    }
    rows.toSeq
  }

  def table(db: Db, name: String): TableDef = {
    val all = tables(db)
    all.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"no table '$name' in database (have ${
          all.map(_.name).sorted.mkString(", ")})"))
  }

  /** A `CREATE INDEX` b-tree: entry records are (indexed columns in
    * index order..., rowid). `partial` (WHERE clause) and `expression`
    * (non-bare-column entries) indexes are parsed but NEVER used for
    * scans — they don't cover every row / can't map to a column. */
  /** `leadingCollated` = the leading indexed column carries a
    * non-BINARY COLLATE in the CREATE INDEX itself; combined with the
    * table column's own `collated` flag it gates TEXT band pruning
    * (byte order must equal index order). */
  final case class IndexDef(name: String, table: String, rootPage: Int,
      sql: String, columns: Seq[(String, Boolean)], // (name, DESC?)
      unique: Boolean, partial: Boolean, expression: Boolean,
      leadingCollated: Boolean = false)

  /** The usable `CREATE INDEX` rows of sqlite_schema for `tableName`.
    * Auto-indexes (`sqlite_autoindex_*`, NULL sql) are skipped: their
    * key columns come from a constraint this reader does not parse. */
  def indexes(db: Db, tableName: String): Seq[IndexDef] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[IndexDef]
    val want = Array(0, 1, 2, 3, 4)
    walk(db, 1, Long.MinValue, Long.MaxValue) { (_, payload) =>
      val out = new Array[Value](5)
      decodeRecord(payload, want, out)
      (out(0), out(1), out(2), out(3), out(4)) match {
        case ("index", name: String, tbl: String, root: Long, sql: String)
            if root > 0 && tbl.equalsIgnoreCase(tableName) =>
          val (cols, unique, partial, expr, leadColl) = parseCreateIndex(sql)
          rows += IndexDef(name, tbl, root.toInt, sql, cols,
            unique, partial, expr, leadColl)
        case _ => ()
      }
    }
    rows.toSeq
  }

  /** Pragmatic CREATE INDEX parser:
    * `CREATE [UNIQUE] INDEX [IF NOT EXISTS] [schema.]name ON table
    * (col [COLLATE c] [ASC|DESC], ...) [WHERE expr]`.
    * Returns (columns with DESC flags, unique, partial, expression,
    * leading column non-BINARY COLLATE); an entry that is not a bare
    * (possibly quoted) identifier marks the whole index
    * `expression = true`. */
  def parseCreateIndex(sql: String)
      : (Seq[(String, Boolean)], Boolean, Boolean, Boolean, Boolean) = {
    val upper = sql.toUpperCase
    val unique = tokenize(upper.take(upper.indexOf("INDEX").max(0)))
      .contains("UNIQUE")
    // the column list is the LAST top-level (...) before any WHERE:
    // scan for the first '(' at depth 0 after the ON clause — index
    // names can be quoted but cannot themselves contain '(' outside
    // quotes handled below
    var i = 0
    var open = -1
    var inQ: Char = 0
    while (i < sql.length && open < 0) {
      val c = sql.charAt(i)
      if (inQ != 0) { if (c == inQ) inQ = 0 }
      else c match {
        case '\'' | '"' | '`' => inQ = c
        case '[' => inQ = ']'
        case '(' => open = i
        case _ => ()
      }
      i += 1
    }
    require(open > 0, s"malformed CREATE INDEX: $sql")
    var depth = 0
    var close = -1
    i = open; inQ = 0
    while (i < sql.length && close < 0) {
      val c = sql.charAt(i)
      if (inQ != 0) { if (c == inQ) inQ = 0 }
      else c match {
        case '\'' | '"' | '`' => inQ = c
        case '[' => inQ = ']'
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ => ()
      }
      i += 1
    }
    require(close > open, s"malformed CREATE INDEX: $sql")
    val partial = {
      val tail = sql.substring(close + 1).toUpperCase
      tokenize(tail).headOption.contains("WHERE")
    }
    var expression = false
    var leadingCollated = false
    val parts = sql.substring(open + 1, close).split(',').toSeq
      .map(_.trim).filter(_.nonEmpty)
    val cols = parts.zipWithIndex.map { case (part, i) =>
      val (name, rest) = takeIdentifier(part)
      val restToks = tokenize(rest.toUpperCase)
      // bare column: nothing after the identifier except
      // COLLATE <x> / ASC / DESC
      val allowed = restToks.isEmpty || {
        val afterCollate =
          if (restToks.headOption.contains("COLLATE")) restToks.drop(2)
          else restToks
        afterCollate.forall(t => t == "ASC" || t == "DESC")
      }
      if (name.isEmpty || !allowed ||
          part.contains("(")) expression = true
      if (i == 0 && restToks.headOption.contains("COLLATE") &&
          !restToks.lift(1).contains("BINARY")) leadingCollated = true
      (name, restToks.contains("DESC"))
    }
    (cols, unique, partial, expression, leadingCollated)
  }

  /** Point lookup in a table b-tree: descend interiors to the leaf
    * owning `rowid`, return its record payload (None when absent).
    * O(depth) page reads — pair with a caching [[Db]] when called per
    * index entry, so shared interior pages read once. */
  def lookupRowid(db: Db, rootPage: Int, rowid: Long): Option[Array[Byte]] = {
    var pageNo = rootPage
    while (true) {
      val pg = db.page(pageNo)
      val ph = pageHeader(pg, pageNo)
      ph.pageType match {
        case 0x05 =>
          var i = 0
          var next = ph.rightMost
          var found = false
          while (i < ph.cellCount && !found) {
            val off = cellPointer(pg, ph, i)
            val (key, _) = varint(pg, off + 4)
            if (rowid <= key) { next = be32(pg, off); found = true }
            i += 1
          }
          pageNo = next
        case 0x0d =>
          var i = 0
          while (i < ph.cellCount) {
            val off = cellPointer(pg, ph, i)
            val (payloadLen, n1) = varint(pg, off)
            val (rid, n2) = varint(pg, off + n1)
            if (rid == rowid)
              return Some(readPayload(db, pg, off + n1 + n2, payloadLen))
            i += 1
          }
          return None
        case t => throw new IllegalStateException(
          s"page $pageNo is not a table b-tree page (type $t)")
      }
    }
    None // unreachable
  }

  /** One stored value vs another in SQLite's cross-class sort order
    * (fileformat2: NULL < numeric < TEXT < BLOB; numerics compare by
    * value across INTEGER/REAL, TEXT by BINARY collation = unsigned
    * UTF-8 bytes, BLOB by unsigned bytes). Callers must not use this
    * for TEXT keys under a non-BINARY collation — their stored order
    * diverges. */
  def compareValues(a: Value, b: Value): Int = {
    def rank(v: Value): Int = v match {
      case null => 0
      case _: Long | _: Double => 1
      case _: String => 2
      case _: Array[Byte] => 3
      case other => throw new IllegalStateException(
        s"unorderable sqlite value $other")
    }
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) return Integer.compare(ra, rb)
    (a, b) match {
      case (null, null) => 0
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      // mixed int/real compares EXACTLY (a 2^60 long vs its double
      // neighbour must not tie): decimal arithmetic, no widening.
      // Non-finite REALs short-circuit first — SQLite legally stores
      // ±Infinity (e.g. a literal 9e999) and new BigDecimal(inf)
      // throws; an infinite double orders against every long by sign.
      // NaN cannot be stored (it becomes NULL on write), so reaching
      // the comparator with one is a decode bug worth failing loudly.
      case (_: Long, y: Double) if !java.lang.Double.isFinite(y) =>
        if (y.isNaN) throw new IllegalStateException(
          "NaN REAL in sqlite key (cannot be stored; decode bug)")
        else if (y > 0) -1 else 1
      case (x: Double, _: Long) if !java.lang.Double.isFinite(x) =>
        if (x.isNaN) throw new IllegalStateException(
          "NaN REAL in sqlite key (cannot be stored; decode bug)")
        else if (x > 0) 1 else -1
      case (x: Long, y: Double) =>
        java.math.BigDecimal.valueOf(x)
          .compareTo(new java.math.BigDecimal(y))
      case (x: Double, y: Long) =>
        new java.math.BigDecimal(x)
          .compareTo(java.math.BigDecimal.valueOf(y))
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: String, y: String) =>
        java.util.Arrays.compareUnsigned(
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x: Array[Byte], y: Array[Byte]) =>
        java.util.Arrays.compareUnsigned(x, y)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  /** Point lookup of one PRIMARY KEY tuple in a WITHOUT ROWID table's
    * index b-tree — the PK-tuple twin of [[lookupRowid]], keying the
    * lookback a non-covering secondary-index scan pays per matched
    * entry. `key` is the tuple in KEY order; `desc` flips each part's
    * comparison to match the stored order. Interior entries ARE rows
    * (index b-trees, not b+-trees), so equality can return at any
    * level; a PK is unique, so the first match is THE row. */
  def lookupPkTuple(db: Db, rootPage: Int, key: Array[Value],
      desc: Array[Boolean]): Option[Array[Byte]] = {
    val want = Array.tabulate(key.length)(identity)
    def cmpEntry(entry: Array[Byte]): Int = {
      val pref = new Array[Value](key.length)
      decodeRecord(entry, want, pref)
      var i = 0
      while (i < key.length) {
        val c = compareValues(key(i), pref(i))
        if (c != 0) return if (desc.lift(i).contains(true)) -c else c
        i += 1
      }
      0
    }
    var pageNo = rootPage
    while (true) {
      val pg = db.page(pageNo)
      val ph = pageHeader(pg, pageNo)
      ph.pageType match {
        case 0x0a => // index leaf: entries are in stored order, so the
          // scan ends the moment the key sorts BEFORE the current entry
          // (cmpEntry < 0) — the same ordering assumption the interior
          // descent makes; without it a miss (or a key near the leaf
          // end) pays a full-leaf decode per lookback
          var i = 0
          while (i < ph.cellCount) {
            val off = cellPointer(pg, ph, i)
            val (payloadLen, n1) = varint(pg, off)
            val entry = readPayload(db, pg, off + n1, payloadLen,
              indexPage = true)
            val c = cmpEntry(entry)
            if (c == 0) return Some(entry)
            if (c < 0) return None
            i += 1
          }
          return None
        case 0x02 => // index interior: first cell with key <= entry wins
          var i = 0
          var next = ph.rightMost
          var done = false
          while (i < ph.cellCount && !done) {
            val off = cellPointer(pg, ph, i)
            val (payloadLen, n1) = varint(pg, off + 4)
            val entry = readPayload(db, pg, off + 4 + n1, payloadLen,
              indexPage = true)
            val c = cmpEntry(entry)
            if (c == 0) return Some(entry)
            if (c < 0) { next = be32(pg, off); done = true }
            i += 1
          }
          pageNo = next
        case t => throw new IllegalStateException(
          s"page $pageNo is not an index b-tree page (type $t)")
      }
    }
    None // unreachable
  }

  /** Column affinity per the published rules, applied in order:
    * INT→INTEGER; CHAR/CLOB/TEXT→TEXT; BLOB or empty→BLOB;
    * REAL/FLOA/DOUB→REAL; else NUMERIC. */
  def affinityOf(declared: String): String = {
    val t = declared.toUpperCase
    if (t.contains("INT")) "INTEGER"
    else if (t.contains("CHAR") || t.contains("CLOB") || t.contains("TEXT"))
      "TEXT"
    else if (t.isEmpty || t.contains("BLOB")) "BLOB"
    else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB"))
      "REAL"
    else "NUMERIC"
  }

  /** Pragmatic CREATE TABLE parser: enough of the published grammar to
    * recover column names, declared types, the INTEGER PRIMARY KEY
    * rowid alias, and the WITHOUT ROWID marker. Quoted identifiers
    * ("x", [x], `x`, 'x') and multi-word type names are handled;
    * table-level constraints (PRIMARY KEY(…), UNIQUE(…), CHECK(…),
    * FOREIGN KEY(…)) are skipped. */
  def parseCreateTable(sql: String)
      : (Seq[ColumnDef], Boolean, Seq[(String, Boolean, Boolean)]) = {
    val open = sql.indexOf('(')
    require(open > 0, s"malformed CREATE TABLE: $sql")
    // find the matching close paren of the column list
    var depth = 0
    var i = open
    var close = -1
    var inQ: Char = 0
    while (i < sql.length && close < 0) {
      val c = sql.charAt(i)
      if (inQ != 0) {
        if (c == inQ) inQ = 0
      } else c match {
        case '\'' | '"' | '`' => inQ = c
        case '[' => inQ = ']'
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ => ()
      }
      i += 1
    }
    require(close > open, s"malformed CREATE TABLE: $sql")
    val body = sql.substring(open + 1, close)
    val tail = sql.substring(close + 1).toUpperCase
    val withoutRowid = tail.contains("WITHOUT") && tail.contains("ROWID")
    // split top-level commas
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    depth = 0; inQ = 0
    body.foreach { c =>
      if (inQ != 0) {
        if (c == inQ) inQ = 0
        cur += c
      } else c match {
        case '\'' | '"' | '`' => inQ = c; cur += c
        case '[' => inQ = ']'; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) parts += cur.toString
    val constraintHeads =
      Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    // a table-level `PRIMARY KEY(x)` over a single column participates
    // in the rowid-alias rule (including the documented DESC quirk:
    // table-level `PRIMARY KEY(x DESC)` DOES alias; column-level
    // `INTEGER PRIMARY KEY DESC` does NOT)
    var tablePkCols: Seq[(String, Boolean, Boolean)] = Seq.empty
    var colPkName: Option[(String, Boolean, Boolean)] = None
    val cols = parts.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      val (name, rest) = takeIdentifier(p)
      if (constraintHeads(name.toUpperCase) && !p.startsWith("\"") &&
          !p.startsWith("[") && !p.startsWith("`")) {
        val u = p.toUpperCase
        val isPkConstraint =
          if (name.equalsIgnoreCase("CONSTRAINT")) {
            val (_, afterName) = takeIdentifier(rest)
            afterName.trim.toUpperCase.startsWith("PRIMARY")
          } else u.startsWith("PRIMARY")
        if (isPkConstraint) {
          val lp = p.indexOf('(')
          val rp = p.lastIndexOf(')')
          if (lp > 0 && rp > lp) {
            // key ORDER matters: PRIMARY KEY(b, a) stores b first;
            // a per-part DESC reverses that part's index ordering, and
            // a per-part COLLATE (legal here: `PRIMARY KEY (k COLLATE
            // NOCASE)`) reorders the PK index away from byte order
            tablePkCols = p.substring(lp + 1, rp).split(',').toSeq
              .map { c =>
                val (n, rest) = takeIdentifier(c.trim)
                val ts = tokenize(rest.toUpperCase)
                val ci = ts.indexOf("COLLATE")
                (n, ts.contains("DESC"),
                  ci >= 0 && !ts.lift(ci + 1).contains("BINARY"))
              }.filter(_._1.nonEmpty)
          }
        }
        None
      } else {
        // declared type = identifier tokens up to the first constraint
        // keyword (PRIMARY/NOT/UNIQUE/DEFAULT/CHECK/REFERENCES/
        // COLLATE/GENERATED/AS)
        val stop = Set("PRIMARY", "NOT", "NULL", "UNIQUE", "DEFAULT",
          "CHECK", "REFERENCES", "COLLATE", "GENERATED", "AS")
        val toks = tokenize(rest)
        val tyToks = toks.takeWhile(t => !stop(t.toUpperCase))
        val declared = tyToks.mkString(" ")
        val upper = rest.toUpperCase
        // the rowid alias requires the declared type to be EXACTLY
        // 'INTEGER' (one token, any case) — mere INTEGER affinity
        // ('INT', 'BIGINT', …) stores real values in the record while
        // rowids are auto-assigned, so treating those as aliases
        // silently substitutes rowids for the stored column
        val exactInteger =
          tyToks.size == 1 && tyToks.head.equalsIgnoreCase("INTEGER")
        val colPk = upper.contains("PRIMARY KEY")
        // historical quirk: column-level `INTEGER PRIMARY KEY DESC`
        // does NOT alias the rowid
        val colPkDesc = colPk &&
          tokenize(upper).containsSlice(Seq("PRIMARY", "KEY", "DESC"))
        val aff = affinityOf(declared)
        val collated = {
          val ts = tokenize(upper)
          val ci = ts.indexOf("COLLATE")
          ci >= 0 && !ts.lift(ci + 1).contains("BINARY")
        }
        if (colPk && colPkName.isEmpty)
          colPkName = Some((name, colPkDesc, collated))
        Some(ColumnDef(name, declared, aff,
          rowidAlias =
            exactInteger && colPk && !colPkDesc && !withoutRowid,
          collated = collated))
      }
    }.toSeq
    // resolve a table-level single-column PK: aliases iff the named
    // column's declared type is exactly INTEGER
    val withTablePk = tablePkCols match {
      case Seq((pk, _, _)) if !withoutRowid =>
        cols.map { c =>
          // identifiers are case-insensitive: PRIMARY KEY(ID) aliases id
          if (c.name.equalsIgnoreCase(pk) &&
              c.declaredType.equalsIgnoreCase("INTEGER"))
            c.copy(rowidAlias = true)
          else c
        }
      case _ => cols
    }
    // the alias is only legal when exactly one column claims it
    val aliases = withTablePk.count(_.rowidAlias)
    val fixed =
      if (aliases == 1) withTablePk
      else withTablePk.map(_.copy(rowidAlias = false))
    val pk = if (tablePkCols.nonEmpty) tablePkCols else colPkName.toSeq
    (fixed, withoutRowid, pk)
  }

  private def takeIdentifier(s: String): (String, String) = {
    val t = s.trim
    if (t.isEmpty) return ("", "")
    t.charAt(0) match {
      case '"' | '`' | '\'' =>
        val q = t.charAt(0)
        val end = t.indexOf(q, 1)
        (t.substring(1, end), t.substring(end + 1))
      case '[' =>
        val end = t.indexOf(']', 1)
        (t.substring(1, end), t.substring(end + 1))
      case _ =>
        val end = t.indexWhere(c => c.isWhitespace || c == '(')
        if (end < 0) (t, "") else (t.substring(0, end), t.substring(end))
    }
  }

  private def tokenize(s: String): Seq[String] =
    s.split("""[\s(),]+""").toSeq.filter(_.nonEmpty)
}
