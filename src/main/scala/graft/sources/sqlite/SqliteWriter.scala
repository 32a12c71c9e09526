package graft.sources.sqlite

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Minimal SQLite 3 database file WRITER — enough of the published
  * format (sqlite.org/fileformat2) to materialize one rowid table:
  * header, sqlite_schema on page 1, and a table b-tree built bottom-up
  * (leaf pages packed in rowid order, interior levels added until one
  * root remains). Written files open in any stock `sqlite3` — the spec
  * round-trips one through Python's stdlib driver to prove it — and in
  * [[SqliteDataSource]], giving the engine a self-contained fixture
  * path and a genuine `.sqlite` export.
  *
  * Deliberate limits, enforced loudly: single table per file, UTF-8,
  * no indexes/views, and no overflow chains on WRITE (a record must
  * fit one leaf page locally; the READER follows overflow chains fine
  * — spill support here would only serve rows >~4 KB, which a fixture
  * writer does not need).
  */
object SqliteWriter {

  val PageSize = 4096
  private val UsableX = PageSize - 35 // max local payload, table leaf

  /** Write `rows` (values: null | Long | Double | String | Array[Byte])
    * as table `name` with the given column names/declared types.
    *
    * A column declared `INTEGER PRIMARY KEY` gets genuine rowid-alias
    * semantics: its value BECOMES the b-tree rowid and the record slot
    * is written NULL (what real SQLite stores) — rows must then arrive
    * in strictly increasing key order, loud otherwise. Without an
    * alias, rowids are 1..n in input order.
    *
    * `indexes` adds secondary CREATE INDEX b-trees — (index name,
    * column names). Each entry record is (indexed values..., rowid)
    * sorted by binary collation with rowid as the tiebreak, exactly
    * what stock SQLite stores, so the written file's indexes are
    * usable by real sqlite3 AND by [[SqliteDataSource]]'s
    * secondary-index scan. Indexed values buffer in memory (fixture
    * writer; the table itself still streams). */
  def write(path: Path, name: String, columns: Seq[(String, String)],
      rows: Iterator[Seq[Any]],
      indexes: Seq[(String, Seq[String])] = Seq.empty): Unit = {
    require(columns.nonEmpty, "need at least one column")
    val createSql = s"CREATE TABLE $name (${
      columns.map { case (n, t) => s"$n $t" }.mkString(", ")})"
    // the rowid alias requires the declared type to be EXACTLY
    // 'INTEGER' and no DESC on the column-level PK — `BIGINT PRIMARY
    // KEY` is an ordinary column in real SQLite, so writing NULL in its
    // record slot would make stock sqlite3 read it as all NULLs
    val aliasIdx = columns.indexWhere { case (_, t) =>
      val toks = t.trim.toUpperCase.split("""\s+""").toSeq
      toks.headOption.contains("INTEGER") &&
        toks.containsSlice(Seq("PRIMARY", "KEY")) &&
        !toks.containsSlice(Seq("PRIMARY", "KEY", "DESC"))
    }

    // secondary indexes: resolve columns once, buffer (values, rowid)
    // per index while the table records stream past
    val idxColIdxs: Seq[Seq[Int]] = indexes.map { case (iname, icols) =>
      require(icols.nonEmpty, s"index $iname needs at least one column")
      icols.map { cn =>
        val i = columns.indexWhere(_._1.equalsIgnoreCase(cn))
        require(i >= 0, s"index $iname references unknown column $cn")
        i
      }
    }
    val idxBufs = indexes.map(_ =>
      Vector.newBuilder[(Seq[Any], Long)])

    // 1. encode every row as a record payload
    var lastRowid = Long.MinValue
    val records = rows.zipWithIndex.map { case (vs, i) =>
      require(vs.length == columns.length,
        s"row ${i + 1} has ${vs.length} values, expected ${columns.length}")
      val rowid =
        if (aliasIdx < 0) i + 1L
        else vs(aliasIdx) match {
          case l: Long => l
          case n: Int => n.toLong
          case other => throw new IllegalArgumentException(
            s"INTEGER PRIMARY KEY value must be an integer, got $other")
        }
      require(rowid > lastRowid,
        s"rows must arrive in strictly increasing key order " +
          s"($rowid after $lastRowid)")
      lastRowid = rowid
      idxBufs.indices.foreach { k =>
        idxBufs(k) += ((idxColIdxs(k).map(vs), rowid))
      }
      val stored =
        if (aliasIdx < 0) vs else vs.updated(aliasIdx, null)
      (rowid, record(stored))
    }

    // 2. pack leaves, then interior levels bottom-up
    val leaves = packLeaves(records)
    require(leaves.nonEmpty, "empty tables still need one leaf")
    val tree = buildTree(leaves)
    val rootIdx = tree.size - 1 // root is last in build order

    // 2b. each index: sort entries by (values..., rowid) under binary
    // collation and bulk-load an index b-tree
    val idxTrees: Seq[(Vector[IndexNode], Int)] = indexes.indices.map { k =>
      val iname = indexes(k)._1
      val entries = idxBufs(k).result()
        .sortWith { case ((va, ra), (vb, rb)) =>
          compareKeys(va :+ ra, vb :+ rb) < 0 }
        .map { case (vals, rowid) =>
          val payload = record(vals :+ rowid)
          require(payload.length <= IndexX,
            s"index $iname entry ${payload.length} B exceeds the " +
              s"no-overflow index write limit ($IndexX B)")
          payload
        }
      buildIndexTree(entries.iterator)
    }

    // 3. page numbering: 1 = schema; table tree (root first, at page 2
    // for a stable layout); each index tree follows, root first
    val pageNoOf = new Array[Int](tree.size)
    val order = (tree.indices.filter(_ == rootIdx) ++
      tree.indices.filterNot(_ == rootIdx)).toArray
    order.zipWithIndex.foreach { case (treeIdx, slot) =>
      pageNoOf(treeIdx) = 2 + slot
    }
    var nextPage = 2 + tree.size
    val idxPageOf: Seq[Array[Int]] = idxTrees.map { case (nodes, root) =>
      val arr = new Array[Int](nodes.size)
      arr(root) = nextPage
      var p = nextPage + 1
      nodes.indices.filterNot(_ == root).foreach { i => arr(i) = p; p += 1 }
      nextPage = p
      arr
    }
    val pageCount = nextPage - 1

    val out = new Array[Byte](pageCount * PageSize)
    // 4. serialize tree pages with resolved child pointers
    tree.zipWithIndex.foreach { case (node, idx) =>
      val pg = node match {
        case Leaf(cells) => leafPage(cells, headerOff = 0)
        case Interior(kids) =>
          interiorPage(kids.map { case (childIdx, key) =>
            (pageNoOf(childIdx), key) }, headerOff = 0)
      }
      System.arraycopy(pg, 0, out, (pageNoOf(idx) - 1) * PageSize, PageSize)
    }
    idxTrees.zip(idxPageOf).foreach { case ((nodes, _), pageOf) =>
      nodes.zipWithIndex.foreach { case (node, idx) =>
        val pg = node match {
          case IndexLeaf(cells) => indexLeafPage(cells)
          case IndexInterior(cells, right) =>
            indexInteriorPage(cells.map { case (c, sep) =>
              (pageOf(c), sep) }, pageOf(right))
        }
        System.arraycopy(pg, 0, out, (pageOf(idx) - 1) * PageSize, PageSize)
      }
    }

    // 5. page 1: header + sqlite_schema leaf — the table row plus one
    // row per index (rootpage + canonical CREATE INDEX text)
    val schemaRows = (1L, record(Seq(
      "table", name, name, pageNoOf(rootIdx).toLong, createSql))) +:
      indexes.zipWithIndex.map { case ((iname, icols), k) =>
        val sql = s"CREATE INDEX $iname ON $name (${icols.mkString(", ")})"
        (k + 2L, record(Seq("index", iname, name,
          idxPageOf(k)(idxTrees(k)._2).toLong, sql)))
      }
    val p1 = leafPage(schemaRows, headerOff = 100)
    header(p1, pageCount)
    System.arraycopy(p1, 0, out, 0, PageSize)

    Files.write(path, out)
  }

  // ---------------------------------------------------------------
  // WITHOUT ROWID tables (index b-tree layout)

  /** Max local payload on an index page (no-overflow write limit). */
  private val IndexX = (PageSize - 12) * 64 / 255 - 23

  /** Write `rows` as a WITHOUT ROWID table: entries live in an index
    * b-tree whose key is the record itself with the PRIMARY KEY
    * columns FIRST (key order), then the rest in declared order. Rows
    * must arrive in strictly increasing PK order (binary collation:
    * numerics numerically, text bytewise, cross-class by storage
    * class) — loud otherwise. Index b-trees are b-trees, not
    * b+-trees: the bulk load PROMOTES one separator entry between
    * adjacent children into the parent, recursively. */
  def writeWithoutRowid(path: Path, name: String,
      columns: Seq[(String, String)], pkCols: Seq[String],
      rows: Iterator[Seq[Any]],
      indexes: Seq[(String, Seq[String])] = Seq.empty): Unit = {
    require(columns.nonEmpty, "need at least one column")
    require(pkCols.nonEmpty, "WITHOUT ROWID requires a PRIMARY KEY")
    val names = columns.map(_._1)
    val pkIdx = pkCols.map { n =>
      val i = names.indexWhere(_.equalsIgnoreCase(n))
      require(i >= 0, s"PRIMARY KEY column $n not among $names")
      i
    }
    val restIdx = names.indices.filterNot(pkIdx.contains)
    val createSql = s"CREATE TABLE $name (${
      columns.map { case (n, t) => s"$n $t" }.mkString(", ")}, PRIMARY KEY (${
      pkCols.mkString(", ")})) WITHOUT ROWID"

    // secondary indexes on a WITHOUT ROWID table: entry = indexed
    // columns then the PK columns not already indexed (the published
    // layout this reader's worowidEntryCols mirrors); entries sort by
    // the full entry tuple under binary collation
    val idxEntryIdxs: Seq[Seq[Int]] = indexes.map { case (iname, icols) =>
      val colIdx = icols.map { cn =>
        val i = names.indexWhere(_.equalsIgnoreCase(cn))
        require(i >= 0, s"index $iname references unknown column $cn")
        i
      }
      colIdx ++ pkIdx.filterNot(colIdx.contains)
    }
    val idxBufs = indexes.map(_ => Vector.newBuilder[Seq[Any]])

    var lastKey: Seq[Any] = null
    val entries = rows.zipWithIndex.map { case (vs, i) =>
      require(vs.length == columns.length,
        s"row ${i + 1} has ${vs.length} values, expected ${columns.length}")
      val key = pkIdx.map(vs)
      require(key.forall(_ != null),
        s"row ${i + 1}: PRIMARY KEY values must not be NULL")
      require(lastKey == null || compareKeys(lastKey, key) < 0,
        s"rows must arrive in strictly increasing PRIMARY KEY order " +
          s"(row ${i + 1})")
      lastKey = key
      idxBufs.indices.foreach(k => idxBufs(k) += idxEntryIdxs(k).map(vs))
      val payload = record(key ++ restIdx.map(vs))
      require(payload.length <= IndexX,
        s"row ${i + 1} payload ${payload.length} B exceeds the " +
          s"no-overflow index write limit ($IndexX B)")
      payload
    }

    val (tree, rootIdx) = buildIndexTree(entries)
    val idxTrees = indexes.indices.map { k =>
      val iname = indexes(k)._1
      val es = idxBufs(k).result()
        .sortWith((a, b) => compareKeys(a, b) < 0)
        .map { vals =>
          val payload = record(vals)
          require(payload.length <= IndexX,
            s"index $iname entry ${payload.length} B exceeds the " +
              s"no-overflow index write limit ($IndexX B)")
          payload
        }
      buildIndexTree(es.iterator)
    }
    val idxMeta = indexes.zip(idxTrees).map { case ((iname, icols), (n, r)) =>
      (iname, s"CREATE INDEX $iname ON $name (${icols.mkString(", ")})", n, r)
    }
    writeFile(path, name, createSql, tree, rootIdx, idxMeta)
  }

  /** Bulk-load an index b-tree from ORDERED entry payloads: leaves
    * packed with separator promotion (index b-trees are b-trees, not
    * b+-trees), interior levels grouped until one root remains.
    * Returns (nodes, root index within the vector). Shared by the
    * WITHOUT ROWID table writer and the CREATE INDEX writer. */
  private def buildIndexTree(
      entries: Iterator[Array[Byte]]): (Vector[IndexNode], Int) = {
    // bulk-load level 0: pack leaves; after each full leaf the NEXT
    // entry is promoted as the separator to the level above
    val nodes = Vector.newBuilder[IndexNode]
    var nodeCount = 0
    var children = Vector.newBuilder[Int]
    var seps = Vector.newBuilder[Array[Byte]] // sep i sits between child i and i+1
    var cur = Vector.newBuilder[Array[Byte]]
    var used = 0
    var curN = 0
    while (entries.hasNext) {
      val payload = entries.next()
      val cellLen = varint(payload.length).length + payload.length
      if (curN > 0 && used + cellLen + 2 > PageSize - 8) {
        if (entries.hasNext) {
          // close the leaf; THIS entry is promoted as the separator
          // between it and the next leaf (it lives in the parent only)
          nodes += IndexLeaf(cur.result())
          children += nodeCount
          nodeCount += 1
          cur = Vector.newBuilder; used = 0; curN = 0
          seps += payload
        } else {
          // the closing entry is the FINAL one: promoting it would
          // leave an empty trailing leaf — a page shape real SQLite
          // never writes (integrity_check flags it). Promote the
          // leaf's last in-page entry instead and start the new leaf
          // with this one; order is preserved (last < payload). The
          // leaf always holds >= 2 entries here: the no-overflow
          // write limit keeps every cell under ~1/4 page.
          val cells = cur.result()
          nodes += IndexLeaf(cells.init)
          children += nodeCount
          nodeCount += 1
          seps += cells.last
          cur = Vector.newBuilder; cur += payload
          used = cellLen + 2; curN = 1
        }
      } else {
        cur += payload; used += cellLen + 2; curN += 1
      }
    }
    nodes += IndexLeaf(cur.result()) // possibly empty (empty table)
    children += nodeCount
    nodeCount += 1

    // build interior levels: group children, promoting the separator
    // BETWEEN groups upward, until one root remains
    var levelKids = children.result()
    var levelSeps = seps.result()
    while (levelKids.size > 1) {
      val nextKids = Vector.newBuilder[Int]
      val nextSeps = Vector.newBuilder[Array[Byte]]
      var i = 0
      while (i < levelKids.size) {
        // take up to maxCells children for one page, bounded by bytes
        var cells = Vector.empty[(Int, Array[Byte])]
        var bytes = 0
        var last = levelKids(i)
        i += 1
        var full = false
        while (i < levelKids.size && !full) {
          val sep = levelSeps(i - 1)
          val cellLen = 4 + varint(sep.length).length + sep.length + 2
          if (bytes + cellLen > PageSize - 12 - 64) full = true
          else {
            cells :+= ((last, sep))
            bytes += cellLen
            last = levelKids(i)
            i += 1
          }
        }
        if (full && i == levelKids.size - 1) {
          // exactly one child remains: emitting it alone would make a
          // zero-cell interior page (right-pointer only) — a shape
          // real SQLite never writes. Donate this page's last cell to
          // the trailing page instead: P' keeps cells.init with the
          // donated child as its right pointer, the donated separator
          // moves up, and the trailing page gets (last, sep, lastKid).
          // A byte-full page always holds >= 3 cells (each is under
          // ~1/4 page), so cells.init is never empty.
          val (donChild, donSep) = cells.last
          nodes += IndexInterior(cells.init, donChild)
          nextKids += nodeCount
          nodeCount += 1
          nextSeps += donSep
          nodes += IndexInterior(Vector((last, levelSeps(i - 1))),
            levelKids(i))
          i += 1
          nextKids += nodeCount
          nodeCount += 1
        } else {
          nodes += IndexInterior(cells, last)
          nextKids += nodeCount
          nodeCount += 1
          if (i < levelKids.size) {
            // separator between this page and the next goes up a level
            nextSeps += levelSeps(i - 1)
            // the child after that separator starts the next page
          }
        }
      }
      // one subtlety: when a page closed exactly at a group boundary,
      // the separator consumed above (levelSeps(i-1)) belongs to the
      // parent level — handled by nextSeps aligning with nextKids
      levelKids = nextKids.result()
      levelSeps = nextSeps.result()
    }

    (nodes.result(), levelKids.head)
  }

  /** Binary-collation key compare: storage-class order (numeric <
    * text < blob), numerics numerically, text/blob bytewise. */
  private def compareKeys(a: Seq[Any], b: Seq[Any]): Int = {
    def cls(v: Any): Int = v match {
      case null => -1 // NULL sorts before every storage class
      case _: Long | _: Int | _: Double | _: Float => 0
      case _: String => 1
      case _: Array[Byte] => 2
      case other => throw new IllegalArgumentException(
        s"unsupported key type ${other.getClass.getName}")
    }
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    def num(v: Any): Double = v match {
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: Double => d
      case f: Float => f.toDouble
      case _ => 0.0
    }
    def bytes(v: Any): Array[Byte] = v match {
      case s: String => s.getBytes(StandardCharsets.UTF_8)
      case b: Array[Byte] => b
      case _ => Array.empty
    }
    a.zip(b).foreach { case (x, y) =>
      val c = Integer.compare(cls(x), cls(y))
      if (c != 0) return c
      val v = cls(x) match {
        case 0 => (asLong(x), asLong(y)) match {
          // pure-integer pairs compare exactly: 2^53 and 2^53 + 1 are
          // the same Double but different keys
          case (Some(a), Some(b)) => java.lang.Long.compare(a, b)
          case _ => java.lang.Double.compare(num(x), num(y))
        }
        case _ => java.util.Arrays.compareUnsigned(bytes(x), bytes(y))
      }
      if (v != 0) return v
    }
    Integer.compare(a.length, b.length)
  }

  private sealed trait IndexNode
  private final case class IndexLeaf(cells: Seq[Array[Byte]]) extends IndexNode
  /** cells = (child tree-index, separator record); `rightMost` is the
    * final child tree-index. */
  private final case class IndexInterior(cells: Seq[(Int, Array[Byte])],
      rightMost: Int) extends IndexNode

  /** Serialize an index-node tree (children before parents, root =
    * `rootIdx`) plus the one-table schema page, then write the file. */
  private def writeFile(path: Path, name: String, createSql: String,
      tree: Vector[IndexNode], rootIdx: Int,
      idx: Seq[(String, String, Vector[IndexNode], Int)] = Seq.empty)
      : Unit = {
    val order = (tree.indices.filter(_ == rootIdx) ++
      tree.indices.filterNot(_ == rootIdx)).toArray
    val pageNoOf = new Array[Int](tree.size)
    order.zipWithIndex.foreach { case (treeIdx, slot) =>
      pageNoOf(treeIdx) = 2 + slot
    }
    // each secondary index tree follows the table tree, root first
    var nextPage = 2 + tree.size
    val idxPageOf: Seq[Array[Int]] = idx.map { case (_, _, nodes, root) =>
      val arr = new Array[Int](nodes.size)
      arr(root) = nextPage
      var p = nextPage + 1
      nodes.indices.filterNot(_ == root).foreach { i => arr(i) = p; p += 1 }
      nextPage = p
      arr
    }
    val pageCount = nextPage - 1
    val out = new Array[Byte](pageCount * PageSize)
    def blit(nodes: Vector[IndexNode], pageOf: Array[Int]): Unit =
      nodes.zipWithIndex.foreach { case (node, i) =>
        val pg = node match {
          case IndexLeaf(cells) => indexLeafPage(cells)
          case IndexInterior(cells, right) =>
            indexInteriorPage(cells.map { case (c, sep) =>
              (pageOf(c), sep) }, pageOf(right))
        }
        System.arraycopy(pg, 0, out, (pageOf(i) - 1) * PageSize, PageSize)
      }
    blit(tree, pageNoOf)
    idx.zip(idxPageOf).foreach { case ((_, _, nodes, _), pageOf) =>
      blit(nodes, pageOf) }
    val schemaRows = (1L, record(Seq(
      "table", name, name, pageNoOf(rootIdx).toLong, createSql))) +:
      idx.zipWithIndex.map { case ((iname, isql, _, root), k) =>
        (k + 2L, record(Seq("index", iname, name,
          idxPageOf(k)(root).toLong, isql)))
      }
    val p1 = leafPage(schemaRows, headerOff = 100)
    header(p1, pageCount)
    System.arraycopy(p1, 0, out, 0, PageSize)
    Files.write(path, out)
  }

  private def indexLeafPage(cells: Seq[Array[Byte]]): Array[Byte] = {
    val pg = new Array[Byte](PageSize)
    pg(0) = 0x0a
    putBe16(pg, 3, cells.size)
    var content = PageSize
    val ptrs = cells.map { payload =>
      val cell = varint(payload.length) ++ payload
      content -= cell.length
      System.arraycopy(cell, 0, pg, content, cell.length)
      content
    }
    putBe16(pg, 5, if (content == 65536) 0 else content)
    var p = 8
    ptrs.foreach { off => putBe16(pg, p, off); p += 2 }
    require(p <= content, "index leaf overflow — packing budget bug")
    pg
  }

  private def indexInteriorPage(cells: Seq[(Int, Array[Byte])],
      rightMost: Int): Array[Byte] = {
    val pg = new Array[Byte](PageSize)
    pg(0) = 0x02
    putBe16(pg, 3, cells.size)
    putBe32(pg, 8, rightMost)
    var content = PageSize
    val ptrs = cells.map { case (child, payload) =>
      val cell = beInt(child) ++ varint(payload.length) ++ payload
      content -= cell.length
      System.arraycopy(cell, 0, pg, content, cell.length)
      content
    }
    putBe16(pg, 5, if (content == 65536) 0 else content)
    var p = 12
    ptrs.foreach { off => putBe16(pg, p, off); p += 2 }
    require(p <= content, "index interior overflow — grouping budget bug")
    pg
  }

  // ---------------------------------------------------------------

  private sealed trait Node
  private final case class Leaf(cells: Seq[(Long, Array[Byte])]) extends Node
  /** children as (tree index, max rowid key); the LAST child is the
    * rightmost pointer. */
  private final case class Interior(kids: Seq[(Int, Long)]) extends Node

  /** Pack records into leaves: cell = varint(payload len) +
    * varint(rowid) + payload; page budget = PageSize - 8 (header) -
    * 2/cell (pointer array). */
  private def packLeaves(records: Iterator[(Long, Array[Byte])])
      : Vector[Leaf] = {
    val leaves = Vector.newBuilder[Leaf]
    var cur = Vector.newBuilder[(Long, Array[Byte])]
    var used = 0
    var n = 0
    records.foreach { case (rowid, payload) =>
      require(payload.length <= UsableX,
        s"row $rowid payload ${payload.length} B exceeds the no-overflow " +
          s"write limit ($UsableX B) — this writer does not spill")
      val cell = varint(payload.length) ++ varint(rowid) ++ payload
      if (n > 0 && used + cell.length + 2 > PageSize - 8) {
        leaves += Leaf(cur.result()); cur = Vector.newBuilder; used = 0; n = 0
      }
      cur += ((rowid, payload)); used += cell.length + 2; n += 1
    }
    val last = cur.result()
    if (last.nonEmpty || n == 0) leaves += Leaf(last)
    val all = leaves.result()
    if (all.isEmpty) Vector(Leaf(Nil)) else all
  }

  /** Bottom-up: returns all nodes, children before parents, root last.
    * Interior fan-out is bounded by cell size (~13 B) — one level
    * handles thousands of leaves, but the loop recurses until a single
    * root remains so arbitrarily large fixtures stay correct. */
  private def buildTree(leaves: Vector[Leaf]): Vector[Node] = {
    val nodes = Vector.newBuilder[Node]
    nodes ++= leaves
    var level: Vector[(Int, Long)] = leaves.zipWithIndex.map {
      case (l, i) => (i, l.cells.lastOption.map(_._1).getOrElse(0L))
    }
    var nextIdx = leaves.size
    while (level.size > 1) {
      // interior page budget: 12-byte header + per cell (2 ptr + 4
      // child + ≤9 key) ⇒ ~270 kids/page; group accordingly
      val maxKids = (PageSize - 12) / 15
      val parents = level.grouped(maxKids).toVector
      level = parents.map { kids =>
        nodes += Interior(kids)
        val idx = nextIdx
        nextIdx += 1
        (idx, kids.last._2)
      }
    }
    nodes.result()
  }

  private def leafPage(cells: Seq[(Long, Array[Byte])],
      headerOff: Int): Array[Byte] = {
    val pg = new Array[Byte](PageSize)
    pg(headerOff) = 0x0d
    putBe16(pg, headerOff + 3, cells.size)
    var content = PageSize
    val ptrs = cells.map { case (rowid, payload) =>
      val cell = varint(payload.length) ++ varint(rowid) ++ payload
      content -= cell.length
      System.arraycopy(cell, 0, pg, content, cell.length)
      content
    }
    putBe16(pg, headerOff + 5, if (content == 65536) 0 else content)
    var p = headerOff + 8
    ptrs.foreach { off => putBe16(pg, p, off); p += 2 }
    require(p <= content, "leaf page overflow — packLeaves budget bug")
    pg
  }

  private def interiorPage(kids: Seq[(Int, Long)],
      headerOff: Int): Array[Byte] = {
    val pg = new Array[Byte](PageSize)
    pg(headerOff) = 0x05
    val cells = kids.dropRight(1)
    putBe16(pg, headerOff + 3, cells.size)
    putBe32(pg, headerOff + 8, kids.last._1)
    var content = PageSize
    val ptrs = cells.map { case (child, key) =>
      val cell = beInt(child) ++ varint(key)
      content -= cell.length
      System.arraycopy(cell, 0, pg, content, cell.length)
      content
    }
    putBe16(pg, headerOff + 5, if (content == 65536) 0 else content)
    var p = headerOff + 12
    ptrs.foreach { off => putBe16(pg, p, off); p += 2 }
    require(p <= content, "interior page overflow — buildTree budget bug")
    pg
  }

  private def header(p1: Array[Byte], pageCount: Int): Unit = {
    val magic = "SQLite format 3".getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(magic, 0, p1, 0, magic.length)
    p1(15) = 0
    putBe16(p1, 16, PageSize)
    p1(18) = 1; p1(19) = 1 // legacy journal read/write versions
    p1(20) = 0 // reserved bytes
    p1(21) = 64; p1(22) = 32; p1(23) = 32 // payload fractions (fixed)
    putBe32(p1, 24, 1) // file change counter
    putBe32(p1, 28, pageCount)
    putBe32(p1, 40, 1) // schema cookie
    putBe32(p1, 44, 4) // schema format
    putBe32(p1, 48, 0) // default cache size
    putBe32(p1, 56, 1) // UTF-8
    putBe32(p1, 92, 1) // version-valid-for = change counter
    putBe32(p1, 96, 3049000) // a plausible library version number
  }

  /** Record format: header of serial-type varints, then values.
    * Integers use the smallest serial type that holds them (incl. the
    * 0/1 constants); REAL is type 7; TEXT/BLOB length-coded. */
  def record(values: Seq[Any]): Array[Byte] = {
    val bodies = values.map {
      case null => (0L, Array.empty[Byte])
      case l: Long => intBody(l)
      case i: Int => intBody(i.toLong)
      case s: Short => intBody(s.toLong)
      case b: Byte => intBody(b.toLong)
      case b: Boolean => intBody(if (b) 1L else 0L)
      case d: Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        (7L, (0 until 8).map(i => ((bits >>> (56 - 8 * i)) & 0xff).toByte)
          .toArray)
      case f: Float =>
        val bits = java.lang.Double.doubleToLongBits(f.toDouble)
        (7L, (0 until 8).map(i => ((bits >>> (56 - 8 * i)) & 0xff).toByte)
          .toArray)
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        (13L + 2 * b.length, b)
      case b: Array[Byte] => (12L + 2 * b.length, b)
      case other => throw new IllegalArgumentException(
        s"unsupported value type ${other.getClass.getName}")
    }
    val typesPart = bodies.flatMap(b => varint(b._1)).toArray
    // header length includes its own varint: find the fixed point
    // hlen = len(varint(hlen)) + len(types) — converges in ≤2 steps
    var hlen = typesPart.length + 1
    while (varint(hlen).length + typesPart.length != hlen)
      hlen = varint(hlen).length + typesPart.length
    val out = new ByteArrayOutputStream()
    out.write(varint(hlen))
    out.write(typesPart)
    bodies.foreach(b => out.write(b._2))
    out.toByteArray
  }

  private def intBody(v: Long): (Long, Array[Byte]) = v match {
    case 0L => (8L, Array.empty[Byte])
    case 1L => (9L, Array.empty[Byte])
    case _ =>
      val width =
        if (v >= Byte.MinValue && v <= Byte.MaxValue) 1
        else if (v >= Short.MinValue && v <= Short.MaxValue) 2
        else if (v >= -(1L << 23) && v < (1L << 23)) 3
        else if (v >= Int.MinValue && v <= Int.MaxValue) 4
        else if (v >= -(1L << 47) && v < (1L << 47)) 6
        else 8
      val st = width match {
        case 1 => 1L; case 2 => 2L; case 3 => 3L
        case 4 => 4L; case 6 => 5L; case _ => 6L
      }
      (st, (0 until width).map(i =>
        ((v >>> (8 * (width - 1 - i))) & 0xff).toByte).toArray)
  }

  /** SQLite varint encode (big-endian base-128, ≤9 bytes). */
  def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v < 128) return Array(v.toByte)
    // values with any of the top 8 bits set need the full 9-byte form
    // (byte 9 carries all 8 low bits)
    if ((v & 0xff00000000000000L) != 0) {
      val out = new Array[Byte](9)
      var x = v >>> 8
      var i = 7
      out(8) = (v & 0xff).toByte
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      return out
    }
    val buf = new Array[Byte](9)
    var n = 0
    var x = v
    while (x != 0 || n == 0) {
      buf(n) = (x & 0x7f).toByte
      x >>>= 7
      n += 1
    }
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = (buf(n - 1 - i) | (if (i < n - 1) 0x80 else 0)).toByte
      i += 1
    }
    out
  }

  private def beInt(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def putBe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 8) & 0xff).toByte; b(off + 1) = (v & 0xff).toByte
  }
  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }
}
