package graft.sources.sqlite

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader over a SQLite database FILE — `type: sqlite` in
  * sources.yaml becomes first-class here instead of the jar-blocked
  * generic-jdbc path (reference
  * crates/connectors/src/sources/sql/sqlite.rs:30-195 registers the
  * file's tables through a driver pool; this is the same user surface
  * re-expressed as a clean-room format reader, see [[SqliteFile]]).
  *
  * Options:
  *   path    the .sqlite/.db file (local or shared filesystem)
  *   table   table name inside the database
  *
  * Pushdown:
  *   - columns: only requested columns are DECODED from each record —
  *     the serial-type header lets unreferenced values be skipped by
  *     width without materializing.
  *   - filters on the INTEGER PRIMARY KEY (rowid alias): =, <, <=, >,
  *     >= prune the b-tree descent by interior keys — EXACT pushdown,
  *     page reads proportional to the selected range.
  *   - WITHOUT ROWID tables: the same range filters on the LEADING
  *     integer-affine PRIMARY KEY column prune the index descent by
  *     the interior entries' leading key — INEXACT pushdown (flexible
  *     typing; Spark re-evaluates), same page-read proportionality.
  *   - secondary CREATE INDEX b-trees (rowid tables): range/equality
  *     on an integer-affine leading column, or range/equality/PREFIX
  *     on a BINARY-collated text-affine one, plan an index-descent
  *     scan — covering projections decode from the entries, others
  *     point-look the rowid back into the table b-tree. INEXACT, with
  *     class-safe band pruning (see [[SqliteFile.KeyRange]]).
  *
  * Scale: partitions = the root page's child subtrees (disjoint rowid
  * ranges) or index root slices, so a large file scans in parallel;
  * with a pushed range, subtrees outside it are planned away entirely.
  */
class SqliteDataSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = SqliteOptions(options.asCaseSensitiveMap().asScala.toMap)
    val db = new SqliteFile.Db(opts.path)
    try SqliteDataSource.sparkSchema(SqliteFile.table(db, opts.table))
    finally db.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SqliteTable(schema, SqliteOptions(properties.asScala.toMap))
}

object SqliteDataSource {
  /** Affinity → Spark type. NUMERIC maps to DOUBLE (SQLite's flexible
    * typing can store either ints or reals there; DOUBLE holds both —
    * declare the column INTEGER/BIGINT when exact 64-bit range
    * matters). */
  def sparkType(affinity: String): DataType = affinity match {
    case "INTEGER" => LongType
    case "TEXT" => StringType
    case "REAL" | "NUMERIC" => DoubleType
    case _ => BinaryType
  }

  def sparkSchema(t: SqliteFile.TableDef): StructType = {
    if (t.withoutRowid) require(t.pkCols.nonEmpty,
      s"table ${t.name} is WITHOUT ROWID but its PRIMARY KEY could " +
        "not be recovered from the CREATE TABLE — refusing rather " +
        "than guessing the on-disk column order")
    val pk = t.pkCols.map(_.toLowerCase).toSet
    StructType(t.columns.map(c =>
      StructField(c.name, sparkType(c.affinity),
        // the rowid alias and WITHOUT ROWID key columns are NOT NULL
        nullable = !c.rowidAlias &&
          !(t.withoutRowid && pk(c.name.toLowerCase)))))
  }

  /** Entry-record column order of a secondary index on a WITHOUT
    * ROWID table: the indexed columns (index order), then the PRIMARY
    * KEY columns (key order) that are not already indexed — the
    * published index-entry layout. */
  def worowidEntryCols(t: SqliteFile.TableDef,
      ix: SqliteFile.IndexDef): Seq[String] =
    ix.columns.map(_._1) ++ t.pkCols.filterNot(pk =>
      ix.columns.exists(_._1.equalsIgnoreCase(pk)))

  /** WITHOUT ROWID PK-tuple lookback soundness: every PK part must
    * order by [[SqliteFile.compareValues]]'s BINARY comparison, so any
    * part whose effective collation is non-BINARY (declared on the
    * column OR inside the table-level PK clause) disables the lookback
    * — its stored order diverges from the comparator and the descent
    * would miss rows. Applied to every part regardless of affinity:
    * flexible typing lets any column store TEXT, and stored TEXT
    * orders by the collation. */
  def worowidLookbackCapable(t: SqliteFile.TableDef): Boolean =
    t.withoutRowid && t.pkCols.nonEmpty &&
      t.pkCols.zipWithIndex.forall { case (n, i) =>
        t.columns.find(_.name.equalsIgnoreCase(n)).exists(c =>
          !c.collated && !t.pkCollated.lift(i).contains(true))
      }

  /** Record position → declared column, for a WITHOUT ROWID table:
    * on disk the PRIMARY KEY columns come FIRST (in key order), then
    * the remaining columns in declared order. */
  def indexRecordOrder(t: SqliteFile.TableDef): Seq[SqliteFile.ColumnDef] = {
    val byName = t.columns.map(c => c.name.toLowerCase -> c).toMap
    val pk = t.pkCols.map(n => byName.getOrElse(n.toLowerCase,
      throw new IllegalStateException(
        s"PRIMARY KEY column $n not among ${t.name}'s columns")))
    val pkSet = t.pkCols.map(_.toLowerCase).toSet
    pk ++ t.columns.filterNot(c => pkSet(c.name.toLowerCase))
  }
}

final case class SqliteOptions(path: String, table: String)

object SqliteOptions {
  def apply(m: Map[String, String]): SqliteOptions = {
    def req(k: String): String =
      m.getOrElse(k, m.getOrElse(k.toLowerCase,
        throw new IllegalArgumentException(s"sqlite source needs '$k'")))
    SqliteOptions(req("path"), req("table"))
  }
}

final class SqliteTable(schema: StructType, opts: SqliteOptions)
    extends Table with SupportsRead {
  override def name(): String = s"${opts.path}#${opts.table}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SqliteScanBuilder(schema, opts)
}

final class SqliteScanBuilder(fullSchema: StructType, opts: SqliteOptions)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  // resolved once at planning: which column (if any) aliases the rowid,
  // plus the table's usable CREATE INDEX b-trees. On a rowid table the
  // index entry's trailing rowid keys a lookback; on a WITHOUT ROWID
  // table the entry carries indexed + PRIMARY KEY columns — covering
  // projections decode in place, anything else drives a PK-tuple
  // descent of the table's index b-tree (requires BINARY-ordered PK
  // parts; see SqliteDataSource.worowidLookbackCapable)
  private lazy val (tableDef: SqliteFile.TableDef,
      tableIndexes: Seq[SqliteFile.IndexDef]) = {
    val db = new SqliteFile.Db(opts.path)
    try {
      val t = SqliteFile.table(db, opts.table)
      (t, SqliteFile.indexes(db, opts.table))
    } finally db.close()
  }
  private def rowidCol: Option[String] =
    tableDef.columns.find(_.rowidAlias).map(_.name)

  /** WITHOUT ROWID: the LEADING PRIMARY KEY column, when integer-
    * affine or BINARY-collated text-affine — range (and, for text,
    * prefix) filters on it prune the index descent (INEXACTLY:
    * flexible typing could store other classes, so Spark re-evaluates;
    * the pruning is still page-read-proportional). */
  private def pkPrefixCol: Option[SqliteFile.ColumnDef] =
    if (!tableDef.withoutRowid ||
        tableDef.pkDesc.headOption.contains(true)) None
    // a DESC leading key stores the index in REVERSE order — the
    // ascending band pruning would drop the WRONG subtrees, so the
    // pushdown stays off (set semantics remain correct: no pruning)
    else tableDef.pkCols.headOption.flatMap(n =>
      tableDef.columns.find(_.name.equalsIgnoreCase(n)))
      .filter(c => c.affinity == "INTEGER" ||
        // the key's EFFECTIVE collation: the column definition's
        // COLLATE or a table-level `PRIMARY KEY (k COLLATE …)` — a
        // NOCASE-ordered PK index diverges from byte order, so text
        // band pruning would silently drop matching rows
        (c.affinity == "TEXT" && !c.collated &&
          !tableDef.pkCollated.headOption.contains(true)))

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  private var chosenIndex: Option[SqliteFile.IndexDef] = None
  private var chosenTextRange: Option[SqliteFile.TextRange] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushedCandidates = filters
    val rid = rowidCol
    val prefix = pkPrefixCol
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    // `strict`: adjust > / < bounds by ±1 — valid ONLY on the exact
    // all-integer rowid path. The WITHOUT ROWID prefix path keeps the
    // raw bound INCLUSIVE: flexible typing can store 9.5 in an
    // integer-affine key, and `pk < 10` → hi = 9 would prune it away
    // before Spark's residual filter ever sees it; hi = 10 keeps the
    // boundary band and the residual filter discards 10 itself.
    def collectRange(key: Option[String], strict: Boolean): Array[Filter] =
      filters.filter {
        case EqualTo(c, v) if key.contains(c) && asLong(v).isDefined =>
          val x = asLong(v).get; lo = math.max(lo, x); hi = math.min(hi, x)
          true
        case GreaterThan(c, v) if key.contains(c) && asLong(v).isDefined &&
            (!strict || asLong(v).get != Long.MaxValue) =>
          // strict `> MaxValue` is not collected: `+ 1` would wrap to
          // MinValue and the exact pushdown would admit EVERY row
          lo = math.max(lo, asLong(v).get + (if (strict) 1 else 0)); true
        case GreaterThanOrEqual(c, v)
            if key.contains(c) && asLong(v).isDefined =>
          lo = math.max(lo, asLong(v).get); true
        case LessThan(c, v) if key.contains(c) && asLong(v).isDefined &&
            (!strict || asLong(v).get != Long.MinValue) =>
          // mirror: strict `< MinValue` would wrap `- 1` to MaxValue
          hi = math.min(hi, asLong(v).get - (if (strict) 1 else 0)); true
        case LessThanOrEqual(c, v) if key.contains(c) && asLong(v).isDefined =>
          hi = math.min(hi, asLong(v).get); true
        // IN-list: the covering [min, max] range — INEXACT paths only
        // (the exact rowid walk would over-admit the gaps)
        case In(c, vs) if !strict && key.contains(c) && vs.nonEmpty &&
            vs.forall(v => asLong(v).isDefined) =>
          val ls = vs.map(v => asLong(v).get)
          lo = math.max(lo, ls.min); hi = math.min(hi, ls.max); true
        case IsNotNull(c) if key.contains(c) => true // keys are never null
        case _ => false
      }
    if (rid.isDefined) {
      val accepted = collectRange(rid, strict = true)
      if (accepted.nonEmpty || tableIndexes.isEmpty) {
        pushed = accepted
        // rowid-range pushdown is EXACT (the b-tree walk admits exactly
        // [lo, hi]), so accepted filters need no re-evaluation in Spark
        return filters.filterNot(accepted.contains)
      }
      // no rowid filter matched — fall through to the secondary-index
      // path below (lo/hi untouched when nothing was collected)
    }
    prefix match {
      case Some(cd) =>
        // PK-prefix pruning is INEXACT (SQLite's flexible typing can
        // store other classes in the key): report the range as pushed
        // so the plan shows the pruning, but leave EVERY filter
        // residual for Spark to re-evaluate. When no filter bounds the
        // leading PK, fall through — a covering secondary index may
        // still serve the query.
        if (cd.affinity == "INTEGER") {
          val accepted = collectRange(Some(cd.name), strict = false)
          if (lo != Long.MinValue || hi != Long.MaxValue) {
            pushed = accepted
            return filters
          }
        } else collectTextRange(cd.name) match {
          case Some((accepted, r)) =>
            pushed = accepted
            chosenTextRange = Some(r)
            return filters
          case None => ()
        }
      case None => ()
    }
    // secondary CREATE INDEX scan: pick the first declared usable
    // index — ascending, non-partial, non-expression, leading column
    // either integer-affine or BINARY-collated text-affine — that a
    // pushed range/equality/prefix actually BOUNDS (an index with no
    // usable bound would scan every entry and pay a lookback per row —
    // worse than the table scan). On a WITHOUT ROWID table the
    // candidate survives if build() finds the projection COVERED by
    // (indexed + PK) columns, or the PK tuple is BINARY-ordered so the
    // entry's trailing tuple can key a PK-index descent (the rowid
    // lookback's twin). Same INEXACT stance as the PK-prefix path:
    // the range prunes the index descent (bands of the leading entry
    // value), and every filter stays residual for Spark.
    val byName = tableDef.columns.map(c => c.name.toLowerCase -> c).toMap
    val usable = tableIndexes.filter { ix =>
      !ix.partial && !ix.expression && ix.columns.nonEmpty &&
        !ix.columns.head._2 // DESC leading key stores in reverse
    }
    val it = usable.iterator
    while (chosenIndex.isEmpty && it.hasNext) {
      val ix = it.next()
      byName.get(ix.columns.head._1.toLowerCase).foreach { cd =>
        if (cd.affinity == "INTEGER") {
          val accepted = collectRange(Some(cd.name), strict = false)
          if (lo != Long.MinValue || hi != Long.MaxValue) {
            pushed = accepted
            chosenIndex = Some(ix)
          }
        } else if (cd.affinity == "TEXT" && !cd.collated &&
            !ix.leadingCollated) {
          // byte-order pruning is only sound under BINARY collation —
          // a NOCASE/RTRIM column's index order diverges from it
          collectTextRange(cd.name) match {
            case Some((accepted, range)) =>
              pushed = accepted
              chosenTextRange = Some(range)
              chosenIndex = Some(ix)
            case None => ()
          }
        }
      }
    }
    filters
  }

  /** Intersect the string filters on `key` into a BINARY-collation
    * [lo, hi] byte range (prefix → [p, nextPrefix(p))); None when no
    * filter actually bounds the key. Strict < / > bounds stay
    * INCLUSIVE — consistent with Spark's own binary UTF8String
    * ordering, the residual filter discards the boundary. */
  private def collectTextRange(key: String)
      : Option[(Array[Filter], SqliteFile.TextRange)] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    var tLo: Option[Array[Byte]] = None
    var tHi: Option[Array[Byte]] = None
    var hiEx = false
    def cmp(a: Array[Byte], b: Array[Byte]): Int =
      java.util.Arrays.compareUnsigned(a, b)
    def raiseLo(b: Array[Byte]): Unit =
      if (tLo.forall(l => cmp(b, l) > 0)) tLo = Some(b)
    def lowerHi(b: Array[Byte], ex: Boolean): Unit = tHi match {
      case None => tHi = Some(b); hiEx = ex
      case Some(h) =>
        val c = cmp(b, h)
        if (c < 0) { tHi = Some(b); hiEx = ex }
        else if (c == 0 && ex) hiEx = true
    }
    // smallest byte string strictly above every string with prefix p:
    // rightmost non-0xFF byte incremented, tail dropped; None when all
    // 0xFF (no upper bound — the prefix keeps only the lower one)
    def nextPrefix(p: Array[Byte]): Option[Array[Byte]] = {
      var i = p.length - 1
      while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
      if (i < 0) None
      else {
        val out = java.util.Arrays.copyOf(p, i + 1)
        out(i) = (out(i) + 1).toByte
        Some(out)
      }
    }
    val accepted = pushedCandidates.filter {
      case EqualTo(c, v: String) if c.equalsIgnoreCase(key) =>
        raiseLo(v.getBytes(utf8)); lowerHi(v.getBytes(utf8), ex = false); true
      case GreaterThan(c, v: String) if c.equalsIgnoreCase(key) =>
        raiseLo(v.getBytes(utf8)); true
      case GreaterThanOrEqual(c, v: String) if c.equalsIgnoreCase(key) =>
        raiseLo(v.getBytes(utf8)); true
      case LessThan(c, v: String) if c.equalsIgnoreCase(key) =>
        lowerHi(v.getBytes(utf8), ex = false); true
      case LessThanOrEqual(c, v: String) if c.equalsIgnoreCase(key) =>
        lowerHi(v.getBytes(utf8), ex = false); true
      case org.apache.spark.sql.sources.StringStartsWith(c, p)
          if c.equalsIgnoreCase(key) =>
        raiseLo(p.getBytes(utf8))
        nextPrefix(p.getBytes(utf8)).foreach(lowerHi(_, ex = true))
        true
      case In(c, vs) if c.equalsIgnoreCase(key) && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[String]) =>
        val bs = vs.map(_.asInstanceOf[String].getBytes(utf8))
        raiseLo(bs.minBy(identity)(
          (a: Array[Byte], b: Array[Byte]) =>
            java.util.Arrays.compareUnsigned(a, b)))
        lowerHi(bs.maxBy(identity)(
          (a: Array[Byte], b: Array[Byte]) =>
            java.util.Arrays.compareUnsigned(a, b)), ex = false)
        true
      case IsNotNull(c) if c.equalsIgnoreCase(key) => true
      case _ => false
    }
    if (tLo.isEmpty && tHi.isEmpty) None
    else Some((accepted, SqliteFile.TextRange(tLo, tHi, hiEx)))
  }

  // the filter array of the in-flight pushFilters call, for
  // collectTextRange (set before the secondary-index selection runs)
  private var pushedCandidates: Array[Filter] = Array.empty
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // a WITHOUT ROWID candidate survives when the projection is covered
    // by its entry columns (indexed + PK) OR the entry's trailing PK
    // tuple can key a point descent of the table's PK index (the
    // rowid-lookback twin — requires BINARY-ordered PK parts); a
    // dropped candidate takes its collected range with it — that range
    // bounds the INDEX column, not the PK, and must never leak into
    // the PK-prefix scan
    val keepIndex = chosenIndex.filter { ix =>
      !tableDef.withoutRowid || {
        val cols = SqliteDataSource.worowidEntryCols(tableDef, ix)
          .map(_.toLowerCase).toSet
        required.fieldNames.forall(f => cols(f.toLowerCase))
      } || SqliteDataSource.worowidLookbackCapable(tableDef)
    }
    val pushedRange: Option[SqliteFile.KeyRange] =
      if (keepIndex.isDefined)
        Some(chosenTextRange.getOrElse(SqliteFile.NumRange(lo, hi)))
      else if (chosenIndex.isDefined) None
      else if (pkPrefixCol.isDefined)
        Some(chosenTextRange.getOrElse(SqliteFile.NumRange(lo, hi)))
      else None
    new SqliteScan(required, opts, tableDef, lo, hi, keepIndex, pushedRange)
  }
}

final class SqliteScan(schema: StructType, opts: SqliteOptions,
    t: SqliteFile.TableDef, lo: Long, hi: Long,
    secIndex: Option[SqliteFile.IndexDef] = None,
    pushedRange: Option[SqliteFile.KeyRange] = None) extends Scan with Batch {

  private def indexRange: SqliteFile.KeyRange =
    pushedRange.getOrElse(
      SqliteFile.NumRange(Long.MinValue, Long.MaxValue))
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Covering when every required column rides in the index entry:
    * indexed columns plus, on a rowid table, the rowid alias (the
    * entry's last slot) or, on a WITHOUT ROWID table, the PRIMARY KEY
    * columns — then the table/PK b-tree is never touched. */
  private def covering(ix: SqliteFile.IndexDef): Boolean = {
    val inEntry =
      if (t.withoutRowid)
        SqliteDataSource.worowidEntryCols(t, ix).map(_.toLowerCase).toSet
      else ix.columns.map(_._1.toLowerCase).toSet ++
        t.columns.find(_.rowidAlias).map(_.name.toLowerCase)
    schema.fieldNames.forall(f => inEntry(f.toLowerCase))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (lo > hi) return Array.empty
    val db = new SqliteFile.Db(opts.path)
    try {
      secIndex match {
        case Some(ix) =>
          // secondary-index descent: partitions are the index root's
          // slices, pruned by the leading entry-value bands — the same
          // parallel shape as the WITHOUT ROWID path
          val range = indexRange
          if (range.isEmpty) return Array.empty
          return (SqliteFile.indexRoot(db, ix.rootPage) match {
            case None =>
              Array(SqliteSecIndexPartition(opts, ix.rootPage, -1, range))
            case Some(firsts) =>
              val cells = firsts.size
              (0 to cells).flatMap { i =>
                val prev = if (i == 0) None else Some(firsts(i - 1))
                val cur = if (i < cells) Some(firsts(i)) else None
                if (range.mayOverlap(prev, cur))
                  Some(SqliteSecIndexPartition(opts, ix.rootPage, i,
                    range): InputPartition)
                else None
              }.toArray
          })
        case None => ()
      }
      if (t.withoutRowid) {
        // index b-tree: one partition per root slice (child subtree +
        // the root cell's own entry), same parallel-read shape as the
        // rowid subtrees; slices whose leading-key band misses the
        // pushed PK range are planned away here
        val range = indexRange
        if (range.isEmpty) return Array.empty
        SqliteFile.indexRoot(db, t.rootPage) match {
          case None =>
            Array(SqliteIndexPartition(opts, t.rootPage, -1, range))
          case Some(firsts) =>
            val cells = firsts.size
            (0 to cells).flatMap { i =>
              val prev = if (i == 0) None else Some(firsts(i - 1))
              val cur = if (i < cells) Some(firsts(i)) else None
              if (range.mayOverlap(prev, cur))
                Some(SqliteIndexPartition(opts, t.rootPage, i, range):
                  InputPartition)
              else None
            }.toArray
        }
      } else if (SqliteFile.isLeaf(db, t.rootPage))
        Array(SqlitePartition(opts, t.rootPage, lo, hi))
      else {
        // one partition per root subtree — disjoint rowid ranges, so
        // no row is read twice; subtrees outside [lo, hi] are planned
        // away here, before any executor touches a page
        var lower = Long.MinValue
        SqliteFile.interiorChildren(db, t.rootPage).flatMap {
          case (child, maxKey) =>
            val pLo = math.max(lo, lower)
            val pHi = math.min(hi, maxKey)
            lower = maxKey + 1
            if (pLo <= pHi) Some(SqlitePartition(opts, child, pLo, pHi))
            else None
        }.toArray
      }
    } finally db.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SqliteReaderFactory(schema, t, secIndex)

  private def range: String = s"[${
    if (lo == Long.MinValue) "-inf" else lo}, ${
    if (hi == Long.MaxValue) "+inf" else hi}]"

  override def description(): String = secIndex match {
    case Some(ix) =>
      s"SqliteScan(${opts.path}#${t.name}, index=${ix.name}, " +
        s"key=${indexRange.describe}, " +
        s"covering=${covering(ix)})"
    case None if t.withoutRowid =>
      s"SqliteScan(${opts.path}#${t.name}, WITHOUT ROWID, pk=${
        indexRange.describe})"
    case None => s"SqliteScan(${opts.path}#${t.name}, rowid=$range)"
  }
}

final case class SqlitePartition(opts: SqliteOptions, page: Int,
    lo: Long, hi: Long) extends InputPartition

/** One root slice of a WITHOUT ROWID table's index b-tree; slice = -1
  * when the root is itself a leaf (whole-tree single partition).
  * [lo, hi] is the pushed leading-PK prune range. */
final case class SqliteIndexPartition(opts: SqliteOptions, rootPage: Int,
    slice: Int, range: SqliteFile.KeyRange) extends InputPartition

/** One root slice of a secondary CREATE INDEX b-tree (rowid table);
  * `range` is the pushed leading-entry-value prune range (numeric or
  * BINARY-collation text). */
final case class SqliteSecIndexPartition(opts: SqliteOptions, rootPage: Int,
    slice: Int, range: SqliteFile.KeyRange) extends InputPartition

final class SqliteReaderFactory(schema: StructType, t: SqliteFile.TableDef,
    secIndex: Option[SqliteFile.IndexDef] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case rp: SqlitePartition => new SqlitePartitionReader(schema, t, rp)
      case ip: SqliteIndexPartition =>
        new SqliteIndexPartitionReader(schema, t, ip)
      case sp: SqliteSecIndexPartition =>
        new SqliteSecIndexReader(schema, t, secIndex.getOrElse(
          throw new IllegalStateException(
            "secondary-index partition without an index choice")), sp)
    }
}

/** Reader for a secondary-index slice. Entry records are (indexed
  * columns..., rowid). Covering projections decode straight from the
  * entries; otherwise each surviving entry's rowid keys a point lookup
  * in the table b-tree ([[SqliteFile.lookupRowid]]) through a caching
  * [[SqliteFile.Db]], so shared interior pages read once per slice,
  * not once per row. */
final class SqliteSecIndexReader(schema: StructType,
    t: SqliteFile.TableDef, ix: SqliteFile.IndexDef,
    part: SqliteSecIndexPartition) extends PartitionReader[InternalRow] {

  private val db = new SqliteFile.Db(part.opts.path, cachePages = 256)
  private val slotOf = schema.fieldNames.zipWithIndex.toMap
  private val rowidAlias = t.columns.find(_.rowidAlias).map(_.name)
  // entry layout: rowid table = (indexed..., rowid); WITHOUT ROWID =
  // (indexed..., missing PK cols) — no rowid, so covering is REQUIRED
  // there (the planner guarantees it)
  private val entryCols: Seq[String] =
    if (t.withoutRowid) SqliteDataSource.worowidEntryCols(t, ix)
    else ix.columns.map(_._1)
  private val covering: Boolean = {
    val inEntry = entryCols.map(_.toLowerCase).toSet ++
      (if (t.withoutRowid) Set.empty else rowidAlias.map(_.toLowerCase))
    schema.fieldNames.forall(f => inEntry(f.toLowerCase))
  }
  require(covering || !t.withoutRowid ||
      SqliteDataSource.worowidLookbackCapable(t),
    s"WITHOUT ROWID secondary index ${ix.name} planned for a " +
      "non-covered projection without a BINARY-ordered PK — planner bug")
  private val nIdxCols = ix.columns.size
  // entry record position -> output slot (covering path); on a rowid
  // table the rowid (last position) fills the alias column if required
  private val entryWant: Array[Int] = {
    val byName = slotOf.map { case (k, v) => k.toLowerCase -> v }
    val cols = entryCols.map(c =>
      byName.getOrElse(c.toLowerCase, -1)).toArray
    if (t.withoutRowid) cols
    else cols :+
      rowidAlias.flatMap(n => byName.get(n.toLowerCase)).getOrElse(-1)
  }
  // entry position of the rowid alone (lookback path, rowid tables)
  private val rowidOnlyWant: Array[Int] =
    Array.fill(nIdxCols)(-1) :+ 0
  // table record column -> output slot (lookback path)
  private val tableWant: Array[Int] = t.columns.map { c =>
    if (c.rowidAlias) -1 else slotOf.getOrElse(c.name, -1)
  }.toArray
  // WITHOUT ROWID lookback plumbing: entry position of each PK part
  // (KEY order) to decode the tuple, each part's stored direction, and
  // the PK-first record permutation of the table b-tree's rows.
  // Lazy: on a rowid table the PK columns need not ride in the entry
  private lazy val pkEntryWant: Array[Int] = {
    val pos = entryCols.zipWithIndex
      .map { case (n, i) => n.toLowerCase -> i }.toMap
    val w = Array.fill(entryCols.size)(-1)
    t.pkCols.zipWithIndex.foreach { case (n, slot) =>
      w(pos(n.toLowerCase)) = slot }
    w
  }
  private val pkDescArr: Array[Boolean] =
    t.pkCols.indices.map(i => t.pkDesc.lift(i).getOrElse(false)).toArray
  private val pkTableWant: Array[Int] = {
    val byName = slotOf.map { case (k, v) => k.toLowerCase -> v }
    SqliteDataSource.indexRecordOrder(t)
      .map(c => byName.getOrElse(c.name.toLowerCase, -1)).toArray
  }
  private val rowidSlot: Int =
    rowidAlias.flatMap(slotOf.get).getOrElse(-1)
  private val targets: Array[DataType] = schema.fields.map(_.dataType)

  private val pending =
    new scala.collection.mutable.ArrayDeque[InternalRow]()
  private val stack = scala.collection.mutable.Stack[Int]()
  locally {
    if (part.slice < 0) stack.push(part.rootPage)
    else {
      val (entries, kids) =
        SqliteFile.indexSliceSeed(db, part.rootPage, part.slice)
      entries.filter(e => part.range.contains(SqliteFile.firstValue(e)))
        .foreach(emit)
      kids.foreach(stack.push)
    }
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pending.isEmpty && stack.nonEmpty) {
      val (entries, kids) =
        SqliteFile.indexPageStep(db, stack.pop(), part.range)
      entries.foreach(emit)
      kids.foreach(stack.push)
    }
    if (pending.isEmpty) false
    else { current = pending.removeHead(); true }
  }

  override def get(): InternalRow = current
  override def close(): Unit = db.close()

  private def emit(entry: Array[Byte]): Unit =
    if (covering) {
      val decoded = new Array[SqliteFile.Value](schema.length)
      SqliteFile.decodeRecord(entry, entryWant, decoded)
      val vals = new Array[Any](schema.length)
      var i = 0
      while (i < schema.length) {
        vals(i) = SqliteCoerce(decoded(i), targets(i), t.name)
        i += 1
      }
      pending.append(new GenericInternalRow(vals))
    } else if (t.withoutRowid) {
      // PK-tuple lookback: the entry's trailing PK tuple keys a point
      // descent of the table's PK index — the rowid lookback's twin,
      // one O(depth) path per matched entry through the caching Db
      val tuple = new Array[SqliteFile.Value](t.pkCols.size)
      SqliteFile.decodeRecord(entry, pkEntryWant, tuple)
      val payload = SqliteFile.lookupPkTuple(db, t.rootPage, tuple,
        pkDescArr).getOrElse(throw new IllegalStateException(
          s"index ${ix.name} references a missing PK tuple ${
            tuple.mkString("(", ",", ")")} — corrupt database"))
      val decoded = new Array[SqliteFile.Value](schema.length)
      SqliteFile.decodeRecord(payload, pkTableWant, decoded)
      val vals = new Array[Any](schema.length)
      var i = 0
      while (i < schema.length) {
        vals(i) = SqliteCoerce(decoded(i), targets(i), t.name)
        i += 1
      }
      pending.append(new GenericInternalRow(vals))
    } else {
      val ridOut = new Array[SqliteFile.Value](1)
      SqliteFile.decodeRecord(entry, rowidOnlyWant, ridOut)
      val rowid = ridOut(0) match {
        case l: Long => l
        case other => throw new IllegalStateException(
          s"index ${ix.name} entry carries a non-integer rowid: $other")
      }
      val payload = SqliteFile.lookupRowid(db, t.rootPage, rowid)
        .getOrElse(throw new IllegalStateException(
          s"index ${ix.name} references missing rowid $rowid — " +
            "corrupt database"))
      val decoded = new Array[SqliteFile.Value](schema.length)
      SqliteFile.decodeRecord(payload, tableWant, decoded)
      val vals = new Array[Any](schema.length)
      var i = 0
      while (i < schema.length) {
        vals(i) = SqliteCoerce(decoded(i), targets(i), t.name)
        i += 1
      }
      if (rowidSlot >= 0) vals(rowidSlot) = rowid
      pending.append(new GenericInternalRow(vals))
    }
}

/** Reader for a WITHOUT ROWID slice: a page stack over the index
  * b-tree, decoding each entry record with the PK-first column
  * permutation ([[SqliteDataSource.indexRecordOrder]]). Memory stays
  * O(tree depth + one page), like the rowid reader. */
final class SqliteIndexPartitionReader(schema: StructType,
    t: SqliteFile.TableDef, part: SqliteIndexPartition)
    extends PartitionReader[InternalRow] {

  private val db = new SqliteFile.Db(part.opts.path)
  // record position (PK cols first, then the rest) → output slot
  private val want: Array[Int] = {
    val slotOf = schema.fieldNames.zipWithIndex.toMap
    SqliteDataSource.indexRecordOrder(t)
      .map(c => slotOf.getOrElse(c.name, -1)).toArray
  }
  private val targets: Array[DataType] = schema.fields.map(_.dataType)

  private val pending =
    new scala.collection.mutable.ArrayDeque[InternalRow]()
  private val stack = scala.collection.mutable.Stack[Int]()
  locally {
    if (part.slice < 0) stack.push(part.rootPage)
    else {
      val (entries, kids) =
        SqliteFile.indexSliceSeed(db, part.rootPage, part.slice)
      entries.filter(e => part.range.contains(SqliteFile.firstValue(e)))
        .foreach(e => pending.append(toRow(e)))
      kids.foreach(stack.push)
    }
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pending.isEmpty && stack.nonEmpty) {
      val (entries, kids) =
        SqliteFile.indexPageStep(db, stack.pop(), part.range)
      entries.foreach(e => pending.append(toRow(e)))
      kids.foreach(stack.push)
    }
    if (pending.isEmpty) false
    else { current = pending.removeHead(); true }
  }

  override def get(): InternalRow = current
  override def close(): Unit = db.close()

  private def toRow(payload: Array[Byte]): InternalRow = {
    val decoded = new Array[SqliteFile.Value](schema.length)
    SqliteFile.decodeRecord(payload, want, decoded)
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      vals(i) = SqliteCoerce(decoded(i), targets(i), t.name)
      i += 1
    }
    new GenericInternalRow(vals)
  }
}

/** Shared storage-class → Spark-type coercion for both readers. */
private[sqlite] object SqliteCoerce {
  def apply(v: SqliteFile.Value, to: DataType, table: String): Any = v match {
    case null => null
    case l: Long => to match {
      case LongType => l
      case DoubleType => l.toDouble
      case StringType => UTF8String.fromString(l.toString)
      case _ => fail(v, to, table)
    }
    case d: Double => to match {
      case DoubleType => d
      case LongType if d == d.toLong.toDouble => d.toLong
      case StringType => UTF8String.fromString(d.toString)
      case _ => fail(v, to, table)
    }
    case s: String => to match {
      case StringType => UTF8String.fromString(s)
      case BinaryType => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case _ => fail(v, to, table)
    }
    case b: Array[Byte] => to match {
      case BinaryType => b
      case _ => fail(v, to, table)
    }
    case other => fail(other, to, table)
  }

  private def fail(v: Any, to: DataType, table: String): Nothing =
    throw new IllegalStateException(
      s"cannot coerce stored ${v.getClass.getSimpleName} to $to in " +
        s"$table — the column's declared affinity does not match " +
        "the stored value")
}

final class SqlitePartitionReader(schema: StructType,
    t: SqliteFile.TableDef, part: SqlitePartition)
    extends PartitionReader[InternalRow] {

  private val db = new SqliteFile.Db(part.opts.path)
  // record column index → output slot (-1 = skip without decoding);
  // the rowid alias column never decodes from the record (its slot is
  // NULL on disk) — it fills from the b-tree rowid
  private val want: Array[Int] = {
    val slotOf = schema.fieldNames.zipWithIndex.toMap
    t.columns.map { c =>
      if (c.rowidAlias) -1 else slotOf.getOrElse(c.name, -1)
    }.toArray
  }
  private val rowidSlot: Int = t.columns.find(_.rowidAlias)
    .flatMap(c => schema.fieldNames.zipWithIndex.toMap.get(c.name))
    .getOrElse(-1)
  private val targets: Array[DataType] = schema.fields.map(_.dataType)

  // The b-tree walk is callback-driven; a small queue decouples it
  // from the pull-based PartitionReader. Pages are visited lazily via
  // an explicit stack so memory stays O(tree depth + one page).
  private val pending =
    new scala.collection.mutable.ArrayDeque[InternalRow]()
  private val stack = scala.collection.mutable.Stack[Int](part.page)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pending.isEmpty && stack.nonEmpty) {
      val pageNo = stack.pop()
      if (SqliteFile.isLeaf(db, pageNo)) {
        SqliteFile.walk(db, pageNo, part.lo, part.hi) { (rowid, payload) =>
          pending.append(toRow(rowid, payload))
        }
      } else {
        // push children in REVERSE so rowid order is preserved
        var lower = Long.MinValue
        val kids = SqliteFile.interiorChildren(db, pageNo).flatMap {
          case (child, maxKey) =>
            val keep = lower <= part.hi && maxKey >= part.lo
            lower = maxKey + 1
            if (keep) Some(child) else None
        }
        kids.reverseIterator.foreach(stack.push)
      }
    }
    if (pending.isEmpty) { false }
    else { current = pending.removeHead(); true }
  }

  override def get(): InternalRow = current
  override def close(): Unit = db.close()

  private def toRow(rowid: Long, payload: Array[Byte]): InternalRow = {
    val vals = new Array[Any](schema.length)
    val decoded = new Array[SqliteFile.Value](schema.length)
    SqliteFile.decodeRecord(payload, want, decoded)
    var i = 0
    while (i < schema.length) {
      vals(i) = SqliteCoerce(decoded(i), targets(i), t.name)
      i += 1
    }
    if (rowidSlot >= 0) vals(rowidSlot) = rowid
    new GenericInternalRow(vals)
  }
}
