package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

import graft.sources.sqlite.{SqliteDataSource, SqliteFile, SqliteWriter}
import graft.sources.{SourceDef, SourceRegistry, SourcesConfig, TableDef}

/** Clean-room SQLite file-format reader/writer, differentially checked
  * against Python's stdlib `sqlite3` driver (a REAL SQLite): fixtures
  * are built by the genuine library and decoded by [[SqliteFile]];
  * files built by [[SqliteWriter]] are read back by the genuine
  * library. Covers every serial-type class, NULLs, negative and 8-byte
  * ints, overflow-page chains (multi-KB text), multi-level b-trees
  * (interior pages), freeblocks left by DELETE, ALTER TABLE ADD COLUMN
  * short records, the INTEGER PRIMARY KEY rowid alias, rowid-range
  * pushdown pruning, column pruning, WITHOUT ROWID tables (index b-tree
  * layout, PK-first record permutation, root-slice partitions), and the
  * `type: sqlite` registry path.
  */
class SqliteSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val pyAvailable: Boolean =
    try Process(Seq("python3", "-c", "import sqlite3"))
      .!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  private def py(script: String): Unit = {
    val f = Files.createTempFile("sqlite-fix", ".py")
    Files.write(f, script.getBytes("UTF-8"))
    val log = new StringBuilder
    val code = Process(Seq("python3", f.toString))
      .!(ProcessLogger(s => log.append(s).append('\n')))
    assert(code == 0, s"python fixture failed:\n$log")
  }

  private def fixture(name: String)(script: Path => String): Path = {
    val db = Files.createTempFile(s"graft-$name", ".sqlite")
    Files.delete(db)
    py(script(db))
    db
  }

  // ---------------------------------------------------------------

  test("reader: all storage classes round-trip from a real SQLite file") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("types") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, s TEXT, f REAL, n INTEGER, b BLOB)")
         |rows = [
         |  (1, 'alpha', 1.5, 0, b'\\x00\\x01\\x02'),
         |  (2, None, -2.25, 1, None),
         |  (3, 'утф-8 ok', 0.0, -1, b''),
         |  (4, 'x', 1e300, 127, b'\\xff'),
         |  (5, '', -1e-300, -128, None),
         |  (6, 'big', 3.14, 32767, None),
         |  (7, 'neg', -3.14, -32768, None),
         |  (8, 'mid', 2.0, 8388607, None),
         |  (9, 'mid2', 2.0, -8388608, None),
         |  (10, 'i32', 2.0, 2147483647, None),
         |  (11, 'i48', 2.0, 140737488355327, None),
         |  (12, 'i64', 2.0, 9223372036854775807, None),
         |  (13, 'i64n', 2.0, -9223372036854775808, None),
         |]
         |c.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      ("id", "long"), ("s", "string"), ("f", "double"),
      ("n", "long"), ("b", "binary")))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 13)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha" &&
      rows(0).getDouble(2) == 1.5 && rows(0).getLong(3) == 0L &&
      rows(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](0, 1, 2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(4))
    assert(rows(2).getString(1) == "утф-8 ok" && rows(2).getLong(3) == -1L)
    assert(rows(11).getLong(3) == Long.MaxValue)
    assert(rows(12).getLong(3) == Long.MinValue)
    Files.delete(db)
  }

  test("reader: overflow chains, interior pages, freeblocks, ALTER TABLE") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("big") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT, k INTEGER)")
         |# 3000 rows forces interior pages; every 100th body is 9 KB,
         |# forcing multi-page overflow chains at the 4096 default page
         |rows = [(i, ('x%d.' % i) * (3000 if i % 100 == 0 else 3), i * 7)
         |        for i in range(1, 3001)]
         |c.executemany("INSERT INTO docs VALUES (?,?,?)", rows)
         |c.commit()
         |# freeblocks: delete a band in the middle
         |c.execute("DELETE FROM docs WHERE id BETWEEN 1000 AND 1099")
         |c.commit()
         |# short records: rows written BEFORE this ALTER lack the column
         |c.execute("ALTER TABLE docs ADD COLUMN extra TEXT")
         |c.execute("INSERT INTO docs VALUES (9001, 'tail', 1, 'present')")
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "docs").load()
    assert(df.count() == 2901) // 3000 - 100 deleted + 1 tail
    // overflow payloads reassemble byte-exact
    val big = df.filter(col("id") === 1200).select("body").head.getString(0)
    assert(big == "x1200." * 3000)
    // ALTER-added column: NULL on old rows, value on the new one
    assert(df.filter(col("id") === 42).select("extra").head.isNullAt(0))
    assert(df.filter(col("id") === 9001).select("extra")
      .head.getString(0) == "present")
    // deleted band stays deleted
    assert(df.filter(col("id").between(1000, 1099)).count() == 0)
    Files.delete(db)
  }

  test("reader: rowid-range pushdown prunes and stays exact") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("push") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE m (id INTEGER PRIMARY KEY, v TEXT)")
         |c.executemany("INSERT INTO m VALUES (?,?)",
         |              [(i, 'v%d' % i) for i in range(1, 5001)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "m").load()
      .filter(col("id") > 4900 && col("id") <= 4950)
    assert(df.count() == 50)
    assert(df.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(4901L, 4950L))
    // the range must be visible in the scan (pushed, not post-filtered)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rowid=[4901, 4950]"),
      s"rowid range not pushed into the scan:\n$plan")
    // a point lookup plans at most one partition's pages
    val one = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "m").load()
      .filter(col("id") === 123)
    assert(one.select("v").head.getString(0) == "v123")
    Files.delete(db)
  }

  test("reader: column pruning reaches the scan") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("prune") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE w (a INTEGER, b TEXT, c REAL)")
         |c.executemany("INSERT INTO w VALUES (?,?,?)",
         |              [(i, 'b%d' % i, i * 0.5) for i in range(100)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "w").load()
      .select("b")
    assert(df.schema.fieldNames.toSeq == Seq("b"))
    assert(df.count() == 100)
    // no rowid alias on this table: ids come from the hidden rowid and
    // every declared column decodes normally
    val all = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "w").load()
    assert(all.filter(col("a") === 7).select("c").head.getDouble(0) == 3.5)
    Files.delete(db)
  }

  test("reader: WITHOUT ROWID single-column TEXT key") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("worid") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE kv (k TEXT PRIMARY KEY, v TEXT, n INTEGER) WITHOUT ROWID")
         |c.executemany("INSERT INTO kv VALUES (?,?,?)",
         |  [("key-%04d" % i, None if i % 5 == 0 else "val-%d" % i, i)
         |   for i in range(400)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "kv").load()
    assert(df.schema.map(f => (f.name, f.dataType.typeName, f.nullable)) ==
      Seq(("k", "string", false), ("v", "string", true),
        ("n", "long", true)))
    val rows = df.orderBy("k").collect()
    assert(rows.length == 400)
    assert(rows(7).getString(0) == "key-0007" &&
      rows(7).getString(1) == "val-7" && rows(7).getLong(2) == 7L)
    assert(rows(0).isNullAt(1), "i % 5 == 0 stores NULL")
    assert(df.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      == (0 until 400).sum.toLong)
    Files.delete(db)
  }

  test("reader: WITHOUT ROWID TEXT leading key — range and prefix " +
      "prune the index descent under BINARY collation") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("woridtext") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE kv (k TEXT, v TEXT, PRIMARY KEY (k)) WITHOUT ROWID")
         |c.executemany("INSERT INTO kv VALUES (?,?)",
         |  [("key-%04d" % i, 'pad-' * 40 + str(i)) for i in range(3000)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    def scan() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "kv").load()
    val rg = scan().filter(col("k") >= "key-2900" && col("k") < "key-2950")
    val plan = rg.queryExecution.executedPlan.toString
    assert(plan.contains("pk=[key-2900, key-2950]"),
      s"text PK range not pushed:\n$plan")
    assert(plan.contains("Filter"), "inexact pushdown keeps the filter")
    assert(rg.count() == 50)
    val pf = scan().filter(col("k").startsWith("key-01"))
    assert(pf.queryExecution.executedPlan.toString
      .contains("pk=[key-01, key-02)"), pf.queryExecution.executedPlan)
    assert(pf.count() == 100)
    // pages-read drop at the SqliteFile level: narrow text range vs
    // full index walk
    val d1 = new SqliteFile.Db(db.toString)
    val tdef = SqliteFile.table(d1, "kv")
    val all = SqliteFile.NumRange(Long.MinValue, Long.MaxValue)
    def walkPages(db: SqliteFile.Db, range: SqliteFile.KeyRange): Int = {
      val stack = scala.collection.mutable.Stack[Int](tdef.rootPage)
      var n = 0
      while (stack.nonEmpty) {
        val (entries, kids) = SqliteFile.indexPageStep(db, stack.pop(), range)
        n += entries.size
        kids.foreach(stack.push)
      }
      n
    }
    assert(walkPages(d1, all) == 3000)
    val fullPages = d1.pagesRead
    d1.close()
    val d2 = new SqliteFile.Db(db.toString)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val narrow = SqliteFile.TextRange(Some("key-2900".getBytes(utf8)),
      Some("key-2950".getBytes(utf8)), hiExclusive = true)
    assert(walkPages(d2, narrow) == 50)
    val prunedPages = d2.pagesRead
    d2.close()
    assert(prunedPages * 3 < fullPages,
      s"text pruning read $prunedPages of $fullPages pages — no drop")
    Files.delete(db)
  }

  test("reader: table-level PRIMARY KEY (k COLLATE NOCASE) disables " +
      "byte-order band pruning — no silently dropped rows") {
    assume(pyAvailable, "python3/sqlite3 not available")
    // NOCASE interleaves 'a…' and 'B…' keys by digits while byte order
    // puts every 'B'(0x42) before every 'a'(0x61): BINARY band pruning
    // on this NOCASE-ordered tree would cut subtrees holding matching
    // 'a…' rows (the r17-advice scenario). The COLLATE lives in the
    // TABLE-LEVEL PK clause, which the column-def parser never sees.
    val db = fixture("nocasepk") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE kv (k TEXT, v TEXT, PRIMARY KEY (k COLLATE NOCASE)) WITHOUT ROWID")
         |c.executemany("INSERT INTO kv VALUES (?,?)",
         |  [(('a%06d' if i % 2 == 0 else 'B%06d') % i,
         |    'pad-' * 40 + str(i)) for i in range(3000)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val d1 = new SqliteFile.Db(db.toString)
    val tdef = SqliteFile.table(d1, "kv")
    d1.close()
    assert(tdef.pkCollated == Seq(true),
      s"table-level PK COLLATE NOCASE not parsed: ${tdef.pkCollated}")
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "kv").load()
      .filter(col("k") >= "a")
    // pruning must stay OFF: the descent keeps the unbounded range…
    assert(df.queryExecution.executedPlan.toString
      .contains("pk=[-inf, +inf]"), df.queryExecution.executedPlan)
    // …and every byte-order match survives (all 1500 'a…' keys; every
    // 'B…' key is < 'a' in Spark's binary comparison)
    assert(df.count() == 1500)
    Files.delete(db)
  }

  test("reader: WITHOUT ROWID secondary index, NON-covering projection " +
      "— PK-tuple lookback, pages-read drop, real-SQLite fixture") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("worlb") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE kv (k INTEGER, v TEXT, n INTEGER, PRIMARY KEY (k)) WITHOUT ROWID")
         |c.executemany("INSERT INTO kv VALUES (?,?,?)",
         |  [(i, 'pad-' * 40 + str(i), i % 500) for i in range(6000)])
         |c.execute("CREATE INDEX kv_n ON kv (n)")
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "kv").load()
      .filter(col("n").between(100, 103)) // 12 matches per n value
      .select(col("k"), col("v"), col("n"))
    // the planner must pick the index WITHOUT coverage (v rides only in
    // the table b-tree) — the entry's trailing PK tuple keys the lookback
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("index=kv_n") && plan.contains("covering=false"),
      s"lookback scan not planned:\n$plan")
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.size == 48, rows.size)
    assert(rows.forall { case (k, v, n) =>
      n == k % 500 && n >= 100 && n <= 103 && v == "pad-" * 40 + k })
    // pages-read drop at the SqliteFile level: index descent + per-match
    // PK lookback vs the full table walk
    val dFull = new SqliteFile.Db(db.toString)
    val tdef = SqliteFile.table(dFull, "kv")
    def walkAll(d: SqliteFile.Db, root: Int): Int = {
      val stack = scala.collection.mutable.Stack[Int](root)
      var rows = 0
      while (stack.nonEmpty) {
        val (es, ks) = SqliteFile.indexPageStep(d, stack.pop(),
          SqliteFile.NumRange(Long.MinValue, Long.MaxValue))
        rows += es.size; ks.foreach(stack.push)
      }
      rows
    }
    assert(walkAll(dFull, tdef.rootPage) == 6000)
    val fullPages = dFull.pagesRead
    dFull.close()
    val dIdx = new SqliteFile.Db(db.toString, cachePages = 256)
    val ix = SqliteFile.indexes(dIdx, "kv").find(_.name == "kv_n").get
    val range = SqliteFile.NumRange(100, 103)
    val stack = scala.collection.mutable.Stack[Int](ix.rootPage)
    var looked = 0
    while (stack.nonEmpty) {
      val (es, ks) = SqliteFile.indexPageStep(dIdx, stack.pop(), range)
      es.foreach { e =>
        val tuple = new Array[SqliteFile.Value](1)
        SqliteFile.decodeRecord(e, Array(-1, 0), tuple) // entry = (n, k)
        assert(SqliteFile.lookupPkTuple(dIdx, tdef.rootPage, tuple,
          Array(false)).isDefined, s"PK tuple ${tuple.toSeq} not found")
        looked += 1
      }
      ks.foreach(stack.push)
    }
    assert(looked == 48, looked)
    val prunedPages = dIdx.pagesRead
    dIdx.close()
    assert(prunedPages * 3 < fullPages,
      s"lookback read $prunedPages of $fullPages pages — no drop")
    Files.delete(db)
  }

  test("reader: ±Infinity REAL PK parts survive the PK-tuple lookback " +
      "(compareValues orders non-finite doubles instead of throwing)") {
    // SQLite legally stores ±Infinity REALs (a 9e999 literal); the
    // BigDecimal mixed int/real path throws on them, so the comparator
    // short-circuits non-finite doubles by sign
    import SqliteFile.compareValues
    assert(compareValues(Long.MaxValue, Double.PositiveInfinity) < 0)
    assert(compareValues(Long.MinValue, Double.NegativeInfinity) > 0)
    assert(compareValues(Double.PositiveInfinity, 5L) > 0)
    assert(compareValues(Double.NegativeInfinity, 5L) < 0)
    assert(compareValues(Double.PositiveInfinity, Double.PositiveInfinity) == 0)
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("worinf") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE kv (k REAL, v TEXT, n INTEGER, PRIMARY KEY (k)) WITHOUT ROWID")
         |c.executemany("INSERT INTO kv VALUES (?,?,?)",
         |  [(float(i), 'pad-' * 40 + str(i), i % 50) for i in range(2000)])
         |c.execute("INSERT INTO kv VALUES (9e999, 'top', 7)")
         |c.execute("INSERT INTO kv VALUES (-9e999, 'bottom', 7)")
         |c.execute("CREATE INDEX kv_n ON kv (n)")
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "kv").load()
      .filter(col("n") === 7)
      .select(col("k"), col("v"), col("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("index=kv_n") && plan.contains("covering=false"),
      s"lookback scan not planned:\n$plan")
    val rows = df.collect().map(r =>
      (r.getDouble(0), r.getString(1))).toSet
    assert(rows.contains((Double.PositiveInfinity, "top")) &&
      rows.contains((Double.NegativeInfinity, "bottom")), rows.take(5))
    assert(rows.size == 42, rows.size) // 40 finite (n == 7) + the 2 infinities
    Files.delete(db)
  }

  test("reader: WITHOUT ROWID NOCASE PK never plans the lookback " +
      "(descent order would diverge) — falls back, stays correct") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("worlbnc") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE kv (k TEXT COLLATE NOCASE PRIMARY KEY, v TEXT, n INTEGER) WITHOUT ROWID")
         |c.executemany("INSERT INTO kv VALUES (?,?,?)",
         |  [(('a%04d' if i % 2 == 0 else 'B%04d') % i, 'v' + str(i), i % 50)
         |   for i in range(2000)])
         |c.execute("CREATE INDEX kvnc_n ON kv (n)")
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "kv").load()
      .filter(col("n") === 7).select(col("k"), col("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("index=kvnc_n"),
      s"NOCASE-keyed lookback must not be planned:\n$plan")
    assert(df.count() == 40)
    Files.delete(db)
  }

  test("reader: WITHOUT ROWID composite key in NON-declared order, " +
      "multi-level index b-tree, overflow payloads") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("worid2") { p =>
      // PRIMARY KEY(b, a): on disk the record stores b FIRST, then a,
      // then the payload columns — the permutation the reader must undo.
      // 3000 rows with a 600-char text forces interior index pages AND
      // overflow chains (index-page local formula, not the table one).
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE m (a INTEGER, big TEXT, b TEXT, x REAL, PRIMARY KEY (b, a)) WITHOUT ROWID")
         |c.executemany("INSERT INTO m VALUES (?,?,?,?)",
         |  [(i, ("t%d-" % i) * (200 if i % 11 == 0 else 3),
         |    "g%02d" % (i % 40), i / 4.0) for i in range(3000)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "m").load()
    // declared order, key columns non-nullable
    assert(df.schema.map(f => (f.name, f.nullable)) ==
      Seq(("a", false), ("big", true), ("b", false), ("x", true)))
    assert(df.count() == 3000)
    val r = df.filter(org.apache.spark.sql.functions.col("a") === 1234)
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1234 && r(0).getString(2) == "g34" &&
      r(0).getDouble(3) == 308.5 && r(0).getString(1) == "t1234-" * 3)
    // the overflow row survives reassembly intact
    val big = df.filter(org.apache.spark.sql.functions.col("a") === 2200)
      .head.getString(1)
    assert(big == "t2200-" * 200, s"overflow text len ${big.length}")
    // multiple root slices = parallel partitions (interior root)
    assert(df.rdd.getNumPartitions > 1,
      "a 3000-row index tree should plan multiple root-slice partitions")
    Files.delete(db)
  }

  test("writer: files written here open in a real SQLite") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = Files.createTempFile("graft-out", ".sqlite")
    // enough rows for several leaf pages + an interior level
    val rows = (1 to 2000).iterator.map { i =>
      Seq[Any](i.toLong, s"name-$i", i * 1.25,
        if (i % 7 == 0) null else s"note $i")
    }
    SqliteWriter.write(db, "people",
      Seq("id" -> "INTEGER", "name" -> "TEXT", "score" -> "REAL",
        "note" -> "TEXT"), rows)
    val outTsv = Files.createTempFile("graft-out", ".tsv")
    py(s"""import sqlite3
          |c = sqlite3.connect(${q(db)})
          |c.execute("PRAGMA integrity_check").fetchall()
          |n, = c.execute("SELECT count(*) FROM people").fetchone()
          |assert n == 2000, n
          |r = c.execute("SELECT id, name, score, note FROM people WHERE id IN (1, 7, 2000)").fetchall()
          |with open(${q(outTsv)}, 'w') as fh:
          |    for row in r:
          |        fh.write(repr(row) + '\\n')
          |c.close()
          |""".stripMargin)
    val dump = new String(Files.readAllBytes(outTsv), "UTF-8")
    assert(dump.contains("(1, 'name-1', 1.25, 'note 1')"))
    assert(dump.contains("(7, 'name-7', 8.75, None)"))
    assert(dump.contains("(2000, 'name-2000', 2500.0, 'note 2000')"))
    // and our own reader agrees with what we wrote
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "people").load()
    assert(df.count() == 2000)
    assert(df.filter(col("id") === 1400).select("score")
      .head.getDouble(0) == 1750.0)
    Files.delete(db); Files.delete(outTsv)
  }

  test("writer: WITHOUT ROWID files open in a real SQLite (promoted " +
      "separators, multi-level index)") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = Files.createTempFile("graft-worid-out", ".sqlite")
    // 4000 rows: multiple index leaves AND an interior level, so the
    // separator-promotion path is on the line; composite key (grp, id)
    // exercises the PK-first record order on WRITE
    val rows = (1 to 4000).iterator.map { i =>
      val grp = s"g${(i - 1) / 400}"
      Seq[Any](i.toLong, grp, s"name-$i", i * 1.25)
    }
    // key order = (grp, id): g0 < g1 < ... bytewise and ids ascend
    // inside each group, so input arrives pre-sorted by the PK
    SqliteWriter.writeWithoutRowid(db, "people",
      Seq("id" -> "INTEGER", "grp" -> "TEXT", "name" -> "TEXT",
        "score" -> "REAL"), Seq("grp", "id"), rows)
    val outTsv = Files.createTempFile("graft-worid-out", ".tsv")
    py(s"""import sqlite3
          |c = sqlite3.connect(${q(db)})
          |ok, = c.execute("PRAGMA integrity_check").fetchone()
          |assert ok == 'ok', ok
          |n, = c.execute("SELECT count(*) FROM people").fetchone()
          |assert n == 4000, n
          |r = c.execute("SELECT id, grp, name, score FROM people WHERE id IN (1, 777, 4000)").fetchall()
          |s, = c.execute("SELECT sum(id) FROM people WHERE grp = 'g3'").fetchone()
          |with open(${q(outTsv)}, 'w') as fh:
          |    for row in r:
          |        fh.write(repr(row) + '\\n')
          |    fh.write('sum=%d\\n' % s)
          |c.close()
          |""".stripMargin)
    val dump = new String(Files.readAllBytes(outTsv), "UTF-8")
    assert(dump.contains("(1, 'g0', 'name-1', 1.25)"), dump)
    assert(dump.contains("(777, 'g1', 'name-777', 971.25)"), dump)
    assert(dump.contains("(4000, 'g9', 'name-4000', 5000.0)"), dump)
    assert(dump.contains(s"sum=${(1201 to 1600).sum}"), dump)
    // and our own index reader agrees with what we wrote
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "people").load()
    assert(df.count() == 4000)
    assert(df.filter(col("id") === 1400).select("score")
      .head.getDouble(0) == 1750.0)
    Files.delete(db); Files.delete(outTsv)
  }

  test("registry: type sqlite registers tables through the format reader") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("reg") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE inventory (id INTEGER PRIMARY KEY, sku TEXT, qty INTEGER)")
         |c.executemany("INSERT INTO inventory VALUES (?,?,?)",
         |              [(i, 'sku%03d' % i, i * 10) for i in range(1, 61)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val cfg = SourcesConfig(Seq(SourceDef(
      name = "store", sourceType = "sqlite",
      url = Some(s"jdbc:sqlite:$db"), // jdbc-style prefix tolerated
      tables = Seq(TableDef("inventory")))))
    new SourceRegistry(spark).registerAll(cfg)
    try {
      val df = spark.table("store_inventory").filter(col("id") >= 50)
      assert(df.count() == 11)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("rowid=[50, +inf]"),
        s"registry read lost rowid pushdown:\n$plan")
    } finally {
      spark.catalog.dropTempView("store_inventory")
      Files.delete(db)
    }
  }

  test("format core: varint and record encode/decode are inverses") {
    val cases = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 1L << 40,
      Long.MaxValue, -1L, Long.MinValue)
    cases.foreach { v =>
      val enc = SqliteWriter.varint(v)
      val (dec, n) = SqliteFile.varint(enc, 0)
      assert(dec == v && n == enc.length, s"varint round-trip $v")
    }
    val rec = SqliteWriter.record(Seq(null, 42L, -7L, 3.5, "héllo",
      Array[Byte](1, 2, 3), 0L, 1L))
    val out = new Array[SqliteFile.Value](8)
    SqliteFile.decodeRecord(rec, Array(0, 1, 2, 3, 4, 5, 6, 7), out)
    assert(out(0) == null && out(1) == 42L && out(2) == -7L &&
      out(3) == 3.5 && out(4) == "héllo" &&
      out(5).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3) &&
      out(6) == 0L && out(7) == 1L)
  }

  // ---------------------------------------------------------------
  // the rowid-alias rule, differentially against real SQLite: only a
  // declared type of EXACTLY 'INTEGER' aliases the rowid. `INT PRIMARY
  // KEY` / `BIGINT PRIMARY KEY` store real values in the record while
  // rowids auto-assign — a reader that treats them as aliases silently
  // substitutes rowids for the stored column.

  test("reader: INT PRIMARY KEY is NOT a rowid alias (stored values win)") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("intpk") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)")
         |# out-of-order keys: rowids become 1,2,3 while id keeps 50,30,90
         |c.execute("INSERT INTO t VALUES (50, 'a')")
         |c.execute("INSERT INTO t VALUES (30, 'b')")
         |c.execute("INSERT INTO t VALUES (90, 'c')")
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    val got = df.orderBy("v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((50L, "a"), (30L, "b"), (90L, "c")),
      s"INT PRIMARY KEY values must come from the record, got ${got.toSeq}")
    // and the filter is NOT routed through rowid pruning: id=30 is
    // rowid 2, so a rowid-pruned read would return the wrong row
    assert(df.filter(col("id") === 30).select("v").head.getString(0) == "b")
    Files.delete(db)
  }

  test("reader: INTEGER PRIMARY KEY DESC (column-level quirk) is NOT an alias") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("descpk") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY DESC, v TEXT)")
         |c.execute("INSERT INTO t VALUES (70, 'x')")
         |c.execute("INSERT INTO t VALUES (10, 'y')")
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    val got = df.orderBy("v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((70L, "x"), (10L, "y")),
      s"column-level DESC quirk: values must come from the record, got ${got.toSeq}")
    Files.delete(db)
  }

  test("reader: table-level PRIMARY KEY(id) with exact INTEGER IS an alias") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("tblpk") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER, v TEXT, PRIMARY KEY(id))")
         |c.executemany("INSERT INTO t VALUES (?,?)",
         |              [(i * 10, 'v%d' % i) for i in range(1, 201)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
      .filter(col("id") >= 100 && col("id") <= 200)
    assert(df.count() == 11)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rowid=[100, 200]"),
      s"table-level INTEGER PK must route through rowid pruning:\n$plan")
    Files.delete(db)
  }

  test("writer: BIGINT PRIMARY KEY stores real values (no alias NULLs)") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = Files.createTempFile("graft-bigintpk", ".sqlite")
    SqliteWriter.write(db, "t",
      Seq("id" -> "BIGINT PRIMARY KEY", "v" -> "TEXT"),
      Iterator(Seq[Any](7L, "a"), Seq[Any](11L, "b")))
    val outTsv = Files.createTempFile("graft-bigintpk", ".tsv")
    py(s"""import sqlite3
          |c = sqlite3.connect(${q(db)})
          |r = c.execute("SELECT id, v FROM t ORDER BY v").fetchall()
          |assert r == [(7, 'a'), (11, 'b')], r
          |with open(${q(outTsv)}, 'w') as fh: fh.write(repr(r))
          |c.close()
          |""".stripMargin)
    assert(new String(Files.readAllBytes(outTsv), "UTF-8")
      .contains("(7, 'a')"))
    Files.delete(db); Files.delete(outTsv)
  }

  test("reader: WITHOUT ROWID leading-PK range prunes the index descent") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("woridpk") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE ev (ts INTEGER, src TEXT, v REAL, PRIMARY KEY (ts, src)) WITHOUT ROWID")
         |c.executemany("INSERT INTO ev VALUES (?,?,?)",
         |  [(i, 's%d' % (i % 3), i * 0.5) for i in range(1, 5001)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "ev").load()
      .filter(col("ts") > 4900 && col("ts") <= 4950)
    assert(df.count() == 50)
    assert(df.agg(min("ts"), max("ts")).head() ==
      org.apache.spark.sql.Row(4901L, 4950L))
    // the prune range must reach the scan; INEXACT, so the filter must
    // ALSO survive as a Spark-side Filter above it
    // the strict bound stays INCLUSIVE on this path (4900, not 4901):
    // a fractional 4900.5 key must survive pruning for the residual
    // filter to judge
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pk=[4900, 4950]"),
      s"leading-PK range not pushed into the scan:\n$plan")
    assert(plan.contains("Filter"),
      "inexact pushdown must keep the Spark-side filter")
    // composite residual: second key column filters stay Spark-side
    val both = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "ev").load()
      .filter(col("ts") === 123 && col("src") === "s0")
    assert(both.count() == 1)
    assert(both.head.getDouble(2) == 61.5)
    Files.delete(db)
  }

  test("reader: WITHOUT ROWID with a DESC leading key disables the " +
      "(ascending) prune but stays correct") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("woriddesc") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE d (ts INTEGER, v TEXT, PRIMARY KEY (ts DESC)) WITHOUT ROWID")
         |c.executemany("INSERT INTO d VALUES (?,?)",
         |  [(i, 'v%d' % i) for i in range(1, 3001)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "d").load()
      .filter(col("ts") > 2900 && col("ts") <= 2950)
    assert(df.count() == 50, "a reverse-ordered index must not lose rows")
    assert(df.agg(min("ts"), max("ts")).head() ==
      org.apache.spark.sql.Row(2901L, 2950L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pk=[2901"),
      s"DESC leading key must not claim an ascending prune range:\n$plan")
    Files.delete(db)
  }

  test("reader: journal_mode=PERSIST's leftover -journal (zeroed " +
      "header) is not hot — the database reads fine") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("persist") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("PRAGMA journal_mode=PERSIST")
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
         |c.executemany("INSERT INTO t VALUES (?,?)",
         |              [(i, 'v%d' % i) for i in range(1, 101)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val journal = java.nio.file.Paths.get(db.toString + "-journal")
    assume(Files.exists(journal) && Files.size(journal) > 0,
      "PERSIST should leave a non-empty journal on this platform")
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    assert(df.count() == 100)
    Files.delete(db); Files.delete(journal)
  }

  test("reader: PK-prefix pruning never hides a fractional key — a " +
      "REAL stored in an integer-affine key fails LOUDLY either way") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("fractional") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE f (ts INTEGER, v TEXT, PRIMARY KEY (ts)) WITHOUT ROWID")
         |c.executemany("INSERT INTO f VALUES (?,?)",
         |  [(i, 'v%d' % i) for i in range(1, 9)] + [(9.5, 'frac')])
         |c.commit(); c.close()
         |""".stripMargin
    }
    def scan() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "f").load()
    // count() decodes no columns, so even the fractional-key row counts
    assert(scan().count() == 9, "pruning must not change the row count")
    // both the unfiltered scan and the pruned one must agree: the
    // affinity-mismatched key is a LOUD coercion error, never a
    // silently missing row (the pruning bound stays inclusive)
    val full = intercept[Exception](scan().select("ts", "v").collect())
    val pruned = intercept[Exception](
      scan().filter(col("ts") < 10).select("ts", "v").collect())
    def root(t: Throwable): String = {
      var x = t; while (x.getCause != null) x = x.getCause
      Option(x.getMessage).getOrElse("")
    }
    assert(root(full).contains("cannot coerce"), root(full))
    assert(root(pruned).contains("cannot coerce"),
      s"pruning must not hide the fractional key: ${root(pruned)}")
    Files.delete(db)
  }

  test("reader: band pruning never hides a TEXT key stored in an " +
      "integer-affine PK — loud coerce failure even under a range " +
      "filter below it (round-16 advice)") {
    assume(pyAvailable, "python3/sqlite3 not available")
    // text sorts above every numeric, so 'zzz' lands in the index's
    // right spine; a filter ts < 50 used to prune that spine on
    // prev > hi alone, silently skipping the key the unpruned scan
    // fails loudly on. Enough rows to force interior pages, so the
    // BAND pruning path (not the leaf filter) is what's on the line.
    val db = fixture("textkey") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE f (ts INTEGER, v TEXT, PRIMARY KEY (ts)) WITHOUT ROWID")
         |c.executemany("INSERT INTO f VALUES (?,?)",
         |  [(i, 'pad-' * 40 + str(i)) for i in range(1, 2001)])
         |c.execute("INSERT INTO f VALUES ('zzz', 'textkey')")
         |c.commit(); c.close()
         |""".stripMargin
    }
    def scan() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "f").load()
    def root(t: Throwable): String = {
      var x = t; while (x.getCause != null) x = x.getCause
      Option(x.getMessage).getOrElse("")
    }
    val full = intercept[Exception](scan().select("ts").collect())
    assert(root(full).contains("cannot coerce"), root(full))
    val pruned = intercept[Exception](
      scan().filter(col("ts") < 50).select("ts").collect())
    assert(root(pruned).contains("cannot coerce"),
      s"band pruning must not hide the text key: ${root(pruned)}")
    Files.delete(db)
  }

  test("reader: table-level PRIMARY KEY(ID) aliases id case-insensitively") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("pkcase") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER, v TEXT, PRIMARY KEY(ID))")
         |c.executemany("INSERT INTO t VALUES (?,?)",
         |              [(i, 'v%d' % i) for i in range(1, 21)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    // real SQLite stores NULL in the aliased slot; a case-sensitive
    // match would decode those NULLs instead of the rowids
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (1 to 20).sum.toLong)
    Files.delete(db)
  }

  test("reader: secondary CREATE INDEX scan — lookback correctness, " +
      "covering detection, and a pages-read drop vs full scan") {
    assume(pyAvailable, "python3/sqlite3 not available")
    // price is NOT monotone in rowid, so index order differs from table
    // order — a scan that secretly walked the table would still pass a
    // sorted-fixture test; this one it cannot
    val db = fixture("secidx") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, price INTEGER, name TEXT)")
         |c.executemany("INSERT INTO t VALUES (?,?,?)",
         |  [(i, (i * 37) % 5000, 'n%d-' % i + 'x' * 200) for i in range(1, 5001)])
         |c.execute("CREATE INDEX idx_price ON t (price)")
         |c.commit(); c.close()
         |""".stripMargin
    }
    def scan() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    // non-covering: name comes from the rowid lookback
    val df = scan().filter(col("price").between(100, 149))
      .select("id", "price", "name")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expect = (1 to 5000)
      .map(i => (i.toLong, ((i * 37) % 5000).toLong, s"n$i-" + "x" * 200))
      .filter(t => t._2 >= 100 && t._2 <= 149).toSet
    assert(got == expect, s"got ${got.size}, expected ${expect.size}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("index=idx_price") &&
      plan.contains("covering=false"),
      s"secondary index not chosen:\n$plan")
    assert(plan.contains("key=[100, 149]"), plan)
    assert(plan.contains("Filter"),
      "inexact pushdown must keep the Spark-side filter")
    // IN-list pushes its covering [min, max] range
    val inl = scan().filter(col("price").isin(120, 110, 115)).select("id")
    val iplan = inl.queryExecution.executedPlan.toString
    assert(iplan.contains("index=idx_price") &&
      iplan.contains("key=[110, 120]"), iplan)
    assert(inl.collect().map(_.getLong(0)).toSet ==
      (1 to 5000).filter(i => Set(110, 115, 120)((i * 37) % 5000))
        .map(_.toLong).toSet)
    // covering: id (rowid, rides in every entry) + price — no lookback
    val cov = scan().filter(col("price") === 250).select("price", "id")
    assert(cov.queryExecution.executedPlan.toString
      .contains("covering=true"), cov.queryExecution.executedPlan)
    assert(cov.collect().map(_.getLong(1)).toSet ==
      (1 to 5000).filter(i => (i * 37) % 5000 == 250).map(_.toLong).toSet)
    // pages-read drop: the same work driven at the SqliteFile level
    // with physical-read counters — the observable the pushdown buys
    val d1 = new SqliteFile.Db(db.toString)
    val tdef = SqliteFile.table(d1, "t")
    SqliteFile.walk(d1, tdef.rootPage, Long.MinValue, Long.MaxValue)(
      (_, _) => ())
    val fullPages = d1.pagesRead
    d1.close()
    val d2 = new SqliteFile.Db(db.toString, cachePages = 256)
    val ix = SqliteFile.indexes(d2, "t").find(_.name == "idx_price").get
    val stack = scala.collection.mutable.Stack[Int](ix.rootPage)
    var matched = 0
    while (stack.nonEmpty) {
      val (entries, kids) =
        SqliteFile.indexPageStep(d2, stack.pop(), 100, 149)
      entries.foreach { e =>
        val out = new Array[SqliteFile.Value](1)
        SqliteFile.decodeRecord(e, Array(-1, 0), out)
        val rowid = out(0).asInstanceOf[Long]
        assert(SqliteFile.lookupRowid(d2, tdef.rootPage, rowid).isDefined)
        matched += 1
      }
      kids.foreach(stack.push)
    }
    val indexPages = d2.pagesRead
    d2.close()
    assert(matched == expect.size, s"$matched of ${expect.size}")
    assert(indexPages * 3 < fullPages,
      s"index path read $indexPages pages vs $fullPages full — no drop")
    Files.delete(db)
  }

  test("reader: TEXT secondary index — equality, range, and prefix " +
      "prune under BINARY collation; NOCASE is never chosen; a numeric " +
      "stored in the text column survives pruning") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("textidx") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, dom TEXT, nc TEXT COLLATE NOCASE, v TEXT)")
         |rows = [(i, 'host-%04d.example' % ((i * 37) % 2000), 'x%d' % i,
         |         'pad-' * 30 + str(i)) for i in range(1, 4001)]
         |c.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
         |# flexible typing: a NUMERIC key inside the TEXT-affine column
         |c.execute("INSERT INTO t (id, dom, nc, v) VALUES (4001, 5, 'y', 'num')")
         |c.execute("CREATE INDEX idx_dom ON t (dom)")
         |c.execute("CREATE INDEX idx_nc ON t (nc)")
         |c.commit(); c.close()
         |""".stripMargin
    }
    def scan() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    def dom(i: Int) = f"host-${(i * 37) % 2000}%04d.example"
    // equality
    val eq = scan().filter(col("dom") === "host-0037.example").select("id")
    assert(eq.queryExecution.executedPlan.toString.contains("index=idx_dom"),
      eq.queryExecution.executedPlan)
    assert(eq.collect().map(_.getLong(0)).toSet ==
      (1 to 4000).filter(i => dom(i) == "host-0037.example").map(_.toLong).toSet)
    // range (strict bound stays residual-correct)
    val rg = scan().filter(col("dom") > "host-1990" && col("dom") < "host-1995")
    val plan = rg.queryExecution.executedPlan.toString
    assert(plan.contains("index=idx_dom") &&
      plan.contains("key=[host-1990, host-1995]"), plan)
    assert(rg.count() ==
      (1 to 4000).count(i => dom(i) > "host-1990" && dom(i) < "host-1995"))
    // prefix -> [p, nextPrefix(p)) exclusive-hi range
    val pf = scan().filter(col("dom").startsWith("host-003"))
    val pplan = pf.queryExecution.executedPlan.toString
    assert(pplan.contains("index=idx_dom") &&
      pplan.contains("key=[host-003, host-004)"), pplan)
    assert(pf.count() == (1 to 4000).count(i => dom(i).startsWith("host-003")))
    // the numeric key sorts below all text: a text range must never
    // prune it silently — it reaches the residual filter coerced ("5")
    val num = scan().filter(col("dom") >= "4" && col("dom") <= "6")
    assert(num.queryExecution.executedPlan.toString.contains("index=idx_dom"))
    assert(num.select("dom").collect().map(_.getString(0)).toSet == Set("5"),
      "coerced numeric key must survive text-band pruning")
    // NOCASE column: byte-order pruning unsound, index never chosen
    val nc = scan().filter(col("nc") === "x5")
    assert(!nc.queryExecution.executedPlan.toString.contains("index="),
      nc.queryExecution.executedPlan)
    assert(nc.count() == 1, "NOCASE semantics stay with Spark")
    Files.delete(db)
  }

  test("reader: WITHOUT ROWID secondary index — covering projections " +
      "scan it (entries carry indexed + PK columns), non-covered " +
      "drive the PK-tuple lookback") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("woridsec") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE ev (k TEXT, grp INTEGER, payload TEXT, PRIMARY KEY (k)) WITHOUT ROWID")
         |c.executemany("INSERT INTO ev VALUES (?,?,?)",
         |  [("key-%04d" % i, (i * 13) % 200, 'pad-' * 30 + str(i))
         |   for i in range(3000)])
         |c.execute("CREATE INDEX idx_grp ON ev (grp)")
         |c.commit(); c.close()
         |""".stripMargin
    }
    def scan() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "ev").load()
    val expect = (0 until 3000).filter(i => (i * 13) % 200 == 42)
      .map(i => f"key-$i%04d").toSet
    // covering: (grp, k) both ride in the index entry — no table pages
    val cov = scan().filter(col("grp") === 42).select("k", "grp")
    val plan = cov.queryExecution.executedPlan.toString
    assert(plan.contains("index=idx_grp") && plan.contains("covering=true"),
      s"covering worowid index not chosen:\n$plan")
    assert(cov.collect().map(_.getString(0)).toSet == expect)
    // non-covered: payload is not in the entry — the entry's trailing
    // PK tuple (k, TEXT under BINARY collation) keys a point descent of
    // the table's PK index per match (r17-verdict #3: the lookback twin)
    val full = scan().filter(col("grp") === 42).select("k", "payload")
    val fplan = full.queryExecution.executedPlan.toString
    assert(fplan.contains("index=idx_grp") &&
      fplan.contains("covering=false"), fplan)
    val got = full.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.map(_._1) == expect)
    // payloads must be the TABLE row's, not entry residue
    assert(got.forall { case (k, p) =>
      p == "pad-" * 30 + k.stripPrefix("key-").toInt.toString })
    Files.delete(db)
  }

  test("reader: DESC / partial / expression indexes are never chosen") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("badidx") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER, b INTEGER, cx INTEGER)")
         |c.executemany("INSERT INTO t VALUES (?,?,?,?)",
         |  [(i, i % 100, i % 50, i % 25) for i in range(1, 1001)])
         |c.execute("CREATE INDEX idx_desc ON t (a DESC)")
         |c.execute("CREATE INDEX idx_part ON t (b) WHERE b > 10")
         |c.execute("CREATE INDEX idx_expr ON t (abs(cx))")
         |c.commit(); c.close()
         |""".stripMargin
    }
    def scan() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    for (c <- Seq("a", "b", "cx")) {
      val df = scan().filter(col(c) === 7)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("index="),
        s"unusable index chosen for $c:\n$plan")
      val expectN = (1 to 1000).count(i => (c match {
        case "a" => i % 100; case "b" => i % 50; case _ => i % 25
      }) == 7)
      assert(df.count() == expectN, s"$c: wrong rows")
    }
    Files.delete(db)
  }

  test("writer: a written secondary index is used by REAL SQLite " +
      "and by the format reader") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = Files.createTempFile("graft-idx-out", ".sqlite")
    // rowids ascend but the indexed value does not: the index tree's
    // sort (value, rowid) is what real SQLite must accept
    SqliteWriter.write(db, "m",
      Seq("id" -> "INTEGER PRIMARY KEY", "grp" -> "INTEGER", "v" -> "TEXT"),
      (1 to 3000).iterator.map(i =>
        Seq[Any](i.toLong, ((i * 13) % 300).toLong, s"v$i")),
      indexes = Seq(("idx_grp", Seq("grp"))))
    val outTsv = Files.createTempFile("graft-idx-out", ".tsv")
    py(s"""import sqlite3
          |c = sqlite3.connect(${q(db)})
          |ok, = c.execute("PRAGMA integrity_check").fetchone()
          |assert ok == 'ok', ok
          |plan = c.execute(
          |    "EXPLAIN QUERY PLAN SELECT id FROM m WHERE grp = 42").fetchall()
          |assert any('idx_grp' in str(r) for r in plan), plan
          |rows = c.execute(
          |    "SELECT id FROM m WHERE grp = 42 ORDER BY id").fetchall()
          |with open(${q(outTsv)}, 'w') as fh:
          |    fh.write(repr([r[0] for r in rows]))
          |c.close()
          |""".stripMargin)
    val expect = (1 to 3000).filter(i => (i * 13) % 300 == 42)
    assert(new String(Files.readAllBytes(outTsv), "UTF-8") ==
      expect.mkString("[", ", ", "]"),
      "real SQLite disagrees via the index")
    // and the format reader picks the same index up
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "m").load()
      .filter(col("grp") === 42)
    assert(df.queryExecution.executedPlan.toString.contains("index=idx_grp"))
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      expect.map(_.toLong))
    Files.delete(db); Files.delete(outTsv)
  }

  test("writer: WITHOUT ROWID boundary sweep — no empty leaves or " +
      "zero-cell interior pages at any fill level") {
    // Round-16 advice: when the entry that triggers leaf closure is the
    // FINAL entry it used to be promoted anyway, leaving an empty
    // trailing index leaf; and a lone trailing child used to get a
    // zero-cell interior page. Sweeping consecutive row counts at a
    // fixed payload width provably crosses every leaf/interior
    // boundary, including closure-at-last-entry. Two sweeps: ~200 B
    // payloads cross leaf boundaries, ~990 B payloads (3-4 cells a
    // page) cross interior-page boundaries cheaply. Each file is
    // page-shape checked in-JVM, then ALL go through a real SQLite
    // integrity_check + count in one python pass.
    val dir = Files.createTempDirectory("graft-worid-sweep")
    val cases = ((1 to 45).map(n => (n, 200)) ++
      (40 to 100).map(n => (n, 990))).zipWithIndex
    cases.foreach { case ((n, width), i) =>
      val db = dir.resolve(s"s$i.sqlite")
      SqliteWriter.writeWithoutRowid(db, "t",
        Seq("id" -> "INTEGER", "v" -> "TEXT"), Seq("id"),
        (1 to n).iterator.map(k => Seq[Any](k.toLong, "x" * width)))
      // in-JVM page-shape audit: every index page must carry >= 1 cell
      val bytes = Files.readAllBytes(db)
      val pageSize = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
      var p = 1
      while ((p + 1) * pageSize <= bytes.length) {
        val off = p * pageSize
        val tpe = bytes(off) & 0xff
        if (tpe == 0x0a || tpe == 0x02) {
          val cells = ((bytes(off + 3) & 0xff) << 8) | (bytes(off + 4) & 0xff)
          assert(cells >= 1,
            s"n=$n width=$width: page ${p + 1} type=$tpe has zero cells")
        }
        p += 1
      }
    }
    if (pyAvailable) py(
      s"""import sqlite3, os
         |cases = ${cases.map { case ((n, _), i) => s"($i,$n)" }
             .mkString("[", ",", "]")}
         |for i, n in cases:
         |    c = sqlite3.connect(os.path.join(${q(dir)}, 's%d.sqlite' % i))
         |    ok, = c.execute("PRAGMA integrity_check").fetchone()
         |    assert ok == 'ok', 'case %d: %s' % (i, ok)
         |    cnt, = c.execute("SELECT count(*) FROM t").fetchone()
         |    assert cnt == n, 'case %d: %d != %d' % (i, cnt, n)
         |    mn, mx = c.execute("SELECT min(id), max(id) FROM t").fetchone()
         |    assert (mn, mx) == (1, n), 'case %d: %s' % (i, (mn, mx))
         |    c.close()
         |""".stripMargin)
    cases.foreach { case (_, i) => Files.delete(dir.resolve(s"s$i.sqlite")) }
    Files.delete(dir)
  }

  test("writer: WITHOUT ROWID keys above 2^53 compare exactly") {
    val db = Files.createTempFile("graft-bigkey", ".sqlite")
    val base = 1L << 53
    SqliteWriter.writeWithoutRowid(db, "t",
      Seq("id" -> "INTEGER", "v" -> "TEXT"), Seq("id"),
      Iterator(Seq[Any](base, "a"), Seq[Any](base + 1, "b")))
    val df = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    assert(df.count() == 2, "2^53 and 2^53+1 are DISTINCT keys")
    Files.delete(db)
  }

  test("reader: WAL-mode database reads the last COMMITTED snapshot " +
      "(hot -wal overlay, updates win over main-file pages)") {
    assume(pyAvailable, "python3/sqlite3 not available")
    // build a db whose -wal holds committed, UNCHECKPOINTED frames:
    // copy db + wal while the writing connection is still open (closing
    // it would auto-checkpoint and hide the interesting state)
    val dst = Files.createTempFile("graft-walread", ".sqlite")
    Files.delete(dst)
    val src = fixture("walsrc") { p =>
      s"""import sqlite3, shutil
         |c = sqlite3.connect(${q(p)})
         |c.execute("PRAGMA journal_mode=WAL")
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
         |c.executemany("INSERT INTO t VALUES (?,?)",
         |              [(i, 'v%d' % i) for i in range(1, 401)])
         |c.commit()
         |c.execute("PRAGMA wal_checkpoint(TRUNCATE)")
         |# frames from here live ONLY in the -wal
         |c.execute("UPDATE t SET v = 'updated-' || id WHERE id <= 50")
         |c.commit()
         |c.executemany("INSERT INTO t VALUES (?,?)",
         |              [(i, 'v%d' % i) for i in range(401, 601)])
         |c.commit()
         |shutil.copy(${q(p)}, ${q(dst)})
         |shutil.copy(${q(p)} + "-wal", ${q(dst)} + "-wal")
         |c.close()
         |""".stripMargin
    }
    def read() = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", dst.toString).option("table", "t").load()
    val df = read()
    assert(df.count() == 600, "rows committed only to the WAL must appear")
    assert(df.filter(col("id") === 10).head.getString(1) == "updated-10",
      "a WAL frame must override the checkpointed main-file page")
    assert(df.filter(col("id") === 550).head.getString(1) == "v550")
    // torn tail: truncating the WAL mid-frame invalidates the final
    // commit's checksum chain — the reader falls back to the previous
    // committed snapshot (updates visible, the 200 inserts gone)
    val walPath = java.nio.file.Paths.get(dst.toString + "-wal")
    val walLen = Files.size(walPath)
    val ch = java.nio.channels.FileChannel.open(walPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(walLen - 100) finally ch.close()
    val torn = read()
    assert(torn.count() == 400,
      "a torn WAL tail must cut back to the last whole commit")
    assert(torn.filter(col("id") === 10).head.getString(1) == "updated-10")
    Files.delete(dst); Files.delete(walPath); Files.delete(src)
    Seq(src.toString + "-wal", src.toString + "-shm").foreach { s =>
      val p = java.nio.file.Paths.get(s)
      if (Files.exists(p)) Files.delete(p)
    }
  }

  test("reader: a rollback-journal database with a stray -wal refuses") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("stray") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (a INTEGER)")
         |c.execute("INSERT INTO t VALUES (1)")
         |c.commit(); c.close()
         |""".stripMargin
    }
    Files.write(java.nio.file.Paths.get(db.toString + "-wal"),
      "garbage".getBytes("UTF-8"))
    val e = intercept[Exception] {
      spark.read.format(classOf[SqliteDataSource].getName)
        .option("path", db.toString).option("table", "t").load().count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("-wal")),
      s"expected the stray-wal refusal, got: ${msgs(e).mkString(" | ")}")
    Files.delete(db)
    Files.delete(java.nio.file.Paths.get(db.toString + "-wal"))
  }

  test("reader: boundary-value range filters do not wrap (Long.MaxValue)") {
    assume(pyAvailable, "python3/sqlite3 not available")
    val db = fixture("bounds") { p =>
      s"""import sqlite3
         |c = sqlite3.connect(${q(p)})
         |c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
         |c.executemany("INSERT INTO t VALUES (?,?)",
         |              [(i, 'v%d' % i) for i in range(1, 11)])
         |c.commit(); c.close()
         |""".stripMargin
    }
    val base = spark.read.format(classOf[SqliteDataSource].getName)
      .option("path", db.toString).option("table", "t").load()
    assert(base.filter(col("id") > Long.MaxValue).count() == 0,
      "id > Long.MaxValue must select nothing (no wraparound)")
    assert(base.filter(col("id") < Long.MinValue).count() == 0,
      "id < Long.MinValue must select nothing (no wraparound)")
    Files.delete(db)
  }

  private def q(p: Path): String = "r'" + p.toString + "'"
}
