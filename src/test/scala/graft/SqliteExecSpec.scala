package graft

import graft.sql._
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Third LIVE differential engine for the SQL generator: generated
  * sqlite-dialect SQL executes in a real SQLite (the python stdlib
  * `sqlite3` module — no dependency to install) and row sets are diffed
  * against Spark executing the same plan. SQLite exercises corners the
  * other two engines don't: dynamic typing (no BOOLEAN/DOUBLE types —
  * CAST targets are TEXT/REAL/INTEGER affinities), the `IS` operator as
  * null-safe equality (`IS NOT DISTINCT FROM` only aliased in 3.39),
  * and the loosest grammar of the four, which catches generator output
  * that only works because stricter engines would have rejected the
  * plan earlier. Reference dialect:
  * /root/reference/crates/sql/src/sql_generator/dialects/sqlite.rs.
  */
class SqliteExecSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private val users = Seq((1, "ann", 7.5), (2, "bob", 3.0), (3, "cyd", 9.25),
    (4, "dee", 3.0), (5, "eve", 1.0))
  private val orders = Seq((10, 1, 50.0), (11, 1, 70.0), (12, 2, 20.0),
    (13, 3, 10.0), (14, 3, 90.0), (15, 5, 30.0))

  private val bridgePy =
    """import glob, os, sqlite3, sys
      |d = sys.argv[1]
      |con = sqlite3.connect(":memory:")
      |con.executescript(open(os.path.join(d, "setup.sql")).read())
      |for f in sorted(glob.glob(os.path.join(d, "case_*.sql"))):
      |    base = f[:-4]
      |    try:
      |        rows = con.execute(open(f).read()).fetchall()
      |        with open(base + ".out", "w") as fh:
      |            for r in rows:
      |                cells = []
      |                for v in r:
      |                    if v is None:
      |                        cells.append("NULL")
      |                    elif isinstance(v, (int, float)):
      |                        cells.append("%.6f" % float(v))
      |                    else:
      |                        cells.append(str(v))
      |                fh.write("\t".join(cells) + "\n")
      |    except Exception as e:
      |        with open(base + ".err", "w") as fh:
      |            fh.write(str(e))
      |con.close()
      |""".stripMargin

  private def setupSql: String = {
    def vals(rows: Seq[Product]): String =
      rows.map(r => r.productIterator.map {
        case s: String => s"'$s'"
        case x => x.toString
      }.mkString("(", ", ", ")")).mkString(", ")
    s"""CREATE TABLE "sqlexec_users" ("id" INT, "name" TEXT, "score" REAL);
       |INSERT INTO "sqlexec_users" VALUES ${vals(users)};
       |CREATE TABLE "sqlexec_orders" ("order_id" INT, "user_id" INT, "amount" REAL);
       |INSERT INTO "sqlexec_orders" VALUES ${vals(orders)};
       |CREATE TABLE "lite_nulls" ("id" INT, "a" TEXT, "b" TEXT);
       |INSERT INTO "lite_nulls" VALUES (1, 'x', 'x'), (2, 'x', NULL), (3, NULL, NULL);
       |CREATE TABLE "lite_notes" ("id" INT, "note" TEXT);
       |INSERT INTO "lite_notes" VALUES (1, '50% off sale'), (2, '50 units left');
       |""".stripMargin
  }

  override def beforeAll(): Unit = {
    import spark.implicits._
    users.toDF("id", "name", "score").createOrReplaceTempView("sqlexec_users")
    orders.toDF("order_id", "user_id", "amount")
      .createOrReplaceTempView("sqlexec_orders")
    Seq((1, Some("x"), Some("x")), (2, Some("x"), None), (3, None, None))
      .toDF("id", "a", "b").createOrReplaceTempView("lite_nulls")
    Seq((1, "50% off sale"), (2, "50 units left")).toDF("id", "note")
      .createOrReplaceTempView("lite_notes")
  }

  /** Run each SQL in one python sqlite3 process; Right(rows) or Left(err). */
  private def liteRun(sqls: Seq[String]): Seq[Either[String, Seq[String]]] = {
    val dir = Files.createTempDirectory("graft-sqliteexec")
    Files.writeString(dir.resolve("setup.sql"), setupSql)
    Files.writeString(dir.resolve("bridge.py"), bridgePy)
    sqls.zipWithIndex.foreach { case (sql, i) =>
      Files.writeString(dir.resolve(f"case_$i%04d.sql"), sql)
    }
    val log = new StringBuilder
    val code = Process(Seq("python3", dir.resolve("bridge.py").toString,
      dir.toString)).!(ProcessLogger(s => log.append(s).append('\n')))
    assert(code == 0, s"sqlite bridge failed: $log")
    sqls.indices.map { i =>
      val out = dir.resolve(f"case_$i%04d.out")
      val err = dir.resolve(f"case_$i%04d.err")
      if (Files.exists(err)) Left(Files.readString(err))
      else Right(Files.readString(out).split("\n").filter(_.nonEmpty).toSeq)
    }
  }

  private def sparkRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case x: java.lang.Number => BigDecimal(x.doubleValue).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toString
      case x => x.toString
    }.mkString("\t"))

  private def compare(df: DataFrame, sql: String,
      remote: Either[String, Seq[String]], ordered: Boolean, clue: String): Unit = {
    val r = remote.fold(e => fail(s"$clue SQLite error for:\n$sql\n$e"), identity)
    val local = sparkRows(df)
    def norm(rs: Seq[String]) = if (ordered) rs else rs.sorted
    assert(norm(r) == norm(local),
      s"$clue MISMATCH for generated SQL:\n$sql\nremote=$r\nlocal=$local")
  }

  private def check(df: DataFrame, ordered: Boolean = false): String = {
    val sql = GraftSqlGen.forDataFrame(df, "sqlite").get
    compare(df, sql, liteRun(Seq(sql)).head, ordered, "")
    sql
  }

  private def checkAll(dfs: Seq[(DataFrame, Boolean)], clue: Int => String): Unit = {
    val sqls = dfs.map { case (df, _) => GraftSqlGen.forDataFrame(df, "sqlite").get }
    val results = liteRun(sqls)
    dfs.zip(sqls).zip(results).zipWithIndex.foreach {
      case ((((df, ordered), sql), remote), i) =>
        compare(df, sql, remote, ordered, clue(i))
    }
  }

  private def u = spark.table("sqlexec_users")
  private def o = spark.table("sqlexec_orders")

  test("sqlite: scan, filter, join, aggregate, sort+limit in one batch") {
    checkAll(Seq(
      (u, false),
      (u.filter(col("score") > 2.0 && col("name") =!= "bob")
        .select(col("id"), col("name")), false),
      (u.join(o, col("id") === col("user_id"))
        .groupBy(col("name")).agg(sum(col("amount")).as("total"))
        .filter(col("total") > 25.0), false),
      (u.join(o, col("id") === col("user_id"), "left")
        .select(col("id"), col("order_id")), false),
      (u.orderBy(col("score").desc, col("id")).limit(3).offset(1), true),
      (u.select(col("score")).distinct(), false),
      (u.select(col("id")).union(o.select(col("user_id"))), false),
      (u.select(upper(col("name")).as("un"), length(col("name")).as("n")), false),
      (u.select(col("id"),
        when(col("score") >= 7.0, lit("high"))
          .when(col("score") >= 3.0, lit("mid"))
          .otherwise(lit("low")).as("band"),
        (col("score") * 2 + 1).as("adj")), false)),
      i => s"batch case $i:")
  }

  test("sqlite: window functions execute — ranking, running totals, global rank") {
    import org.apache.spark.sql.expressions.Window
    checkAll(Seq(
      (u.withColumn("rn", row_number().over(
        Window.partitionBy(col("score")).orderBy(col("id")))), false),
      (o.withColumn("running", sum(col("amount")).over(
        Window.partitionBy(col("user_id")).orderBy(col("order_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))), false),
      (u.withColumn("r", rank().over(
        Window.orderBy(col("score").desc, col("id")))), false)),
      i => s"window case $i:")
  }

  test("sqlite: null-safe equality renders as the IS operator") {
    val sql = check(spark.table("lite_nulls").filter(col("a") <=> col("b"))
      .select(col("id")))
    assert(sql.contains("\"a\" IS \"b\"") || sql.contains("IS "), sql)
    assert(!sql.contains("IS NOT DISTINCT FROM"), sql)
    check(spark.table("lite_nulls").filter(!(col("a") <=> col("b")))
      .select(col("id")))
  }

  test("sqlite: LIKE with escaped wildcard matches literally") {
    check(spark.table("lite_notes").filter(col("note").contains("50%")))
  }

  test("sqlite: join/aggregate differential fuzz — 30 generated plans match") {
    // the SAME generator recipe and seed as the Derby and DuckDB fuzzes:
    // a case passing on two engines and failing on the third is a
    // dialect bug by construction
    val rnd = new scala.util.Random(42424242)
    val aggFns = Seq[(org.apache.spark.sql.Column => org.apache.spark.sql.Column, String)](
      (c => sum(c), "s"), (c => count(c), "c"), (c => min(c), "mn"),
      (c => max(c), "mx"), (c => avg(c), "av"))
    val cases = (1 to 30).map { _ =>
      val joined = rnd.nextInt(3) match {
        case 0 => u.join(o, col("id") === col("user_id"))
        case 1 => u.join(o, col("id") === col("user_id"), "left")
        case _ => u
      }
      val filtered =
        if (rnd.nextBoolean()) joined.filter(col("score") > rnd.nextInt(8)) else joined
      val hasAmount = filtered.columns.contains("amount")
      val aggCol = if (hasAmount && rnd.nextBoolean()) col("amount") else col("score")
      val shaped =
        if (rnd.nextBoolean()) {
          val (fn, nm) = aggFns(rnd.nextInt(aggFns.length))
          filtered.groupBy(col("name")).agg(fn(aggCol).as(nm))
        } else filtered.select(col("name"), aggCol.as("v"))
      if (rnd.nextBoolean()) shaped.limit(1 + rnd.nextInt(10)) else shaped
    }
    // limits without ORDER BY are row-count-only checks: compare sizes
    val sqls = cases.map(df => GraftSqlGen.forDataFrame(df, "sqlite").get)
    val results = liteRun(sqls)
    cases.zip(sqls).zip(results).zipWithIndex.foreach {
      case (((df, sql), remote), i) =>
        val r = remote.fold(e => fail(s"fuzz $i SQLite error:\n$sql\n$e"), identity)
        val local = sparkRows(df)
        if (sql.contains("LIMIT"))
          assert(r.size == local.size, s"fuzz $i row-count mismatch:\n$sql")
        else assert(r.sorted == local.sorted,
          s"fuzz $i MISMATCH:\n$sql\nremote=$r\nlocal=$local")
    }
  }
}
