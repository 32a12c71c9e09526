package graft

import graft.sql._
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Second LIVE differential engine for the SQL generator: generated
  * DuckDB-dialect SQL executes in a real DuckDB (the python module the
  * correctness oracle already uses) and the row sets are diffed against
  * Spark executing the same plan. Derby (SqlGenExecSpec) proves the
  * ANSI-FETCH/no-VALUES/rewritten-null-safe-eq corner of the dialect
  * space; DuckDB proves the opposite corner — native LIMIT/OFFSET,
  * VALUES, IS NOT DISTINCT FROM, NULLS FIRST — so generator bugs that one
  * engine's grammar happens to mask are caught by the other.
  *
  * The bridge batches every case of a test into ONE python process:
  * case_N.sql files in, case_N.out (normalized rows) or case_N.err files
  * back. Skips cleanly if python3/duckdb is unavailable.
  */
class DuckDbExecSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private val users = Seq((1, "ann", 7.5), (2, "bob", 3.0), (3, "cyd", 9.25),
    (4, "dee", 3.0), (5, "eve", 1.0))
  private val orders = Seq((10, 1, 50.0), (11, 1, 70.0), (12, 2, 20.0),
    (13, 3, 10.0), (14, 3, 90.0), (15, 5, 30.0))

  private lazy val duckAvailable: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  private val bridgePy =
    """import glob, os, sys
      |import duckdb
      |d = sys.argv[1]
      |con = duckdb.connect()
      |for stmt in open(os.path.join(d, "setup.sql")).read().split(";\n"):
      |    if stmt.strip():
      |        con.execute(stmt)
      |for f in sorted(glob.glob(os.path.join(d, "case_*.sql"))):
      |    base = f[:-4]
      |    try:
      |        rows = con.sql(open(f).read()).fetchall()
      |        with open(base + ".out", "w") as fh:
      |            for r in rows:
      |                cells = []
      |                for v in r:
      |                    if v is None:
      |                        cells.append("NULL")
      |                    elif isinstance(v, bool):
      |                        cells.append(str(v).lower())
      |                    elif isinstance(v, (int, float)) or type(v).__name__ == "Decimal":
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
    s"""CREATE TABLE "sqlexec_users" ("id" INT, "name" VARCHAR, "score" DOUBLE);
       |INSERT INTO "sqlexec_users" VALUES ${vals(users)};
       |CREATE TABLE "sqlexec_orders" ("order_id" INT, "user_id" INT, "amount" DOUBLE);
       |INSERT INTO "sqlexec_orders" VALUES ${vals(orders)};
       |CREATE TABLE "duck_notes" ("id" INT, "note" VARCHAR);
       |INSERT INTO "duck_notes" VALUES (1, '50% off sale'), (2, '50 units left');
       |CREATE TABLE "duck_nulls" ("id" INT, "a" VARCHAR, "b" VARCHAR);
       |INSERT INTO "duck_nulls" VALUES (1, 'x', 'x'), (2, 'x', NULL), (3, NULL, NULL);
       |""".stripMargin
  }

  override def beforeAll(): Unit = {
    import spark.implicits._
    users.toDF("id", "name", "score").createOrReplaceTempView("sqlexec_users")
    orders.toDF("order_id", "user_id", "amount")
      .createOrReplaceTempView("sqlexec_orders")
    Seq((1, "50% off sale"), (2, "50 units left")).toDF("id", "note")
      .createOrReplaceTempView("duck_notes")
    Seq((1, Some("x"), Some("x")), (2, Some("x"), None), (3, None, None))
      .toDF("id", "a", "b").createOrReplaceTempView("duck_nulls")
  }

  /** Run each SQL in one DuckDB process; Right(rows) or Left(error). */
  private def duckRun(sqls: Seq[String]): Seq[Either[String, Seq[String]]] = {
    val dir = Files.createTempDirectory("graft-duckexec")
    Files.writeString(dir.resolve("setup.sql"), setupSql)
    Files.writeString(dir.resolve("bridge.py"), bridgePy)
    sqls.zipWithIndex.foreach { case (sql, i) =>
      Files.writeString(dir.resolve(f"case_$i%04d.sql"), sql)
    }
    val log = new StringBuilder
    val code = Process(Seq("python3", dir.resolve("bridge.py").toString,
      dir.toString)).!(ProcessLogger(s => log.append(s).append('\n')))
    assert(code == 0, s"duckdb bridge failed: $log")
    sqls.indices.map { i =>
      val out = dir.resolve(f"case_$i%04d.out")
      val err = dir.resolve(f"case_$i%04d.err")
      if (Files.exists(err)) Left(Files.readString(err))
      else Right(Files.readString(out).split("\n").filter(_.nonEmpty).toSeq)
    }
  }

  /** Spark rows normalized exactly like the bridge normalizes DuckDB's. */
  private def sparkRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case b: java.lang.Boolean => b.toString
      case x: java.lang.Number => BigDecimal(x.doubleValue).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toString
      case x => x.toString
    }.mkString("\t"))

  private def compare(df: DataFrame, sql: String,
      remote: Either[String, Seq[String]], ordered: Boolean, clue: String): Unit = {
    val r = remote.fold(e => fail(s"$clue DuckDB error for:\n$sql\n$e"), identity)
    val local = sparkRows(df)
    def norm(rs: Seq[String]) = if (ordered) rs else rs.sorted
    assert(norm(r) == norm(local),
      s"$clue MISMATCH for generated SQL:\n$sql\nremote=$r\nlocal=$local")
  }

  private def check(df: DataFrame, ordered: Boolean = false): String = {
    assume(duckAvailable, "python3/duckdb not available")
    val sql = GraftSqlGen.forDataFrame(df, "duckdb").get
    compare(df, sql, duckRun(Seq(sql)).head, ordered, "")
    sql
  }

  /** Batched: generate everything first, one bridge run, compare all. */
  private def checkAll(dfs: Seq[(DataFrame, Boolean)], clue: Int => String): Unit = {
    assume(duckAvailable, "python3/duckdb not available")
    val sqls = dfs.map { case (df, _) => GraftSqlGen.forDataFrame(df, "duckdb").get }
    val results = duckRun(sqls)
    dfs.zip(sqls).zip(results).zipWithIndex.foreach {
      case ((((df, ordered), sql), remote), i) =>
        compare(df, sql, remote, ordered, clue(i))
    }
  }

  private def u = spark.table("sqlexec_users")
  private def o = spark.table("sqlexec_orders")

  test("duck: plain scan") {
    val sql = check(u)
    assert(sql.contains("\"sqlexec_users\" AS \"rel_0\""))
  }

  test("duck: projection + compound filter") {
    check(u.filter(col("score") > 2.0 && col("name") =!= "bob")
      .select(col("id"), col("name")))
  }

  test("duck: inner join with aggregation and HAVING") {
    check(u.join(o, col("id") === col("user_id"))
      .groupBy(col("name")).agg(sum(col("amount")).as("total"))
      .filter(col("total") > 25.0))
  }

  test("duck: left outer join preserves unmatched rows") {
    check(u.join(o, col("id") === col("user_id"), "left")
      .select(col("id"), col("order_id")))
  }

  test("duck: sort+limit+offset use native LIMIT/OFFSET syntax") {
    val sql = check(u.orderBy(col("score").desc_nulls_last, col("id"))
      .limit(3).offset(1), ordered = true)
    assert(sql.contains("LIMIT"), sql)
    assert(sql.contains("OFFSET 1"), sql)
    assert(!sql.contains("FETCH NEXT"), sql)
  }

  test("duck: distinct, union all, CASE WHEN, scalar functions") {
    checkAll(Seq(
      (u.select(col("score")).distinct(), false),
      (u.select(col("id")).union(o.select(col("user_id"))), false),
      (u.select(col("id"),
        when(col("score") >= 7.0, lit("high"))
          .when(col("score") >= 3.0, lit("mid"))
          .otherwise(lit("low")).as("band"),
        (col("score") * 2 + 1).as("adj")), false),
      (u.select(upper(col("name")).as("un"), length(col("name")).as("n")), false),
      (u.filter(col("score") > 1.0).alias("f")
        .groupBy().agg(count(lit(1)).as("n"), avg(col("score")).as("avg_score")),
        false)),
      i => s"batch case $i:")
  }

  test("duck: window functions execute — ranking, running totals, global rank") {
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

  test("duck: null-safe equality uses native IS NOT DISTINCT FROM") {
    val sql = check(spark.table("duck_nulls").filter(col("a") <=> col("b"))
      .select(col("id")))
    assert(sql.contains("IS NOT DISTINCT FROM"), sql)
    check(spark.table("duck_nulls").filter(!(col("a") <=> col("b")))
      .select(col("id")))
  }

  test("duck: LIKE with escaped wildcard matches literally") {
    check(spark.table("duck_notes").filter(col("note").contains("50%")))
  }

  test("duck: join/aggregate differential fuzz — 30 generated plans match") {
    // same generator recipe and seed as the Derby fuzz: any case that
    // passes on one engine and fails on the other is a DIALECT bug
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
          val agged = filtered.groupBy(col("name")).agg(fn(aggCol).as(nm))
          if (rnd.nextBoolean()) agged.filter(col(nm).isNotNull) else agged
        } else filtered.select(col("id"), col("name"))
      (shaped, false)
    }
    checkAll(cases, i => s"join/agg fuzz case ${i + 1}:")
  }

  test("duck: randomized differential fuzz — 40 generated plans match") {
    val rnd = new scala.util.Random(20260812)
    val numCols = Seq("id", "score")
    val cmps = Seq[(org.apache.spark.sql.Column, Double) => org.apache.spark.sql.Column](
      (c, v) => c > v, (c, v) => c >= v, (c, v) => c < v,
      (c, v) => c <= v, (c, v) => c === v, (c, v) => c =!= v)
    def leaf(): org.apache.spark.sql.Column = {
      val c = col(numCols(rnd.nextInt(numCols.length)))
      val v = BigDecimal(rnd.nextDouble() * 10).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      cmps(rnd.nextInt(cmps.length))(c, v)
    }
    def pred(depth: Int): org.apache.spark.sql.Column =
      if (depth == 0 || rnd.nextBoolean()) leaf()
      else if (rnd.nextBoolean()) pred(depth - 1) && pred(depth - 1)
      else pred(depth - 1) || pred(depth - 1)
    val cases = (1 to 40).map { _ =>
      val base = u.filter(pred(2))
      val projected =
        if (rnd.nextBoolean()) base.select(col("id"), col("name"))
        else base
      val shaped =
        if (rnd.nextBoolean())
          projected.orderBy(col("id")).limit(1 + rnd.nextInt(5))
        else projected
      val ordered = shaped.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.GlobalLimit]
      (shaped, ordered)
    }
    checkAll(cases, i => s"fuzz case ${i + 1}:")
  }
}
