package graft

import graft.sql.substrait.SubstraitProducer
import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** The Substrait producer executed in a SECOND ENGINE: produced plan bytes
  * run in Acero (pyarrow.substrait.run_query) over the same parquet
  * tables, and row sets are diffed against Spark executing the identical
  * logical plan. This is the same differential discipline as the SQL
  * generator's Derby/DuckDB specs, applied to the binary-plan tier the
  * reference reserves for DuckDB's `from_substrait(?)` — a consumer with
  * its own independent decoder, so a single wrong field number, varint,
  * or ordinal fails loudly here.
  *
  * Bridge: one python process per batch; case_N.plan files in,
  * case_N.out (normalized rows) or case_N.err back. Skips cleanly when
  * python3/pyarrow.substrait is unavailable.
  */
class SubstraitExecSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val aceroAvailable: Boolean =
    try Process(Seq("python3", "-c", "import pyarrow.substrait")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  private val bridgePy =
    """import glob, os, sys
      |import pyarrow as pa
      |import pyarrow.parquet as pq
      |import pyarrow.substrait as ps
      |d, sf = sys.argv[1], sys.argv[2]
      |def provider(names, schema):
      |    tbl = pq.read_table(os.path.join(sf, names[0] + ".parquet"))
      |    return tbl.select(schema.names)
      |for f in sorted(glob.glob(os.path.join(d, "case_*.plan"))):
      |    base = f[:-5]
      |    try:
      |        plan = open(f, "rb").read()
      |        res = ps.run_query(pa.py_buffer(plan), table_provider=provider,
      |                           use_threads=False).read_all()
      |        # positional column access: to_pylist() keys rows by column
      |        # NAME, silently collapsing duplicate names (e.g. self-joins)
      |        cols = [res.column(i).to_pylist() for i in range(res.num_columns)]
      |        with open(base + ".out", "w") as fh:
      |            for r in zip(*cols):
      |                cells = []
      |                for v in r:
      |                    if v is None:
      |                        cells.append("NULL")
      |                    elif isinstance(v, bool):
      |                        cells.append(str(v).lower())
      |                    elif isinstance(v, (int, float)):
      |                        cells.append("%.6f" % float(v))
      |                    else:
      |                        cells.append(str(v))
      |                fh.write("\t".join(cells) + "\n")
      |    except Exception as e:
      |        with open(base + ".err", "w") as fh:
      |            fh.write("%s: %s" % (type(e).__name__, e))
      |""".stripMargin

  /** Run each plan in one Acero process; Right(rows) or Left(error). */
  private def aceroRun(plans: Seq[Array[Byte]]): Seq[Either[String, Seq[String]]] = {
    val dir = Files.createTempDirectory("graft-substrait")
    Files.writeString(dir.resolve("bridge.py"), bridgePy)
    plans.zipWithIndex.foreach { case (p, i) =>
      Files.write(dir.resolve(f"case_$i%04d.plan"), p)
    }
    val log = new StringBuilder
    val code = Process(Seq("python3", dir.resolve("bridge.py").toString,
      dir.toString, sf)).!(ProcessLogger(s => log.append(s).append('\n')))
    assert(code == 0, s"acero bridge failed: $log")
    plans.indices.map { i =>
      val out = dir.resolve(f"case_$i%04d.out")
      val err = dir.resolve(f"case_$i%04d.err")
      if (Files.exists(err)) Left(Files.readString(err))
      else Right(Files.readString(out).split("\n").filter(_.nonEmpty).toSeq)
    }
  }

  private def sparkRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case b: java.lang.Boolean => b.toString
      case x: java.lang.Number => BigDecimal(x.doubleValue).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toString
      case x => x.toString
    }.mkString("\t"))

  private def checkAll(dfs: Seq[(DataFrame, Boolean)], clue: Int => String): Unit = {
    assume(aceroAvailable, "python3/pyarrow.substrait not available")
    val plans = dfs.map { case (df, _) => SubstraitProducer.produce(df) }
    val results = aceroRun(plans)
    dfs.zip(results).zipWithIndex.foreach { case (((df, ordered), remote), i) =>
      val r = remote.fold(e => fail(s"${clue(i)} Acero error: $e"), identity)
      val local = sparkRows(df)
      def norm(rs: Seq[String]) = if (ordered) rs else rs.sorted
      assert(norm(r) == norm(local),
        s"${clue(i)} MISMATCH\nacero=${r.take(5)}\nspark=${local.take(5)}")
    }
  }

  private def check(df: DataFrame, ordered: Boolean = false): Unit =
    checkAll(Seq((df, ordered)), _ => "")

  private def nation = spark.table("nation")
  private def customer = spark.table("customer")
  private def documents = spark.table("documents")

  override def withFixture(test: NoArgTest) = {
    Tables(spark, sf).registerAll()
    super.withFixture(test)
  }

  test("substrait: plain named-table scan") {
    check(nation)
  }

  test("substrait: filter + projection") {
    check(nation
      .filter(col("n_regionkey") > 1 && col("n_nationkey") =!= 5)
      .select(col("n_name"), col("n_nationkey")))
  }

  test("substrait: arithmetic expressions and cast") {
    check(customer.select(col("c_custkey"),
      (col("c_acctbal") * lit(2.0) + lit(1.0)).as("adj"),
      col("c_nationkey").cast("long").as("nk64")))
  }

  test("substrait: boolean operators and null predicates") {
    check(customer
      .filter((col("c_acctbal") >= 0.0 || col("c_mktsegment") === "BUILDING")
        && col("c_name").isNotNull && !(col("c_nationkey") < 2))
      .select(col("c_custkey")))
  }

  test("substrait: sort + fetch is ordered") {
    // Acero rejects MIXED null placement across sort keys
    // (ArrowNotImplementedError), so both keys place nulls first; the
    // producer still encodes all four direction enums
    check(customer
      .orderBy(col("c_acctbal").desc_nulls_first, col("c_custkey").asc)
      .limit(10)
      .select(col("c_custkey"), col("c_acctbal")),
      ordered = true)
  }

  test("substrait: group-by with sum/count/min/max/avg and HAVING") {
    checkAll(Seq(
      (customer.groupBy(col("c_mktsegment")).agg(
        sum(col("c_acctbal")).as("total"),
        count(lit(1)).as("n"),
        min(col("c_acctbal")).as("lo"),
        max(col("c_acctbal")).as("hi"),
        avg(col("c_acctbal")).as("mean")), false),
      (customer.groupBy(col("c_nationkey")).agg(sum(col("c_acctbal")).as("t"))
        .filter(col("t") > 0.0), false),
      (documents.groupBy(col("lang")).agg(
        count(col("doc_id")).as("docs"),
        sum(col("n_chars")).as("chars")), false)),
      i => s"agg case $i:")
  }

  test("substrait: distinct is group-by-everything") {
    check(nation.select(col("n_regionkey")).distinct())
  }

  test("substrait: the router's Substrait tier yields plan bytes") {
    import graft.sql.GraftSqlGen
    val df = nation.select(col("n_name"))
    assert(GraftSqlGen.substraitForDataFrame(df, "datafusion").exists(_.nonEmpty))
    assert(GraftSqlGen.substraitForDataFrame(df, "duckdb").isEmpty,
      "duckdb routes through SQL text here (live DuckDbExecSpec), not Substrait")
    assert(GraftSqlGen.substraitForDataFrame(df, "unknown_source").isEmpty)
  }

  test("substrait: inner equi-join across two named tables") {
    check(customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_name"), col("n_name")))
  }

  test("substrait: left join preserves unmatched rows as nulls") {
    check(nation
      .join(customer.filter(col("c_custkey") < 5),
        col("n_nationkey") === col("c_nationkey"), "left")
      .select(col("n_name"), col("c_name")))
  }

  test("substrait: USING-style join resolves through the analyzer's rewrite") {
    // df.join(other, Seq(col)) analyzes to Project(coalesce..., Join) —
    // covered by the generic project/join paths, no special casing
    check(nation.alias("a")
      .join(nation.alias("b"), Seq("n_regionkey"))
      .select(col("a.n_name"), col("b.n_name")))
  }

  test("substrait: join + aggregate federation shape") {
    check(customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("customers"), sum(col("c_acctbal")).as("balance")))
  }

  test("substrait: unsupported shapes fail loudly, not silently") {
    intercept[SubstraitProducer.SubstraitUnsupported] {
      SubstraitProducer.produce(customer.select(col("c_custkey"),
        rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("c_acctbal"))).as("r")))
    }
    intercept[SubstraitProducer.SubstraitUnsupported] {
      SubstraitProducer.produce(
        customer.groupBy(col("c_custkey") % 3).agg(count(lit(1))))
    }
  }

  test("substrait: mixed null placement across sort keys refuses " +
      "loudly (Acero raises ArrowNotImplementedError on it)") {
    intercept[SubstraitProducer.SubstraitUnsupported] {
      SubstraitProducer.produce(customer
        .orderBy(col("c_acctbal").desc_nulls_last,
          col("c_custkey").asc_nulls_first)
        .limit(5).select(col("c_custkey")))
    }
    // uniform placement still produces (and executes — the sort+fetch
    // test above drives the same shape through Acero)
    SubstraitProducer.produce(customer
      .orderBy(col("c_acctbal").desc_nulls_last,
        col("c_custkey").asc_nulls_last)
      .limit(5).select(col("c_custkey")))
  }

  test("substrait: semi/anti joins refuse loudly (Acero binds their " +
      "condition left-only — a produced plan could not execute)") {
    intercept[SubstraitProducer.SubstraitUnsupported] {
      SubstraitProducer.produce(nation.join(customer,
        col("n_nationkey") === col("c_nationkey"), "left_semi"))
    }
    intercept[SubstraitProducer.SubstraitUnsupported] {
      SubstraitProducer.produce(nation.join(customer,
        col("n_nationkey") === col("c_nationkey"), "left_anti"))
    }
  }

  test("substrait: CASE WHEN, IF, and the typed-null implicit ELSE") {
    checkAll(Seq(
      (customer.select(col("c_custkey"),
        when(col("c_acctbal") > 50.0, "hi")
          .when(col("c_acctbal") > 0.0, "mid")
          .otherwise("neg").as("band")), false),
      // no otherwise: the implicit ELSE is a TYPED null literal
      (customer.select(col("c_custkey"),
        when(col("c_acctbal") > 50.0, col("c_acctbal")).as("maybe")), false),
      (customer.select(col("c_custkey"),
        expr("if(c_nationkey < 5, 1, 0)").as("flag")), false)),
      i => s"case/if case $i:")
  }

  test("substrait: grouping by EXPRESSIONS through an interposed project") {
    checkAll(Seq(
      (customer.groupBy((col("c_nationkey") + 1).as("nk1"))
        .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("s")), false),
      (customer.groupBy(
        when(col("c_acctbal") > 50.0, "hi").otherwise("lo").as("band"))
        .agg(count(lit(1)).as("n")), false)),
      i => s"expr-group case $i:")
  }

  test("substrait: IN list lowers to singular_or_list") {
    check(customer.filter(col("c_nationkey").isin(1, 3, 5))
      .select(col("c_custkey"), col("c_nationkey")))
  }

  test("substrait: string concat") {
    check(customer.select(col("c_custkey"),
      concat(col("c_name"), lit("-"), col("c_mktsegment")).as("j")))
  }

  test("substrait: randomized differential fuzz — 30 produced plans match") {
    val rnd = new scala.util.Random(47114711)
    val numCols = Seq("c_custkey", "c_acctbal", "c_nationkey")
    val cmps = Seq[(org.apache.spark.sql.Column, Double) => org.apache.spark.sql.Column](
      (c, v) => c > v, (c, v) => c >= v, (c, v) => c < v,
      (c, v) => c <= v, (c, v) => c === v, (c, v) => c =!= v)
    def leaf(): org.apache.spark.sql.Column = {
      val c = col(numCols(rnd.nextInt(numCols.length)))
      val v = BigDecimal(rnd.nextDouble() * 100).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      cmps(rnd.nextInt(cmps.length))(c, v)
    }
    def pred(depth: Int): org.apache.spark.sql.Column =
      if (depth == 0 || rnd.nextBoolean()) leaf()
      else if (rnd.nextBoolean()) pred(depth - 1) && pred(depth - 1)
      else pred(depth - 1) || pred(depth - 1)
    val cases = (1 to 30).map { _ =>
      val base = customer.filter(pred(2))
      val shaped = rnd.nextInt(3) match {
        case 0 => base.select(col("c_custkey"), col("c_mktsegment"))
        case 1 => base.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("s"))
        case _ => base.select(col("c_custkey"),
          (col("c_acctbal") - col("c_nationkey")).as("delta"))
      }
      val withSort =
        if (rnd.nextBoolean())
          (shaped.orderBy(col(shaped.columns.head)).limit(1 + rnd.nextInt(20)), true)
        else (shaped, false)
      withSort
    }
    checkAll(cases, i => s"fuzz case ${i + 1}:")
  }
}
