package graft

import graft.sql._
import graft.sql.SqlAst._
import graft.util.Sanitize
import org.apache.spark.sql.catalyst.expressions.{Alias => CAlias, AttributeReference, Literal => CLit}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, Project}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Dialect-aware SQL generation, tested the reference's way: exact
  * generated-SQL string asserts. Mapper cases mirror
  * /root/reference/crates/sql/tests/dialects/oracle.rs:20-138 and
  * snowflake.rs:16-69 one-for-one; generator cases mirror
  * tests/integration/end_to_end.rs and robustness.rs:35-379 (systematic
  * rel_N aliases, scope isolation, recursion cap, identifier-injection
  * rejection, kitchen-sink shape).
  */
class SqlGenSpec extends AnyFunSuite {
  import SparkTestSession._

  private def id(n: String) = RawIdent(n)
  private def slit(s: String) = StringLit(s)

  private def oracle(fn: String, args: SqlExpr*): String =
    OracleDialect.mapper.translate(fn, args).map(_.render).orNull
  private def snow(fn: String, args: SqlExpr*): String =
    SnowflakeDialect.mapper.translate(fn, args).map(_.render).orNull

  // ------------------------------------------------ Oracle function mapper
  // (tests/dialects/oracle.rs — same inputs, same expected strings)

  test("oracle: coalesce → NVL") {
    assert(oracle("coalesce", id("a"), id("b")) == "NVL(a, b)")
  }

  test("oracle: ifnull → NVL") {
    assert(oracle("ifnull", id("col"), id("0")) == "NVL(col, 0)")
  }

  test("oracle: concat uses pipe operator") {
    assert(oracle("concat", id("a"), id("b"), id("c")) == "a || b || c")
  }

  test("oracle: strpos → INSTR") {
    assert(oracle("strpos", id("haystack"), id("needle")) == "INSTR(haystack, needle)")
  }

  test("oracle: position → INSTR with swapped args") {
    assert(oracle("position", id("needle"), id("haystack")) == "INSTR(haystack, needle)")
  }

  test("oracle: string_agg → LISTAGG WITHIN GROUP") {
    assert(oracle("string_agg", id("name"), slit(",")) ==
      "LISTAGG(name, ',') WITHIN GROUP (ORDER BY name ASC)")
  }

  test("oracle: current_timestamp → SYSTIMESTAMP") {
    assert(oracle("current_timestamp") == "SYSTIMESTAMP")
  }

  test("oracle: now → SYSTIMESTAMP") {
    assert(oracle("now") == "SYSTIMESTAMP")
  }

  test("oracle: current_date → SYSDATE") {
    assert(oracle("current_date") == "SYSDATE")
  }

  test("oracle: to_timestamp single arg") {
    assert(oracle("to_timestamp", slit("2024-01-15")) == "TO_TIMESTAMP('2024-01-15')")
  }

  test("oracle: to_timestamp with format") {
    assert(oracle("to_timestamp", slit("2024-01-15 10:30:00"), slit("YYYY-MM-DD HH24:MI:SS")) ==
      "TO_TIMESTAMP('2024-01-15 10:30:00', 'YYYY-MM-DD HH24:MI:SS')")
  }

  test("oracle: random → DBMS_RANDOM.VALUE; from_unixtime → epoch arithmetic") {
    assert(oracle("random") == "DBMS_RANDOM.VALUE")
    assert(oracle("from_unixtime", id("ts")) ==
      "TO_DATE('1970-01-01', 'YYYY-MM-DD') + (ts / 86400)")
  }

  test("oracle: extract renders EXTRACT(FIELD FROM source)") {
    assert(oracle("extract", slit("month"), id("hired")) == "EXTRACT(MONTH FROM hired)")
  }

  test("oracle: concat_ws interleaves the separator") {
    assert(oracle("concat_ws", slit("-"), id("a"), id("b")) == "a || '-' || b")
  }

  // --------------------------------------------- Snowflake function mapper
  // (tests/dialects/snowflake.rs)

  test("snowflake: coalesce renamed") {
    assert(snow("coalesce", id("a"), id("b")) == "COALESCE(a, b)")
  }

  test("snowflake: string_agg → LISTAGG (no WITHIN GROUP)") {
    assert(snow("string_agg", id("name"), slit(",")) == "LISTAGG(name, ',')")
  }

  test("snowflake: array_agg supported") {
    assert(snow("array_agg", id("id")) == "ARRAY_AGG(id)")
  }

  test("snowflake: current_timestamp argless") {
    assert(snow("current_timestamp") == "CURRENT_TIMESTAMP")
  }

  test("snowflake: from_unixtime → TO_TIMESTAMP") {
    assert(snow("from_unixtime", id("ts")) == "TO_TIMESTAMP(ts)")
  }

  // --------------------------------------------------------- plan → SQL
  private lazy val users = {
    val df = spark.createDataFrame(
      Seq((1, "ann"), (2, "bob"))).toDF("id", "name")
    df.createOrReplaceTempView("sqlgen_users")
    spark.table("sqlgen_users")
  }
  private lazy val orders = {
    val df = spark.createDataFrame(
      Seq((10, 1), (11, 2))).toDF("order_id", "user_id")
    df.createOrReplaceTempView("sqlgen_orders")
    spark.table("sqlgen_orders")
  }

  private def pg(plan: LogicalPlan): String =
    new SqlGenerator(PostgresDialect).generate(plan)
  private def pgDf(df: org.apache.spark.sql.DataFrame): String =
    pg(df.queryExecution.analyzed)

  test("generator: table scan emits explicit columns and rel_0 alias") {
    assert(pgDf(users) ==
      """SELECT "rel_0"."id", "rel_0"."name" FROM "sqlgen_users" AS "rel_0"""")
  }

  test("generator: filter merges into WHERE") {
    assert(pgDf(users.filter(col("id") === 1)) ==
      """SELECT "rel_0"."id", "rel_0"."name" FROM "sqlgen_users" AS "rel_0" WHERE "rel_0"."id" = 1""")
  }

  test("generator: subquery alias scope isolation") {
    val sql = pgDf(users.select("id").alias("derived").select("id"))
    assert(sql ==
      """SELECT "rel_1"."id" FROM (SELECT "rel_0"."id" FROM "sqlgen_users" AS "rel_0") AS "rel_1"""")
  }

  test("generator: join emits ON with systematic aliases") {
    val sql = pgDf(users.join(orders, col("id") === col("user_id")))
    assert(sql.contains(
      """INNER JOIN "sqlgen_orders" AS "rel_1" ON "rel_0"."id" = "rel_1"."user_id""""))
    assert(sql.contains("""FROM "sqlgen_users" AS "rel_0" INNER JOIN"""))
  }

  test("generator: join column collision keeps both sides addressable") {
    val t1 = spark.createDataFrame(Seq((1, "x"))).toDF("id", "name")
    val t2 = spark.createDataFrame(Seq((1, "admin"))).toDF("id", "role")
    t1.createOrReplaceTempView("sqlgen_t1"); t2.createOrReplaceTempView("sqlgen_t2")
    val a = spark.table("sqlgen_t1"); val b = spark.table("sqlgen_t2")
    val sql = pgDf(a.join(b, a("id") === b("id")).select(a("id"), b("id")))
    assert(sql.contains("\"rel_0\".\"id\""))
    assert(sql.contains("\"rel_1\".\"id\""))
    assert(sql.contains(
      """FROM "sqlgen_t1" AS "rel_0" INNER JOIN "sqlgen_t2" AS "rel_1""""))
  }

  test("generator: join under alias is isolated in a derived table") {
    val joined = users.join(orders, col("id") === col("user_id")).alias("joined")
    val sql = pgDf(joined.select("id"))
    assert(!sql.startsWith("SELECT \"rel_0\"") && !sql.startsWith("SELECT \"rel_1\""), sql)
    assert(sql.contains("""\"sqlgen_users\" AS \"rel_0\"""".replace("\\", "")))
    assert(sql.contains("""\"sqlgen_orders\" AS \"rel_1\"""".replace("\\", "")))
  }

  test("generator: determinism — same plan renders identical SQL") {
    val plan = users.filter(col("id") === 1).queryExecution.analyzed
    assert(pg(plan) == pg(plan))
    assert(pg(plan).contains("rel_0"))
  }

  test("generator: aggregate emits GROUP BY") {
    val sql = pgDf(users.groupBy("name").agg(sum("id").as("total")))
    assert(sql ==
      """SELECT "rel_0"."name", SUM("rel_0"."id") AS "total" FROM "sqlgen_users" AS "rel_0" GROUP BY "rel_0"."name"""")
  }

  test("generator: filter above aggregate becomes HAVING") {
    val sql = pgDf(users.groupBy("name").agg(sum("id").as("total"))
      .filter(col("total") > 1))
    assert(sql.contains("""HAVING SUM("rel_0"."id") > 1"""), sql)
  }

  test("generator: sort + limit with NULLS FIRST") {
    val sql = pgDf(users.orderBy(col("id").asc_nulls_first).limit(10))
    assert(sql.contains("ORDER BY \"rel_0\".\"id\" ASC NULLS FIRST"), sql)
    assert(sql.contains("LIMIT 10"), sql)
  }

  test("generator: offset renders after limit") {
    val sql = pgDf(users.orderBy("id").offset(5).limit(10))
    assert(sql.contains("LIMIT 10"), sql)
    assert(sql.contains("OFFSET 5"), sql)
  }

  test("generator: window function renders OVER clause") {
    val sql = pgDf(users.withColumn("rn",
      row_number().over(W.partitionBy("name").orderBy("id"))))
    assert(sql.contains("ROW_NUMBER() OVER (PARTITION BY \"rel_0\".\"name\" ORDER BY \"rel_0\".\"id\" ASC NULLS FIRST) AS \"rn\""), sql)
  }

  test("generator: explicit window frame renders ROWS BETWEEN") {
    val sql = pgDf(users.withColumn("s",
      sum("id").over(W.partitionBy("name").orderBy("id").rowsBetween(-1, 1))))
    assert(sql.contains("ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"), sql)
  }

  test("generator: union renders UNION ALL") {
    val sql = pgDf(users.union(users))
    assert(sql.contains(" UNION ALL "), sql)
  }

  test("generator: distinct renders SELECT DISTINCT") {
    val sql = pgDf(users.distinct())
    assert(sql.startsWith("SELECT DISTINCT "), sql)
  }

  test("generator: empty relation renders 1 = 0 guard") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val rel = LocalRelation(
      AttributeReference("id", IntegerType)() :: Nil)
    val sql = pg(rel)
    assert(sql.contains("1 = 0"), sql)
    assert(sql.contains("SELECT NULL"), sql)
  }

  test("generator: VALUES renders inline for postgres, FROM DUAL for oracle") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.unsafe.types.UTF8String
    val rel = LocalRelation(
      Seq(AttributeReference("id", IntegerType)(),
        AttributeReference("name", StringType)()),
      Seq(InternalRow(1, UTF8String.fromString("a")),
        InternalRow(2, UTF8String.fromString("b"))))
    val psql = pg(rel)
    assert(psql.contains("""(VALUES (1, 'a'), (2, 'b')) AS "rel_0" ("id", "name")"""), psql)
    val osql = new SqlGenerator(OracleDialect).generate(rel)
    assert(osql.contains("SELECT 1 AS \"id\", 'a' AS \"name\" FROM DUAL UNION ALL"), osql)
  }

  test("generator: recursion depth capped at 50") {
    var plan: LogicalPlan = users.queryExecution.analyzed
    (0 until 150).foreach { _ =>
      plan = Project(plan.output.map(a => a), plan)
    }
    val e = intercept[SqlGenError](pg(plan))
    assert(e.getMessage.contains("Maximum recursion depth (50) exceeded"))
  }

  test("generator: scope violation lists available columns") {
    val phantom = AttributeReference("non_existent", IntegerType)()
    val plan = LFilter(
      org.apache.spark.sql.catalyst.expressions.EqualTo(phantom, CLit(1)),
      users.queryExecution.analyzed)
    val e = intercept[SqlGenError](pg(plan))
    assert(e.getMessage.contains("Column 'non_existent' not found"), e.getMessage)
    assert(e.getMessage.contains("rel_0.id"), e.getMessage)
    assert(e.getMessage.contains("rel_0.name"), e.getMessage)
  }

  test("generator: identifier injection payloads rejected") {
    val payloads = Seq(
      "users\" UNION SELECT",
      "x; DROP TABLE users",
      "name\u0000hidden",
      "\"\"\"",
      "back`tick",
      "back\\slash")
    payloads.foreach { p =>
      intercept[Sanitize.UnsafeIdentifier](Sanitize.validateIdentifier(p))
    }
  }

  test("generator: oracle CAST uses VARCHAR2") {
    val sql = new SqlGenerator(OracleDialect)
      .generate(users.select(col("id").cast("string").as("ids"))
        .queryExecution.analyzed)
    assert(sql.contains("VARCHAR2"), sql)
  }

  test("generator: mysql quotes with backticks") {
    val sql = new SqlGenerator(MySqlDialect)
      .generate(users.queryExecution.analyzed)
    assert(sql == "SELECT `rel_0`.`id`, `rel_0`.`name` FROM `sqlgen_users` AS `rel_0`")
  }

  test("generator: clickhouse backticks, CASE null-safe eq, CH type names") {
    val sql = new SqlGenerator(ClickHouseDialect)
      .generate(users.queryExecution.analyzed)
    assert(sql == "SELECT `rel_0`.`id`, `rel_0`.`name` FROM `sqlgen_users` AS `rel_0`")
    val nse = new SqlGenerator(ClickHouseDialect)
      .generate(users.filter(col("name") <=> lit("ann")).queryExecution.analyzed)
    assert(nse.contains("CASE WHEN") && !nse.contains("DISTINCT FROM"), nse)
    val cast = new SqlGenerator(ClickHouseDialect)
      .generate(users.select(col("id").cast("string").as("s"),
        col("id").cast("double").as("d")).queryExecution.analyzed)
    assert(cast.contains("AS String") && cast.contains("AS Float64"), cast)
    val esc = new SqlGenerator(ClickHouseDialect)
      .generate(users.filter(col("name") === "x\\").queryExecution.analyzed)
    assert(esc.contains("'x\\\\'"), esc) // backslash doubled, like MySQL
  }

  test("generator: kitchen sink query") {
    // mirrors robustness.rs test_kitchen_sink_query: join → select →
    // filter → aggregate → window → alias → filter → sort → limit
    val t1 = users
    val t2 = {
      val df = spark.createDataFrame(Seq((1, "admin"), (2, "dev"))).toDF("id", "role")
      df.createOrReplaceTempView("sqlgen_roles")
      spark.table("sqlgen_roles")
    }
    val sql = pgDf(
      t1.join(t2, Seq("id"))
        .select(t1("id"), col("name"), col("role"))
        .filter(col("name") =!= "admin")
        .groupBy("name").agg(sum("id").as("total_id"))
        .withColumn("rn", row_number().over(
          W.partitionBy("name").orderBy(col("total_id").desc)))
        .alias("sub")
        .filter(col("rn") === 1)
        .orderBy(col("total_id").desc)
        .limit(10))
    assert(sql.contains("SELECT"), sql)
    assert(sql.contains("FROM"), sql)
    assert(sql.contains("INNER JOIN"), sql)
    assert(sql.contains("GROUP BY"), sql)
    assert(sql.contains("ROW_NUMBER() OVER"), sql)
    assert(sql.contains("ORDER BY"), sql)
    assert(sql.contains("LIMIT 10"), sql)
    assert(sql.contains("<> 'admin'"), sql)
  }

  test("generator: filter directly above window nests a derived table") {
    val sql = pgDf(users
      .withColumn("rn", row_number().over(W.partitionBy("name").orderBy("id")))
      .filter(col("rn") === 1))
    // ROW_NUMBER must end up inside a subquery, never in WHERE
    assert(!sql.matches(".*WHERE[^(]*ROW_NUMBER.*"), sql)
    assert(sql.contains("WHERE \"rel_1\".\"rn\" = 1"), sql)
  }

  test("generator: filter on a NON-window column above a window still nests") {
    // SQL evaluates WHERE before window functions; Spark filters after the
    // window is computed over ALL rows. Merging would silently renumber.
    val sql = pgDf(users
      .withColumn("rn", row_number().over(W.partitionBy("name").orderBy("id")))
      .filter(col("id") > 5))
    assert(sql.contains(") AS \"rel_1\" WHERE \"rel_1\".\"id\" > 5"), sql)
  }

  test("generator: set-op branches with ORDER BY/LIMIT wrap in derived tables") {
    val limited = users.select("id").orderBy("id").limit(2)
    val sql = pgDf(limited.union(orders.select("user_id")))
    // "... LIMIT 2 UNION ALL ..." is a syntax error; the branch must nest
    assert(!sql.contains("LIMIT 2 UNION ALL"), sql)
    assert(sql.contains("LIMIT 2) AS"), sql)
  }

  test("generator: string literals escape per dialect (MySQL backslashes)") {
    val df = users.filter(col("name") === "x\\")
    val pgSql = pgDf(df)
    assert(pgSql.contains("'x\\'"), pgSql) // ANSI: backslash is literal
    val mySql = new SqlGenerator(MySqlDialect).generate(df.queryExecution.analyzed)
    assert(mySql.contains("'x\\\\'"), mySql) // MySQL: backslash doubled
  }

  test("generator: contains/startsWith emit ESCAPE only when needed") {
    val plain = pgDf(users.filter(col("name").contains("ann")))
    assert(plain.contains("LIKE '%ann%'") && !plain.contains("ESCAPE"), plain)
    val pct = pgDf(users.filter(col("name").contains("50%")))
    assert(pct.contains("LIKE '%50\\%%' ESCAPE '\\'"), pct)
  }

  test("generator: null-safe equality is dialect-specific") {
    val df = users.filter(col("name") <=> lit("ann"))
    assert(pgDf(df).contains("IS NOT DISTINCT FROM"), pgDf(df))
    val my = new SqlGenerator(MySqlDialect).generate(df.queryExecution.analyzed)
    assert(my.contains("<=>"), my)
    val derby = new SqlGenerator(DerbyDialect).generate(df.queryExecution.analyzed)
    // total CASE form: never NULL, so it inverts correctly under NOT and
    // stays legal on engines without boolean expressions (Oracle pre-23)
    assert(derby.contains("CASE WHEN"), derby)
    assert(derby.contains("IS NULL AND"), derby)
    assert(derby.contains("ELSE 0 END = 1"), derby)
  }

  test("generator: offset above limit folds into one ordered block") {
    val sql = pgDf(users.orderBy(col("id").desc).limit(3).offset(1))
    // OFFSET must stay in the block whose ORDER BY governs it; Spark's
    // take-3-then-skip-1 is SQL's OFFSET 1 LIMIT 2
    assert(sql.contains("ORDER BY"), sql)
    assert(sql.contains("LIMIT 2"), sql)
    assert(sql.contains("OFFSET 1"), sql)
    assert(!sql.contains("(SELECT"), sql)
  }

  test("generator: multi-referenced CTE renders WITH and named refs") {
    users // ensure view exists
    val df = spark.sql(
      """WITH big AS (SELECT id, name FROM sqlgen_users WHERE id > 0)
        |SELECT a.id, b.name FROM big a JOIN big b ON a.id = b.id""".stripMargin)
    val sql = pgDf(df)
    assert(sql.startsWith("""WITH "big" AS (SELECT"""), sql)
    assert(sql.contains(""""big" AS "rel_"""), sql)
    // the definition body renders once; both join sides reference it
    assert("\"big\" AS \"rel_".r.findAllIn(sql).length == 2, sql)
  }

  test("generator: recursive CTE renders WITH RECURSIVE + UNION ALL") {
    // mirrors end_to_end.rs test_recursive_query_generation
    val df = spark.sql(
      """WITH RECURSIVE recc(i) AS (
        |  SELECT 1 UNION ALL SELECT i + 1 FROM recc WHERE i < 10)
        |SELECT i FROM recc""".stripMargin)
    val sql = pgDf(df)
    assert(sql.contains("WITH RECURSIVE"), sql)
    assert(sql.contains("UNION ALL"), sql)
    assert(sql.contains("recc"), sql)
    assert(sql.contains("""("i") AS ("""), sql)
  }

  test("generator: INTERSECT and EXCEPT render with ALL variants") {
    assert(pgDf(users.select("id").intersect(orders.select("user_id")))
      .contains(" INTERSECT "))
    assert(pgDf(users.select("id").exceptAll(orders.select("user_id")))
      .contains(" EXCEPT ALL "))
  }

  test("generator: uncorrelated subquery expressions render inline") {
    users; orders
    val in = pgDf(spark.sql(
      """SELECT id FROM sqlgen_users
        |WHERE id IN (SELECT user_id FROM sqlgen_orders)""".stripMargin))
    assert(in.contains("IN (SELECT"), in)
    val exists = pgDf(spark.sql(
      """SELECT id FROM sqlgen_users
        |WHERE EXISTS (SELECT 1 FROM sqlgen_orders WHERE user_id = 1)""".stripMargin))
    assert(exists.contains("EXISTS (SELECT"), exists)
    val scalar = pgDf(spark.sql(
      """SELECT id, (SELECT max(user_id) FROM sqlgen_orders) AS mx
        |FROM sqlgen_users""".stripMargin))
    assert(scalar.contains("(SELECT MAX("), scalar)
  }

  test("generator: non-deterministic projections are never re-evaluated in WHERE") {
    val df = users.select(rand().as("r"), col("id")).filter(col("r") > 0.5)
    val sql = pgDf(df)
    // RANDOM() must appear exactly once, inside a derived table; the
    // filter references the subquery column, not a second RANDOM() call
    assert("RANDOM\\(\\)".r.findAllIn(sql).length == 1, sql)
    assert(sql.contains("""WHERE "rel_1"."r" > 0.5"""), sql)
  }

  test("generator: correlated subqueries are refused") {
    users; orders
    val df = spark.sql(
      """SELECT id FROM sqlgen_users u
        |WHERE EXISTS (SELECT 1 FROM sqlgen_orders o WHERE o.user_id = u.id)""".stripMargin)
    val e = intercept[SqlGenError](pgDf(df))
    assert(e.getMessage.contains("correlated"), e.getMessage)
  }

  // --------------------------------------------------------------- router

  test("router: native, custom, substrait, fallback tiers") {
    import DialectRouter._
    assert(route("postgres").isInstanceOf[Sql])
    assert(route("PostgreSQL").isInstanceOf[Sql])
    assert(route("mysql").isInstanceOf[Sql])
    assert(route("clickhouse") == Sql(ClickHouseDialect))
    assert(route("sqlite").isInstanceOf[Sql])
    assert(route("oracle") == Sql(OracleDialect))
    assert(route("snowflake") == Sql(SnowflakeDialect))
    assert(route("duckdb") == Sql(DuckDbDialect))
    assert(isSubstraitSource("datafusion"))
    assert(!isSubstraitSource("duckdb"))
    assert(!isSubstraitSource("postgres"))
    assert(isLocalExecution("unknown_db"))
  }

  test("router: unknown dialect returns None for local execution") {
    assert(GraftSqlGen.forDataFrame(users, "unknown_db").isEmpty)
  }

  test("router: substrait sources refuse SQL-text generation") {
    val e = intercept[SqlGenError](GraftSqlGen.forDataFrame(users, "datafusion"))
    assert(e.getMessage.contains("Substrait"))
  }

  test("router: oracle end-to-end through forDataFrame") {
    val sql = GraftSqlGen.forDataFrame(
      users.select(concat(col("name"), lit("!")).as("shout")), "oracle").get
    assert(sql.contains("\"rel_0\".\"name\" || '!'"), sql)
  }
}
