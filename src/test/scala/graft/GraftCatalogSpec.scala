package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Three-level namespace catalog: graft.<source>.<table> resolution,
  * SHOW NAMESPACES/TABLES, pushdown through catalog-resolved scans,
  * read-only enforcement. */
class GraftCatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val configPath = {
    val yaml =
      s"""sources:
         |  - name: warehouse
         |    type: parquet
         |    tables:
         |      - name: lineitem
         |        path: $sf/lineitem.parquet
         |      - name: orders
         |        path: $sf/orders.parquet
         |  - name: docs
         |    type: parquet
         |    tables:
         |      - name: documents
         |        path: $sf/documents.parquet
         |""".stripMargin
    val p = Files.createTempFile("graft-cat", ".yaml")
    Files.writeString(p, yaml)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.config", p.toString)
    p.toString
  }

  test("three-level identifiers resolve and scan") {
    configPath
    val n = spark.sql("SELECT count(*) AS n FROM graft.warehouse.lineitem")
      .head().getLong(0)
    assert(n == Tables(spark, sf).lineitem.count())
  }

  test("SHOW NAMESPACES / SHOW TABLES surface the config") {
    configPath
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
    assert(ns.toSet == Set("warehouse", "docs", "information_schema"))
    val tables = spark.sql("SHOW TABLES IN graft.warehouse")
      .collect().map(_.getString(1))
    assert(tables.toSet == Set("lineitem", "orders"))
  }

  test("information_schema is queryable with plain SQL") {
    configPath
    val tables = spark.sql(
      "SELECT table_schema, table_name FROM graft.information_schema.tables " +
        "ORDER BY table_schema, table_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(tables.contains(("warehouse", "lineitem")), tables.toSeq)
    assert(tables.contains(("docs", "documents")), tables.toSeq)
    // columns carry names, positions, and SQL types; filters work
    val cols = spark.sql(
      """SELECT column_name, ordinal_position, data_type
        |FROM graft.information_schema.columns
        |WHERE table_name = 'lineitem' ORDER BY ordinal_position""".stripMargin)
      .collect()
    assert(cols.nonEmpty)
    assert(cols.map(_.getString(0)).contains("l_orderkey"), cols.map(_.getString(0)).toSeq)
    assert(cols.head.getInt(1) == 1)
    assert(cols.forall(_.getString(2).nonEmpty))
  }

  test("filters push down through catalog-resolved scans") {
    configPath
    val df = spark.table("graft.warehouse.orders")
      .filter(col("o_totalprice") > 300000).select("o_orderkey")
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"pushdown missing:\n$plan")
  }

  test("cross-namespace joins work") {
    configPath
    val joined = spark.sql(
      """SELECT count(*) AS n FROM graft.warehouse.lineitem l
        |JOIN graft.warehouse.orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
    assert(joined.head().getLong(0) > 0)
  }

  test("catalog is read-only") {
    configPath
    intercept[Exception](
      spark.sql("DROP TABLE graft.warehouse.orders"))
    intercept[Exception](
      spark.sql("CREATE NAMESPACE graft.newns"))
  }

  test("unknown table raises NoSuchTable") {
    configPath
    val e = intercept[Exception](spark.table("graft.warehouse.nope").count())
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  // ------------------------------------------------------- time travel

  /** Versioned table: snapshot 1 (2 rows, tagged "initial") at t1,
    * snapshot 2 (3 rows, branch main head) at t2 = t1 + 10 min. */
  private lazy val versionedSetup: (String, Long, Long) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-versioned")
    val t1 = 1700000000000L
    val t2 = t1 + 600000L
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(dir.resolve("v1").toString)
    Seq((1L, "a"), (2L, "b2"), (3L, "c")).toDF("id", "v")
      .write.parquet(dir.resolve("v2").toString)
    Files.writeString(dir.resolve("_graft_snapshots.json"),
      s"""[
         | {"snapshot_id": 1, "timestamp_ms": $t1, "path": "v1",
         |  "tags": ["initial"], "branch": "main"},
         | {"snapshot_id": 2, "timestamp_ms": $t2, "path": "v2",
         |  "branch": "main"}
         |]""".stripMargin)
    val yaml =
      s"""sources:
         |  - name: versioned
         |    type: parquet
         |    tables:
         |      - name: items
         |        path: $dir
         |""".stripMargin
    val p = Files.createTempFile("graft-vcat", ".yaml")
    Files.writeString(p, yaml)
    spark.conf.set("spark.sql.catalog.gvt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvt.config", p.toString)
    (dir.toString, t1, t2)
  }

  test("time travel: plain read resolves to the branch head snapshot") {
    versionedSetup
    assert(spark.table("gvt.versioned.items").count() == 3)
  }

  test("time travel: VERSION AS OF snapshot id reads the old snapshot") {
    versionedSetup
    val v1 = spark.sql("SELECT * FROM gvt.versioned.items VERSION AS OF 1")
    assert(v1.count() == 2)
    assert(v1.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    val v2 = spark.sql("SELECT * FROM gvt.versioned.items VERSION AS OF 2")
    assert(v2.count() == 3)
  }

  test("time travel: VERSION AS OF tag and branch names resolve") {
    versionedSetup
    assert(spark.sql(
      "SELECT * FROM gvt.versioned.items VERSION AS OF 'initial'").count() == 2)
    // branch resolves to its HEAD
    assert(spark.sql(
      "SELECT * FROM gvt.versioned.items VERSION AS OF 'main'").count() == 3)
  }

  test("time travel: TIMESTAMP AS OF between commits reads the earlier one") {
    val (_, t1, t2) = versionedSetup
    val between = new java.sql.Timestamp(t1 + 300000L)
    val df = spark.sql(
      s"SELECT * FROM gvt.versioned.items TIMESTAMP AS OF '$between'")
    assert(df.count() == 2, "as-of between commits must see snapshot 1")
    val after = new java.sql.Timestamp(t2 + 1000L)
    assert(spark.sql(
      s"SELECT * FROM gvt.versioned.items TIMESTAMP AS OF '$after'").count() == 3)
  }

  test("time travel: errors — unknown snapshot, pre-history timestamp, unversioned table") {
    val (_, t1, _) = versionedSetup
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM gvt.versioned.items VERSION AS OF 99").collect())
    assert(e1.getMessage.contains("no snapshot"), e1.getMessage)
    val before = new java.sql.Timestamp(t1 - 1000000L)
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM gvt.versioned.items TIMESTAMP AS OF '$before'").collect())
    assert(e2.getMessage.contains("no snapshot at or before"), e2.getMessage)
    configPath
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM graft.warehouse.orders VERSION AS OF 1").collect())
    assert(e3.getMessage.contains("not versioned"), e3.getMessage)
  }
}
