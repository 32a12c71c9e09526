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
    assert(ns.toSet == Set("warehouse", "docs"))
    val tables = spark.sql("SHOW TABLES IN graft.warehouse")
      .collect().map(_.getString(1))
    assert(tables.toSet == Set("lineitem", "orders"))
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
}
