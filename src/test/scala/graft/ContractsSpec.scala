package graft

import graft.session.{Contracts, TraceReport}
import org.scalatest.funsuite.AnyFunSuite

/** Data contracts + trace report. */
class ContractsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val yaml =
    """contracts:
      |  - table: "files.orders"
      |    strict: true
      |    columns:
      |      - {name: o_orderkey, type: integer}
      |      - name: o_totalprice
      |        type: decimal
      |        constraints:
      |          - {type: gt, value: 0}
      |      - {name: o_custkey, type: integer}
      |      - {name: o_orderstatus, type: char}
      |      - {name: o_orderpriority, type: char}
      |      - {name: o_orderdate, type: date}
      |  - table: "files.lineitem"
      |    strict: false
      |    columns:
      |      - name: l_quantity
      |        type: float
      |        constraints:
      |          - type: between
      |            value: {min: 0, max: 100}
      |      - name: l_returnflag
      |        type: string
      |        constraints:
      |          - type: in
      |            value: ["R", "A", "N"]
      |""".stripMargin

  test("yaml parses into the contract model") {
    val cs = Contracts.fromYamlString(yaml)
    assert(cs.contracts.size == 2)
    assert(cs.forTable("orders").exists(_.strict))
    val li = cs.forTable("lineitem").get
    assert(li.columns.flatMap(_.constraints).size == 2)
  }

  test("clean data passes value constraints") {
    val cs = Contracts.fromYamlString(yaml)
    val li = Tables(spark, sf).lineitem
    val bad = Contracts.violations(li, cs.forTable("lineitem").get)
    assert(bad.count() == 0)
  }

  test("violations are detected and tagged") {
    import spark.implicits._
    val cs = Contracts.fromYamlString(yaml)
    val dirty = Seq((150.0, "R"), (50.0, "X"), (-1.0, "Z"), (10.0, "A"))
      .toDF("l_quantity", "l_returnflag")
    val bad = Contracts.violations(dirty, cs.forTable("lineitem").get)
      .orderBy("l_quantity").collect()
    assert(bad.length == 3)
    assert(bad(0).getAs[String]("failed_checks")
      .contains("l_quantity between"))
    assert(bad.exists(_.getAs[String]("failed_checks")
      .contains("l_returnflag in")))
    // the double violation carries both checks
    assert(bad.count(_.getAs[String]("failed_checks").contains("; ")) >= 1)
  }

  test("strict contract flags undeclared columns; open contract doesn't") {
    val cs = Contracts.fromYamlString(yaml)
    // orders declares exactly the table's six columns → clean
    val orders = Tables(spark, sf).orders
    assert(Contracts.validateSchema(orders, cs.forTable("orders").get).isEmpty)
    // an extra column violates the strict (closed-schema) contract
    val widened = orders.withColumn("o_leak",
      org.apache.spark.sql.functions.lit(1))
    val v = Contracts.validateSchema(widened, cs.forTable("orders").get)
    assert(v.exists(x => x.kind == "undeclared_column" && x.column == "o_leak"))
    // open contract tolerates the extra columns lineitem has
    val li = Tables(spark, sf).lineitem
    assert(Contracts.validateSchema(li, cs.forTable("lineitem").get).isEmpty)
  }

  test("missing declared column is a violation") {
    import spark.implicits._
    val cs = Contracts.fromYamlString(yaml)
    val narrow = Seq((1.0, "R")).toDF("l_quantity", "other")
    val v = Contracts.validateSchema(narrow,
      cs.forTable("lineitem").get)
    assert(v.exists(x => x.kind == "missing_column" && x.column == "l_returnflag"))
  }

  test("trace report surfaces pushdown and timing") {
    val df = Tables(spark, sf).lineitem
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val t = TraceReport.run(df)
    assert(t.report.contains("GRAFT QUERY REPORT"))
    assert(t.rowCount > 0)
    assert(t.pushedFilters.exists(_.contains("l_quantity")),
      s"no pushdown recorded: ${t.pushedFilters}")
    assert(t.scannedColumns.contains("l_orderkey"))
    // runtime metrics (the EXPLAIN ANALYZE half): the scan reports the
    // rows it actually produced, and the count matches the plan output
    assert(t.nodeMetrics.nonEmpty, "no runtime metrics collected")
    val outputRows = t.nodeMetrics
      .flatMap(_.metrics.get("numOutputRows"))
    assert(outputRows.exists(_ == t.rowCount),
      s"no node reports the result row count: ${t.nodeMetrics}")
    assert(t.report.contains("runtime metrics"), t.report)
  }

  test("trace metrics descend through AQE stages (plans with exchanges)") {
    // AQE wraps materialized subtrees in leaf QueryStageExec nodes: a
    // traversal that stops there loses every pre-shuffle operator —
    // exactly the metrics an aggregate's trace is for
    val df = Tables(spark, sf).lineitem
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val t = TraceReport.run(df)
    assert(t.rowCount > 0)
    val nodes = t.nodeMetrics.map(_.node)
    assert(nodes.exists(_.toLowerCase.contains("scan")),
      s"scan metrics missing behind the exchange: $nodes")
    assert(nodes.exists(_.contains("Exchange")) ||
      nodes.exists(_.contains("ShuffleQueryStage")), nodes)
    // the scan's output-row metric survives the stage boundary
    val scanRows = t.nodeMetrics.filter(_.node.toLowerCase.contains("scan"))
      .flatMap(_.metrics.get("numOutputRows"))
    assert(scanRows.exists(_ > 0), t.nodeMetrics.toString)
  }
}
