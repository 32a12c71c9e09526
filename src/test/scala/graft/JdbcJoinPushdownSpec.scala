package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Same-source multi-table join pushdown — the reference's federation
  * centerpiece (grouping co-located scans into one remote SQL statement,
  * /root/reference/crates/runtime/src/federation.rs:232 +
  * datafusion-federation). Spark 4.1 ships this natively for DSv2 JDBC
  * (`spark.sql.optimizer.datasourceV2JoinPushdown`); this spec proves the
  * engine achieves the same remote-join collapse over one JDBC source.
  */
class JdbcJoinPushdownSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val url = {
    graft.sources.DerbyFederationDialect.register()
    val dir = Files.createTempDirectory("graft-fed").toString
    val u = s"jdbc:derby:$dir/fed;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE dept (dept_id INT NOT NULL, dept_name VARCHAR(32))")
    st.execute("CREATE TABLE emp (emp_id INT NOT NULL, dept_id INT, salary DOUBLE)")
    (1 to 5).foreach(i => st.execute(s"INSERT INTO dept VALUES ($i, 'dept$i')"))
    (1 to 100).foreach(i =>
      st.execute(s"INSERT INTO emp VALUES ($i, ${i % 5 + 1}, ${i * 1000.0})"))
    st.close(); conn.close()
    u
  }

  /** DSv2 JDBC catalog — join pushdown only exists on the V2 path
    * (a V1 `spark.read.format("jdbc")` relation never collapses joins). */
  private def catalogTable(table: String) = {
    spark.conf.set("spark.sql.catalog.fed",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.fed.url", url)
    spark.conf.set("spark.sql.catalog.fed.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set("spark.sql.catalog.fed.pushDownJoin", "true")
    spark.conf.set("spark.sql.catalog.fed.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.fed.pushDownLimit", "true")
    // Derby stores unquoted identifiers uppercase
    spark.table(s"fed.APP.${table.toUpperCase}")
  }

  test("co-located join collapses into a single JDBC scan") {
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    try {
      val joined = catalogTable("emp")
        .join(catalogTable("dept"), "dept_id")
        .filter(col("salary") > 50000)
        .select(col("emp_id"), col("dept_name"), col("salary"))
      assert(joined.count() == 50)
      val plan = joined.queryExecution.executedPlan.toString
      // one pushed join ⇒ exactly one JDBC scan node in the plan
      val scans = "Scan JDBCScan".r.findAllIn(plan).size +
        "Scan org.apache.spark.sql.execution.datasources.v2.jdbc".r.findAllIn(plan).size
      val relationScans = "JDBCRelation".r.findAllIn(plan).size
      assert(scans == 1 || relationScans == 1 || plan.contains("PushedJoins"),
        s"join not collapsed into one remote scan:\n$plan")
    } finally spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
  }

  test("pushed join returns the same rows as the unpushed plan") {
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    val pushed =
      try catalogTable("emp").join(catalogTable("dept"), "dept_id")
        .groupBy("dept_name").agg(count(lit(1)).as("n"), sum("salary").as("total"))
        .collect().map(_.toString).sorted
      finally spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
    val plain = catalogTable("emp").join(catalogTable("dept"), "dept_id")
      .groupBy("dept_name").agg(count(lit(1)).as("n"), sum("salary").as("total"))
      .collect().map(_.toString).sorted
    assert(pushed.sameElements(plain))
  }
}
