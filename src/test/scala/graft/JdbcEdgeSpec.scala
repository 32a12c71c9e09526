package graft

import java.sql.DriverManager
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The Thrift JDBC/ODBC serving edge, driven by a real hive-jdbc client
  * over the wire: standard JDBC tooling queries the engine's registered
  * sources directly. */
class JdbcEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private var port: Int = _
  private var handle: AutoCloseable = _
  private val license = new graft.server.LicenseGate.LicenseCache

  override def beforeAll(): Unit = {
    Tables(spark, sf).registerAll()
    // start() blocks until the socket accepts connections
    val (p, h) = graft.server.JdbcEdge.start(spark, license)
    port = p; handle = h
  }

  override def afterAll(): Unit = {
    // the enforcement rule stays attached to the shared session: leave
    // it in the passing state for every later suite in this JVM
    license.updateState(graft.server.LicenseGate.Valid)
    if (handle != null) handle.close()
  }

  private def connect() = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    DriverManager.getConnection(
      s"jdbc:hive2://localhost:$port/default;auth=noSasl", "graft", "")
  }

  test("a plain JDBC client queries registered sources over the wire") {
    val conn = connect()
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery(
        "SELECT n_regionkey, count(*) AS n FROM nation " +
          "GROUP BY n_regionkey ORDER BY n_regionkey")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getLong(2))).toList
      val want = spark.sql(
        "SELECT n_regionkey, count(*) AS n FROM nation " +
          "GROUP BY n_regionkey ORDER BY n_regionkey")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toList
      assert(got == want && got.nonEmpty)
      st.close()
    } finally conn.close()
  }

  test("joins and filters work end-to-end; metadata lists the tables") {
    val conn = connect()
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery(
        """SELECT n.n_name, count(*) AS custs
          |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          |WHERE c.c_acctbal > 0 GROUP BY n.n_name ORDER BY custs DESC, n_name
          |LIMIT 5""".stripMargin)
      var rows = 0
      while (rs.next()) { assert(rs.getLong(2) > 0); rows += 1 }
      assert(rows == 5)
      st.close()
      // catalog discovery through standard JDBC metadata
      val md = conn.getMetaData
      val tables = md.getTables(null, null, "%", null)
      val names = Iterator.continually(tables)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME")).toSet
      assert(names.contains("nation") && names.contains("lineitem"), names)
    } finally conn.close()
  }

  test("an invalid license refuses wire-protocol queries too") {
    import graft.server.LicenseGate
    license.updateState(LicenseGate.Invalid)
    try {
      // refusal can fire at session open (setup statements also run
      // through the optimizer) or at the query — either way it's a
      // licensing SQLException, never silent execution
      val e = intercept[java.sql.SQLException] {
        val conn = connect()
        try conn.createStatement().executeQuery("SELECT count(*) FROM nation")
        finally conn.close()
      }
      assert(e.getMessage.contains("License invalid"), e.getMessage)
    } finally license.updateState(LicenseGate.Valid)
    // recovered: the same edge serves again
    val conn2 = connect()
    try {
      val rs = conn2.createStatement()
        .executeQuery("SELECT count(*) FROM nation")
      assert(rs.next() && rs.getLong(1) > 0)
    } finally conn2.close()
  }

  test("wire sessions see the engine session's catalog (singleSession)") {
    import spark.implicits._
    Seq((1, "only-in-engine")).toDF("id", "tag")
      .createOrReplaceTempView("edge_probe")
    val conn = connect()
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT tag FROM edge_probe")
      assert(rs.next() && rs.getString(1) == "only-in-engine")
    } finally conn.close()
  }
}
