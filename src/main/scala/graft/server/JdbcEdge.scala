package graft.server

import org.apache.spark.sql.SparkSession

/** Standard-wire-protocol serving edge: the Thrift JDBC/ODBC server
  * (HiveThriftServer2) over the engine's own SparkSession — the Spark
  * analog of the reference's Arrow Flight SQL server
  * (/root/reference/crates/server/src/flight_sql.rs:48-216): any JDBC/BI
  * client (beeline, DBeaver, Tableau) points at the engine and runs SQL
  * against the registered sources with the session's Catalyst
  * extensions (defensive limits, policies) in force.
  *
  * `spark.sql.hive.thriftServer.singleSession=true` (set by
  * GraftSession.builder — it is a static conf) makes wire sessions share
  * the engine session's catalog, so registered temp views are visible.
  *
  * Auth note: the Thrift edge serves in NOSASL/NONE auth here; API-key /
  * JWT auth and per-user RLS remain on the REST edge, which carries the
  * user identity. The reference splits the same way — Flight SQL carries
  * Bearer auth, the embedded engine trusts its caller.
  */
object JdbcEdge {

  /** Start on an OS-assigned free port; returns (port, closeable). */
  def start(spark: SparkSession): (Int, AutoCloseable) = {
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    // HiveServer2 reads the port from the context's hadoop/sql conf
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    spark.sqlContext.setConf("hive.server2.authentication", "NOSASL")
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    (port, () => server.stop())
  }
}
