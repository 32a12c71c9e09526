package graft

import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite

/** The Thrift edge in Hive CUSTOM-auth mode: SASL/PLAIN where the JDBC
  * password must be a registered API key (the REST edge's authenticator,
  * reused on the wire — the multi-user-host hardening the NOSASL default
  * deliberately omits).
  *
  * HiveThriftServer2 can only be STARTED ONCE per JVM (a second
  * startWithContext never accepts connections), so this suite runs in its
  * own forked test JVM — see `Test / testGrouping` in build.sbt — while
  * JdbcEdgeSpec exercises the NOSASL default in the main test JVM.
  */
class JdbcCustomAuthSpec extends AnyFunSuite {
  import SparkTestSession._

  private def open(port: Int, user: String, pass: String) = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    DriverManager.getConnection(
      s"jdbc:hive2://localhost:$port/default", user, pass)
  }

  test("the API-key authenticator gates the wire") {
    Tables(spark, sf).registerAll()
    val users = Map("k-secret" -> graft.session.AuthenticatedUser("ana"))
    val (port, handle) = graft.server.JdbcEdge.start(spark,
      auth = Some(new graft.server.ApiKeyAuthenticator(users)))
    try {
      // wrong key refused at SASL negotiation, before any SQL runs
      intercept[java.sql.SQLException](open(port, "ana", "wrong"))
      // valid key but a mismatched user name is a misconfigured client
      intercept[java.sql.SQLException](open(port, "mallory", "k-secret"))
      // valid key + matching user serves registered sources normally
      val conn = open(port, "ana", "k-secret")
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT count(*) FROM nation")
        assert(rs.next() && rs.getLong(1) > 0)
      } finally conn.close()
    } finally handle.close()
  }
}
