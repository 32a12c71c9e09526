package graft.server

import org.apache.spark.sql.SparkSession

/** Standard-wire-protocol serving edge: the Thrift JDBC/ODBC server
  * (HiveThriftServer2) over the engine's own SparkSession — the Spark
  * analog of the reference's Arrow Flight SQL server
  * (/root/reference/crates/server/src/flight_sql.rs:48-216): any JDBC/BI
  * client (beeline, DBeaver, Tableau) points at the engine and runs SQL
  * against the registered sources (see the governance-boundary note
  * below for exactly which protections apply on this edge).
  *
  * `spark.sql.hive.thriftServer.singleSession=true` (set by
  * GraftSession.builder — it is a static conf) makes wire sessions share
  * the engine session's catalog, so registered temp views are visible.
  *
  * Governance boundary: the Thrift edge serves NOSASL by default; on
  * multi-user hosts pass `auth=` to serve Hive CUSTOM auth backed by the
  * REST edge's API-key authenticator (password = key). Per-user RLS,
  * defensive limits, and the result cache still live on the REST edge,
  * which carries the user identity
  * (the per-request machinery in GraftSession.executeQuery). What IS
  * enforced here session-wide: the license gate (below) and the RLS
  * resolution rule (inactive without a user context — fail-open to
  * no-policies is correct for an identity-less wire). The reference
  * splits the same way — Flight SQL carries Bearer auth, the embedded
  * engine trusts its caller.
  */
/** Hive CUSTOM-auth bridge. HiveServer2's CustomAuthenticationProviderImpl
  * instantiates `hive.server2.custom.authentication.class` reflectively
  * through a no-arg constructor, so the credential check is handed over via
  * the static hook on [[JdbcEdge]] rather than a constructor argument. */
final class ApiKeyPasswdAuthenticationProvider
    extends org.apache.hive.service.auth.PasswdAuthenticationProvider {
  override def Authenticate(user: String, password: String): Unit =
    if (!JdbcEdge.wireCredentialsValid(user, password))
      throw new javax.security.sasl.AuthenticationException(
        s"invalid API key for user '$user'")
}

object JdbcEdge {

  /** The authenticator consulted by [[ApiKeyPasswdAuthenticationProvider]];
    * JVM-global because HiveServer2 builds the provider reflectively (and a
    * JVM runs at most one engine Thrift edge). */
  @volatile private var wireAuth: Option[ApiKeyAuthenticator] = None

  /** JDBC password = the API key; the JDBC user name, when non-empty, must
    * match the identity the key resolves to (a mismatched name with a valid
    * key is a misconfigured client worth refusing, not mapping silently). */
  private[server] def wireCredentialsValid(user: String, password: String)
      : Boolean =
    wireAuth.exists(_.apply(password).exists(u =>
      user == null || user.isEmpty || user == u.id))

  /** License enforcement for wire-protocol queries: the Thrift server
    * executes SQL directly on the session, bypassing the REST edge's
    * admission check — this optimizer-stage gate closes that hole
    * (reference gates its Flight SQL edge the same way,
    * flight_sql.rs:131-137). Valid/Degraded pass (a plan rule has no
    * warning channel; Degraded is the REST edge's concern). */
  private final class LicenseEnforcementRule(license: LicenseGate.LicenseCache)
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
      if (license.currentState == LicenseGate.Invalid)
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION", Map("errorMessage" ->
            "License invalid or expired. Please contact support."))
      plan
    }
  }

  /** Start on an OS-assigned free port; returns (port, closeable).
    * Blocks until the server accepts connections (the bind is
    * asynchronous; the probed free port can also be lost to another
    * process between probe and bind — TOCTOU — in which case this fails
    * loudly within the timeout instead of handing out a dead port). */
  def start(spark: SparkSession,
      license: LicenseGate.LicenseCache = LicenseGate.alwaysValid,
      bindTimeoutMillis: Long = 30000,
      /** When set, the edge serves SASL/PLAIN with Hive CUSTOM auth: the
        * JDBC password must be a registered API key (the REST edge's
        * authenticator, reused) — for multi-user hosts where NOSASL would
        * hand ungoverned SQL access to any local process. */
      auth: Option[ApiKeyAuthenticator] = None): (Int, AutoCloseable) = {
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    // HiveServer2 reads the port from the context's hadoop/sql conf
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    auth match {
      case Some(a) =>
        wireAuth = Some(a)
        spark.sqlContext.setConf("hive.server2.authentication", "CUSTOM")
        // Hive's PlainSaslHelper resolves the provider from a FRESH
        // HiveConf() per connection (AuthenticationProviderFactory passes
        // conf=null), so the session conf never reaches it — but HiveConf
        // applies matching JVM system properties at construction.
        System.setProperty("hive.server2.custom.authentication.class",
          classOf[ApiKeyPasswdAuthenticationProvider].getName)
        spark.sqlContext.setConf("hive.server2.custom.authentication.class",
          classOf[ApiKeyPasswdAuthenticationProvider].getName)
      case None =>
        spark.sqlContext.setConf("hive.server2.authentication", "NOSASL")
    }
    if (license ne LicenseGate.alwaysValid)
      spark.experimental.extraOptimizations ++=
        Seq(new LicenseEnforcementRule(license))
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    val deadline = System.currentTimeMillis() + bindTimeoutMillis
    var up = false
    while (!up && System.currentTimeMillis() < deadline) {
      try {
        val s = new java.net.Socket("localhost", port)
        s.close(); up = true
      } catch { case _: java.io.IOException => Thread.sleep(200) }
    }
    if (!up) {
      server.stop()
      throw new IllegalStateException(
        s"thrift server did not accept connections on port $port " +
          s"within ${bindTimeoutMillis}ms")
    }
    (port, () => server.stop())
  }
}
