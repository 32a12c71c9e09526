package graft

import graft.server.{InformationSchemaEnricher, NullEnricher, SchemaSearch}
import java.nio.file.Files
import java.sql.DriverManager
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Remote-catalog metadata enrichment (reference metadata.py semantics):
  * dialect-routed probes, fetch-once caching, the coverage threshold
  * below which a source degrades to NullEnricher, and the search overlay
  * that lets probed comments rank opaque column names. The generic JDBC
  * REMARKS probe runs LIVE against embedded Derby. */
class MetadataEnricherSpec extends AnyFunSuite with BeforeAndAfterAll {
  import InformationSchemaEnricher.{Descriptions, Probe}

  private var url: String = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("graft-enricher-derby").toString
    url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE accounts (acct_id INT, bal_x9 DOUBLE)")
    st.execute("CREATE TABLE audit_log (id INT, payload VARCHAR(64))")
    st.close(); conn.close()
  }

  private def derbyConn() = DriverManager.getConnection(url)

  test("generic JDBC probe walks user tables and counts columns") {
    val conn = derbyConn()
    try {
      val d = InformationSchemaEnricher.genericJdbcProbe(conn)
      // Derby populates no REMARKS → zero described, but the probe must
      // still see all four user columns (coverage denominator) and no
      // SYS catalog noise
      assert(d.totalColumns == 4, d)
      assert(d.byKey.isEmpty, d)
    } finally conn.close()
  }

  test("a live source without real comments is blacklisted after one probe") {
    val e = new InformationSchemaEnricher(
      _ => derbyConn(), _ => Some("derby"))
    assert(e.enrich("accounts", Some("bal_x9"), "warehouse").isEmpty)
    assert(e.enrich("accounts", Some("acct_id"), "warehouse").isEmpty)
    assert(e.enrich("audit_log", None, "warehouse").isEmpty)
    assert(e.fetchCount == 1, "blacklisted source must not be re-probed")
  }

  private def fakeProbe(d: Descriptions): Probe = _ => d

  private def enricherWith(d: Descriptions, threshold: Double = 0.20) =
    new InformationSchemaEnricher(
      _ => derbyConn(), _ => Some("derby"), threshold,
      probeOverride = Some(Seq(fakeProbe(d))))

  test("descriptions above the coverage threshold are served and cached") {
    val e = enricherWith(Descriptions(Map(
      ("accounts", None) -> "customer account master",
      ("accounts", Some("bal_x9")) -> "current balance, US dollars"),
      totalColumns = 4))
    assert(e.enrich("accounts", Some("bal_x9"), "db")
      .contains("current balance, US dollars"))
    assert(e.enrich("ACCOUNTS", Some("BAL_X9"), "db").isDefined,
      "lookups are case-insensitive")
    assert(e.enrich("accounts", None, "db").contains("customer account master"))
    assert(e.enrich("accounts", Some("acct_id"), "db").isEmpty)
    assert(e.fetchCount == 1, "one probe serves every lookup")
  }

  test("coverage below the threshold degrades the source to null enrichment") {
    val one = Descriptions(
      Map(("accounts", Some("bal_x9")) -> "balance"), totalColumns = 10)
    val strict = enricherWith(one, threshold = 0.20)
    assert(strict.enrich("accounts", Some("bal_x9"), "db").isEmpty,
      "1/10 described is below 20% — blacklist, serve nothing")
    val lax = enricherWith(one, threshold = 0.10)
    assert(lax.enrich("accounts", Some("bal_x9"), "db").contains("balance"))
  }

  test("a failing probe blacklists instead of erroring") {
    val e = new InformationSchemaEnricher(
      _ => throw new RuntimeException("connection refused"),
      _ => Some("postgres"))
    assert(e.enrich("t", Some("c"), "down").isEmpty)
    assert(e.enrich("t", None, "down").isEmpty)
    assert(e.fetchCount == 1)
  }

  test("dialect routing: known dialects probe their own catalog shape") {
    import InformationSchemaEnricher._
    assert(PostgresSql.contains("col_description"))
    assert(MySqlSql.contains("COLUMN_COMMENT") && MySqlSql.contains("DATABASE()"))
    assert(SnowflakeSql.contains("INFORMATION_SCHEMA.COLUMNS"))
    assert(probesFor(Some("postgres")).size == 1)
    assert(probesFor(Some("derby")).size == 1)
    assert(probesFor(None).size == 4, "unknown dialect tries every strategy")
  }

  test("search ranks an opaque column via its probed remote comment") {
    import SparkTestSession._
    Tables(spark, sf).registerAll()
    spark.range(1).selectExpr("42 AS acct_id", "1.5 AS fld_x9")
      .createOrReplaceTempView("enr_accounts")
    try {
      val enricher = enricherWith(Descriptions(Map(
        ("enr_accounts", Some("fld_x9")) -> "outstanding account balance in dollars"),
        totalColumns = 2))
      def hit(hits: Seq[SchemaSearch.Hit]) =
        hits.find(h => h.table == "enr_accounts" && h.column.contains("fld_x9"))
      val enriched = hit(SchemaSearch.search(spark,
        "account balance in dollars", 10, enricher, "db"))
      assert(enriched.isDefined, "probed comment must make fld_x9 rank")
      // without enrichment the opaque name carries no evidence at all
      val plain = hit(SchemaSearch.search(spark,
        "account balance in dollars", 10, NullEnricher, "db"))
      assert(plain.forall(_.score < enriched.get.score),
        s"plain=$plain enriched=$enriched")
    } finally spark.catalog.dropTempView("enr_accounts")
  }
}
