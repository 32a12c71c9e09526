package graft.server

import java.sql.Connection
import scala.util.control.NonFatal

/** Remote-catalog metadata enrichment for agent schema discovery — the
  * analog of the reference's `InformationSchemaEnricher`
  * (/root/reference/python/strake/metadata.py:42-260): table/column
  * descriptions fetched from a source's own catalog (pg_catalog comments,
  * information_schema COLUMN_COMMENT, JDBC REMARKS) so search can rank
  * columns whose NAMES are opaque but whose remote comments explain them,
  * without requiring every description to be declared in YAML.
  *
  * Reference semantics kept: fetch-once per source; a COVERAGE THRESHOLD
  * (default 20% of columns described) below which the source is
  * blacklisted and enrichment degrades to the null enricher — a catalog
  * that answers the probe but carries no real comments should not be
  * re-probed per lookup; any probe failure also blacklists (probing is
  * advisory, never an error path).
  */
trait MetadataEnricher {
  /** Description for a table (column = None) or a column, if known. */
  def enrich(table: String, column: Option[String], source: String): Option[String]
}

object NullEnricher extends MetadataEnricher {
  override def enrich(table: String, column: Option[String],
      source: String): Option[String] = None
}

object InformationSchemaEnricher {
  /** (table, column?) → description; plus the probed column total for
    * coverage accounting. */
  final case class Descriptions(
      byKey: Map[(String, Option[String]), String],
      totalColumns: Int)

  type Probe = Connection => Descriptions

  /** PostgreSQL: pg_catalog comment functions over ordinary columns
    * (metadata.py:154-169). */
  val PostgresSql: String =
    """SELECT c.relname AS table_name, a.attname AS column_name,
      |       col_description(c.oid, a.attnum) AS description
      |FROM pg_catalog.pg_class c
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |JOIN pg_catalog.pg_attribute a ON a.attrelid = c.oid
      |WHERE c.relkind IN ('r', 'v', 'm') AND a.attnum > 0
      |  AND NOT a.attisdropped AND n.nspname NOT IN ('pg_catalog', 'information_schema')""".stripMargin

  /** MySQL/MariaDB: COLUMN_COMMENT in information_schema
    * (metadata.py:199-210). */
  val MySqlSql: String =
    """SELECT TABLE_NAME AS table_name, COLUMN_NAME AS column_name,
      |       COLUMN_COMMENT AS description
      |FROM information_schema.COLUMNS
      |WHERE TABLE_SCHEMA = DATABASE()""".stripMargin

  /** Snowflake: COMMENT in INFORMATION_SCHEMA (metadata.py:171-184). */
  val SnowflakeSql: String =
    """SELECT TABLE_NAME AS table_name, COLUMN_NAME AS column_name,
      |       COMMENT AS description
      |FROM INFORMATION_SCHEMA.COLUMNS
      |WHERE TABLE_SCHEMA = CURRENT_SCHEMA()""".stripMargin

  private def sqlProbe(sql: String): Probe = conn => {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val out = Map.newBuilder[(String, Option[String]), String]
      var total = 0
      while (rs.next()) {
        total += 1
        val t = rs.getString("table_name")
        val c = rs.getString("column_name")
        val d = rs.getString("description")
        if (d != null && d.nonEmpty) out += ((t.toLowerCase, Option(c).map(_.toLowerCase)) -> d)
      }
      Descriptions(out.result(), total)
    } finally st.close()
  }

  /** Dialect-independent JDBC fallback: table + column REMARKS from
    * DatabaseMetaData — the java.sql face of the same catalogs. Works on
    * any driver (exercised live against Derby in MetadataEnricherSpec);
    * drivers that don't populate REMARKS yield zero coverage and fall to
    * the blacklist, exactly the reference's NullEnricher degradation. */
  val genericJdbcProbe: Probe = conn => {
    val md = conn.getMetaData
    // '_' and '%' are LIKE wildcards in DatabaseMetaData patterns: a
    // literal table name like AUDIT_LOG would also match AUDIT1LOG's
    // columns, misattributing remarks and inflating the coverage
    // denominator — escape with the driver's own escape string
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    def literal(name: String): String = name
      .replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    val out = Map.newBuilder[(String, Option[String]), String]
    var total = 0
    val tables = md.getTables(null, null, "%", Array("TABLE", "VIEW"))
    try {
      while (tables.next()) {
        val t = tables.getString("TABLE_NAME")
        val schema = tables.getString("TABLE_SCHEM")
        // system catalogs describe themselves; enrichment is about USER tables
        if (schema == null || !schema.toUpperCase.startsWith("SYS")) {
          val tr = tables.getString("REMARKS")
          if (tr != null && tr.nonEmpty) out += ((t.toLowerCase, None) -> tr)
          val cols = md.getColumns(null,
            Option(schema).map(literal).orNull, literal(t), "%")
          try {
            while (cols.next()) {
              total += 1
              val cr = cols.getString("REMARKS")
              if (cr != null && cr.nonEmpty)
                out += ((t.toLowerCase,
                  Some(cols.getString("COLUMN_NAME").toLowerCase)) -> cr)
            }
          } finally cols.close()
        }
      }
    } finally tables.close()
    Descriptions(out.result(), total)
  }

  /** Probe routing by dialect name; unknown dialects try everything the
    * way the reference loops its strategy list (metadata.py:91-105). */
  def probesFor(dialect: Option[String]): Seq[Probe] = dialect.map(_.toLowerCase) match {
    case Some("postgres" | "postgresql") => Seq(sqlProbe(PostgresSql))
    case Some("mysql" | "mariadb") => Seq(sqlProbe(MySqlSql))
    case Some("snowflake") => Seq(sqlProbe(SnowflakeSql))
    case Some("derby") => Seq(genericJdbcProbe)
    case _ => Seq(sqlProbe(PostgresSql), sqlProbe(MySqlSql),
      sqlProbe(SnowflakeSql), genericJdbcProbe)
  }
}

final class InformationSchemaEnricher(
    connect: String => Connection,
    dialectOf: String => Option[String],
    coverageThreshold: Double = 0.20,
    probeOverride: Option[Seq[InformationSchemaEnricher.Probe]] = None)
  extends MetadataEnricher {
  import InformationSchemaEnricher._

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Option[String]), String]()
  private val fetched =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val blacklisted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // One lock PER SOURCE, not a global one: a hung remote probe must only
  // stall callers asking about that source, never every enrich() caller
  // on every source.
  private val fetchLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // Daemon executor for JDBC setNetworkTimeout enforcement.
  private val probeTimeoutExecutor =
    java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "enricher-probe-timeout"); t.setDaemon(true); t
    }

  /** Visible for tests: how many live fetches ran (fetch-once contract). */
  private[graft] val fetchCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def fetchCount: Int = fetchCounter.get

  override def enrich(table: String, column: Option[String],
      source: String): Option[String] = {
    if (blacklisted.contains(source)) return None
    if (!fetched.contains(source)) {
      val lock = fetchLocks.computeIfAbsent(source, _ => new Object)
      lock.synchronized {
        if (!fetched.contains(source)) {
          fetchFor(source)
          fetched.add(source)
        }
      }
    }
    Option(cache.get((source, table.toLowerCase, column.map(_.toLowerCase))))
  }

  private def fetchFor(source: String): Unit = {
    fetchCounter.incrementAndGet()
    val probes = probeOverride.getOrElse(probesFor(dialectOf(source)))
    val found = probes.view.flatMap { probe =>
      try {
        val conn = connect(source)
        try {
          // Best-effort network timeout so one unresponsive catalog can't
          // hold its source's lock forever; drivers without support
          // (Derby embedded) just skip it.
          try conn.setNetworkTimeout(probeTimeoutExecutor, 15000)
          catch { case NonFatal(_) => () }
          Some(probe(conn))
        } finally conn.close()
      } catch { case NonFatal(_) => None } // wrong dialect — try the next
    }.headOption
    found match {
      case Some(d) if meetsCoverage(d) =>
        d.byKey.foreach { case ((t, c), desc) => cache.put((source, t, c), desc) }
      case _ =>
        // no strategy answered, or the catalog carries too few real
        // comments to be useful — degrade to NullEnricher for this source
        blacklisted.add(source)
    }
  }

  private def meetsCoverage(d: Descriptions): Boolean = {
    if (d.totalColumns == 0) return true
    val described = d.byKey.count { case ((_, c), v) => c.isDefined && v.nonEmpty }
    described.toDouble / d.totalColumns >= coverageThreshold
  }
}
