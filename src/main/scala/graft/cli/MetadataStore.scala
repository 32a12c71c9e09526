package graft.cli

import java.sql.{Connection, DriverManager, Timestamp}
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** Versioned-configuration metadata store — the GitOps backbone of the
  * reference CLI (/root/reference/crates/cli/src/metadata/mod.rs:38-80:
  * `MetadataStore` with apply/version/history/rollback over SQLite or
  * Postgres). Domains are isolated namespaces (`prod`, `staging`); every
  * `apply` bumps the domain version under optimistic locking and writes
  * an audit entry carrying the full config YAML, so any past version can
  * be diffed or rolled back to.
  */
final case class ApplyLogEntry(
    domain: String,
    version: Int,
    userId: String,
    sourcesAdded: Seq[String],
    sourcesDeleted: Seq[String],
    tablesModified: Seq[String],
    configHash: String,
    configYaml: String,
    timestamp: Option[java.time.Instant] = None)

final case class DomainStatus(
    name: String, version: Int, createdAt: Option[java.time.Instant])

final case class ApplyOutcome(
    domain: String, version: Int,
    sourcesAdded: Seq[String], sourcesDeleted: Seq[String])

/** Optimistic-lock violation (reference exit code CONFLICT_ERROR=6). */
final class VersionConflictException(msg: String) extends RuntimeException(msg)

/** Destructive change without --force (source deletions). */
final class ForceRequiredException(msg: String) extends RuntimeException(msg)

trait MetadataStore {
  def init(): Unit
  /** Persist `configYaml` as the next version of `domain`; returns the
    * outcome with the new version. `expectedVersion` enforces optimistic
    * locking; deleting sources requires `force`. */
  def applySources(domain: String, configYaml: String, userId: String,
      force: Boolean, expectedVersion: Option[Int]): ApplyOutcome
  def getDomainVersion(domain: String): Int
  def getHistory(domain: String, limit: Int): Seq[ApplyLogEntry]
  def getHistoryConfig(domain: String, version: Int): String
  /** Latest stored YAML for a domain ("" when never applied). */
  def getSources(domain: String): String
  def listDomains(): Seq[DomainStatus]
  def close(): Unit
}

/** Embedded-Derby implementation — the analog of the reference's SQLite
  * backend (`metadata/sqlite.rs`): a zero-dependency local database file
  * beside the project config. */
final class DerbyMetadataStore(dbPath: String) extends MetadataStore {

  private lazy val conn: Connection = {
    // Derby's embedded driver registers on class load
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    DriverManager.getConnection(s"jdbc:derby:$dbPath;create=true")
  }

  override def init(): Unit = {
    def createIfMissing(sql: String): Unit = {
      val st = conn.createStatement()
      try st.executeUpdate(sql)
      catch {
        // X0Y32 = object already exists — idempotent init
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      } finally st.close()
    }
    createIfMissing(
      """CREATE TABLE domains (
        |  name VARCHAR(128) PRIMARY KEY,
        |  version INT NOT NULL,
        |  created_at TIMESTAMP NOT NULL)""".stripMargin)
    createIfMissing(
      """CREATE TABLE apply_log (
        |  domain VARCHAR(128) NOT NULL,
        |  version INT NOT NULL,
        |  user_id VARCHAR(128) NOT NULL,
        |  sources_added CLOB NOT NULL,
        |  sources_deleted CLOB NOT NULL,
        |  tables_modified CLOB NOT NULL,
        |  config_hash VARCHAR(64) NOT NULL,
        |  config_yaml CLOB NOT NULL,
        |  ts TIMESTAMP NOT NULL,
        |  PRIMARY KEY (domain, version))""".stripMargin)
  }

  override def applySources(domain: String, configYaml: String,
      userId: String, force: Boolean,
      expectedVersion: Option[Int]): ApplyOutcome = {
    val previousYaml = getSources(domain)
    val prevNames = sourceNames(previousYaml)
    val newNames = sourceNames(configYaml)
    val added = newNames.filterNot(prevNames.contains)
    val deleted = prevNames.filterNot(newNames.contains)
    if (deleted.nonEmpty && !force)
      throw new ForceRequiredException(
        s"apply would DELETE sources [${deleted.mkString(", ")}] — " +
          "re-run with --force to confirm")

    val current = getDomainVersionOpt(domain)
    expectedVersion.foreach { want =>
      if (current.getOrElse(0) != want)
        throw new VersionConflictException(
          s"domain '$domain' is at version ${current.getOrElse(0)}, " +
            s"expected $want (someone else applied first)")
    }
    conn.setAutoCommit(false)
    try {
      val newVersion = current match {
        case None =>
          val ins = conn.prepareStatement(
            "INSERT INTO domains (name, version, created_at) VALUES (?, 1, ?)")
          try {
            ins.setString(1, domain)
            ins.setTimestamp(2, Timestamp.from(java.time.Instant.now()))
            ins.executeUpdate()
          } finally ins.close()
          1
        case Some(v) =>
          // optimistic lock: bump only if still at the version we read
          val upd = conn.prepareStatement(
            "UPDATE domains SET version = ? WHERE name = ? AND version = ?")
          try {
            upd.setInt(1, v + 1)
            upd.setString(2, domain)
            upd.setInt(3, v)
            if (upd.executeUpdate() != 1)
              throw new VersionConflictException(
                s"domain '$domain' changed concurrently")
          } finally upd.close()
          v + 1
      }
      val log = conn.prepareStatement(
        """INSERT INTO apply_log (domain, version, user_id, sources_added,
          |  sources_deleted, tables_modified, config_hash, config_yaml, ts)
          |VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)""".stripMargin)
      try {
        log.setString(1, domain)
        log.setInt(2, newVersion)
        log.setString(3, userId)
        log.setString(4, added.mkString(","))
        log.setString(5, deleted.mkString(","))
        log.setString(6, "")
        log.setString(7, sha256(configYaml))
        log.setString(8, configYaml)
        log.setTimestamp(9, Timestamp.from(java.time.Instant.now()))
        log.executeUpdate()
      } finally log.close()
      conn.commit()
      ApplyOutcome(domain, newVersion, added, deleted)
    } catch {
      case NonFatal(e) => conn.rollback(); throw e
    } finally conn.setAutoCommit(true)
  }

  override def getDomainVersion(domain: String): Int =
    getDomainVersionOpt(domain).getOrElse(0)

  private def getDomainVersionOpt(domain: String): Option[Int] = {
    val st = conn.prepareStatement("SELECT version FROM domains WHERE name = ?")
    try {
      st.setString(1, domain)
      val rs = st.executeQuery()
      if (rs.next()) Some(rs.getInt(1)) else None
    } finally st.close()
  }

  override def getHistory(domain: String, limit: Int): Seq[ApplyLogEntry] = {
    val st = conn.prepareStatement(
      """SELECT version, user_id, sources_added, sources_deleted,
        |  tables_modified, config_hash, config_yaml, ts
        |FROM apply_log WHERE domain = ? ORDER BY version DESC
        |FETCH FIRST ? ROWS ONLY""".stripMargin)
    try {
      st.setString(1, domain)
      st.setInt(2, limit)
      val rs = st.executeQuery()
      val out = ArrayBuffer.empty[ApplyLogEntry]
      while (rs.next()) {
        def csv(s: String): Seq[String] =
          if (s == null || s.isEmpty) Nil else s.split(",").toSeq
        out += ApplyLogEntry(domain, rs.getInt(1), rs.getString(2),
          csv(rs.getString(3)), csv(rs.getString(4)), csv(rs.getString(5)),
          rs.getString(6), rs.getString(7),
          Option(rs.getTimestamp(8)).map(_.toInstant))
      }
      out.toSeq
    } finally st.close()
  }

  override def getHistoryConfig(domain: String, version: Int): String = {
    val st = conn.prepareStatement(
      "SELECT config_yaml FROM apply_log WHERE domain = ? AND version = ?")
    try {
      st.setString(1, domain)
      st.setInt(2, version)
      val rs = st.executeQuery()
      if (!rs.next()) throw new NoSuchElementException(
        s"domain '$domain' has no version $version")
      rs.getString(1)
    } finally st.close()
  }

  override def getSources(domain: String): String = {
    val v = getDomainVersion(domain)
    if (v == 0) "" else getHistoryConfig(domain, v)
  }

  override def listDomains(): Seq[DomainStatus] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        "SELECT name, version, created_at FROM domains ORDER BY name")
      val out = ArrayBuffer.empty[DomainStatus]
      while (rs.next())
        out += DomainStatus(rs.getString(1), rs.getInt(2),
          Option(rs.getTimestamp(3)).map(_.toInstant))
      out.toSeq
    } finally st.close()
  }

  override def close(): Unit =
    try conn.close() catch { case NonFatal(_) => () }

  private def sourceNames(yaml: String): Seq[String] =
    if (yaml.isEmpty) Nil
    else graft.sources.SourcesConfig.fromYamlString(yaml).sources.map(_.name)

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
