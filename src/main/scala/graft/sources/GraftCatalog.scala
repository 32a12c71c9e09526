package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Three-level namespace catalog: `graft.<source>.<table>`, mirroring the
  * reference's Catalog → Schema → Table model where each configured
  * source becomes a schema (default catalog `strake`, per-source
  * namespaces — /root/reference/crates/runtime/src/federation.rs:104-110,
  * crates/connectors/src/sources/sql/mod.rs:178-185).
  *
  * Activate with:
  * {{{
  * spark.sql.catalog.graft = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.config = /path/to/sources.yaml
  * }}}
  * then `SELECT * FROM graft.files.lineitem` / `SHOW NAMESPACES IN graft`.
  *
  * Tables are file-backed (parquet/csv/json) V2 tables; the path and
  * declared schema come from the YAML config. JDBC/REST sources keep
  * their own specialized access paths (JDBCTableCatalog, RestDataSource)
  * and aren't duplicated here.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var config: SourcesConfig = SourcesConfig(Nil)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    Option(options.get("config")).foreach { path =>
      config = validated(SourcesConfig.fromYamlFile(path))
    }
  }

  override def name(): String = catalogName

  /** Test/embedding hook: install a config programmatically. */
  private[graft] def setConfig(c: SourcesConfig): Unit = config = validated(c)

  /** The synthetic namespace would silently shadow a same-named source
    * (its tables become unreachable) — reject it up front. */
  private def validated(c: SourcesConfig): SourcesConfig = {
    require(!c.sources.exists(_.name.equalsIgnoreCase(InformationSchema.Namespace)),
      s"'${InformationSchema.Namespace}' is a reserved namespace and " +
        "cannot be used as a source name")
    c
  }

  private def fileSources = config.sources.filter(s =>
    Set("parquet", "csv", "json").contains(s.sourceType.toLowerCase))

  // -------------------------------------------------------- namespaces
  override def listNamespaces(): Array[Array[String]] =
    fileSources.map(s => Array(s.name)).toArray :+
      Array(InformationSchema.Namespace)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && (namespace(0) == InformationSchema.Namespace ||
      fileSources.exists(_.name == namespace(0)))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    if (namespace(0) == InformationSchema.Namespace)
      return Map("type" -> "system").asJava
    val src = fileSources.find(_.name == namespace(0)).get
    Map("type" -> src.sourceType).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  // ------------------------------------------------------------ tables
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val infoSchema =
      if (namespace.isEmpty || namespace(0) == InformationSchema.Namespace)
        Array("tables", "columns").map(
          Identifier.of(Array(InformationSchema.Namespace), _))
      else Array.empty[Identifier]
    fileSources.filter(s => namespace.isEmpty || s.name == namespace(0))
      .flatMap(s => s.tables.map(t => Identifier.of(Array(s.name), t.name)))
      .toArray ++ infoSchema
  }

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.sameElements(Array(InformationSchema.Namespace)))
      loadInformationSchema(ident)
    else loadVersioned(ident, None)

  /** `information_schema.{tables,columns}` — catalog introspection as
    * plain SQL (the reference's with_information_schema(true)). Column
    * rows use the DECLARED schema when present; undeclared PARQUET
    * tables fall back to the footer (metadata-only). Undeclared CSV/JSON
    * tables are listed in .tables but contribute no column rows —
    * inferring their schema would SCAN the data, and a catalog
    * introspection query must never read table data. */
  private def loadInformationSchema(ident: Identifier): Table = {
    def columnsOf(src: SourceDef, tbl: TableDef)
        : Seq[org.apache.spark.sql.types.StructField] =
      tbl.declaredSchema.map(_.fields.toSeq).getOrElse {
        if (!src.sourceType.equalsIgnoreCase("parquet")) Nil
        else
          try loadVersioned(Identifier.of(Array(src.name), tbl.name), None)
            .schema().fields.toSeq
          catch { case scala.util.control.NonFatal(_) => Nil }
      }
    ident.name match {
      case "tables" => new InformationSchema.RowsTable(
        "information_schema.tables", InformationSchema.tablesSchema,
        () => fileSources.flatMap(s => s.tables.map(t =>
          Seq(catalogName, s.name, t.name, "BASE TABLE"))))
      case "columns" => new InformationSchema.RowsTable(
        "information_schema.columns", InformationSchema.columnsSchema,
        () => fileSources.flatMap(s => s.tables.flatMap(t =>
          columnsOf(s, t).zipWithIndex.map { case (f, i) =>
            Seq(catalogName, s.name, t.name, f.name, i + 1,
              f.dataType.sql, if (f.nullable) "YES" else "NO")
          })))
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    }
  }

  /** Time travel by snapshot id / tag / branch —
    * `SELECT ... VERSION AS OF <v>`. Mirrors the reference's
    * `TableVersionSpec::{SnapshotId, Tag, Branch}`
    * (/root/reference/crates/connectors/src/sources/iceberg.rs:43-100,
    * provider.rs version resolution), over the local snapshot log. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadVersioned(ident, Some(SnapshotLog.ByVersion(version)))

  /** Time travel by timestamp — `SELECT ... TIMESTAMP AS OF <t>`; Spark
    * passes MICROseconds. As-of semantics: the latest snapshot whose
    * commit time is <= the requested instant (TableVersionSpec::Timestamp,
    * validated not-in-future like iceberg.rs:70-77). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    loadVersioned(ident, Some(SnapshotLog.ByTimestamp(timestampMicros / 1000L)))

  private def loadVersioned(ident: Identifier,
      spec: Option[SnapshotLog.VersionSpec]): Table = {
    val src = fileSources.find(s => ident.namespace.sameElements(Array(s.name)))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident))
    val tbl = src.tables.find(_.name == ident.name)
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident))
    val path = tbl.path.getOrElse(
      throw new IllegalArgumentException(s"table ${tbl.name} needs a path"))
    val resolved = SnapshotLog.resolve(path, spec)
    // delegate to Spark's native file tables: full pushdown/pruning applies
    org.apache.spark.sql.execution.datasources.v2.GraftFileTables.create(
      src.sourceType, s"${src.name}.${tbl.name}", Seq(resolved),
      tbl.declaredSchema,
      src.options ++ (if (src.sourceType.equalsIgnoreCase("csv"))
        Map("header" -> src.options.getOrElse("header", "true")) else Map.empty))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
