package graft.sources

import java.io.{FileInputStream, InputStream}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types._

/** Source/table/column configuration, mirroring the reference's YAML
  * config model (/root/reference/crates/common/src/models.rs:53-117:
  * SourceConfig{name, type, url, tables}, TableConfig{name, schema,
  * partition_column, columns}, ColumnConfig{name, type, length, not_null})
  * and its declared-schema type surface
  * (/root/reference/crates/connectors/src/sources/file.rs:370-394).
  */
final case class SourcesConfig(sources: Seq[SourceDef],
    domain: Option[String] = None)

final case class SourceDef(
    name: String,
    sourceType: String, // parquet | csv | json | jdbc | rest
    url: Option[String] = None,
    options: Map[String, String] = Map.empty,
    maxConcurrentQueries: Option[Int] = None,
    /** `cache: false` opts every table of this source out of the result
      * cache — for volatile backends where a TTL-stale answer is wrong
      * (the reference's per-source cache disable, query/cache.rs). */
    cache: Boolean = true,
    tables: Seq[TableDef] = Nil)

final case class TableDef(
    name: String,
    path: Option[String] = None,
    partitionColumn: Option[String] = None,
    comment: Option[String] = None,
    columns: Seq[ColumnDef] = Nil) {
  /** Declared schema with comments carried as field metadata — the
    * reference attaches table/column comments to the Arrow schema for
    * agent discovery (MetadataEnrichedTableProvider,
    * crates/connectors/src/sources/sql/wrappers.rs:96-190). */
  def declaredSchema: Option[StructType] =
    if (columns.isEmpty) None
    else Some(StructType(columns.map { c =>
      val f = StructField(c.name, TypeMapper.fromConfig(c.dataType),
        nullable = !c.notNull)
      c.comment.fold(f)(f.withComment)
    }))
}

final case class ColumnDef(
    name: String, dataType: String, notNull: Boolean = false,
    comment: Option[String] = None)

/** Config type-string → Spark type. Same names the reference accepts in
  * declared schemas (file.rs:370-394: int/int32, bigint/int64, utf8/
  * string/varchar/text, float64/double, boolean, date/date32, timestamp,
  * decimal → Decimal128(15,2) default). */
object TypeMapper {
  def fromConfig(t: String): DataType = t.trim.toLowerCase match {
    case "int" | "int32" | "integer" => IntegerType
    case "bigint" | "int64" | "long" => LongType
    case "utf8" | "string" | "varchar" | "text" => StringType
    case "float64" | "double" | "float" => DoubleType
    case "boolean" | "bool" => BooleanType
    case "date" | "date32" => DateType
    case "timestamp" => TimestampType
    case "binary" | "blob" => BinaryType
    case s if s.startsWith("decimal") =>
      val ps = "\\d+".r.findAllIn(s).map(_.toInt).toSeq
      if (ps.size >= 2) DecimalType(ps.head, ps(1)) else DecimalType(15, 2)
    case other =>
      throw new IllegalArgumentException(s"unsupported config type: $other")
  }
}

/** YAML loader (snakeyaml ships with Spark). Accepts the shape:
  * {{{
  * sources:
  *   - name: files
  *     type: parquet
  *     tables:
  *       - name: lineitem
  *         path: /data/lineitem.parquet
  *         columns: [{name: l_orderkey, type: int64, not_null: true}]
  * }}}
  */
object SourcesConfig {
  def fromYamlFile(path: String): SourcesConfig = {
    val in = new FileInputStream(path)
    try fromYaml(in) finally in.close()
  }

  def fromYamlString(yaml: String): SourcesConfig =
    fromYaml(new java.io.ByteArrayInputStream(yaml.getBytes("UTF-8")))

  private def fromYaml(in: InputStream): SourcesConfig = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](in)
    val sources = list(root.get("sources")).map { s =>
      SourceDef(
        name = str(s, "name"),
        sourceType = str(s, "type"),
        url = opt(s, "url"),
        options = Option(s.get("options"))
          .map(_.asInstanceOf[java.util.Map[String, Object]].asScala
            .map { case (k, v) => k -> String.valueOf(v) }.toMap)
          .getOrElse(Map.empty),
        maxConcurrentQueries = opt(s, "max_concurrent_queries").map(_.toInt),
        cache = opt(s, "cache").forall(_.toBoolean),
        tables = list(s.get("tables")).map { t =>
          TableDef(
            name = str(t, "name"),
            path = opt(t, "path"),
            partitionColumn = opt(t, "partition_column"),
            comment = opt(t, "comment"),
            columns = list(t.get("columns")).map { c =>
              ColumnDef(str(c, "name"), str(c, "type"),
                Option(c.get("not_null")).exists(v => String.valueOf(v).toBoolean),
                comment = opt(c, "comment"))
            })
        })
    }
    SourcesConfig(sources,
      domain = Option(root.get("domain")).map(String.valueOf))
  }

  private def list(o: Object): Seq[java.util.Map[String, Object]] =
    Option(o).map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.toSeq).getOrElse(Nil)
  private def str(m: java.util.Map[String, Object], k: String): String =
    String.valueOf(m.get(k))
  private def opt(m: java.util.Map[String, Object], k: String): Option[String] =
    Option(m.get(k)).map(String.valueOf)
}
