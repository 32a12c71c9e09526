package graft.server

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{UInt4Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.DenseUnionVector
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.UnionMode
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.session.GraftSession

/** Flight SQL catalog-discovery results — the CommandGetCatalogs /
  * GetDbSchemas / GetTables / GetSqlInfo surface ADBC drivers call on
  * connect, mirroring the reference's metadata handlers
  * (crates/server/src/flight_sql.rs:98-125 result schemas,
  * 321-434 catalog/schema/table streams, 729-790 sql_info batch).
  *
  * All listings are driver-side metadata (Spark catalog API — no jobs);
  * the result schemas are fixed by the published Flight SQL spec.
  * GetSqlInfo's value column is the spec's dense union, built directly
  * with Arrow Java vectors (Spark has no union type).
  */
object FlightSqlCatalog {

  private val CatalogsSchema = StructType(Seq(
    StructField("catalog_name", StringType, nullable = false)))
  private val SchemasSchema = StructType(Seq(
    StructField("catalog_name", StringType),
    StructField("db_schema_name", StringType, nullable = false)))
  private val TablesSchema = StructType(Seq(
    StructField("catalog_name", StringType),
    StructField("db_schema_name", StringType),
    StructField("table_name", StringType, nullable = false),
    StructField("table_type", StringType, nullable = false),
    StructField("table_schema", BinaryType, nullable = false)))

  /** The GetFlightInfo-advertised schema for each catalog command. */
  def schemaIpcFor(command: String): Array[Byte] = command match {
    case "CommandGetCatalogs" => ArrowResults.schemaIpcBytes(CatalogsSchema)
    case "CommandGetDbSchemas" => ArrowResults.schemaIpcBytes(SchemasSchema)
    case "CommandGetTables" => ArrowResults.schemaIpcBytes(TablesSchema)
    case "CommandGetXdbcTypeInfo" => ArrowResults.schemaIpcBytes(XdbcSchema)
    case "CommandGetSqlInfo" => schemaIpc(sqlInfoArrowSchema)
    case other => throw new IllegalArgumentException(s"no schema for $other")
  }

  def catalogs(engine: GraftSession): Array[Byte] = {
    val names = engine.spark.catalog.listCatalogs().collect().map(_.name)
    ArrowResults.toArrowStream(CatalogsSchema,
      names.sorted.map(n => Row(n): Row))
  }

  def dbSchemas(engine: GraftSession, catalog: String, pattern: String,
      like: (String, String) => Boolean): Array[Byte] = {
    val cat = engine.spark.catalog.currentCatalog()
    val rows =
      if (catalog != null && catalog.nonEmpty && catalog != cat) Array.empty[Row]
      else engine.spark.catalog.listDatabases().collect()
        .map(_.name).filter(like(_, pattern)).sorted
        .map(n => Row(cat, n): Row)
    ArrowResults.toArrowStream(SchemasSchema, rows)
  }

  /** Tables + temp views (the registry serves sources as temp views, so
    * discovery must list them — the agent path's schema search does
    * too). Spark's TEMPORARY/VIEW types report as "VIEW", persisted
    * tables as "TABLE"; `table_types` filters on those labels. */
  def tables(engine: GraftSession, catalog: String, dbPattern: String,
      tablePattern: String, tableTypes: Seq[String], includeSchema: Boolean,
      like: (String, String) => Boolean): Array[Byte] = {
    val spark = engine.spark
    val cat = spark.catalog.currentCatalog()
    val rows =
      if (catalog != null && catalog.nonEmpty && catalog != cat) Array.empty[Row]
      else {
        val listed = spark.catalog.listTables().collect()
        listed
          .map { t =>
            val db = Option(t.database).getOrElse("")
            val tpe =
              if (t.tableType == null || t.isTemporary ||
                t.tableType.toUpperCase.contains("VIEW")) "VIEW"
              else "TABLE"
            (db, t.name, tpe)
          }
          .filter { case (db, name, tpe) =>
            like(db, dbPattern) && like(name, tablePattern) &&
              (tableTypes.isEmpty || tableTypes.contains(tpe))
          }
          .sortBy { case (db, name, _) => (db, name) }
          .map { case (db, name, tpe) =>
            val schemaBytes =
              if (includeSchema)
                try ArrowResults.schemaIpcBytes(spark.table(name).schema)
                catch { case _: Exception => Array.emptyByteArray }
              else Array.emptyByteArray
            Row(cat, db, name, tpe, schemaBytes): Row
          }
      }
    ArrowResults.toArrowStream(TablesSchema, rows)
  }

  private val XdbcSchema = StructType(Seq(
    StructField("type_name", StringType, nullable = false),
    StructField("data_type", IntegerType, nullable = false)))

  /** GetXdbcTypeInfo: the SQL types this edge serves, as (name, JDBC
    * java.sql.Types code) — the reference ships a 2-row static batch
    * (flight_sql.rs:836-846); this one covers the full mapped surface.
    * `dataType` (when set) filters to that code. */
  def xdbcTypeInfo(dataType: Option[Int]): Array[Byte] = {
    val all = Seq(
      ("BOOLEAN", 16), ("SMALLINT", 5), ("INTEGER", 4), ("BIGINT", -5),
      ("REAL", 7), ("DOUBLE", 8), ("DECIMAL", 3), ("VARCHAR", 12),
      ("VARBINARY", -3), ("DATE", 91), ("TIMESTAMP", 93))
    val rows = all.filter(t => dataType.forall(_ == t._2))
      .map(t => Row(t._1, t._2): Row).toArray
    ArrowResults.toArrowStream(XdbcSchema, rows)
  }

  // ------------------------------------------------------------ sql_info

  /** Flight SQL server metadata ids (the subset the reference reports,
    * flight_sql.rs:32-35). */
  private val InfoServerName = 0L
  private val InfoServerVersion = 1L
  private val InfoDriverVersion = 2L
  private val InfoServerReady = 3L

  private def sqlInfoArrowSchema: ArrowSchema = {
    val unionChildren = Seq(
      new Field("string_value",
        FieldType.notNullable(ArrowType.Utf8.INSTANCE), null),
      new Field("bool_value",
        FieldType.notNullable(ArrowType.Bool.INSTANCE), null),
      new Field("bigint_value",
        FieldType.notNullable(new ArrowType.Int(64, true)), null),
      new Field("int32_value",
        FieldType.notNullable(new ArrowType.Int(32, true)), null),
      new Field("string_list",
        FieldType.notNullable(ArrowType.List.INSTANCE),
        Seq(new Field("item",
          FieldType.nullable(ArrowType.Utf8.INSTANCE), null)).asJava),
      new Field("int32_bitmask",
        FieldType.notNullable(new ArrowType.Int(32, true)), null))
    val union = new Field("value",
      FieldType.nullable(new ArrowType.Union(UnionMode.Dense,
        Array(0, 1, 2, 3, 4, 5))),
      unionChildren.asJava)
    new ArrowSchema(Seq(
      new Field("info_name",
        FieldType.notNullable(new ArrowType.Int(32, false)), null),
      union).asJava)
  }

  private def schemaIpc(schema: ArrowSchema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(
      new org.apache.arrow.vector.ipc.WriteChannel(Channels.newChannel(out)),
      schema)
    out.toByteArray
  }

  /** The GetSqlInfo result: (info_name, dense-union value). Server name
    * and versions as strings, server-ready as a boolean (TRUE — this
    * edge answers it honestly; the reference reports false,
    * flight_sql.rs:735). Empty `wanted` = everything, per spec. */
  def sqlInfo(wanted: Seq[Long]): Array[Byte] = {
    val entries: Seq[(Long, Either[String, Boolean])] = Seq(
      InfoServerName -> Left("graft"),
      InfoServerVersion -> Left("1.0.0"),
      InfoDriverVersion -> Left("17.0.0"),
      InfoServerReady -> Right(true)
    ).filter { case (id, _) => wanted.isEmpty || wanted.contains(id) }
    val allocator = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(sqlInfoArrowSchema, allocator)
      try {
        root.allocateNew()
        val names = root.getVector(0).asInstanceOf[UInt4Vector]
        val union = root.getVector(1).asInstanceOf[DenseUnionVector]
        val strings = union.getVectorByType(0.toByte).asInstanceOf[VarCharVector]
        val bools = union.getVectorByType(1.toByte)
          .asInstanceOf[org.apache.arrow.vector.BitVector]
        var si = 0 // next offset within the string child
        var bi = 0 // next offset within the bool child
        entries.zipWithIndex.foreach { case ((id, value), i) =>
          names.setSafe(i, id.toInt)
          value match {
            case Left(s) =>
              union.setTypeId(i, 0.toByte)
              union.getOffsetBuffer.setInt(i * 4L, si)
              strings.setSafe(si, s.getBytes("UTF-8"))
              si += 1
            case Right(b) =>
              union.setTypeId(i, 1.toByte)
              union.getOffsetBuffer.setInt(i * 4L, bi)
              bools.setSafe(bi, if (b) 1 else 0)
              bi += 1
          }
        }
        strings.setValueCount(si)
        bools.setValueCount(bi)
        union.setValueCount(entries.length)
        root.setRowCount(entries.length)
        val out = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
        writer.start(); writer.writeBatch(); writer.end(); writer.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }
}
