package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL-queryable `information_schema` for the graft catalog — the
  * reference enables DataFusion's information_schema on every session
  * (/root/reference/crates/runtime/src/federation.rs:177
  * `.with_information_schema(true)`), so users and agents can introspect
  * with plain SQL:
  * {{{
  * SELECT * FROM graft.information_schema.tables
  * SELECT column_name, data_type FROM graft.information_schema.columns
  * WHERE table_name = 'lineitem'
  * }}}
  * Rows are derived from the catalog's own config at scan time; the
  * driver materializes only catalog METADATA (never data). */
object InformationSchema {

  val Namespace = "information_schema"

  val tablesSchema: StructType = StructType(Seq(
    StructField("table_catalog", StringType, nullable = false),
    StructField("table_schema", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("table_type", StringType, nullable = false)))

  val columnsSchema: StructType = StructType(Seq(
    StructField("table_catalog", StringType, nullable = false),
    StructField("table_schema", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("ordinal_position", IntegerType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("is_nullable", StringType, nullable = false)))

  /** A bounded, driver-computed rowset as a readable DSv2 table. */
  final class RowsTable(tableName: String, tableSchema: StructType,
      rows: () => Seq[Seq[Any]]) extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(new InputPartition {})
        override def createReaderFactory(): PartitionReaderFactory = {
          // materialize NOW (on the driver building the plan) so the
          // factory ships plain serializable rows to the executor
          val data = rows().map(_.map {
            case s: String => UTF8String.fromString(s)
            case v => v
          })
          new PartitionReaderFactory {
            override def createReader(p: InputPartition): PartitionReader[InternalRow] =
              new PartitionReader[InternalRow] {
                private val it = data.iterator
                private var current: InternalRow = _
                override def next(): Boolean =
                  if (it.hasNext) { current = InternalRow.fromSeq(it.next()); true }
                  else false
                override def get(): InternalRow = current
                override def close(): Unit = ()
              }
          }
        }
      }
  }
}
