package graft.sql.substrait

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 table whose rows ARE the result of executing a produced
  * Substrait plan on an external engine ([[SubstraitEngines]]) — the
  * execution half of the router's Substrait tier, mirroring how the
  * reference runs collapsed subplans on embedded DuckDB via
  * `from_substrait` (reference
  * crates/connectors/src/sources/sql/duckdb_federation.rs,
  * crates/sql/src/substrait_producer.rs:529-536).
  *
  * One InputPartition by design: the federation contract is a
  * dimension-sized remote result (the same stance as the wire-source
  * federation relations), so the single Arrow IPC stream decodes on one
  * task. Execution is LAZY — the engine runs when the scan's reader is
  * pulled, not when the optimizer plans it, so `explain` stays free.
  *
  * The engine's Arrow result may widen types (DuckDB sums an int32 into
  * an int128/decimal); the reader decodes with the STREAM's own schema
  * and casts positionally back to the schema the optimizer promised
  * ([[expected]]), so parents resolve against exact types. */
final class SubstraitEngineTable(expected: StructType, engine: String,
    plan: Array[Byte], tables: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String =
    s"substrait($engine, ${tables.keys.toSeq.sorted.mkString(",")})"
  override def schema(): StructType = expected
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = expected
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(new InputPartition {})
        override def createReaderFactory(): PartitionReaderFactory = {
          val (s, e, p, t) = (expected, engine, plan, tables)
          (_: InputPartition) => new SubstraitPartitionReader(s, e, p, t)
        }
      }
    }
}

/** Runs the plan bytes on first pull; fails LOUDLY on any engine error
  * (the tier is opt-in — a silent empty result would be a wrong answer,
  * not a fallback). */
final class SubstraitPartitionReader(expected: StructType, engine: String,
    plan: Array[Byte], tables: Map[String, String])
    extends PartitionReader[InternalRow] {

  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rows == null) {
      val ipc = SubstraitEngines.run(engine, plan, tables) match {
        case Right(bytes) => bytes
        case Left(err) => throw new java.io.IOException(
          s"substrait $engine execution failed: $err")
      }
      val actual = SubstraitEngines.ipcSchema(ipc)
      require(actual.length == expected.length,
        s"substrait $engine returned ${actual.length} columns, " +
          s"expected ${expected.length}")
      val decoded =
        graft.sources.arrowhttp.ArrowHttpClient.decodeStream(ipc, actual)
      // ANSI cast, explicitly: the engine may widen (DuckDB sums int32
      // into hugeint) and the default non-ANSI Cast would turn an
      // overflowing value into NULL — a silent wrong answer, contrary
      // to this tier's fail-loudly stance. ANSI makes it throw.
      val cast = UnsafeProjection.create(
        expected.fields.zipWithIndex.map { case (f, i) =>
          Cast(BoundReference(i, actual(i).dataType, nullable = true),
            f.dataType, Some("UTC"),
            org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
        }.toSeq)
      rows = decoded.iterator.map(cast)
    }
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
