package graft.sources

import graft.session.{WarningCodes, WarningCollector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Runtime schema-drift reconciliation: make whatever the source returned
  * conform to the declared schema.
  *
  * Same reconciliation matrix as the reference's SchemaDriftExec
  * (/root/reference/crates/connectors/src/sources/schema_drift.rs:122-346):
  *   - missing column      → NULL-filled column of the declared type
  *   - type change         → cast; values that fail to cast become NULL
  *     (try_cast semantics)
  *   - extra column        → dropped
  * Every reconciliation emits a warning on the collector.
  *
  * Implemented as a projection over the scan, so it stays inside
  * whole-stage codegen and costs nothing extra at scale.
  */
object SchemaDrift {

  def reconcile(df: DataFrame, target: StructType,
      warnings: WarningCollector): DataFrame = {
    val actual = df.schema
    val actualByName = actual.fields.map(f => f.name -> f).toMap

    val cols = target.fields.map { want =>
      actualByName.get(want.name) match {
        case None =>
          warnings.add(WarningCodes.SchemaDrift,
            s"column ${want.name} missing from source; null-filled")
          lit(null).cast(want.dataType).as(want.name)
        case Some(have) if have.dataType != want.dataType =>
          warnings.add(WarningCodes.SchemaDrift,
            s"column ${want.name} type ${have.dataType.simpleString} -> " +
              s"${want.dataType.simpleString}; incompatible values become null")
          val q = "`" + want.name.replace("`", "``") + "`"
          expr(s"try_cast($q AS ${want.dataType.sql})").as(want.name)
        case Some(_) => col(want.name)
      }
    }
    val extras = actual.fieldNames.toSet -- target.fieldNames.toSet
    extras.toSeq.sorted.foreach(e =>
      warnings.add(WarningCodes.SchemaDrift, s"extra column $e dropped"))
    df.select(cols.toSeq: _*)
  }
}
