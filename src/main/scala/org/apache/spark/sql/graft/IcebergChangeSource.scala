package org.apache.spark.sql.graft

import java.nio.file.{Path => JPath, Paths}

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.iceberg.{IcebergLocal, IcebergRest}

/** Streaming CHANGELOG source for a local Iceberg table — `readStream
  * .format("graft-iceberg-stream").option("path", tableDir)`: each
  * trigger admits the rows APPENDED to the table's published (`main`)
  * lineage since the last committed snapshot, by the same manifest
  * file-set diff as the batch [[graft.sources.iceberg.IcebergRest
  * .readIncremental]] — the "tail the lake table" consumer every
  * curation pipeline schedules, as a real Structured Streaming source
  * with checkpointed exactly-once offsets.
  *
  * Offsets are SNAPSHOT IDS (monotonic under this writer's serial
  * numbering), so Spark's checkpoint replay contract holds: a restarted
  * stream re-plans exactly the (committed, head] window. The plan per
  * trigger reads only the window's added files — a consumer's cost
  * tracks its lag, not the table size, which is the whole point at
  * 100 TB.
  *
  * Honest refusals, inherited from the batch diff: a window that
  * REWRITES files (compaction/replace — including a rollback followed
  * by new commits) or commits DELETE files (row-level deletes/upserts)
  * fails loudly rather than emitting wrong changelog rows; unpublished
  * branch commits (write-audit-publish) are invisible until
  * fast-forward/cherry-pick moves `main`, at which point their rows are
  * admitted exactly once.
  *
  * Lives in the `org.apache.spark.sql` package tree because the V1
  * streaming `Source` trait and `Dataset.ofRows` are `private[sql]` —
  * the same shim pattern as [[org.apache.spark.sql.GraftPlanBridge]]
  * (and the same package trick Delta Lake's DeltaSource uses for the
  * same API).
  */
final class IcebergChangeSource(spark: SparkSession, tableDir: JPath,
    override val schema: StructType) extends Source {

  /** The published head: `main`'s snapshot, never an unpublished
    * branch head (branch ids can exceed main's — max-snapshot would
    * leak audit commits into the stream). */
  private def mainHead: Option[Long] =
    IcebergLocal.currentMetadata(tableDir).flatMap(m =>
      m.refs.get("main").map(_._2)
        .orElse(m.currentSnapshotId.filter(_ >= 0)))

  override def getOffset: Option[Offset] = mainHead.map(LongOffset(_))

  /** LongOffset's json is the plain number; checkpoint replay hands
    * back a SerializedOffset wrapping the same text. */
  private def idOf(o: Offset): Long =
    o.json().replaceAll("[^0-9]", "").toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(idOf).getOrElse(0L)
    val df = IcebergRest.readIncremental(spark, tableDir, from,
      toSnapshotId = Some(idOf(end)))
    // V1 source contract: the returned frame must carry a STREAMING
    // leaf; the batch parquet scan (or the empty-window LocalRelation)
    // is re-marked, nothing else about the plan changes
    val plan = df.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case loc: LocalRelation => loc.copy(isStreaming = true)
    }
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  }

  override def stop(): Unit = ()

  override def toString: String = s"IcebergChangeSource[$tableDir]"
}

object IcebergChangeSource {
  /** The stream's schema without scanning data: the table metadata's
    * field-id-annotated Spark schema when every column maps, else the
    * head read's schema (one footer). Loud when the table doesn't
    * exist yet — a streaming source can't invent columns. */
  def tableSchema(spark: SparkSession, tableDir: JPath): StructType = {
    val meta = IcebergLocal.currentMetadata(tableDir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed Iceberg table at $tableDir"))
    meta.sparkSchema.getOrElse(
      IcebergRest.readLocal(spark, tableDir).schema)
  }
}

/** `readStream.format("graft-iceberg-stream")` registration. */
final class IcebergStreamProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-stream"

  private def dirOf(parameters: Map[String, String]): JPath =
    Paths.get(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "option 'path' (the Iceberg table directory) is required")))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(IcebergChangeSource.tableSchema(
      sqlContext.sparkSession, dirOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = dirOf(parameters)
    new IcebergChangeSource(sqlContext.sparkSession, dir,
      schema.getOrElse(
        IcebergChangeSource.tableSchema(sqlContext.sparkSession, dir)))
  }
}
