package graft.streaming

import java.nio.file.{Files, Path => JPath}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.sources.iceberg.IcebergLocal

/** Streaming sink committing each micro-batch as an append-only Iceberg
  * snapshot ([[IcebergLocal.append]]): `writeStream.foreachBatch(
  * IcebergSink.committer(tableDir))`. Composes the round's pieces into
  * the standard lakehouse ingest shape — a continuous feed lands as a
  * queryable snapshot history, readable (with time travel) by
  * [[graft.sources.iceberg.IcebergRest]] or any catalog client, while
  * the stream is still running.
  *
  * Exactly-once per micro-batch: Structured Streaming re-runs a batchId
  * after a failure, so each commit is tagged `batch-<id>` and a batch
  * whose tag already exists in the table's refs is skipped — the replay
  * becomes a no-op instead of a duplicate snapshot. (The tag check and
  * commit are driver-side and serial per query, matching foreachBatch's
  * execution model.)
  *
  * Scale notes: the distributed work is exactly the batch's parquet
  * write; the commit itself is a driver-side metadata append (one
  * manifest + one metadata JSON per batch). Row counts come from the
  * written files' footers (a metadata-only read), so the batch plan
  * executes once — no extra count() pass over the input.
  */
object IcebergSink {

  /** A `foreachBatch` function writing every micro-batch to
    * `tableDir/data/batch-<id>/` and committing it as snapshot tagged
    * `batch-<id>`. `clock` supplies commit timestamps (injectable for
    * deterministic histories in tests). */
  def committer(tableDir: JPath,
      clock: () => Long = () => System.currentTimeMillis())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val tag = s"batch-$batchId"
    val committed = IcebergLocal.currentMetadata(tableDir)
      .exists(_.refs.contains(tag))
    if (!committed && !batch.isEmpty) {
      val dataDir = tableDir.resolve("data").resolve(tag)
      batch.write.mode("overwrite").parquet(dataDir.toString)
      val spark = batch.sparkSession
      val files = Files.list(dataDir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
        .map { p =>
          // footer-only row count: parquet count() reads metadata, not data
          val n = spark.read.parquet(p.toUri.toString).count()
          IcebergLocal.DataFileInfo(p.toUri.toString, n, Files.size(p))
        }
      if (files.nonEmpty)
        IcebergLocal.append(tableDir, files, clock(), Some(tag))
    }
  }
}
