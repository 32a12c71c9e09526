package graft.streaming

import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
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
  * Scale notes for an unbounded stream: the distributed work is exactly
  * the batch's parquet write — the plan executes ONCE (no isEmpty/count
  * pre-pass; emptiness is decided from what was written). Row counts
  * come from the parquet footers, read driver-side with
  * [[ParquetFileReader]] — zero Spark jobs. Commit-side growth is
  * bounded: manifest tails compact once they exceed
  * [[IcebergLocal.MergeManifestsAbove]], and `retainLast` caps the
  * snapshot history (per-commit metadata rewrite AND metadata-directory
  * size stay O(retainLast) instead of growing with every batch —
  * Iceberg's expire-snapshots maintenance, fused into the commit).
  */
object IcebergSink {

  /** A `foreachBatch` function writing every micro-batch to
    * `tableDir/data/batch-<id>/` and committing it as snapshot tagged
    * `batch-<id>`. `clock` supplies commit timestamps (injectable for
    * deterministic histories in tests). `retainLast` bounds the snapshot
    * history for unbounded streams; note a replayed batchId older than
    * the retained window re-commits (its tag expired with its snapshot),
    * so pick it well above the stream's maximum replay depth — Spark
    * replays only the last unacknowledged batch, so anything ≥ 2 is
    * safe from duplicates in practice. */
  def committer(tableDir: JPath,
      clock: () => Long = () => System.currentTimeMillis(),
      retainLast: Option[Int] = None)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val tag = s"batch-$batchId"
    val committed = IcebergLocal.currentMetadata(tableDir)
      .exists(_.refs.contains(tag))
    if (!committed) {
      val dataDir = tableDir.resolve("data").resolve(tag)
      batch.write.mode("overwrite").parquet(dataDir.toString)
      val conf = new Configuration()
      val files = listParquet(dataDir).map { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri), conf))
        val n = try r.getRecordCount finally r.close()
        IcebergLocal.DataFileInfo(p.toUri.toString, n, Files.size(p))
      }
      if (files.exists(_.recordCount > 0))
        IcebergLocal.append(tableDir, files.filter(_.recordCount > 0),
          clock(), Some(tag), retainLast, schema = Some(batch.schema))
      else deleteRecursively(dataDir) // empty batch: nothing to commit
    }
  }

  private def listParquet(dir: JPath): Seq[JPath] = {
    val s = Files.list(dir) // close releases the directory fd
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
    } finally s.close()
  }

  private def deleteRecursively(dir: JPath): Unit = {
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[JPath]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
  }
}
