package graft.sources.iceberg

import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Table maintenance for locally committed Iceberg tables — the
  * rewrite-data-files compaction every merge-on-read table eventually
  * needs: each upsert batch adds an equality-delete file whose
  * broadcast anti-join every subsequent read replays, so read cost
  * grows with delete history until a compaction materializes the
  * deletes into a clean file set.
  *
  * [[compact]] reads the CURRENT state through the same MoR read path
  * queries use ([[IcebergRest.readLocal]] — positional + equality
  * deletes applied, sequence-gated), writes it as fresh parquet, and
  * commits the result as a REPLACE snapshot (`IcebergLocal.append(...,
  * replace = true)`): the new manifest list carries only the rewritten
  * files, while every earlier snapshot's manifest list stays intact —
  * time travel to pre-compaction history keeps working, and reads of
  * the new head carry zero delete joins. Iceberg's own
  * rewrite_data_files action has the same contract.
  *
  * Scale notes: the rewrite is one distributed read→write of the live
  * data (the same cost as any full-table query on the table), the
  * commit is driver-side metadata. Row counts come from parquet
  * footers — no second Spark pass.
  */
object IcebergMaintenance {

  /** Compact `tableDir` into a deletes-free snapshot tagged
    * `compacted-<snapshotId>`; returns the new snapshot id. */
  def compact(spark: SparkSession, tableDir: JPath,
      clock: () => Long = () => System.currentTimeMillis(),
      retainLast: Option[Int] = None): Long = {
    val df = IcebergRest.readLocal(spark, tableDir)
    val next = IcebergLocal.currentMetadata(tableDir)
      .map(_.snapshots.map(_.snapshotId).max + 1).getOrElse(1L)
    val outDir = tableDir.resolve("data").resolve(f"compact-$next%05d")
    df.write.mode("overwrite").parquet(outDir.toString)
    val files = parquetFileInfos(outDir)
    IcebergLocal.append(tableDir, files, clock(),
      tag = Some(s"compacted-$next"), retainLast = retainLast,
      schema = Some(df.schema), replace = true)
  }

  /** DataFileInfo for every parquet part under `dir`, row counts from
    * the footers — zero Spark jobs. */
  def parquetFileInfos(dir: JPath, content: Int = 0,
      equalityIds: Seq[Int] = Nil): Seq[IcebergLocal.DataFileInfo] = {
    val conf = new Configuration()
    listParquet(dir).map { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), conf))
      val n = try r.getRecordCount finally r.close()
      IcebergLocal.DataFileInfo(p.toUri.toString, n, Files.size(p),
        content, equalityIds)
    }
  }

  private[iceberg] def listParquet(dir: JPath): Seq[JPath] = {
    val s = Files.list(dir) // close releases the directory fd
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
    } finally s.close()
  }
}
