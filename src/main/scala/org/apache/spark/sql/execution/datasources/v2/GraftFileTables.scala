package org.apache.spark.sql.execution.datasources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
import org.apache.spark.sql.execution.datasources.json.JsonFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.csv.CSVTable
import org.apache.spark.sql.execution.datasources.v2.json.JsonTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Constructs Spark's builtin file-source V2 tables for the graft catalog.
  * Lives in this package because the FileTable subclasses are
  * package-private at the Scala level; the graft catalog delegates here so
  * catalog-resolved tables get the full native scan machinery (vectorized
  * parquet reader, filter pushdown, pruning) instead of a reimplementation.
  */
object GraftFileTables {
  def create(format: String, name: String, paths: Seq[String],
      userSchema: Option[StructType],
      options: Map[String, String]): Table = {
    val spark = SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val opts = new CaseInsensitiveStringMap(
      (options + ("paths" -> paths.mkString(","))).asJava)
    format.toLowerCase match {
      case "parquet" =>
        ParquetTable(name, spark, opts, paths, userSchema, classOf[ParquetFileFormat])
      case "csv" =>
        CSVTable(name, spark, opts, paths, userSchema, classOf[CSVFileFormat])
      case "json" =>
        JsonTable(name, spark, opts, paths, userSchema, classOf[JsonFileFormat])
      case other =>
        throw new IllegalArgumentException(s"unsupported file format: $other")
    }
  }
}
