package graft.sources.rest

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for paginated REST JSON APIs — the Spark-native
  * re-expression of the reference's custom REST TableProvider/ExecutionPlan
  * (/root/reference/crates/connectors/src/sources/rest.rs:15-114 config,
  * 364-562 paged execution, 469-512 declarative filter→query-param
  * pushdown, page cap at 514, 722-744 JSON→columnar decode).
  *
  * Options:
  *   baseUrl                   endpoint returning a JSON array (or object
  *                             with `dataPath` pointing at the array)
  *   dataPath                  dot-path to the row array in the response
  *   authType=basic|bearer     + authUser/authPassword | authToken
  *   header.<Name>=<value>     extra request headers
  *   pagination=indices|token|none  (default none)
  *     indices: paramOffset, paramLimit, pageSize
  *     token:   tokenPath (dot-path in body), paramToken
  *   maxPages                  safety cap (default 50, rest.rs:514)
  *   pushdown.<column>=<op>:<param>  declarative pushdown, e.g.
  *                             pushdown.id==:id_param (ops: = > < >= <=)
  *
  * Scale notes: a REST endpoint is a single stream, so the scan is one
  * InputPartition (the reference's RestExec is likewise a 1-partition
  * plan). Parallelism at 100 TB comes from many tables/param-splits, not
  * from splitting one HTTP cursor; pushed filters shrink the transferred
  * payload — exactly like the reference's query-param pushdown.
  */
class RestDataSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestClient.inferSchema(RestOptions(options.asCaseSensitiveMap().asScala.toMap))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(schema, RestOptions(properties.asScala.toMap))
}

final class RestTable(schema: StructType, opts: RestOptions)
    extends Table with SupportsRead {
  override def name(): String = opts.baseUrl
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, opts)
}

/** Pushdown: accepts filters covered by the declarative pushdown config
  * (they become query params); everything else stays in Spark. Also prunes
  * columns — only requested fields are decoded from JSON. */
final class RestScanBuilder(fullSchema: StructType, opts: RestOptions)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(paramFor(_).isDefined)
    // INEXACT pushdown: the params narrow what the endpoint transfers, but
    // an API that ignores an unknown param would silently widen results —
    // so Spark must keep evaluating every filter post-scan (same stance as
    // DataFusion's Inexact filter pushdown for REST sources).
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RestScan(required, opts, pushedParams)

  /** filter → (param, value) when the config declares a matching rule. */
  private def paramFor(f: Filter): Option[(String, String)] = f match {
    case EqualTo(c, v) => opts.pushdownRule(c, "=").map(_ -> String.valueOf(v))
    case GreaterThan(c, v) => opts.pushdownRule(c, ">").map(_ -> String.valueOf(v))
    case LessThan(c, v) => opts.pushdownRule(c, "<").map(_ -> String.valueOf(v))
    case GreaterThanOrEqual(c, v) => opts.pushdownRule(c, ">=").map(_ -> String.valueOf(v))
    case LessThanOrEqual(c, v) => opts.pushdownRule(c, "<=").map(_ -> String.valueOf(v))
    case _ => None
  }
  private def pushedParams: Map[String, String] =
    pushed.flatMap(paramFor).toMap
}

final class RestScan(schema: StructType, opts: RestOptions,
    params: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RestMicroBatchStream(schema, opts, params)
  override def planInputPartitions(): Array[InputPartition] =
    Array(RestInputPartition(opts, params))
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema)
  override def description(): String =
    s"RestScan(${opts.baseUrl}, pushedParams=$params)"
}

final case class RestInputPartition(opts: RestOptions,
    params: Map[String, String]) extends InputPartition

final class RestReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val rp = p.asInstanceOf[RestInputPartition]
    new RestPartitionReader(schema, rp.opts, rp.params)
  }
}
