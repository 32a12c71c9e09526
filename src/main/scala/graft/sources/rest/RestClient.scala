package graft.sources.rest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.Base64
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parsed connector options (see RestDataSource scaladoc for the surface;
  * field-for-field from the reference's RestSourceConfig,
  * /root/reference/crates/connectors/src/sources/rest.rs:15-114). */
final case class RestOptions(raw: Map[String, String]) {
  private val ci = raw.map { case (k, v) => k.toLowerCase -> v }
  def baseUrl: String = ci.getOrElse("baseurl",
    throw new IllegalArgumentException("rest source requires baseUrl"))
  def dataPath: Option[String] = ci.get("datapath")
  def authHeaders: Map[String, String] = ci.get("authtype").map(_.toLowerCase) match {
    case Some("basic") =>
      val cred = ci.getOrElse("authuser", "") + ":" + ci.getOrElse("authpassword", "")
      Map("Authorization" -> ("Basic " +
        Base64.getEncoder.encodeToString(cred.getBytes(StandardCharsets.UTF_8))))
    case Some("bearer") =>
      Map("Authorization" -> s"Bearer ${ci.getOrElse("authtoken", "")}")
    case _ => Map.empty
  }
  def extraHeaders: Map[String, String] =
    raw.collect { case (k, v) if k.toLowerCase.startsWith("header.") =>
      k.substring("header.".length) -> v }
  def pagination: String = ci.getOrElse("pagination", "none").toLowerCase
  def paramOffset: String = ci.getOrElse("paramoffset", "offset")
  def paramLimit: String = ci.getOrElse("paramlimit", "limit")
  def pageSize: Int = ci.getOrElse("pagesize", "100").toInt
  def tokenPath: String = ci.getOrElse("tokenpath", "next_token")
  def paramToken: String = ci.getOrElse("paramtoken", "token")
  /** Safety cap on pages fetched (rest.rs:514 caps at 50). */
  def maxPages: Int = ci.getOrElse("maxpages", "50").toInt
  /** Streaming admission control: pages fetched per trigger (the Kafka
    * maxOffsetsPerTrigger analog) — bounds driver memory during catch-up. */
  def maxPagesPerTrigger: Int = ci.getOrElse("maxpagespertrigger", "20").toInt
  /** pushdown.<column> = "<op>:<param>" */
  def pushdownRule(column: String, op: String): Option[String] =
    raw.collectFirst {
      case (k, v) if k.equalsIgnoreCase(s"pushdown.$column") &&
        v.takeWhile(_ != ':').trim == op =>
        v.dropWhile(_ != ':').drop(1).trim
    }
}

/** Single-stream paginated reader: fetch page → decode rows → next page
  * until exhausted or capped. */
final class RestPartitionReader(schema: StructType, opts: RestOptions,
    params: Map[String, String]) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var pageRows: Iterator[JsonNode] = Iterator.empty
  private var current: JsonNode = _
  private var pagesFetched = 0
  private var offset = 0
  private var nextToken: Option[String] = None
  private var exhausted = false

  override def next(): Boolean = {
    while (!pageRows.hasNext && !exhausted) fetchNextPage()
    if (pageRows.hasNext) { current = pageRows.next(); true } else false
  }

  override def get(): InternalRow = RestClient.toRow(current, schema)
  override def close(): Unit = ()

  private def fetchNextPage(): Unit = {
    if (pagesFetched >= opts.maxPages) { exhausted = true; return }
    val pageParams = opts.pagination match {
      case "indices" =>
        params + (opts.paramOffset -> offset.toString,
          opts.paramLimit -> opts.pageSize.toString)
      case "token" =>
        params ++ nextToken.map(opts.paramToken -> _)
      case _ => params
    }
    val body = RestClient.fetch(opts, pageParams)
    pagesFetched += 1
    val rows = RestClient.rowsOf(body, opts.dataPath)
    pageRows = rows.iterator
    opts.pagination match {
      case "indices" =>
        offset += rows.size
        if (rows.size < opts.pageSize) exhausted = true
      case "token" =>
        nextToken = RestClient.path(body, opts.tokenPath)
          .filter(n => !n.isNull && n.asText.nonEmpty).map(_.asText)
        if (nextToken.isEmpty) exhausted = true
      case _ => exhausted = true
    }
  }
}

object RestClient {
  private val mapper = new ObjectMapper()

  def fetch(opts: RestOptions, params: Map[String, String]): JsonNode = {
    val sep = if (opts.baseUrl.contains("?")) "&" else "?"
    val query = params.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val url = if (query.isEmpty) opts.baseUrl else opts.baseUrl + sep + query
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    (opts.authHeaders ++ opts.extraHeaders).foreach { case (k, v) =>
      conn.setRequestProperty(k, v) }
    val code = conn.getResponseCode
    if (code >= 400)
      throw new RuntimeException(s"REST source HTTP $code from $url")
    val in = conn.getInputStream
    try mapper.readTree(in) finally { in.close(); conn.disconnect() }
  }

  def rowsOf(body: JsonNode, dataPath: Option[String]): Seq[JsonNode] = {
    val arr = dataPath.flatMap(p => path(body, p)).getOrElse(body)
    if (arr.isArray) arr.elements().asScala.toSeq
    else if (arr.isObject) Seq(arr)
    else Nil
  }

  def path(node: JsonNode, dotted: String): Option[JsonNode] =
    dotted.split('.').foldLeft(Option(node)) {
      case (Some(n), seg) => Option(n.get(seg))
      case (None, _) => None
    }

  /** First-page JSON sniffing → schema, mirroring rest.rs:564-625
    * (numbers → long/double, bools, everything nested → string). */
  def inferSchema(opts: RestOptions): StructType = {
    val params = opts.pagination match {
      case "indices" => Map(opts.paramOffset -> "0",
        opts.paramLimit -> opts.pageSize.toString)
      case _ => Map.empty[String, String]
    }
    val rows = rowsOf(fetch(opts, params), opts.dataPath)
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    rows.take(100).foreach { r =>
      r.fields().asScala.foreach { e =>
        val t = e.getValue match {
          case v if v.isIntegralNumber => LongType
          case v if v.isNumber => DoubleType
          case v if v.isBoolean => BooleanType
          case _ => StringType // nested objects/arrays flattened to JSON text
        }
        fields.get(e.getKey) match {
          case None => fields(e.getKey) = t
          case Some(existing) if existing != t =>
            // widen on conflict: long+double → double, else string
            fields(e.getKey) =
              if (Set(existing, t) == Set[DataType](LongType, DoubleType)) DoubleType
              else StringType
          case _ => ()
        }
      }
    }
    StructType(fields.map { case (n, t) => StructField(n, t) }.toSeq)
  }

  def toRow(node: JsonNode, schema: StructType): InternalRow = {
    val values = schema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case LongType => java.lang.Long.valueOf(v.asLong())
        case IntegerType => java.lang.Integer.valueOf(v.asInt())
        case DoubleType => java.lang.Double.valueOf(v.asDouble())
        case BooleanType => java.lang.Boolean.valueOf(v.asBoolean())
        case StringType =>
          UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
        case TimestampType =>
          java.lang.Long.valueOf(
            DateTimeUtils.stringToTimestampAnsi(
              UTF8String.fromString(v.asText()),
              java.time.ZoneOffset.UTC))
        case other =>
          throw new IllegalArgumentException(
            s"REST source: unsupported type ${other.simpleString} for ${f.name}")
      }
    }
    InternalRow.fromSeq(values.toSeq)
  }
}
