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
    case Some("oauth_client_credentials") =>
      Map("Authorization" -> s"Bearer ${RestAuth.token(oauthConfig.get)}")
    case Some("jwt_assertion") =>
      Map("Authorization" -> s"Bearer ${RestAuth.generateAssertion(jwtConfig.get)}")
    case _ => Map.empty
  }

  /** OAuth client-credentials options (rest.rs:55-62). */
  def oauthConfig: Option[RestAuth.OAuthConfig] =
    if (!ci.get("authtype").map(_.toLowerCase)
        .contains("oauth_client_credentials")) None
    else Some(RestAuth.OAuthConfig(
      clientId = ci.getOrElse("clientid",
        throw new IllegalArgumentException("oauth auth requires clientId")),
      clientSecret = ci.getOrElse("clientsecret", ""),
      tokenUrl = ci.getOrElse("tokenurl",
        throw new IllegalArgumentException("oauth auth requires tokenUrl")),
      scopes = ci.get("scopes").toSeq
        .flatMap(_.split("[ ,]+")).filter(_.nonEmpty)))

  /** Self-signed JWT assertion options (rest.rs:64-78); custom claims are
    * `claim.<name>=<value>` entries, case-preserving like `header.`. */
  def jwtConfig: Option[RestAuth.JwtConfig] =
    if (!ci.get("authtype").map(_.toLowerCase).contains("jwt_assertion")) None
    else Some(RestAuth.JwtConfig(
      issuer = ci.getOrElse("issuer",
        throw new IllegalArgumentException("jwt_assertion requires issuer")),
      audience = ci.getOrElse("audience",
        throw new IllegalArgumentException("jwt_assertion requires audience")),
      privateKeyPem = ci.getOrElse("privatekeypem",
        throw new IllegalArgumentException("jwt_assertion requires privateKeyPem")),
      algorithm = ci.getOrElse("algorithm", "RS256"),
      expirySecs = ci.getOrElse("expirysecs", "3600").toLong,
      subject = ci.get("subject"),
      claims = raw.collect { case (k, v) if k.toLowerCase.startsWith("claim.") =>
        k.substring("claim.".length) -> v }))
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
    def once(): (Int, Option[JsonNode]) = {
      val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      // authHeaders is re-evaluated per attempt: for OAuth sources a
      // refreshed cache entry yields a fresh Bearer token here
      (opts.authHeaders ++ opts.extraHeaders).foreach { case (k, v) =>
        conn.setRequestProperty(k, v) }
      val code = conn.getResponseCode
      if (code >= 400) { conn.disconnect(); (code, None) }
      else {
        val in = conn.getInputStream
        try (code, Some(mapper.readTree(in)))
        finally { in.close(); conn.disconnect() }
      }
    }
    val (code, body) = once() match {
      // A 401 under OAuth means the cached token outlived its server-side
      // validity: invalidate and retry once with a freshly fetched token
      // (the reference's expiry-refresh loop, rest_auth.rs:115-137).
      case (401, None) if opts.oauthConfig.isDefined =>
        RestAuth.invalidate(opts.oauthConfig.get)
        once()
      case r => r
    }
    body.getOrElse(
      throw new RuntimeException(s"REST source HTTP $code from $url"))
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
