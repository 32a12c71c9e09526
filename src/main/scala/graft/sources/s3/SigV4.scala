package graft.sources.s3

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing (the public SigV4 algorithm:
  * canonical request → string-to-sign → derived signing key → HMAC), as
  * specified in the AWS General Reference "Signature Version 4 signing
  * process". Implemented here so `s3://` reads need no SDK or hadoop-aws
  * jar — the in-repo [[S3FileSystem]] signs with this and any
  * S3-compatible store (AWS, MinIO, Ceph RGW, R2) accepts it.
  *
  * Reference parity: the reference reads object stores through OpenDAL's
  * s3 operator (crates/connectors/src/sources/file.rs:124-207), which
  * performs exactly this signing internally (opendal::services::S3 via
  * reqsign). Payloads are never signed (`UNSIGNED-PAYLOAD`) — the
  * engine's S3 surface is read-only, every request body is empty, and
  * S3 accepts unsigned payloads for both HTTP and HTTPS endpoints.
  */
object SigV4 {

  final val Algorithm = "AWS4-HMAC-SHA256"
  final val UnsignedPayload = "UNSIGNED-PAYLOAD"

  /** Strict AWS URI encoding: unreserved characters pass through, every
    * other byte becomes %XX (uppercase hex); '/' is preserved only for
    * path encoding. Space is %20, never '+'. */
  def uriEncode(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved =
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'
      if (unreserved || (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  def sha256Hex(s: String): String = sha256Hex(s.getBytes(UTF_8))

  def sha256Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** The four-step derived signing key for (secret, date, region, service). */
  def signingKey(secret: String, dateStamp: String, region: String,
      service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secret).getBytes(UTF_8), dateStamp)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  /** Canonical request per the SigV4 specification. `path` must be the
    * raw (once-encoded) request path; `query` the raw key/value pairs
    * BEFORE encoding; `headers` the headers to sign (values as sent). */
  def canonicalRequest(method: String, path: String,
      query: Seq[(String, String)], headers: Seq[(String, String)],
      payloadHash: String): String = {
    val cq = query
      .map { case (k, v) => (uriEncode(k, keepSlash = false),
        uriEncode(v, keepSlash = false)) }
      .sortBy(identity)
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
    val sortedHeaders = headers
      .map { case (k, v) => (k.toLowerCase, v.trim.replaceAll(" +", " ")) }
      .sortBy(_._1)
    val ch = sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val sh = sortedHeaders.map(_._1).mkString(";")
    s"$method\n$path\n$cq\n$ch\n$sh\n$payloadHash"
  }

  /** Full Authorization header value. `amzDate` is yyyyMMdd'T'HHmmss'Z';
    * its first 8 chars are the credential-scope date. */
  def authorization(method: String, path: String,
      query: Seq[(String, String)], headers: Seq[(String, String)],
      payloadHash: String, accessKey: String, secretKey: String,
      region: String, amzDate: String, service: String = "s3"): String = {
    val dateStamp = amzDate.take(8)
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val cr = canonicalRequest(method, path, query, headers, payloadHash)
    val sts = s"$Algorithm\n$amzDate\n$scope\n${sha256Hex(cr)}"
    val sig = hmac(signingKey(secretKey, dateStamp, region, service), sts)
      .map(x => f"${x & 0xff}%02x").mkString
    val sh = headers.map(_._1.toLowerCase).sorted.mkString(";")
    s"$Algorithm Credential=$accessKey/$scope, SignedHeaders=$sh, Signature=$sig"
  }

  /** Current UTC timestamp in the SigV4 wire format. */
  def amzDateNow(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
}
