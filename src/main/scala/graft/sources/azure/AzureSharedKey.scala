package graft.sources.azure

import java.nio.charset.StandardCharsets.UTF_8
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Azure Storage Shared Key authorization (the public "Authorize with
  * Shared Key" scheme for the Blob service): a canonical string-to-sign
  * over the request line, standard headers, the sorted `x-ms-*` headers,
  * and the canonicalized resource, HMAC-SHA256'd with the base64 account
  * key. Implemented here so `abfss://` reads need no hadoop-azure jar —
  * the in-repo [[AbfsFileSystem]] signs with this against the Blob REST
  * API (the reference reaches Azure through OpenDAL's azblob operator,
  * crates/connectors/src/sources/file.rs:124-207, which performs the
  * same signing via reqsign). */
object AzureSharedKey {

  /** StringToSign for the 2015-02-21+ service versions (empty
    * Content-Length when there is no body; Date line empty because
    * x-ms-date is always sent among the canonicalized headers). */
  def stringToSign(method: String, xmsHeaders: Seq[(String, String)],
      range: Option[String], canonicalizedResource: String): String = {
    val canonHeaders = xmsHeaders
      .map { case (k, v) => (k.toLowerCase, v.trim) }
      .filter(_._1.startsWith("x-ms-"))
      .sortBy(_._1)
      .map { case (k, v) => s"$k:$v\n" }.mkString
    Seq(
      method,
      "", // Content-Encoding
      "", // Content-Language
      "", // Content-Length (empty when 0)
      "", // Content-MD5
      "", // Content-Type
      "", // Date (x-ms-date is used instead)
      "", // If-Modified-Since
      "", // If-Match
      "", // If-None-Match
      "", // If-Unmodified-Since
      range.getOrElse("") // Range
    ).mkString("\n") + "\n" + canonHeaders + canonicalizedResource
  }

  /** CanonicalizedResource: `/account/container/blob` plus each query
    * parameter on its own line as `lowercase-name:value`, sorted by
    * name (values comma-joined when repeated — not used here). */
  def canonicalizedResource(account: String, path: String,
      query: Seq[(String, String)]): String = {
    val params = query
      .map { case (k, v) => (k.toLowerCase, v) }
      .sortBy(_._1)
      .map { case (k, v) => s"\n$k:$v" }.mkString
    s"/$account$path$params"
  }

  /** `SharedKey account:signature` header value. `accountKey` is the
    * base64 key exactly as the portal hands it out. */
  def authorization(account: String, accountKey: String,
      sts: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(
      java.util.Base64.getDecoder.decode(accountKey), "HmacSHA256"))
    val sig = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(sts.getBytes(UTF_8)))
    s"SharedKey $account:$sig"
  }

  /** RFC 1123 timestamp for x-ms-date. */
  def xmsDateNow(): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
}
