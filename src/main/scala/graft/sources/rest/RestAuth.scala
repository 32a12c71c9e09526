package graft.sources.rest

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.security.{KeyFactory, Signature}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64

/** REST-source auth beyond static headers, mirroring the reference's
  * rest_auth.rs (/root/reference/crates/connectors/src/sources/
  * rest_auth.rs:1-260): OAuth 2.0 client-credentials with a token cache
  * (60 s early-expiry buffer, refresh on expiry, invalidation for the
  * 401-retry path) and self-signed JWT assertions (RS256/384/512 and
  * ES256/384) for service-account schemes.
  *
  * The cache is JVM-global like the reference's OnceLock singleton; entries
  * are keyed by (tokenUrl, clientId) so distinct sources sharing an
  * authorization server share tokens exactly when the reference would.
  */
object RestAuth {

  final case class OAuthConfig(clientId: String, clientSecret: String,
      tokenUrl: String, scopes: Seq[String]) {
    def cacheKey: String = tokenUrl + ":" + clientId
  }

  private final case class CachedToken(accessToken: String, expiresAtNanos: Long) {
    /** Expired with the reference's 60 s buffer (rest_auth.rs:31-33). */
    def isExpired(nowNanos: Long): Boolean =
      nowNanos >= expiresAtNanos - 60L * 1000 * 1000 * 1000
  }

  private val mapper = new ObjectMapper()
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedToken]()

  /** Test seam: how many network token fetches have happened. */
  private val fetches = new java.util.concurrent.atomic.AtomicLong(0)
  def fetchCount: Long = fetches.get()

  // One lock PER KEY, never the map's own bins: a hung authorization
  // server (up to ~40s of connect+read timeout) must only stall callers
  // of ITS key, not unrelated sources whose keys share a hash bin
  // (the reference's try_get_with is per-key for the same reason).
  private val fetchLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Valid access token for the config, from cache or a fresh fetch;
    * concurrent callers of the same key wait for one in-flight fetch. */
  def token(cfg: OAuthConfig): String = {
    val fast = cache.get(cfg.cacheKey)
    if (fast != null && !fast.isExpired(System.nanoTime())) return fast.accessToken
    val lock = fetchLocks.computeIfAbsent(cfg.cacheKey, _ => new Object)
    lock.synchronized {
      val again = cache.get(cfg.cacheKey)
      if (again != null && !again.isExpired(System.nanoTime())) again.accessToken
      else {
        val fresh = fetchToken(cfg)
        cache.put(cfg.cacheKey, fresh)
        fresh.accessToken
      }
    }
  }

  /** Drop the cached token (the fetch-retry path after a 401). */
  def invalidate(cfg: OAuthConfig): Unit = cache.remove(cfg.cacheKey)

  private def fetchToken(cfg: OAuthConfig): CachedToken = {
    fetches.incrementAndGet()
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> cfg.clientId,
      "client_secret" -> cfg.clientSecret) ++
      (if (cfg.scopes.nonEmpty) Seq("scope" -> cfg.scopes.mkString(" ")) else Nil)
    val body = form.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val conn = new URI(cfg.tokenUrl).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    val out = conn.getOutputStream
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val code = conn.getResponseCode
    if (code >= 400) {
      val err = Option(conn.getErrorStream).map { in =>
        try new String(in.readAllBytes(), StandardCharsets.UTF_8).take(500)
        finally in.close()
      }.getOrElse("")
      conn.disconnect()
      throw new RuntimeException(
        s"OAuth token request failed: HTTP $code from ${cfg.tokenUrl} - $err")
    }
    val node = {
      val in = conn.getInputStream
      try mapper.readTree(in) finally { in.close(); conn.disconnect() }
    }
    val access = Option(node.get("access_token")).map(_.asText())
      .filter(_.nonEmpty).getOrElse(throw new RuntimeException(
        s"OAuth token response from ${cfg.tokenUrl} has no access_token"))
    // expires_in default 3600 (rest_auth.rs:104)
    val ttlSecs = Option(node.get("expires_in")).map(_.asLong()).getOrElse(3600L)
    CachedToken(access, System.nanoTime() + ttlSecs * 1000 * 1000 * 1000)
  }

  // ---- self-signed JWT assertions (rest_auth.rs:205-260) ----

  final case class JwtConfig(issuer: String, audience: String,
      privateKeyPem: String, algorithm: String = "RS256",
      expirySecs: Long = 3600, subject: Option[String] = None,
      claims: Map[String, String] = Map.empty)

  private def b64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding().encodeToString(bytes)

  /** Sign `header.claims` with the PEM key. RS* uses SHA*withRSA over a
    * PKCS#8 key; ES* additionally converts the DER signature to the JOSE
    * raw r||s form RFC 7518 §3.4 requires. */
  def generateAssertion(cfg: JwtConfig,
      nowEpochSecs: Long = System.currentTimeMillis() / 1000): String = {
    val (sigAlg, keyAlg, esLen) = cfg.algorithm match {
      case "RS256" => ("SHA256withRSA", "RSA", 0)
      case "RS384" => ("SHA384withRSA", "RSA", 0)
      case "RS512" => ("SHA512withRSA", "RSA", 0)
      case "ES256" => ("SHA256withECDSA", "EC", 32)
      case "ES384" => ("SHA384withECDSA", "EC", 48)
      case other => throw new IllegalArgumentException(
        s"Unsupported JWT algorithm: $other")
    }
    val header = mapper.createObjectNode()
    header.put("alg", cfg.algorithm)
    header.put("typ", "JWT")
    val claims = mapper.createObjectNode()
    claims.put("iss", cfg.issuer)
    claims.put("aud", cfg.audience)
    claims.put("iat", nowEpochSecs)
    claims.put("exp", nowEpochSecs + cfg.expirySecs)
    cfg.subject.foreach(claims.put("sub", _))
    cfg.claims.foreach { case (k, v) => claims.put(k, v) }
    val signingInput =
      b64url(mapper.writeValueAsBytes(header)) + "." +
        b64url(mapper.writeValueAsBytes(claims))
    val key = KeyFactory.getInstance(keyAlg).generatePrivate(
      new PKCS8EncodedKeySpec(decodePem(cfg.privateKeyPem)))
    val sig = Signature.getInstance(sigAlg)
    sig.initSign(key)
    sig.update(signingInput.getBytes(StandardCharsets.US_ASCII))
    val raw = sig.sign()
    val joseSig = if (esLen == 0) raw else derToJose(raw, esLen)
    signingInput + "." + b64url(joseSig)
  }

  private def decodePem(pem: String): Array[Byte] =
    Base64.getMimeDecoder.decode(
      pem.replaceAll("-----[A-Z ]+-----", "").replaceAll("\\s", ""))

  /** DER ECDSA signature (SEQUENCE of two INTEGERs) → fixed-width r||s. */
  private def derToJose(der: Array[Byte], len: Int): Array[Byte] = {
    // SEQUENCE header: 0x30, length (possibly long-form)
    var i = 2
    if ((der(1) & 0x80) != 0) i += der(1) & 0x7f
    def readInt(): Array[Byte] = {
      require(der(i) == 0x02, "malformed DER signature")
      val l = der(i + 1) & 0xff
      val v = der.slice(i + 2, i + 2 + l)
      i += 2 + l
      v
    }
    def fixed(v: Array[Byte]): Array[Byte] = {
      val stripped = v.dropWhile(_ == 0)
      require(stripped.length <= len, "ECDSA component wider than curve")
      Array.fill[Byte](len - stripped.length)(0) ++ stripped
    }
    val r = readInt(); val s = readInt()
    fixed(r) ++ fixed(s)
  }
}
