package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import graft.session.AuthenticatedUser
import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import scala.jdk.CollectionConverters._

/** Token-based authenticator for the serving layer — the OIDC-shaped
  * sibling of [[ApiKeyAuthenticator]] (the reference supports API-key and
  * OIDC bearer auth, crates/server/src/auth.rs:25-155).
  *
  * Validates HS256 JWTs offline: signature over `header.payload` with a
  * shared secret, `exp` (required) checked against the injected clock,
  * `sub` → user id, optional `permissions` claim (array of strings).
  * RS256/JWKS key resolution is a key-source swap behind the same
  * surface; the zero-egress build keeps the HMAC profile.
  */
final class JwtAuthenticator(
    secret: String,
    clock: () => Long = () => System.currentTimeMillis() / 1000) {

  private val mapper = new ObjectMapper()

  def apply(token: String): Option[AuthenticatedUser] = {
    val parts = token.split('.')
    if (parts.length != 3) return None
    try {
      val header = mapper.readTree(decode(parts(0)))
      if (header.path("alg").asText() != "HS256") return None
      if (!constantTimeEq(sign(parts(0) + "." + parts(1)), parts(2))) return None
      val payload = mapper.readTree(decode(parts(1)))
      val exp = payload.path("exp")
      if (exp.isMissingNode || exp.asLong() <= clock()) return None
      val sub = payload.path("sub").asText("")
      if (sub.isEmpty) return None
      val perms = payload.path("permissions") match {
        case a if a.isArray => a.elements().asScala.map(_.asText()).toSet
        case _ => Set.empty[String]
      }
      Some(AuthenticatedUser(sub, permissions = perms))
    } catch {
      case _: Exception => None
    }
  }

  def sign(signingInput: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    Base64.getUrlEncoder.withoutPadding.encodeToString(
      mac.doFinal(signingInput.getBytes(StandardCharsets.UTF_8)))
  }

  /** Issue a token (test/demo helper; a real deployment's IdP signs). */
  def issue(sub: String, permissions: Set[String], expEpochSeconds: Long): String = {
    val enc = Base64.getUrlEncoder.withoutPadding
    def b64(json: String) = enc.encodeToString(json.getBytes(StandardCharsets.UTF_8))
    val header = b64("""{"alg":"HS256","typ":"JWT"}""")
    val permsJson = permissions.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val payload = b64(
      s"""{"sub":"$sub","permissions":$permsJson,"exp":$expEpochSeconds}""")
    s"$header.$payload.${sign(s"$header.$payload")}"
  }

  private def decode(part: String): String =
    new String(Base64.getUrlDecoder.decode(part), StandardCharsets.UTF_8)

  private def constantTimeEq(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))
}

/** OIDC serving auth — RS256 JWTs verified against the issuer's JWKS
  * endpoint (the reference's OIDC profile, crates/common/src/config.rs:
  * oidc issuer/audience + crates/server/src/auth.rs bearer path).
  *
  * Verification is strict and offline once keys are cached:
  *  - `alg` MUST be RS256 — an HS256 token is rejected outright, so the
  *    classic alg-confusion downgrade (HMAC with the public key as the
  *    secret) cannot arise;
  *  - the header `kid` selects the key from the cached JWKS; an unknown
  *    kid triggers ONE rate-limited refetch (key rotation support), a
  *    still-unknown kid fails;
  *  - signature is SHA256withRSA over `header.payload`;
  *  - `exp` (required), `iss` == issuer, and `aud` containing audience
  *    are all enforced against the injected clock;
  *  - `sub` → user id; optional `permissions` array claim, same claim
  *    shape as [[JwtAuthenticator]].
  *
  * JWKS is fetched over HTTP(S) with a TTL cache; fetch failures keep
  * serving from the last good key set (an IdP blip must not take down
  * query auth). */
final class OidcAuthenticator(
    jwksUri: String,
    issuer: String,
    audience: String,
    clock: () => Long = () => System.currentTimeMillis() / 1000,
    refreshSeconds: Long = 300,
    minRefetchIntervalSeconds: Long = 5) {

  private val mapper = new ObjectMapper()
  @volatile private var keys: Map[String, java.security.PublicKey] = Map.empty
  // far in the past but safe from (now - fetchedAt) overflow
  @volatile private var fetchedAt: Long = Long.MinValue / 2

  def apply(token: String): Option[AuthenticatedUser] = {
    val parts = token.split('.')
    if (parts.length != 3) return None
    try {
      val header = mapper.readTree(decode(parts(0)))
      if (header.path("alg").asText() != "RS256") return None
      val kid = header.path("kid").asText("")
      val key = keyFor(kid).getOrElse(return None)
      val sig = Base64.getUrlDecoder.decode(parts(2))
      val verifier = java.security.Signature.getInstance("SHA256withRSA")
      verifier.initVerify(key)
      verifier.update((parts(0) + "." + parts(1))
        .getBytes(StandardCharsets.US_ASCII))
      if (!verifier.verify(sig)) return None
      val payload = mapper.readTree(decode(parts(1)))
      val exp = payload.path("exp")
      if (exp.isMissingNode || exp.asLong() <= clock()) return None
      if (payload.path("iss").asText("") != issuer) return None
      val aud = payload.path("aud") match {
        case a if a.isArray => a.elements().asScala.map(_.asText()).toSet
        case a if a.isTextual => Set(a.asText())
        case _ => Set.empty[String]
      }
      if (!aud.contains(audience)) return None
      val sub = payload.path("sub").asText("")
      if (sub.isEmpty) return None
      val perms = payload.path("permissions") match {
        case a if a.isArray => a.elements().asScala.map(_.asText()).toSet
        case _ => Set.empty[String]
      }
      Some(AuthenticatedUser(sub, permissions = perms))
    } catch {
      case _: Exception => None
    }
  }

  /** Key lookup with TTL refresh and rotation handling: refetch on TTL
    * expiry, or once (rate-limited) when a kid is unknown — a freshly
    * rotated signing key becomes usable on the next request, while a
    * stream of garbage kids cannot hammer the IdP.
    *
    * The JWKS HTTP fetch happens OUTSIDE the object lock: one thread
    * claims the refresh under the lock, performs the (up to 5s+5s)
    * network call unlocked, and publishes the result; every concurrent
    * request keeps serving from the last good key set instead of
    * queueing behind a slow IdP. */
  private def keyFor(kid: String): Option[java.security.PublicKey] = {
    val known = synchronized(keys.contains(kid))
    val doFetch = synchronized {
      val now = clock()
      val stale = now - fetchedAt >= refreshSeconds ||
        (!keys.contains(kid) && now - fetchedAt >= minRefetchIntervalSeconds)
      if (stale && !refreshing) { refreshing = true; true } else false
    }
    if (doFetch)
      try refetch(clock())
      finally synchronized { refreshing = false; notifyAll() }
    else if (!known) synchronized {
      // rotation case while another thread holds the refresh: the kid is
      // useless until the fetch lands, so WAIT (bounded by the fetch's
      // own 5s+5s timeouts) for its result instead of failing the
      // request — only TTL refreshes stay fully non-blocking, because
      // there the old keys still verify
      val deadline = System.nanoTime() + 11_000_000_000L
      while (refreshing && System.nanoTime() < deadline) wait(200)
    }
    synchronized(keys.get(kid))
  }

  private var refreshing = false

  private def refetch(now: Long): Unit =
    try {
      val conn = new java.net.URI(jwksUri).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      val body = try {
        val in = conn.getInputStream
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } finally conn.disconnect()
      keys = OidcAuthenticator.parseJwks(body)
      fetchedAt = now
    } catch {
      case _: Exception =>
        // keep the last good key set; only advance the rate-limit stamp
        // so a down IdP isn't hammered per-request
        fetchedAt = math.max(fetchedAt, now - refreshSeconds +
          minRefetchIntervalSeconds)
    }

  private def decode(part: String): String =
    new String(Base64.getUrlDecoder.decode(part), StandardCharsets.UTF_8)
}

object OidcAuthenticator {

  /** RFC 7517 JWKS → kid-indexed RSA public keys. Non-RSA or malformed
    * entries are skipped (a mixed key set must not fail the RSA ones). */
  def parseJwks(json: String): Map[String, java.security.PublicKey] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    val out = Map.newBuilder[String, java.security.PublicKey]
    root.path("keys").elements().asScala.foreach { k =>
      try {
        if (k.path("kty").asText() == "RSA") {
          val kid = k.path("kid").asText("")
          val n = new java.math.BigInteger(1,
            Base64.getUrlDecoder.decode(k.path("n").asText()))
          val e = new java.math.BigInteger(1,
            Base64.getUrlDecoder.decode(k.path("e").asText()))
          val key = java.security.KeyFactory.getInstance("RSA").generatePublic(
            new java.security.spec.RSAPublicKeySpec(n, e))
          out += kid -> key
        }
      } catch { case _: Exception => () }
    }
    out.result()
  }

  /** The reverse direction for tests and the in-repo IdP stub: an RSA
    * public key as its RFC 7517 JWK entry. */
  def jwkOf(kid: String, pub: java.security.interfaces.RSAPublicKey): String = {
    def b64(b: Array[Byte]) =
      Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    def unsigned(i: java.math.BigInteger): Array[Byte] = {
      val b = i.toByteArray
      if (b.length > 1 && b(0) == 0) b.drop(1) else b
    }
    s"""{"kty":"RSA","use":"sig","alg":"RS256","kid":"$kid",""" +
      s""""n":"${b64(unsigned(pub.getModulus))}",""" +
      s""""e":"${b64(unsigned(pub.getPublicExponent))}"}"""
  }
}
