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
