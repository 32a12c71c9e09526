package graft

import graft.server.JwtAuthenticator
import org.scalatest.funsuite.AnyFunSuite

class JwtAuthenticatorSpec extends AnyFunSuite {

  private val now = 1_700_000_000L
  private def auth(secret: String = "s3cret") =
    new JwtAuthenticator(secret, clock = () => now)

  test("valid token resolves user with permissions") {
    val a = auth()
    val tok = a.issue("alice", Set("read:orders", "read:lineitem"), now + 3600)
    val user = a(tok)
    assert(user.exists(u => u.id == "alice" &&
      u.permissions == Set("read:orders", "read:lineitem")))
  }

  test("expired token rejected") {
    val a = auth()
    assert(a(a.issue("alice", Set.empty, now - 1)).isEmpty)
  }

  test("wrong secret rejected") {
    val minted = auth("other-secret").issue("alice", Set.empty, now + 3600)
    assert(auth()(minted).isEmpty)
  }

  test("tampered payload rejected") {
    val a = auth()
    val tok = a.issue("alice", Set.empty, now + 3600)
    val Array(h, p, s) = tok.split('.')
    val forged = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      new String(java.util.Base64.getUrlDecoder.decode(p), "UTF-8")
        .replace("alice", "admin").getBytes("UTF-8"))
    assert(a(s"$h.$forged.$s").isEmpty)
  }

  test("alg=none and malformed tokens rejected") {
    val a = auth()
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
    val noneHeader = enc.encodeToString("""{"alg":"none"}""".getBytes("UTF-8"))
    val payload = enc.encodeToString(
      s"""{"sub":"alice","exp":${now + 3600}}""".getBytes("UTF-8"))
    assert(a(s"$noneHeader.$payload.").isEmpty)
    assert(a("not-a-jwt").isEmpty)
    assert(a("").isEmpty)
  }

  test("missing exp rejected (no unbounded tokens)") {
    val a = auth()
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
    val h = enc.encodeToString("""{"alg":"HS256"}""".getBytes("UTF-8"))
    val p = enc.encodeToString("""{"sub":"alice"}""".getBytes("UTF-8"))
    val tok = s"$h.$p.${a.sign(s"$h.$p")}"
    assert(a(tok).isEmpty)
  }

  test("plugs into the API server as the authenticator") {
    import graft.session.{GraftConfig, GraftSession}
    import SparkTestSession._
    Tables(spark, sf).registerAll()
    val a = auth()
    val api = new graft.server.ApiServer(
      new GraftSession(spark, GraftConfig(defensiveLimit = 10)), a.apply)
    val port = api.start()
    try {
      def call(token: String): Int = {
        val conn = new java.net.URI(s"http://localhost:$port/api/v1/sources")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestProperty("Authorization", s"Bearer $token")
        conn.getResponseCode
      }
      assert(call(a.issue("alice", Set("catalog:read"), now + 60)) == 200)
      // valid token without the endpoint permission → 403, not 401
      assert(call(a.issue("alice", Set.empty, now + 60)) == 403)
      assert(call(a.issue("alice", Set("catalog:read"), now - 60)) == 401)
      assert(call("garbage") == 401)
    } finally api.stop()
  }
}
