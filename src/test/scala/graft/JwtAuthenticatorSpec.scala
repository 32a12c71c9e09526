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

  // ------------------------------------------------------ OIDC / JWKS

  /** Local IdP: RSA keypairs + a JWKS HTTP endpoint + RS256 issuance. */
  private class IdpStub {
    import com.sun.net.httpserver.HttpServer
    private val keyGen = java.security.KeyPairGenerator.getInstance("RSA")
    keyGen.initialize(2048)
    var keyPairs: Map[String, java.security.KeyPair] = Map.empty
    var fetches = 0
    @volatile var delayMillis = 0

    def addKey(kid: String): Unit =
      keyPairs += kid -> keyGen.generateKeyPair()
    def dropKey(kid: String): Unit = keyPairs -= kid

    private val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/jwks", ex => {
      fetches += 1
      if (delayMillis > 0) Thread.sleep(delayMillis)
      val body = keyPairs.map { case (kid, kp) =>
        graft.server.OidcAuthenticator.jwkOf(kid,
          kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey])
      }.mkString("""{"keys":[""", ",", "]}").getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    val uri = s"http://127.0.0.1:${server.getAddress.getPort}/jwks"
    def stop(): Unit = server.stop(0)

    /** RS256 token signed by `kid`'s private key. */
    def issue(kid: String, sub: String, iss: String, aud: String,
        exp: Long, perms: Set[String] = Set.empty,
        algOverride: Option[String] = None): String = {
      val enc = java.util.Base64.getUrlEncoder.withoutPadding
      def b64(s: String) = enc.encodeToString(s.getBytes("UTF-8"))
      val header = b64(
        s"""{"alg":"${algOverride.getOrElse("RS256")}","kid":"$kid"}""")
      val permsJson = perms.toSeq.sorted.map("\"" + _ + "\"")
        .mkString("[", ",", "]")
      val payload = b64(s"""{"sub":"$sub","iss":"$iss","aud":"$aud",""" +
        s""""permissions":$permsJson,"exp":$exp}""")
      val sig = java.security.Signature.getInstance("SHA256withRSA")
      sig.initSign(keyPairs(kid).getPrivate)
      sig.update(s"$header.$payload".getBytes("US-ASCII"))
      s"$header.$payload.${enc.encodeToString(sig.sign())}"
    }
  }

  private def withIdp(
      f: (IdpStub, graft.server.OidcAuthenticator,
        java.util.concurrent.atomic.AtomicLong) => Unit): Unit = {
    val idp = new IdpStub
    idp.addKey("k1")
    val clock = new java.util.concurrent.atomic.AtomicLong(now)
    val oidc = new graft.server.OidcAuthenticator(idp.uri,
      issuer = "https://idp.test", audience = "graft-api",
      clock = () => clock.get())
    try f(idp, oidc, clock) finally idp.stop()
  }

  test("OIDC: a valid RS256 token verifies via JWKS with claims enforced") {
    withIdp { (idp, oidc, clock) =>
      val tok = idp.issue("k1", "alice", "https://idp.test", "graft-api",
        now + 3600, Set("read:orders"))
      val u = oidc(tok)
      assert(u.exists(x => x.id == "alice" &&
        x.permissions == Set("read:orders")))
    }
  }

  test("OIDC: wrong issuer, wrong audience, and expiry are each rejected") {
    withIdp { (idp, oidc, clock) =>
      assert(oidc(idp.issue("k1", "a", "https://evil.test", "graft-api",
        now + 3600)).isEmpty)
      assert(oidc(idp.issue("k1", "a", "https://idp.test", "other-api",
        now + 3600)).isEmpty)
      assert(oidc(idp.issue("k1", "a", "https://idp.test", "graft-api",
        now - 1)).isEmpty)
    }
  }

  test("OIDC: a token signed by an unknown key is rejected") {
    withIdp { (idp, oidc, clock) =>
      // k2 exists at the IdP but serves a DIFFERENT key under kid k1:
      // signature must fail even though the kid resolves
      val other = new IdpStub
      other.addKey("k1")
      try assert(oidc(other.issue("k1", "a", "https://idp.test",
        "graft-api", now + 3600)).isEmpty)
      finally other.stop()
    }
  }

  test("OIDC: key rotation — a new kid is picked up on refetch") {
    withIdp { (idp, oidc, clock) =>
      // warm the cache with k1
      assert(oidc(idp.issue("k1", "a", "https://idp.test", "graft-api",
        now + 3600)).isDefined)
      // rotate: k2 appears at the IdP after the cache was filled, and
      // enough time passes for the rate-limited refetch window to open
      idp.addKey("k2")
      clock.addAndGet(10)
      val tok = idp.issue("k2", "bob", "https://idp.test", "graft-api",
        now + 3600)
      assert(oidc(tok).exists(_.id == "bob"),
        "unknown kid must trigger a JWKS refetch")
    }
  }

  test("OIDC: unknown-kid refetches are rate-limited") {
    withIdp { (idp, oidc, clock) =>
      assert(oidc(idp.issue("k1", "a", "https://idp.test", "graft-api",
        now + 3600)).isDefined)
      val before = idp.fetches
      // a burst of garbage kids within the min-refetch window: at most
      // one extra fetch, not one per token
      val enc = java.util.Base64.getUrlEncoder.withoutPadding
      (1 to 10).foreach { i =>
        val h = enc.encodeToString(
          s"""{"alg":"RS256","kid":"junk-$i"}""".getBytes("UTF-8"))
        val p = enc.encodeToString(
          s"""{"sub":"x","exp":${now + 60}}""".getBytes("UTF-8"))
        assert(oidc(s"$h.$p.${enc.encodeToString(Array[Byte](1, 2))}").isEmpty)
      }
      assert(idp.fetches - before <= 1, s"fetches: ${idp.fetches - before}")
    }
  }

  test("OIDC: HS256 tokens are rejected outright (no alg confusion)") {
    withIdp { (idp, oidc, clock) =>
      val hs = auth()(
        // an HS256 token with a kid pointing at the RSA key
        auth().issue("alice", Set.empty, now + 3600))
      assert(hs.isDefined) // sanity: HS authenticator accepts it
      assert(oidc(auth().issue("alice", Set.empty, now + 3600)).isEmpty)
    }
  }

  test("OIDC: an IdP outage keeps serving from the cached key set") {
    withIdp { (idp, oidc, clock) =>
      val tok = idp.issue("k1", "alice", "https://idp.test", "graft-api",
        now + 3600)
      assert(oidc(tok).isDefined) // cache warm
      idp.stop() // IdP down
      assert(oidc(tok).isDefined, "cached keys must survive an IdP outage")
    }
  }

  test("OIDC: a slow IdP refresh never blocks auths served from cached keys") {
    withIdp { (idp, oidc, clock) =>
      val tok = idp.issue("k1", "alice", "https://idp.test", "graft-api",
        now + 3600)
      assert(oidc(tok).isDefined) // cache warm (fetch #1)
      idp.delayMillis = 3000
      clock.addAndGet(400) // past the 300s TTL → next auth claims a refresh
      val slow = new Thread(() => oidc(tok), "oidc-slow-refresh")
      slow.start()
      Thread.sleep(300) // let it claim the refresh and enter the HTTP fetch
      val t0 = System.nanoTime()
      assert(oidc(tok).isDefined, "must serve from the last good key set")
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms < 1500,
        f"auth blocked $ms%.0f ms behind the in-flight JWKS fetch")
      slow.join()
    }
  }
}
