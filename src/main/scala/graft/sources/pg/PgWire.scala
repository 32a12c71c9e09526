package graft.sources.pg

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Mac, SecretKeyFactory}

/** PostgreSQL frontend/backend protocol v3 — the message codec shared by
  * the wire CLIENT ([[PgWireClient]], powering the `postgres` source
  * type) and the serving EDGE ([[graft.server.PgWireEdge]]). Hand-built
  * from the public protocol documentation (PostgreSQL docs, "Frontend/
  * Backend Protocol", "Message Formats"); no driver jar.
  *
  * This re-expresses the transport under the reference's most-used
  * connector (/root/reference/crates/connectors/src/sources/sql/
  * postgres.rs:28-160, postgres_federation.rs:24-120 — there carried by
  * tokio-postgres): startup → authentication (cleartext, MD5, or
  * SCRAM-SHA-256 SASL) → simple-query protocol with text-format rows.
  *
  * Framing: every message after startup is `type:byte, length:int32
  * (includes itself, excludes the type byte), payload`. All integers are
  * big-endian; strings are NUL-terminated UTF-8.
  */
object PgWire {

  /** Protocol version 3.0. */
  val ProtocolVersion3 = 196608
  /** Magic "version" of the SSLRequest startup packet. */
  val SslRequestCode = 80877103
  /** Magic "version" of the CancelRequest startup packet. */
  val CancelRequestCode = 80877102

  // backend message types
  val MsgAuthentication: Byte = 'R'
  val MsgParameterStatus: Byte = 'S'
  val MsgBackendKeyData: Byte = 'K'
  val MsgReadyForQuery: Byte = 'Z'
  val MsgRowDescription: Byte = 'T'
  val MsgDataRow: Byte = 'D'
  val MsgCommandComplete: Byte = 'C'
  val MsgEmptyQueryResponse: Byte = 'I'
  val MsgErrorResponse: Byte = 'E'
  val MsgNoticeResponse: Byte = 'N'
  // frontend message types
  val MsgQuery: Byte = 'Q'
  val MsgPassword: Byte = 'p' // also SASLInitialResponse / SASLResponse
  val MsgTerminate: Byte = 'X'
  // extended-query frontend messages (same letters collide with some
  // backend types — the direction disambiguates on the wire)
  val MsgParse: Byte = 'P'
  val MsgBind: Byte = 'B'
  val MsgDescribe: Byte = 'D'
  val MsgExecute: Byte = 'E'
  val MsgSync: Byte = 'S'
  val MsgClose: Byte = 'C'
  val MsgFlush: Byte = 'H'
  // extended-query backend messages
  val MsgParseComplete: Byte = '1'
  val MsgBindComplete: Byte = '2'
  val MsgCloseComplete: Byte = '3'
  val MsgParameterDescription: Byte = 't'
  val MsgNoData: Byte = 'n'
  val MsgPortalSuspended: Byte = 's'
  // COPY sub-protocol (backend 'H' is CopyOutResponse — the frontend 'H'
  // Flush shares the byte but travels the other direction)
  val MsgCopyOutResponse: Byte = 'H'
  val MsgCopyData: Byte = 'd'
  val MsgCopyDone: Byte = 'c'

  // Authentication request codes (payload int32 of an 'R' message)
  val AuthOk = 0
  val AuthCleartextPassword = 3
  val AuthMD5Password = 5
  val AuthSASL = 10
  val AuthSASLContinue = 11
  val AuthSASLFinal = 12

  final case class Message(tpe: Byte, payload: Array[Byte])

  /** One backend/frontend message off the wire (post-startup framing). */
  def readMessage(in: DataInputStream): Message = {
    val tpe = in.readByte()
    val len = in.readInt()
    if (len < 4 || len > 64 * 1024 * 1024)
      throw new PgProtocolException(s"pg: insane message length $len")
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    Message(tpe, payload)
  }

  def writeMessage(out: DataOutputStream, tpe: Byte, payload: Array[Byte]): Unit = {
    out.writeByte(tpe.toInt)
    out.writeInt(payload.length + 4)
    out.write(payload)
  }

  /** The startup packet (no type byte): int32 length, int32 version,
    * then NUL-separated key/value pairs and a final NUL. */
  def startupMessage(params: Seq[(String, String)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    params.foreach { case (k, v) =>
      body.write(k.getBytes(UTF_8)); body.write(0)
      body.write(v.getBytes(UTF_8)); body.write(0)
    }
    body.write(0)
    val bytes = body.toByteArray
    val bb = ByteBuffer.allocate(8 + bytes.length)
    bb.putInt(8 + bytes.length).putInt(ProtocolVersion3).put(bytes)
    bb.array()
  }

  /** Reads the startup packet server-side, keeping the raw body — the
    * CancelRequest "version" carries (pid, secret) there, not params. */
  def readStartupRaw(in: DataInputStream): (Int, Array[Byte]) = {
    val len = in.readInt()
    if (len < 8 || len > 65536)
      throw new PgProtocolException(s"pg: insane startup length $len")
    val version = in.readInt()
    val rest = new Array[Byte](len - 8)
    in.readFully(rest)
    (version, rest)
  }

  /** Reads the startup packet server-side: (version, params). */
  def readStartup(in: DataInputStream): (Int, Map[String, String]) = {
    val (version, rest) = readStartupRaw(in)
    // SSLRequest / GSSENCRequest / CancelRequest carry a magic "version"
    // and no parameter list — return them as-is (rest may be empty)
    if (version != ProtocolVersion3 || rest.isEmpty)
      (version, Map.empty)
    else {
      val bb = ByteBuffer.wrap(rest)
      val params = Map.newBuilder[String, String]
      var k = cstring(bb)
      while (k.nonEmpty) { params += k -> cstring(bb); k = if (bb.remaining() > 1) cstring(bb) else "" }
      (version, params.result())
    }
  }

  /** The CancelRequest packet a client sends on a FRESH connection:
    * int32 16, the magic code, then the (pid, secret) pair from
    * BackendKeyData. */
  def cancelRequest(pid: Int, secret: Int): Array[Byte] =
    ByteBuffer.allocate(16).putInt(16).putInt(CancelRequestCode)
      .putInt(pid).putInt(secret).array()

  def cstring(bb: ByteBuffer): String = {
    val out = new java.io.ByteArrayOutputStream()
    var b = bb.get()
    while (b != 0) { out.write(b.toInt); b = bb.get() }
    new String(out.toByteArray, UTF_8)
  }

  private def putCString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    out.write(s.getBytes(UTF_8)); out.write(0)
  }

  // ------------------------------------------------------------- queries

  def queryMessage(sql: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    putCString(out, sql)
    out.toByteArray
  }

  /** One result column: the subset of RowDescription that matters for
    * schema mapping (table OID / attnum / typlen / format are carried
    * but not consumed — text format 0 is the only one spoken here). */
  final case class FieldDesc(name: String, typeOid: Int, typmod: Int)

  def parseRowDescription(payload: Array[Byte]): Seq[FieldDesc] = {
    val bb = ByteBuffer.wrap(payload)
    val n = bb.getShort.toInt
    (0 until n).map { _ =>
      val name = cstring(bb)
      bb.getInt // table oid
      bb.getShort // attnum
      val oid = bb.getInt
      bb.getShort // typlen
      val typmod = bb.getInt
      bb.getShort // format code
      FieldDesc(name, oid, typmod)
    }
  }

  /** RowDescription payload for `fields`; typlen -1, format text. */
  /** `formats` gives each column's result format code (0 text / 1
    * binary), cycled pg-style: empty = all text, one entry = applies to
    * every column. */
  def rowDescription(fields: Seq[FieldDesc],
      formats: Seq[Int] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val head = ByteBuffer.allocate(2).putShort(fields.size.toShort)
    out.write(head.array())
    fields.zipWithIndex.foreach { case (f, i) =>
      putCString(out, f.name)
      val fixed = ByteBuffer.allocate(18)
      fixed.putInt(0) // table oid
      fixed.putShort(0) // attnum
      fixed.putInt(f.typeOid)
      fixed.putShort(-1) // typlen (varlena)
      fixed.putInt(f.typmod)
      fixed.putShort(formatFor(formats, i).toShort)
      out.write(fixed.array())
    }
    out.toByteArray
  }

  /** pg format-code list semantics: absent → text; a single code
    * applies to all columns; otherwise positional. */
  def formatFor(formats: Seq[Int], i: Int): Int =
    if (formats.isEmpty) 0
    else if (formats.length == 1) formats.head
    else formats(i)

  /** DataRow → per-column text bytes; None is SQL NULL (length -1). */
  def parseDataRow(payload: Array[Byte]): Array[Option[Array[Byte]]] = {
    val bb = ByteBuffer.wrap(payload)
    val n = bb.getShort.toInt
    Array.fill(n) {
      val len = bb.getInt
      if (len == -1) None
      else { val v = new Array[Byte](len); bb.get(v); Some(v) }
    }
  }

  def dataRow(cols: Seq[Option[String]]): Array[Byte] =
    dataRowBytes(cols.map(_.map(_.getBytes(UTF_8))))

  /** DataRow from raw per-column bytes (text or binary format — the
    * wire shape is identical, only the encoding differs). */
  def dataRowBytes(cols: Seq[Option[Array[Byte]]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ByteBuffer.allocate(2).putShort(cols.size.toShort).array())
    cols.foreach {
      case None => out.write(ByteBuffer.allocate(4).putInt(-1).array())
      case Some(b) =>
        out.write(ByteBuffer.allocate(4).putInt(b.length).array())
        out.write(b)
    }
    out.toByteArray
  }

  def commandComplete(tag: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    putCString(out, tag)
    out.toByteArray
  }

  // ------------------------------------------------- errors and notices

  /** ErrorResponse/NoticeResponse payload: (code byte, cstring)* then a
    * terminating 0. S=severity, C=sqlstate, M=message. */
  def errorResponse(severity: String, sqlState: String, message: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('S'.toInt); putCString(out, severity)
    out.write('C'.toInt); putCString(out, sqlState)
    out.write('M'.toInt); putCString(out, message)
    out.write(0)
    out.toByteArray
  }

  def parseErrorFields(payload: Array[Byte]): Map[Char, String] = {
    val bb = ByteBuffer.wrap(payload)
    val fields = Map.newBuilder[Char, String]
    var code = bb.get()
    while (code != 0) { fields += code.toChar -> cstring(bb); code = bb.get() }
    fields.result()
  }

  // ------------------------------------------------------ authentication

  /** Payload of an AuthenticationMD5Password request (code 5 + salt). */
  def authRequest(code: Int, extra: Array[Byte] = Array.empty): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + extra.length)
    bb.putInt(code).put(extra)
    bb.array()
  }

  /** AuthenticationSASL: the mechanism list, NUL-separated + final NUL. */
  def authSaslMechanisms(mechanisms: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ByteBuffer.allocate(4).putInt(AuthSASL).array())
    mechanisms.foreach(putCString(out, _))
    out.write(0)
    out.toByteArray
  }

  /** The MD5 password response: "md5" + hex(md5(hex(md5(password ++
    * user)) ++ salt)) — the documented double-hash. */
  def md5Password(user: String, password: String, salt: Array[Byte]): String = {
    def md5hex(b: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val inner = md5hex((password + user).getBytes(UTF_8))
    "md5" + md5hex(inner.getBytes(UTF_8) ++ salt)
  }

  /** SASLInitialResponse payload: mechanism cstring + int32 + data. */
  def saslInitialResponse(mechanism: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    putCString(out, mechanism)
    out.write(ByteBuffer.allocate(4).putInt(data.length).array())
    out.write(data)
    out.toByteArray
  }

  def parseSaslInitialResponse(payload: Array[Byte]): (String, Array[Byte]) = {
    val bb = ByteBuffer.wrap(payload)
    val mech = cstring(bb)
    val len = bb.getInt
    val data = new Array[Byte](len); bb.get(data)
    (mech, data)
  }

  /** Drains messages until a terminal condition; used by both sides. */
  def expect(in: DataInputStream, tpe: Byte): Message = {
    val m = readMessage(in)
    if (m.tpe == MsgErrorResponse) {
      val f = parseErrorFields(m.payload)
      throw new PgServerException(f.getOrElse('C', "?????"), f.getOrElse('M', "error"))
    }
    if (m.tpe != tpe)
      throw new PgProtocolException(s"pg: expected '${tpe.toChar}', got '${m.tpe.toChar}'")
    m
  }

  def readOrEof(in: DataInputStream): Option[Message] =
    try Some(readMessage(in)) catch { case _: EOFException => None }
}

class PgProtocolException(msg: String) extends RuntimeException(msg)
/** An ErrorResponse from the peer, carrying its SQLSTATE. */
class PgServerException(val sqlState: String, msg: String)
  extends RuntimeException(s"$sqlState: $msg")

/** SCRAM-SHA-256 (RFC 5802 mechanics, RFC 7677 hash suite) — both the
  * client proof construction and the server-side verification, so the
  * edge and the source speak the real modern PostgreSQL auth default.
  * Messages are the RFC's ABNF: client-first `gs2-header n=<user>,r=<c
  * nonce>`, server-first `r=<nonces>,s=<salt b64>,i=<iterations>`,
  * client-final `c=<b64 gs2>,r=<nonces>,p=<proof>`. PostgreSQL ignores
  * the SCRAM-level username (the startup user wins), so the client sends
  * `n=` empty, like libpq; the spec pins the RFC 7677 example vector
  * with `n=user` to verify the arithmetic independently of this repo.
  * SASLprep normalization is not applied (ASCII credentials only —
  * loudly rejected otherwise, never silently mis-hashed). */
object Scram {
  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }
  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)
  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  def requireAscii(s: String, what: String): String = {
    if (!s.forall(c => c >= 0x20 && c < 0x7f))
      throw new PgProtocolException(
        s"pg-scram: non-ASCII $what needs SASLprep, which is not implemented")
    s
  }

  /** Hi(password, salt, i) — PBKDF2-HMAC-SHA-256. */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(
      requireAscii(password, "password").toCharArray, salt, iterations, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def clientKey(salted: Array[Byte]): Array[Byte] =
    hmac(salted, "Client Key".getBytes(UTF_8))
  def storedKey(salted: Array[Byte]): Array[Byte] = sha256(clientKey(salted))
  def serverKey(salted: Array[Byte]): Array[Byte] =
    hmac(salted, "Server Key".getBytes(UTF_8))

  /** client-first-message-bare: `n=<user>,r=<nonce>`. */
  def clientFirstBare(user: String, nonce: String): String = s"n=$user,r=$nonce"
  /** The full client-first with the no-channel-binding gs2 header. */
  def clientFirst(user: String, nonce: String): String =
    s"n,,${clientFirstBare(user, nonce)}"

  final case class ServerFirst(nonce: String, salt: Array[Byte], iterations: Int) {
    def render: String = s"r=$nonce,s=${b64(salt)},i=$iterations"
  }

  def parseServerFirst(s: String): ServerFirst = {
    val kv = attrs(s)
    ServerFirst(kv('r'), unb64(kv('s')), kv('i').toInt)
  }

  def parseClientFirst(s: String): (String, String) = { // (user, nonce)
    if (!s.startsWith("n,,"))
      throw new PgProtocolException(
        s"pg-scram: unsupported gs2 header in ${s.takeWhile(_ != ',')} " +
          "(channel binding not offered)")
    val kv = attrs(s.stripPrefix("n,,"))
    (kv.getOrElse('n', ""), kv('r'))
  }

  final case class ClientFinal(channelBinding: String, nonce: String, proof: Array[Byte],
      withoutProof: String)

  def parseClientFinal(s: String): ClientFinal = {
    val kv = attrs(s)
    val withoutProof = s.substring(0, s.lastIndexOf(",p="))
    ClientFinal(kv('c'), kv('r'), unb64(kv('p')), withoutProof)
  }

  private def attrs(s: String): Map[Char, String] =
    s.split(",").filter(_.length >= 2).map(p => p.charAt(0) -> p.substring(2)).toMap

  /** The proof arithmetic, shared by both sides:
    * AuthMessage = client-first-bare , server-first , client-final-no-proof
    * ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage). */
  def authMessage(clientFirstBare: String, serverFirst: String,
      clientFinalWithoutProof: String): String =
    s"$clientFirstBare,$serverFirst,$clientFinalWithoutProof"

  def clientProof(salted: Array[Byte], authMsg: String): Array[Byte] = {
    val ck = clientKey(salted)
    xor(ck, hmac(sha256(ck), authMsg.getBytes(UTF_8)))
  }

  def serverSignature(salted: Array[Byte], authMsg: String): Array[Byte] =
    hmac(serverKey(salted), authMsg.getBytes(UTF_8))

  /** Server-side proof check: recover ClientKey from the proof and the
    * signature, and compare its hash against StoredKey — constant-time. */
  def verifyClientProof(proof: Array[Byte], stored: Array[Byte], authMsg: String): Boolean = {
    val sig = hmac(stored, authMsg.getBytes(UTF_8))
    val recovered = xor(proof, sig)
    MessageDigest.isEqual(sha256(recovered), stored)
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  def renderClientFinal(nonce: String, proof: Array[Byte]): String =
    s"c=biws,r=$nonce,p=${b64(proof)}"
  def clientFinalWithoutProof(nonce: String): String = s"c=biws,r=$nonce"
  def renderServerFinal(sig: Array[Byte]): String = s"v=${b64(sig)}"
  def parseServerFinal(s: String): Array[Byte] = unb64(attrs(s)('v'))

  def newNonce(): String = {
    val bytes = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(bytes)
    java.util.Base64.getEncoder.encodeToString(bytes)
  }
}
