package graft.sources.ssh

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, MessageDigest, SecureRandom, Signature}
import java.security.spec.NamedParameterSpec
import java.security.spec.{EdECPoint, EdECPublicKeySpec, XECPublicKeySpec}
import javax.crypto.{Cipher, KeyAgreement, Mac}
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** A minimal SSH 2.0 transport (RFC 4253) carrying the SFTP subsystem —
  * the last scheme'd-URI gap of the reference's file source (OpenDAL's
  * sftp operator, /root/reference/crates/connectors/src/sources/
  * file.rs:157-188). Hand-built on JDK crypto only, one fixed cipher
  * suite — the modern-OpenSSH default set:
  *
  *  - kex `curve25519-sha256` (RFC 8731; X25519 via JDK XDH)
  *  - host key `ssh-ed25519` (RFC 8709; JDK EdDSA)
  *  - cipher `aes128-ctr` both ways (RFC 4344)
  *  - mac `hmac-sha2-256` (RFC 6668), compression `none`
  *
  * Both ROLES are implemented — the client carries [[graft.sources.SftpFileSystem]];
  * the server role exists so the spec can drive the full handshake
  * against an in-repo peer (the FtpFileSystem/PgTlsSpec pattern: the
  * same bytes a stock OpenSSH endpoint would exchange, minus nothing).
  *
  * The client verifies the server's Ed25519 signature over the exchange
  * hash, and optionally pins the host key (`hostKeySha256`) — without a
  * pin, the posture is trust-on-first-use, stated loudly in
  * [[graft.sources.SftpFileSystem]]'s scaladoc. */
object SshWire {

  // message numbers (RFC 4253, 4252, 4254)
  val MsgDisconnect = 1
  val MsgIgnore = 2
  val MsgDebug = 4
  val MsgServiceRequest = 5
  val MsgServiceAccept = 6
  val MsgUserauthBanner = 53
  val MsgKexInit = 20
  val MsgNewKeys = 21
  val MsgKexEcdhInit = 30
  val MsgKexEcdhReply = 31
  val MsgUserauthRequest = 50
  val MsgUserauthFailure = 51
  val MsgUserauthSuccess = 52
  val MsgGlobalRequest = 80
  val MsgChannelOpen = 90
  val MsgChannelOpenConfirm = 91
  val MsgChannelOpenFailure = 92
  val MsgChannelWindowAdjust = 93
  val MsgChannelData = 94
  val MsgChannelEof = 96
  val MsgChannelClose = 97
  val MsgChannelRequest = 98
  val MsgChannelSuccess = 99
  val MsgChannelFailure = 100

  final class Writer {
    private val bytes = new ByteArrayOutputStream()
    def u8(v: Int): Writer = { bytes.write(v); this }
    def bool(v: Boolean): Writer = u8(if (v) 1 else 0)
    def u32(v: Long): Writer = {
      bytes.write(((v >>> 24) & 0xff).toInt); bytes.write(((v >>> 16) & 0xff).toInt)
      bytes.write(((v >>> 8) & 0xff).toInt); bytes.write((v & 0xff).toInt)
      this
    }
    def raw(b: Array[Byte]): Writer = { bytes.write(b, 0, b.length); this }
    def str(b: Array[Byte]): Writer = { u32(b.length.toLong); raw(b) }
    def str(s: String): Writer = str(s.getBytes(UTF_8))
    def nameList(names: Seq[String]): Writer = str(names.mkString(","))
    /** ssh mpint: two's complement big-endian, minimal, 0x00-prefixed
      * when the high bit is set. */
    def mpint(unsigned: Array[Byte]): Writer = {
      var i = 0
      while (i < unsigned.length && unsigned(i) == 0) i += 1
      if (i == unsigned.length) return u32(0)
      val needPad = (unsigned(i) & 0x80) != 0
      u32((unsigned.length - i + (if (needPad) 1 else 0)).toLong)
      if (needPad) u8(0)
      bytes.write(unsigned, i, unsigned.length - i)
      this
    }
    def result(): Array[Byte] = bytes.toByteArray
  }

  final class Reader(buf: Array[Byte]) {
    private var i = 0
    // fixed-width reads bound-check like raw(): a packet truncated
    // mid-field must be a clean protocol IOException, never an AIOOBE
    private def need(n: Int): Unit =
      if (n > remaining)
        throw new IOException(
          s"ssh: field needs $n bytes, packet has $remaining left")
    def u8(): Int = { need(1); val b = buf(i) & 0xff; i += 1; b }
    def bool(): Boolean = u8() != 0
    def u32(): Long = {
      need(4)
      val v = ((buf(i) & 0xffL) << 24) | ((buf(i + 1) & 0xffL) << 16) |
        ((buf(i + 2) & 0xffL) << 8) | (buf(i + 3) & 0xffL)
      i += 4; v
    }
    def raw(n: Int): Array[Byte] = {
      // peer-supplied lengths must be validated against the packet, or
      // a lying length surfaces as AIOOBE instead of a clean error
      if (n < 0 || n > remaining)
        throw new IOException(
          s"ssh: field length $n exceeds packet ($remaining left)")
      val b = java.util.Arrays.copyOfRange(buf, i, i + n); i += n; b
    }
    def str(): Array[Byte] = raw(u32().toInt)
    def strUtf8(): String = new String(str(), UTF_8)
    def nameList(): Seq[String] =
      strUtf8().split(",").toSeq.filter(_.nonEmpty)
    def remaining: Int = buf.length - i
  }

  // --------------------------------------------------- raw 32-byte keys

  /** X25519 public key → RFC 7748 little-endian 32 bytes. */
  def x25519Raw(pub: java.security.PublicKey): Array[Byte] = {
    val u = pub.asInstanceOf[java.security.interfaces.XECPublicKey].getU
    leFixed(u, 32)
  }

  def x25519FromRaw(raw: Array[Byte]): java.security.PublicKey = {
    val u = new BigInteger(1, raw.reverse)
    KeyFactory.getInstance("X25519").generatePublic(
      new XECPublicKeySpec(NamedParameterSpec.X25519, u))
  }

  /** Ed25519 public key → RFC 8032 32-byte encoding (LE y, x-parity in
    * the top bit). */
  def ed25519Raw(pub: java.security.PublicKey): Array[Byte] = {
    val p = pub.asInstanceOf[java.security.interfaces.EdECPublicKey].getPoint
    val b = leFixed(p.getY, 32)
    if (p.isXOdd) b(31) = (b(31) | 0x80).toByte
    b
  }

  def ed25519FromRaw(raw: Array[Byte]): java.security.PublicKey = {
    val b = raw.clone()
    val xOdd = (b(31) & 0x80) != 0
    b(31) = (b(31) & 0x7f).toByte
    val y = new BigInteger(1, b.reverse)
    KeyFactory.getInstance("Ed25519").generatePublic(
      new EdECPublicKeySpec(NamedParameterSpec.ED25519, new EdECPoint(xOdd, y)))
  }

  private def leFixed(v: BigInteger, n: Int): Array[Byte] = {
    val be = v.toByteArray.reverse // now little-endian
    val out = new Array[Byte](n)
    System.arraycopy(be, 0, out, 0, math.min(be.length, n))
    out
  }

  /** `ssh-ed25519` host key blob (RFC 8709 §4). */
  def hostKeyBlob(pub: java.security.PublicKey): Array[Byte] =
    new Writer().str("ssh-ed25519").str(ed25519Raw(pub)).result()

  def hostKeyFromBlob(blob: Array[Byte]): java.security.PublicKey = {
    val r = new Reader(blob)
    val alg = r.strUtf8()
    if (alg != "ssh-ed25519")
      throw new IOException(s"ssh: unsupported host key algorithm '$alg'")
    ed25519FromRaw(r.str())
  }

  def signatureBlob(sig: Array[Byte]): Array[Byte] =
    new Writer().str("ssh-ed25519").str(sig).result()

  def signatureFromBlob(blob: Array[Byte]): Array[Byte] = {
    val r = new Reader(blob)
    if (r.strUtf8() != "ssh-ed25519")
      throw new IOException("ssh: unsupported signature algorithm")
    r.str()
  }
}

/** The negotiated single suite, as KEXINIT name-lists. */
private[ssh] object SshSuite {
  val kex = Seq("curve25519-sha256", "curve25519-sha256@libssh.org")
  val hostKey = Seq("ssh-ed25519")
  val cipher = Seq("aes128-ctr")
  val mac = Seq("hmac-sha2-256")
  val compression = Seq("none")
}

/** Binary packet layer (RFC 4253 §6) with the negotiated aes128-ctr +
  * hmac-sha2-256 applied after NEWKEYS. Encrypt-and-mac: the MAC covers
  * `u32(seq) || plaintext packet`. */
final class SshPacketIO(in: DataInputStream, out: DataOutputStream,
    random: SecureRandom) {

  private var sendSeq = 0L
  private var recvSeq = 0L
  private var sendCipher: Cipher = _
  private var recvCipher: Cipher = _
  private var sendMac: Mac = _
  private var recvMac: Mac = _

  def enable(encKey: Array[Byte], encIv: Array[Byte],
      macKey: Array[Byte], decKey: Array[Byte], decIv: Array[Byte],
      recvMacKey: Array[Byte]): Unit = {
    sendCipher = Cipher.getInstance("AES/CTR/NoPadding")
    sendCipher.init(Cipher.ENCRYPT_MODE,
      new SecretKeySpec(encKey, "AES"), new IvParameterSpec(encIv))
    recvCipher = Cipher.getInstance("AES/CTR/NoPadding")
    recvCipher.init(Cipher.DECRYPT_MODE,
      new SecretKeySpec(decKey, "AES"), new IvParameterSpec(decIv))
    sendMac = Mac.getInstance("HmacSHA256")
    sendMac.init(new SecretKeySpec(macKey, "HmacSHA256"))
    recvMac = Mac.getInstance("HmacSHA256")
    recvMac.init(new SecretKeySpec(recvMacKey, "HmacSHA256"))
  }

  def send(payload: Array[Byte]): Unit = {
    val block = if (sendCipher == null) 8 else 16
    var padLen = block - ((payload.length + 5) % block)
    if (padLen < 4) padLen += block
    val total = 1 + payload.length + padLen
    val packet = new Array[Byte](4 + total)
    packet(0) = (total >>> 24).toByte; packet(1) = (total >>> 16).toByte
    packet(2) = (total >>> 8).toByte; packet(3) = total.toByte
    packet(4) = padLen.toByte
    System.arraycopy(payload, 0, packet, 5, payload.length)
    val pad = new Array[Byte](padLen)
    random.nextBytes(pad)
    System.arraycopy(pad, 0, packet, 5 + payload.length, padLen)
    if (sendCipher == null) out.write(packet)
    else {
      val seqb = java.nio.ByteBuffer.allocate(4).putInt(sendSeq.toInt).array()
      sendMac.reset(); sendMac.update(seqb); sendMac.update(packet)
      val tag = sendMac.doFinal()
      out.write(sendCipher.update(packet))
      out.write(tag)
    }
    out.flush()
    sendSeq = (sendSeq + 1) & 0xffffffffL
  }

  def recv(): Array[Byte] = {
    val packet =
      if (recvCipher == null) {
        val head = new Array[Byte](4); in.readFully(head)
        val total = java.nio.ByteBuffer.wrap(head).getInt
        if (total < 1 || total > (1 << 20))
          throw new IOException(s"ssh: packet length $total out of range")
        val rest = new Array[Byte](total); in.readFully(rest)
        head ++ rest
      } else {
        val first = new Array[Byte](16); in.readFully(first)
        val clear = recvCipher.update(first)
        val total = java.nio.ByteBuffer.wrap(clear).getInt
        // >= 12: the first decrypted block already holds 12 payload
        // bytes past the length word — a smaller claimed length would
        // drive the remainder allocation negative (lying-length class)
        if (total < 12 || total > (1 << 20))
          throw new IOException(s"ssh: packet length $total out of range")
        val rest = new Array[Byte](total - 12); in.readFully(rest)
        val clearRest = if (rest.isEmpty) rest else recvCipher.update(rest)
        val packet = new Array[Byte](4 + total)
        System.arraycopy(clear, 0, packet, 0, 16)
        System.arraycopy(clearRest, 0, packet, 16, clearRest.length)
        val tag = new Array[Byte](32); in.readFully(tag)
        val seqb = java.nio.ByteBuffer.allocate(4).putInt(recvSeq.toInt).array()
        recvMac.reset(); recvMac.update(seqb); recvMac.update(packet)
        if (!MessageDigest.isEqual(recvMac.doFinal(), tag))
          throw new IOException("ssh: MAC verification failed")
        packet
      }
    recvSeq = (recvSeq + 1) & 0xffffffffL
    val padLen = packet(4) & 0xff
    // padding must leave a non-negative payload (lying-padding class:
    // copyOfRange with to < from throws AIOOBE, not a protocol error)
    if (packet.length - padLen < 5)
      throw new IOException(s"ssh: padding length $padLen exceeds packet")
    java.util.Arrays.copyOfRange(packet, 5, packet.length - padLen)
  }
}

/** One established, encrypted, authenticated SSH connection (either
  * role) with the sftp channel open — the piece both the client and the
  * in-repo stub build on.
  *
  * `rekeyContext` (client role only) carries what a client needs to
  * answer a server-initiated re-exchange: OpenSSH rekeys by default
  * after ~1-4 GB of traffic, so without it any long transfer dies at
  * the rekey boundary. */
final class SshConnection private[graft] (
    val io: SshPacketIO,
    val sessionId: Array[Byte],
    rekeyContext: Option[SshRekeyContext] = None) {

  // ------------------------------------------------- channel bookkeeping
  var remoteChannel: Long = 0
  var remoteWindow: Long = 0
  var remoteMaxPacket: Long = 32768
  val localWindow = new java.util.concurrent.atomic.AtomicLong(1L << 24)

  private val pending = new scala.collection.mutable.Queue[Array[Byte]]()

  /** Send one CHANNEL_DATA respecting the peer's window (blocking on
    * WINDOW_ADJUST when exhausted — correctness over throughput; reads
    * are request/response so this rarely triggers). */
  def sendChannelData(data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      while (remoteWindow <= 0) pumpOne()
      // min on LONGS first: window/max-packet are u32 values that can
      // legally exceed Int.MaxValue — a .toInt there wraps negative
      val n = math.min(data.length - off,
        math.min(remoteMaxPacket, remoteWindow)).toInt
      io.send(new SshWire.Writer().u8(SshWire.MsgChannelData)
        .u32(remoteChannel).str(java.util.Arrays.copyOfRange(data, off, off + n))
        .result())
      remoteWindow -= n
      off += n
    }
  }

  /** Next CHANNEL_DATA payload, servicing window/keepalive traffic. */
  def recvChannelData(): Array[Byte] = {
    while (pending.isEmpty) pumpOne()
    pending.dequeue()
  }

  private def pumpOne(): Unit = {
    val p = io.recv()
    val r = new SshWire.Reader(p)
    r.u8() match {
      case SshWire.MsgChannelData =>
        r.u32() // our channel id
        val data = r.str()
        pending.enqueue(data)
        // replenish our window as we consume
        if (localWindow.addAndGet(-data.length) < (1L << 20)) {
          io.send(new SshWire.Writer().u8(SshWire.MsgChannelWindowAdjust)
            .u32(remoteChannel).u32(1L << 24).result())
          localWindow.addAndGet(1L << 24)
        }
      case SshWire.MsgChannelWindowAdjust =>
        r.u32(); remoteWindow += r.u32()
      case SshWire.MsgGlobalRequest =>
        // OpenSSH sends e.g. hostkeys-00@openssh.com after auth; decline
        // politely when a reply is wanted (82 = SSH_MSG_REQUEST_FAILURE;
        // 81 is REQUEST_SUCCESS, which would misreport the request as
        // granted with an empty payload)
        r.strUtf8()
        if (r.bool()) io.send(Array(82.toByte))
      case SshWire.MsgChannelRequest =>
        // exit-status and friends; decline anything that wants a reply
        r.u32(); r.strUtf8()
        if (r.bool())
          io.send(new SshWire.Writer().u8(SshWire.MsgChannelFailure)
            .u32(remoteChannel).result())
      case SshWire.MsgChannelEof | SshWire.MsgChannelClose =>
        throw new EOFException("ssh: channel closed by peer")
      case SshWire.MsgIgnore | SshWire.MsgDebug => ()
      case SshWire.MsgKexInit =>
        rekeyContext match {
          case Some(ctx) => rekeyAsClient(ctx, p)
          case None => throw new IOException(
            "ssh: peer initiated rekey but this connection has no rekey context")
        }
      case SshWire.MsgDisconnect =>
        r.u32()
        throw new EOFException(s"ssh: peer disconnected: ${r.strUtf8()}")
      case other =>
        throw new IOException(s"ssh: unexpected message $other mid-session")
    }
  }

  /** Server-initiated re-exchange, client side (RFC 4253 §9): answer
    * with our KEXINIT + ECDH_INIT, verify the (unchanged) host key's
    * signature over the NEW exchange hash, swap keys at the NEWKEYS
    * boundary. Key derivation keeps the ORIGINAL session id; sequence
    * numbers continue. Between the peer's KEXINIT and its NEWKEYS only
    * kex messages (plus IGNORE/DEBUG) are legal, so the reads here
    * need no channel-data handling. */
  private def rekeyAsClient(ctx: SshRekeyContext, is2: Array[Byte]): Unit = {
    SshKex.checkKexInit(is2)
    val ic2 = SshKex.kexInitPayload(ctx.random)
    io.send(ic2)
    val eph = SshKex.newX25519(ctx.random)
    val qc = SshWire.x25519Raw(eph.getPublic)
    io.send(new SshWire.Writer().u8(SshWire.MsgKexEcdhInit).str(qc).result())
    def recvSkippingNoise(): Array[Byte] = {
      var p = io.recv()
      while (p.nonEmpty && ((p(0) & 0xff) == SshWire.MsgIgnore ||
          (p(0) & 0xff) == SshWire.MsgDebug)) p = io.recv()
      p
    }
    val reply = new SshWire.Reader(recvSkippingNoise())
    val tpe = reply.u8()
    if (tpe != SshWire.MsgKexEcdhReply)
      throw new IOException(s"ssh: expected KEX_ECDH_REPLY in rekey, got $tpe")
    val ks2 = reply.str()
    val qs2 = reply.str()
    val sig = reply.str()
    // the host key must be the SAME key that was verified (and possibly
    // pinned) at connect — a rekey is not a chance to swap identities
    if (!java.util.Arrays.equals(ks2, ctx.hostKeyBlob))
      throw new IOException("ssh: host key changed across rekey")
    val k2 = SshKex.agree(eph.getPrivate, SshWire.x25519FromRaw(qs2))
    val h2 = SshKex.exchangeHash(ctx.vc, ctx.vs, ic2, is2, ks2, qc, qs2, k2)
    if (!SshKex.verify(SshWire.hostKeyFromBlob(ks2), h2,
        SshWire.signatureFromBlob(sig)))
      throw new IOException("ssh: rekey host key signature verification FAILED")
    io.send(Array(SshWire.MsgNewKeys.toByte))
    val nk = new SshWire.Reader(recvSkippingNoise()).u8()
    if (nk != SshWire.MsgNewKeys)
      throw new IOException(s"ssh: expected NEWKEYS in rekey, got $nk")
    io.enable(
      encKey = SshKex.deriveKey(k2, h2, 'C', sessionId, 16),
      encIv = SshKex.deriveKey(k2, h2, 'A', sessionId, 16),
      macKey = SshKex.deriveKey(k2, h2, 'E', sessionId, 32),
      decKey = SshKex.deriveKey(k2, h2, 'D', sessionId, 16),
      decIv = SshKex.deriveKey(k2, h2, 'B', sessionId, 16),
      recvMacKey = SshKex.deriveKey(k2, h2, 'F', sessionId, 32))
  }
}

/** What a client-role connection needs to answer a server-initiated
  * rekey: the version strings and host-key blob of the initial
  * exchange, and the RNG. */
private[graft] final case class SshRekeyContext(vc: String, vs: String,
    hostKeyBlob: Array[Byte], random: SecureRandom)

object SshKex {

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  /** RFC 4253 §7.2 key derivation: HASH(K || H || letter || session_id),
    * extended with HASH(K || H || prior) until `len` bytes exist. */
  def deriveKey(k: Array[Byte], h: Array[Byte], letter: Char,
      sessionId: Array[Byte], len: Int): Array[Byte] = {
    val kEnc = new SshWire.Writer().mpint(k).result()
    var out = sha256(kEnc, h, Array(letter.toByte), sessionId)
    while (out.length < len) out = out ++ sha256(kEnc, h, out)
    java.util.Arrays.copyOf(out, len)
  }

  def kexInitPayload(random: SecureRandom): Array[Byte] = {
    val cookie = new Array[Byte](16)
    random.nextBytes(cookie)
    new SshWire.Writer().u8(SshWire.MsgKexInit).raw(cookie)
      .nameList(SshSuite.kex).nameList(SshSuite.hostKey)
      .nameList(SshSuite.cipher).nameList(SshSuite.cipher)
      .nameList(SshSuite.mac).nameList(SshSuite.mac)
      .nameList(SshSuite.compression).nameList(SshSuite.compression)
      .nameList(Nil).nameList(Nil)
      .bool(false).u32(0)
      .result()
  }

  /** Check the peer's KEXINIT shares our suite (we offer exactly one). */
  def checkKexInit(payload: Array[Byte]): Unit = {
    val r = new SshWire.Reader(payload)
    r.u8(); r.raw(16)
    val kex = r.nameList(); val hk = r.nameList()
    val c1 = r.nameList(); val c2 = r.nameList()
    val m1 = r.nameList(); val m2 = r.nameList()
    def need(have: Seq[String], want: Seq[String], what: String): Unit =
      if (!have.exists(want.contains))
        throw new IOException(
          s"ssh: no common $what (peer offers ${have.mkString(",")})")
    need(kex, SshSuite.kex, "kex")
    need(hk, SshSuite.hostKey, "host key algorithm")
    need(c1, SshSuite.cipher, "cipher c2s"); need(c2, SshSuite.cipher, "cipher s2c")
    need(m1, SshSuite.mac, "mac c2s"); need(m2, SshSuite.mac, "mac s2c")
  }

  /** Exchange hash H (RFC 8731 / RFC 4253 §8). */
  def exchangeHash(vc: String, vs: String, ic: Array[Byte], is: Array[Byte],
      ks: Array[Byte], qc: Array[Byte], qs: Array[Byte],
      k: Array[Byte]): Array[Byte] = {
    val w = new SshWire.Writer()
      .str(vc).str(vs).str(ic).str(is).str(ks).str(qc).str(qs).mpint(k)
    sha256(w.result())
  }

  def agree(priv: java.security.PrivateKey,
      peerPub: java.security.PublicKey): Array[Byte] = {
    val ka = KeyAgreement.getInstance("X25519")
    ka.init(priv)
    ka.doPhase(peerPub, true)
    ka.generateSecret()
  }

  def newX25519(random: SecureRandom): KeyPair = {
    val g = KeyPairGenerator.getInstance("X25519")
    g.initialize(NamedParameterSpec.X25519, random)
    g.generateKeyPair()
  }

  def newEd25519HostKey(): KeyPair =
    KeyPairGenerator.getInstance("Ed25519").generateKeyPair()

  def sign(priv: java.security.PrivateKey, data: Array[Byte]): Array[Byte] = {
    val s = Signature.getInstance("Ed25519")
    s.initSign(priv); s.update(data); s.sign()
  }

  def verify(pub: java.security.PublicKey, data: Array[Byte],
      sig: Array[Byte]): Boolean = {
    val s = Signature.getInstance("Ed25519")
    s.initVerify(pub); s.update(data)
    s.verify(sig)
  }
}
