package graft.sources.ssh

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileNotFoundException, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.SecureRandom

import SshWire._

/** SFTP v3 (draft-ietf-secsh-filexfer-02) over the hand-built SSH
  * transport: OPEN/READ/CLOSE with explicit offsets — the property that
  * makes `seek` a free operation (every READ names its offset, so a
  * parquet footer read fetches the file tail, like http Range and ftp
  * REST). Password auth; one connection per open stream, as with the
  * ftp scheme. */
object SftpPacket {
  val Init = 1
  val Version = 2
  val Open = 3
  val Close = 4
  val Read = 5
  val Lstat = 7
  val Opendir = 11
  val Readdir = 12
  val Realpath = 16
  val Stat = 17
  val Status = 101
  val Handle = 102
  val Data = 103
  val Name = 104
  val Attrs = 105

  val FxOk = 0
  val FxEof = 1
  val FxNoSuchFile = 2
  val FxPermissionDenied = 3

  val FlagSize = 0x00000001
  val FlagPermissions = 0x00000004
  val FxfRead = 0x00000001
}

final case class SftpAttrs(size: Long, isDir: Boolean)

/** An authenticated SSH session with the sftp subsystem ready. */
final class SftpClient private (conn: SshConnection, socket: Socket)
    extends AutoCloseable {

  import SftpPacket._

  private var nextId = 0L
  private var inbox = Array.emptyByteArray
  private var inboxOff = 0

  // ---------------------------------------------------- sftp packet io

  private def sendSftp(body: Array[Byte]): Unit =
    conn.sendChannelData(
      new Writer().u32(body.length.toLong).raw(body).result())

  /** SFTP packets may split/merge across CHANNEL_DATA frames. */
  private def readExact(n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var got = 0
    while (got < n) {
      if (inboxOff >= inbox.length) {
        inbox = conn.recvChannelData(); inboxOff = 0
      }
      val take = math.min(n - got, inbox.length - inboxOff)
      System.arraycopy(inbox, inboxOff, out, got, take)
      inboxOff += take
      got += take
    }
    out
  }

  private def recvSftp(): Reader = {
    val len = new Reader(readExact(4)).u32().toInt
    if (len < 1 || len > (1 << 26))
      throw new IOException(s"sftp: packet length $len out of range")
    new Reader(readExact(len))
  }

  private def request(tpe: Int, body: Writer => Unit): (Int, Reader) = {
    val id = { nextId += 1; nextId }
    val w = new Writer().u8(tpe).u32(id)
    body(w)
    sendSftp(w.result())
    val r = recvSftp()
    val gotType = r.u8()
    val gotId = r.u32()
    if (gotId != id)
      throw new IOException(s"sftp: response id $gotId, expected $id")
    (gotType, r)
  }

  private def statusError(r: Reader, path: String): Nothing = {
    val code = r.u32().toInt
    val msg = if (r.remaining >= 4) r.strUtf8() else ""
    code match {
      case FxNoSuchFile => throw new FileNotFoundException(s"sftp: $path: $msg")
      case FxPermissionDenied => throw new IOException(s"sftp: $path: permission denied: $msg")
      case other => throw new IOException(s"sftp: $path: status $other: $msg")
    }
  }

  // ----------------------------------------------------------- sftp ops

  def stat(path: String): SftpAttrs = request(Stat, _.str(path)) match {
    case (Attrs, r) => parseAttrs(r)
    case (Status, r) => statusError(r, path)
    case (other, _) => throw new IOException(s"sftp: unexpected reply $other to STAT")
  }

  def open(path: String): Array[Byte] =
    request(Open, w => { w.str(path); w.u32(FxfRead.toLong); w.u32(0) }) match {
      case (Handle, r) => r.str()
      case (Status, r) => statusError(r, path)
      case (other, _) => throw new IOException(s"sftp: unexpected reply $other to OPEN")
    }

  /** One READ at an explicit offset; None = EOF. */
  def read(handle: Array[Byte], offset: Long, len: Int): Option[Array[Byte]] =
    request(Read, w => {
      w.str(handle); w.u32(offset >>> 32); w.u32(offset & 0xffffffffL)
      w.u32(len.toLong)
    }) match {
      case (Data, r) => Some(r.str())
      case (Status, r) =>
        val code = r.u32().toInt
        if (code == FxEof) None
        else throw new IOException(s"sftp: READ failed with status $code")
      case (other, _) => throw new IOException(s"sftp: unexpected reply $other to READ")
    }

  def closeHandle(handle: Array[Byte]): Unit =
    request(Close, _.str(handle)) // STATUS; best-effort

  /** Directory listing (v3 READDIR loop until the EOF status). */
  def readdir(path: String): Seq[(String, SftpAttrs)] = {
    val handle = request(Opendir, _.str(path)) match {
      case (Handle, r) => r.str()
      case (Status, r) => statusError(r, path)
      case (other, _) => throw new IOException(s"sftp: unexpected reply $other to OPENDIR")
    }
    val names = Seq.newBuilder[(String, SftpAttrs)]
    try {
      var done = false
      while (!done) request(Readdir, _.str(handle)) match {
        case (Name, r) =>
          val n = r.u32().toInt
          var i = 0
          while (i < n) {
            val filename = r.strUtf8()
            r.strUtf8() // longname (v3)
            val attrs = parseAttrs(r)
            if (filename != "." && filename != "..")
              names += ((filename, attrs))
            i += 1
          }
        case (Status, r) =>
          val code = r.u32().toInt
          if (code == FxEof) done = true
          else throw new IOException(s"sftp: READDIR status $code")
        case (other, _) =>
          throw new IOException(s"sftp: unexpected reply $other to READDIR")
      }
    } finally closeHandle(handle)
    names.result()
  }

  private def parseAttrs(r: Reader): SftpAttrs = {
    val flags = r.u32()
    var size = 0L
    var isDir = false
    if ((flags & FlagSize) != 0)
      size = (r.u32() << 32) | r.u32()
    if ((flags & 0x00000002) != 0) { r.u32(); r.u32() } // uid/gid
    if ((flags & FlagPermissions) != 0) {
      val perms = r.u32()
      isDir = (perms & 0xf000L) == 0x4000L // S_IFDIR
    }
    if ((flags & 0x00000008) != 0) { r.u32(); r.u32() } // atime/mtime
    // SSH_FILEXFER_ATTR_EXTENDED: count (type, data) string pairs ride
    // after mtime — they must be consumed or the READDIR loop desyncs
    // and reads filenames out of the middle of extension data
    if ((flags & 0x80000000L) != 0) {
      val n = r.u32().toInt
      var i = 0
      while (i < n) { r.str(); r.str(); i += 1 }
    }
    SftpAttrs(size, isDir)
  }

  override def close(): Unit = socket.close()
}

object SftpClient {

  /** Full client handshake: version exchange, curve25519-sha256 kex with
    * Ed25519 host-key signature verification (and optional SHA-256 pin),
    * aes128-ctr + hmac-sha2-256, password userauth, session channel,
    * sftp subsystem, SFTP INIT/VERSION. */
  def connect(host: String, port: Int, user: String, password: String,
      hostKeySha256: Option[String] = None,
      timeoutMillis: Int = 15000): SftpClient = {
    val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMillis)
    socket.setSoTimeout(60000)
    socket.setTcpNoDelay(true)
    try {
      val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
      val vc = "SSH-2.0-graft_sftp"
      out.write((vc + "\r\n").getBytes(UTF_8)); out.flush()
      val vs = readVersionLine(in)
      val random = new SecureRandom()
      val io = new SshPacketIO(in, out, random)

      // KEXINIT both ways
      val ic = SshKex.kexInitPayload(random)
      io.send(ic)
      val is = io.recv()
      if (is.headOption.map(_ & 0xff).getOrElse(-1) != MsgKexInit)
        throw new IOException("ssh: expected KEXINIT")
      SshKex.checkKexInit(is)

      // ECDH
      val eph = SshKex.newX25519(random)
      val qc = x25519Raw(eph.getPublic)
      io.send(new Writer().u8(MsgKexEcdhInit).str(qc).result())
      val reply = new Reader(io.recv())
      if (reply.u8() != MsgKexEcdhReply)
        throw new IOException("ssh: expected KEX_ECDH_REPLY")
      val ks = reply.str()
      val qs = reply.str()
      val sigBlob = reply.str()
      val hostPub = hostKeyFromBlob(ks)
      hostKeySha256.foreach { pin =>
        // ssh-keygen -lf prints the SHA-256 fingerprint base64 WITHOUT
        // padding; compare both sides padding-stripped so a pin copied
        // from ssh tooling verbatim works
        def canon(s: String): String =
          s.stripPrefix("SHA256:").replace("=", "").trim
        val got = java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("SHA-256").digest(ks))
        if (canon(got) != canon(pin))
          throw new IOException(
            s"ssh: host key mismatch (got SHA256:$got, pinned SHA256:$pin)")
      }
      val k = SshKex.agree(eph.getPrivate, x25519FromRaw(qs))
      val h = SshKex.exchangeHash(vc, vs, ic, is, ks, qc, qs, k)
      if (!SshKex.verify(hostPub, h, signatureFromBlob(sigBlob)))
        throw new IOException("ssh: host key signature verification FAILED")

      // NEWKEYS, then turn on the negotiated algorithms
      io.send(Array(MsgNewKeys.toByte))
      if (new Reader(io.recv()).u8() != MsgNewKeys)
        throw new IOException("ssh: expected NEWKEYS")
      val sid = h
      io.enable(
        encKey = SshKex.deriveKey(k, h, 'C', sid, 16),
        encIv = SshKex.deriveKey(k, h, 'A', sid, 16),
        macKey = SshKex.deriveKey(k, h, 'E', sid, 32),
        decKey = SshKex.deriveKey(k, h, 'D', sid, 16),
        decIv = SshKex.deriveKey(k, h, 'B', sid, 16),
        recvMacKey = SshKex.deriveKey(k, h, 'F', sid, 32))

      // Read the next packet that matters, servicing the noise a real
      // OpenSSH peer interleaves: IGNORE/DEBUG anywhere, USERAUTH_BANNER
      // during auth (RFC 4252 §5.4), and GLOBAL_REQUEST — OpenSSH >= 6.8
      // fires hostkeys-00@openssh.com right after USERAUTH_SUCCESS —
      // declined with REQUEST_FAILURE when a reply is wanted.
      def nextRelevant(): Reader = {
        while (true) {
          val p = io.recv()
          val t = if (p.isEmpty) -1 else p(0) & 0xff
          t match {
            case MsgIgnore | MsgDebug | MsgUserauthBanner => ()
            case MsgGlobalRequest =>
              val r = new Reader(p)
              r.u8(); r.strUtf8()
              if (r.bool()) io.send(Array(82.toByte)) // REQUEST_FAILURE
            case _ => return new Reader(p)
          }
        }
        throw new IllegalStateException
      }

      // userauth (password)
      io.send(new Writer().u8(MsgServiceRequest).str("ssh-userauth").result())
      if (nextRelevant().u8() != MsgServiceAccept)
        throw new IOException("ssh: service ssh-userauth refused")
      io.send(new Writer().u8(MsgUserauthRequest).str(user)
        .str("ssh-connection").str("password").bool(false).str(password)
        .result())
      nextRelevant().u8() match {
        case MsgUserauthSuccess => ()
        case MsgUserauthFailure =>
          throw new IOException(s"ssh: password authentication failed for $user")
        case other => throw new IOException(s"ssh: unexpected userauth reply $other")
      }

      // session channel + sftp subsystem; the connection can answer a
      // server-initiated rekey from here on
      val conn = new SshConnection(io, sid,
        Some(SshRekeyContext(vc, vs, ks, random)))
      io.send(new Writer().u8(MsgChannelOpen).str("session")
        .u32(0).u32(1L << 24).u32(32768).result())
      val confirm = nextRelevant()
      confirm.u8() match {
        case MsgChannelOpenConfirm =>
          confirm.u32() // our id (0)
          conn.remoteChannel = confirm.u32()
          conn.remoteWindow = confirm.u32()
          conn.remoteMaxPacket = confirm.u32()
        case MsgChannelOpenFailure =>
          throw new IOException("ssh: session channel refused")
        case other => throw new IOException(s"ssh: unexpected channel reply $other")
      }
      io.send(new Writer().u8(MsgChannelRequest).u32(conn.remoteChannel)
        .str("subsystem").bool(true).str("sftp").result())
      nextRelevant().u8() match {
        case MsgChannelSuccess => ()
        case MsgChannelFailure => throw new IOException("ssh: sftp subsystem refused")
        case other => throw new IOException(s"ssh: unexpected subsystem reply $other")
      }

      val client = new SftpClient(conn, socket)
      // SFTP INIT/VERSION (v3)
      client.sendSftp(new Writer().u8(SftpPacket.Init).u32(3).result())
      val ver = client.recvSftp()
      if (ver.u8() != SftpPacket.Version)
        throw new IOException("sftp: expected VERSION")
      val v = ver.u32()
      if (v < 3) throw new IOException(s"sftp: server version $v < 3")
      client
    } catch {
      case e: Throwable => socket.close(); throw e
    }
  }

  private[graft] def readVersionLine(in: DataInputStream): String = {
    // RFC 4253 §4.2: lines before the SSH- identification are allowed
    var tries = 0
    while (tries < 32) {
      val sb = new StringBuilder
      var c = in.read()
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
        if (sb.length > 255) throw new IOException("ssh: version line too long")
      }
      if (c < 0) throw new EOFException("ssh: closed before version exchange")
      val line = sb.toString
      if (line.startsWith("SSH-")) {
        if (!line.startsWith("SSH-2.0"))
          throw new IOException(s"ssh: unsupported protocol version '$line'")
        return line
      }
      tries += 1
    }
    throw new IOException("ssh: no version line in the first 32 lines")
  }
}
