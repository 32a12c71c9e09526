package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path => JPath}
import java.security.SecureRandom

import graft.sources.ssh._
import graft.sources.ssh.SshWire._

/** In-repo SSH+SFTP server speaking the REAL protocols over a real
  * socket — the server role of the hand-built transport (version
  * exchange, curve25519-sha256 kex signed with a fresh Ed25519 host
  * key, aes128-ctr + hmac-sha2-256 after NEWKEYS, password userauth,
  * session channel, sftp v3 subsystem over a local directory). The
  * same bytes a stock OpenSSH endpoint would exchange for this suite;
  * drives [[graft.sources.SftpFileSystem]] end to end. */
final class SftpServerStub(root: JPath, user: String, pass: String,
    rekeyAfterReads: Int = 0) {

  /** Completed server-initiated re-exchanges (asserted by the spec). */
  val rekeysCompleted = new java.util.concurrent.atomic.AtomicInteger

  /** Print session-thread exceptions (debug aid; sessions die silently
    * otherwise, as a real server's would). */
  @volatile var debugErrors = false

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  val hostKey: java.security.KeyPair = SshKex.newEd25519HostKey()

  /** Base64 SHA-256 of the host-key blob — the pin a client would put
    * in `fs.sftp.hostkey.sha256`. */
  def hostKeyPin: String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(hostKeyBlob(hostKey.getPublic)))

  def start(): Int = {
    val t = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val w = new Thread(() => try session(s) catch { case e: Exception => if (debugErrors) e.printStackTrace() }
            finally s.close())
          w.setDaemon(true); w.start()
        } catch { case _: Exception => () }
      }
    }, "sftp-stub-accept")
    t.setDaemon(true); t.start()
    server.getLocalPort
  }

  def stop(): Unit = { running = false; server.close() }

  private def session(sock: Socket): Unit = {
    sock.setSoTimeout(60000)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    val vs = "SSH-2.0-graft_sftp_stub"
    out.write((vs + "\r\n").getBytes(UTF_8)); out.flush()
    val vc = SftpClient.readVersionLine(in)
    val random = new SecureRandom()
    val io = new SshPacketIO(in, out, random)

    // KEXINIT both ways
    val is = SshKex.kexInitPayload(random)
    io.send(is)
    val ic = io.recv()
    if (ic.headOption.map(_ & 0xff).getOrElse(-1) != MsgKexInit)
      throw new IOException("stub: expected KEXINIT")
    SshKex.checkKexInit(ic)

    // ECDH: client's Q_C arrives, we reply with host key + Q_S + sig(H)
    val init = new Reader(io.recv())
    if (init.u8() != MsgKexEcdhInit)
      throw new IOException("stub: expected KEX_ECDH_INIT")
    val qc = init.str()
    val eph = SshKex.newX25519(random)
    val qs = x25519Raw(eph.getPublic)
    val ks = hostKeyBlob(hostKey.getPublic)
    val k = SshKex.agree(eph.getPrivate, x25519FromRaw(qc))
    val h = SshKex.exchangeHash(vc, vs, ic, is, ks, qc, qs, k)
    val sig = signatureBlob(SshKex.sign(hostKey.getPrivate, h))
    io.send(new Writer().u8(MsgKexEcdhReply).str(ks).str(qs).str(sig).result())

    io.send(Array(MsgNewKeys.toByte))
    if (new Reader(io.recv()).u8() != MsgNewKeys)
      throw new IOException("stub: expected NEWKEYS")
    // server sends s2c ('B','D','F'), receives c2s ('A','C','E')
    io.enable(
      encKey = SshKex.deriveKey(k, h, 'D', h, 16),
      encIv = SshKex.deriveKey(k, h, 'B', h, 16),
      macKey = SshKex.deriveKey(k, h, 'F', h, 32),
      decKey = SshKex.deriveKey(k, h, 'C', h, 16),
      decIv = SshKex.deriveKey(k, h, 'A', h, 16),
      recvMacKey = SshKex.deriveKey(k, h, 'E', h, 32))

    // userauth
    val svc = new Reader(io.recv())
    if (svc.u8() != MsgServiceRequest || svc.strUtf8() != "ssh-userauth")
      throw new IOException("stub: expected ssh-userauth request")
    io.send(new Writer().u8(MsgServiceAccept).str("ssh-userauth").result())
    var authed = false
    while (!authed) {
      val req = new Reader(io.recv())
      if (req.u8() != MsgUserauthRequest)
        throw new IOException("stub: expected USERAUTH_REQUEST")
      val u = req.strUtf8()
      req.strUtf8() // service
      val method = req.strUtf8()
      if (method == "password") {
        req.bool()
        val p = req.strUtf8()
        if (u == user && p == pass) {
          // a real server may banner before the auth result (RFC 4252
          // 5.4) and OpenSSH >= 6.8 fires hostkeys-00@openssh.com right
          // after success — both must be tolerated by the client
          io.send(new Writer().u8(MsgUserauthBanner)
            .str("graft stub says hello\n").str("en").result())
          io.send(Array(MsgUserauthSuccess.toByte))
          io.send(new Writer().u8(MsgGlobalRequest)
            .str("hostkeys-00@openssh.com").bool(true)
            .str(hostKeyBlob(hostKey.getPublic)).result())
          authed = true
        } else {
          io.send(new Writer().u8(MsgUserauthFailure)
            .nameList(Seq("password")).bool(false).result())
          return // one strike in the stub
        }
      } else {
        io.send(new Writer().u8(MsgUserauthFailure)
          .nameList(Seq("password")).bool(false).result())
      }
    }

    // session channel + sftp subsystem. The client may answer our
    // hostkeys-00 global request with REQUEST_SUCCESS/FAILURE (81/82)
    // interleaved with its channel setup — skip those replies.
    def recvSkippingReplies(): Reader = {
      var p = io.recv()
      while (p.nonEmpty && ((p(0) & 0xff) == 81 || (p(0) & 0xff) == 82 ||
          (p(0) & 0xff) == MsgIgnore || (p(0) & 0xff) == MsgDebug))
        p = io.recv()
      new Reader(p)
    }
    val open = recvSkippingReplies()
    if (open.u8() != MsgChannelOpen || open.strUtf8() != "session")
      throw new IOException("stub: expected session CHANNEL_OPEN")
    val clientChannel = open.u32()
    val clientWindow = open.u32()
    val clientMaxPkt = open.u32()
    io.send(new Writer().u8(MsgChannelOpenConfirm).u32(clientChannel)
      .u32(0).u32(1L << 24).u32(32768).result())
    val sub = recvSkippingReplies()
    if (sub.u8() != MsgChannelRequest) throw new IOException("stub: expected CHANNEL_REQUEST")
    sub.u32()
    if (sub.strUtf8() != "subsystem") throw new IOException("stub: expected subsystem")
    val wantReply = sub.bool()
    if (sub.strUtf8() != "sftp") throw new IOException("stub: expected sftp")
    if (wantReply)
      io.send(new Writer().u8(MsgChannelSuccess).u32(clientChannel).result())

    val conn = new SshConnection(io, h)
    conn.remoteChannel = clientChannel
    conn.remoteWindow = clientWindow
    conn.remoteMaxPacket = clientMaxPkt
    sftpLoop(conn, io, vc, vs, random, h)
  }

  /** Server-initiated re-exchange (what OpenSSH does every ~1-4 GB):
    * send KEXINIT at a request/response quiet point (the client is
    * blocked awaiting an SFTP reply, so nothing is in flight), run the
    * curve25519 exchange signed with the SAME host key, swap keys at
    * NEWKEYS. Key derivation uses the ORIGINAL session id `sid`. */
  private def rekeyAsServer(io: SshPacketIO, vc: String, vs: String,
      random: SecureRandom, sid: Array[Byte]): Unit = {
    val is2 = SshKex.kexInitPayload(random)
    io.send(is2)
    val ic2 = io.recv()
    if (ic2.headOption.map(_ & 0xff).getOrElse(-1) != MsgKexInit)
      throw new IOException("stub: expected KEXINIT in rekey")
    SshKex.checkKexInit(ic2)
    val init = new Reader(io.recv())
    if (init.u8() != MsgKexEcdhInit)
      throw new IOException("stub: expected KEX_ECDH_INIT in rekey")
    val qc = init.str()
    val eph = SshKex.newX25519(random)
    val qs = x25519Raw(eph.getPublic)
    val ks = hostKeyBlob(hostKey.getPublic)
    val k2 = SshKex.agree(eph.getPrivate, x25519FromRaw(qc))
    val h2 = SshKex.exchangeHash(vc, vs, ic2, is2, ks, qc, qs, k2)
    val sig = signatureBlob(SshKex.sign(hostKey.getPrivate, h2))
    io.send(new Writer().u8(MsgKexEcdhReply).str(ks).str(qs).str(sig).result())
    io.send(Array(MsgNewKeys.toByte))
    if (new Reader(io.recv()).u8() != MsgNewKeys)
      throw new IOException("stub: expected NEWKEYS in rekey")
    io.enable(
      encKey = SshKex.deriveKey(k2, h2, 'D', sid, 16),
      encIv = SshKex.deriveKey(k2, h2, 'B', sid, 16),
      macKey = SshKex.deriveKey(k2, h2, 'F', sid, 32),
      decKey = SshKex.deriveKey(k2, h2, 'C', sid, 16),
      decIv = SshKex.deriveKey(k2, h2, 'A', sid, 16),
      recvMacKey = SshKex.deriveKey(k2, h2, 'E', sid, 32))
    rekeysCompleted.incrementAndGet()
  }

  // ------------------------------------------------------- sftp subsystem

  private def sftpLoop(conn: SshConnection, io: SshPacketIO, vc: String,
      vs: String, random: SecureRandom, sid: Array[Byte]): Unit = {
    import SftpPacket._
    var reads = 0
    var buf = Array.emptyByteArray
    var off = 0
    def readExact(n: Int): Array[Byte] = {
      val outB = new Array[Byte](n)
      var got = 0
      while (got < n) {
        if (off >= buf.length) { buf = conn.recvChannelData(); off = 0 }
        val take = math.min(n - got, buf.length - off)
        System.arraycopy(buf, off, outB, got, take)
        off += take; got += take
      }
      outB
    }
    def sendPkt(body: Array[Byte]): Unit =
      conn.sendChannelData(new Writer().u32(body.length.toLong).raw(body).result())
    def status(id: Long, code: Int, msg: String): Unit =
      sendPkt(new Writer().u8(Status).u32(id).u32(code.toLong).str(msg)
        .str("en").result())
    def attrsOf(p: JPath): Array[Byte] = {
      val size = if (Files.isDirectory(p)) 0L else Files.size(p)
      val perms = if (Files.isDirectory(p)) 0x4000L | 0x1edL else 0x8000L | 0x1a4L
      // include an extended (type, data) pair: servers that set
      // SSH_FILEXFER_ATTR_EXTENDED desync clients that don't consume it
      new Writer().u32(FlagSize | FlagPermissions | 0x80000000L)
        .u32(size >>> 32).u32(size & 0xffffffffL).u32(perms)
        .u32(1).str("graft@test").str("x").result()
    }
    def resolve(path: String): JPath = {
      val p = root.resolve(path.stripPrefix("/")).normalize()
      require(p.startsWith(root), "path escapes root")
      p
    }

    val handles = scala.collection.mutable.Map.empty[String, JPath]
    var nextHandle = 0

    while (true) {
      val len = new Reader(readExact(4)).u32().toInt
      val r = new Reader(readExact(len))
      val tpe = r.u8()
      if (tpe == Init) {
        r.u32() // client version
        sendPkt(new Writer().u8(Version).u32(3).result())
      } else {
        val id = r.u32()
        try tpe match {
          case Stat | Lstat =>
            val p = resolve(r.strUtf8())
            if (!Files.exists(p)) status(id, FxNoSuchFile, "no such file")
            else sendPkt(new Writer().u8(Attrs).u32(id).raw(attrsOf(p)).result())
          case Realpath =>
            val path = r.strUtf8()
            val abs = if (path.isEmpty || path == ".") "/" else
              ("/" + path.stripPrefix("/")).replaceAll("/+", "/")
            sendPkt(new Writer().u8(Name).u32(id).u32(1)
              .str(abs).str(abs).u32(0).result())
          case Open =>
            val p = resolve(r.strUtf8())
            val flags = r.u32()
            if ((flags & FxfRead) == 0) status(id, FxPermissionDenied, "read-only stub")
            else if (!Files.isRegularFile(p)) status(id, FxNoSuchFile, "no such file")
            else {
              val hid = s"h${nextHandle}"; nextHandle += 1
              handles(hid) = p
              sendPkt(new Writer().u8(Handle).u32(id).str(hid).result())
            }
          case Read =>
            val hid = new String(r.str(), UTF_8)
            val offset = (r.u32() << 32) | r.u32()
            val want = r.u32().toInt
            // quiet point: the client is blocked awaiting this reply, so
            // a rekey here exercises the mid-transfer boundary exactly
            reads += 1
            if (rekeyAfterReads > 0 && reads % rekeyAfterReads == 0)
              rekeyAsServer(io, vc, vs, random, sid)
            handles.get(hid) match {
              case None => status(id, FxPermissionDenied, "bad handle")
              case Some(p) =>
                val size = Files.size(p)
                if (offset >= size) status(id, FxEof, "eof")
                else {
                  val n = math.min(want.toLong, size - offset).toInt
                  val ch = Files.newByteChannel(p)
                  try {
                    ch.position(offset)
                    val bb = java.nio.ByteBuffer.allocate(n)
                    while (bb.hasRemaining && ch.read(bb) >= 0) ()
                    sendPkt(new Writer().u8(Data).u32(id)
                      .str(java.util.Arrays.copyOf(bb.array(), bb.position()))
                      .result())
                  } finally ch.close()
                }
            }
          case Close =>
            handles.remove(new String(r.str(), UTF_8))
            status(id, FxOk, "ok")
          case Opendir =>
            val p = resolve(r.strUtf8())
            if (!Files.isDirectory(p)) status(id, FxNoSuchFile, "not a directory")
            else {
              val hid = s"d${nextHandle}"; nextHandle += 1
              handles(hid) = p
              sendPkt(new Writer().u8(Handle).u32(id).str(hid).result())
            }
          case Readdir =>
            val hid = new String(r.str(), UTF_8)
            handles.get(hid) match {
              case Some(p) if Files.isDirectory(p) =>
                handles.remove(hid); handles(hid + ":done") = p
                import scala.jdk.CollectionConverters._
                val entries = Files.list(p).iterator().asScala.toSeq
                if (entries.isEmpty) status(id, FxEof, "empty")
                else {
                  val w = new Writer().u8(Name).u32(id).u32(entries.length.toLong)
                  entries.foreach { e =>
                    w.str(e.getFileName.toString).str(e.getFileName.toString)
                      .raw(attrsOf(e))
                  }
                  sendPkt(w.result())
                }
              case _ => status(id, FxEof, "eof") // second READDIR or bad handle
            }
          case other => status(id, 8 /* OP_UNSUPPORTED */, s"op $other")
        } catch {
          case _: Exception => status(id, FxNoSuchFile, "error")
        }
      }
    }
  }
}
