package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.session.{AuthenticatedUser, GraftSession}
import graft.sources.pg.{PgTypes, PgWire, Scram}
import PgWire._

/** Credentials the edge authenticates against: username → (password,
  * engine identity). The password doubles as the user's API key, so the
  * same secret works on the REST, Flight, and pg edges. */
final case class PgCredentials(byUser: Map[String, (String, AuthenticatedUser)])

/** PostgreSQL wire-protocol SERVER edge: any client speaking protocol
  * v3 — psql, JDBC's org.postgresql, BI tools — connects, authenticates
  * (SCRAM-SHA-256 by default; `cleartext` and `md5` modes for clients
  * that need them), and runs SQL through the SAME engine session as the
  * REST/Flight edges: executeQuery → RLS, defensive limits, cost gate,
  * cache, trace all in force. A wire protocol, not a policy bypass —
  * the same stance as [[FlightSqlEdge]] and the reference's Flight SQL
  * endpoint (server/src/flight_sql.rs:48-216; the reference exposes
  * Flight + REST, not pg wire — this edge is the Spark build's answer
  * to the same "bring your own client" requirement, over the protocol
  * with the widest client ecosystem).
  *
  * Protocol surface: startup (SSL/GSS probes answered 'N'), auth,
  * simple-query ('Q') with text-format results, Terminate. The extended
  * (Parse/Bind/Execute) protocol is not spoken — honest scope: psql and
  * most tools use simple query for ad-hoc SQL; drivers that insist on
  * extended protocol get a clean protocol error, not silent truncation.
  *
  * Results are capped at `maxRows` (the edge's bulk-delivery bound, as
  * on the other edges); a capped result is flagged with a NOTICE so the
  * client knows it saw a prefix. */
final class PgWireEdge(
    engine: GraftSession,
    credentials: PgCredentials,
    authMode: String = "scram",
    maxRows: Int = 100000) {

  require(Set("scram", "md5", "cleartext", "trust").contains(authMode),
    s"pg-edge: unknown auth mode $authMode")

  @volatile private var server: ServerSocket = _
  private val connections = ConcurrentHashMap.newKeySet[Socket]()
  private val threadId = new AtomicInteger()

  /** Last few statements received off the wire (bounded), so tests and
    * operators can assert what a pg client actually pushed down. */
  private val queryLog = new java.util.concurrent.ConcurrentLinkedDeque[String]()
  def recentQueries: Seq[String] = queryLog.asScala.toSeq
  private def logQuery(sql: String): Unit = {
    queryLog.addLast(sql)
    while (queryLog.size > 64) queryLog.pollFirst()
  }

  def start(): Int = {
    // pg clients quote identifiers with double quotes; make the engine's
    // parser read them as identifiers (ANSI), not string literals —
    // without this, SELECT "col" FROM "t" silently selects the LITERAL
    // 'col'. The conf is session-wide: attaching a pg edge opts the
    // engine into ANSI identifier quoting.
    engine.spark.conf.set("spark.sql.ansi.enabled", "true")
    engine.spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    server = new ServerSocket(0, 64, java.net.InetAddress.getLoopbackAddress)
    val acceptor = new Thread(() => acceptLoop(), "pg-edge-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    if (server != null) server.close()
    connections.forEach(s => try s.close() catch { case _: Exception => () })
    connections.clear()
  }

  private def acceptLoop(): Unit =
    try {
      while (!server.isClosed) {
        val sock = server.accept()
        connections.add(sock)
        val t = new Thread(() => {
          try serve(sock)
          catch { case _: Exception => () }
          finally { connections.remove(sock); try sock.close() catch { case _: Exception => () } }
        }, s"pg-edge-conn-${threadId.incrementAndGet()}")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: SocketException => () /* stop() */ }

  // ---------------------------------------------------------- connection

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    // startup, skipping over SSL/GSSENC probes (answered 'N': not spoken)
    var startup = readStartup(in)
    while (startup._1 == SslRequestCode || startup._1 == 80877104) {
      out.writeByte('N'); out.flush()
      startup = readStartup(in)
    }
    if (startup._1 == CancelRequestCode) return // cancellation not spoken
    if (startup._1 != ProtocolVersion3) {
      writeError(out, "FATAL", "08P01", s"unsupported protocol version ${startup._1}")
      return
    }
    val username = startup._2.getOrElse("user", "")

    val user = authenticate(in, out, username) match {
      case Some(u) => u
      case None => return // error already written
    }

    // post-auth greetings
    writeMessage(out, MsgAuthentication, authRequest(AuthOk))
    Seq("server_version" -> "16.0 (graft)", "server_encoding" -> "UTF8",
      "client_encoding" -> "UTF8", "DateStyle" -> "ISO, MDY",
      "integer_datetimes" -> "on").foreach { case (k, v) =>
      val b = new java.io.ByteArrayOutputStream()
      b.write(k.getBytes(UTF_8)); b.write(0); b.write(v.getBytes(UTF_8)); b.write(0)
      writeMessage(out, MsgParameterStatus, b.toByteArray)
    }
    val key = java.nio.ByteBuffer.allocate(8)
      .putInt(threadId.get()).putInt(scala.util.Random.nextInt())
    writeMessage(out, MsgBackendKeyData, key.array())
    writeReady(out)

    // ------------------------------------------------------- query loop
    var open = true
    while (open) {
      readOrEof(in) match {
        case None => open = false
        case Some(m) => m.tpe match {
          case MsgQuery =>
            val sql = cstring(java.nio.ByteBuffer.wrap(m.payload))
            logQuery(sql)
            runQuery(out, sql, user)
            writeReady(out)
          case MsgTerminate => open = false
          case other =>
            // extended-protocol or unknown message: loud, precise refusal
            writeError(out, "ERROR", "0A000",
              s"message '${other.toChar}' not supported (simple query protocol only)")
            writeReady(out)
        }
      }
    }
  }

  private def runQuery(out: DataOutputStream, sql: String,
      user: AuthenticatedUser): Unit = {
    if (sql.trim.isEmpty || sql.trim == ";") {
      writeMessage(out, MsgEmptyQueryResponse, Array.empty)
      return
    }
    try {
      val result = engine.executeQuery(sql, user)
      val schema = result.df.schema
      val rows = result.df.limit(maxRows + 1).collect()
      val capped = rows.length > maxRows
      val emit = if (capped) rows.take(maxRows) else rows
      writeMessage(out, MsgRowDescription, rowDescription(schema.fields.toSeq.map { f =>
        val (oid, typmod) = PgTypes.oidOf(f.dataType)
        FieldDesc(f.name, oid, typmod)
      }))
      emit.foreach(r => writeMessage(out, MsgDataRow, dataRow(encodeRow(r, schema))))
      if (capped)
        writeMessage(out, MsgNoticeResponse, errorResponse("NOTICE", "01000",
          s"result truncated at $maxRows rows (edge delivery bound)"))
      writeMessage(out, MsgCommandComplete, commandComplete(s"SELECT ${emit.length}"))
    } catch {
      case e: Exception =>
        writeError(out, "ERROR", "XX000",
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName).take(4000))
    } finally out.flush()
  }

  private def encodeRow(r: Row, schema: StructType): Seq[Option[String]] =
    schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      if (r.isNullAt(i)) None
      else Some(PgTypes.encode(r.get(i), f.dataType))
    }

  // ------------------------------------------------------------ authents

  private def authenticate(in: DataInputStream, out: DataOutputStream,
      username: String): Option[AuthenticatedUser] = {
    def fail(msg: String): Option[AuthenticatedUser] = {
      writeError(out, "FATAL", "28P01", msg); None
    }
    val cred = credentials.byUser.get(username)
    authMode match {
      case "trust" =>
        cred.map(_._2).orElse(fail(s"""no such user "$username""""))
      case "cleartext" =>
        writeMessage(out, MsgAuthentication, authRequest(AuthCleartextPassword))
        out.flush()
        val given = readPassword(in)
        cred match {
          case Some((pw, u)) if constantEq(pw, given) => Some(u)
          case _ => fail(s"""password authentication failed for user "$username"""")
        }
      case "md5" =>
        val salt = new Array[Byte](4)
        new java.security.SecureRandom().nextBytes(salt)
        writeMessage(out, MsgAuthentication, authRequest(AuthMD5Password, salt))
        out.flush()
        val given = readPassword(in)
        cred match {
          case Some((pw, u)) if constantEq(md5Password(username, pw, salt), given) =>
            Some(u)
          case _ => fail(s"""password authentication failed for user "$username"""")
        }
      case "scram" =>
        writeMessage(out, MsgAuthentication, authSaslMechanisms(Seq("SCRAM-SHA-256")))
        out.flush()
        val init = readMessage(in)
        if (init.tpe != MsgPassword) return fail("expected SASLInitialResponse")
        val (mech, clientFirstRaw) = parseSaslInitialResponse(init.payload)
        if (mech != "SCRAM-SHA-256") return fail(s"unsupported SASL mechanism $mech")
        val clientFirst = new String(clientFirstRaw, UTF_8)
        val (_, clientNonce) = Scram.parseClientFirst(clientFirst)
        val clientFirstBare = clientFirst.stripPrefix("n,,")

        val salt = new Array[Byte](16)
        new java.security.SecureRandom().nextBytes(salt)
        val iterations = 4096
        val combined = clientNonce + Scram.newNonce()
        val serverFirst = Scram.ServerFirst(combined, salt, iterations).render
        writeMessage(out, MsgAuthentication,
          authRequest(AuthSASLContinue, serverFirst.getBytes(UTF_8)))
        out.flush()

        val finalMsg = readMessage(in)
        if (finalMsg.tpe != MsgPassword) return fail("expected SASLResponse")
        val clientFinal = Scram.parseClientFinal(new String(finalMsg.payload, UTF_8))
        if (clientFinal.nonce != combined) return fail("SCRAM nonce mismatch")
        cred match {
          case Some((pw, u)) =>
            val salted = Scram.saltedPassword(pw, salt, iterations)
            val authMsg = Scram.authMessage(clientFirstBare, serverFirst,
              clientFinal.withoutProof)
            if (!Scram.verifyClientProof(clientFinal.proof,
                Scram.storedKey(salted), authMsg))
              return fail(
                s"""password authentication failed for user "$username"""")
            writeMessage(out, MsgAuthentication, authRequest(AuthSASLFinal,
              Scram.renderServerFinal(
                Scram.serverSignature(salted, authMsg)).getBytes(UTF_8)))
            out.flush()
            Some(u)
          case None =>
            fail(s"""password authentication failed for user "$username"""")
        }
    }
  }

  private def readPassword(in: DataInputStream): String = {
    val m = readMessage(in)
    if (m.tpe != MsgPassword)
      throw new graft.sources.pg.PgProtocolException("pg-edge: expected PasswordMessage")
    cstring(java.nio.ByteBuffer.wrap(m.payload))
  }

  private def constantEq(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(a.getBytes(UTF_8), b.getBytes(UTF_8))

  private def writeReady(out: DataOutputStream): Unit = {
    writeMessage(out, MsgReadyForQuery, Array('I'.toByte))
    out.flush()
  }

  private def writeError(out: DataOutputStream, severity: String, state: String,
      msg: String): Unit = {
    writeMessage(out, MsgErrorResponse, errorResponse(severity, state, msg))
    out.flush()
  }
}
