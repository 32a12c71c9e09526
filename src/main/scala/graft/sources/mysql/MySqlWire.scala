package graft.sources.mysql

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.types._

/** MySQL client/server protocol — the packet codec shared by the wire
  * CLIENT ([[MySqlWireConnection]], powering the `mysql` source type)
  * and the in-repo test server stub. Hand-built from the public
  * protocol documentation (MySQL Internals manual, "Client/Server
  * Protocol": basic packets, connection phase, text protocol); no
  * driver jar.
  *
  * This re-expresses the transport under the reference's mysql
  * connector (/root/reference/crates/connectors/src/sources/sql/
  * mysql.rs:35-206 — there carried by mysql_async +
  * datafusion-table-providers): handshake → auth
  * (mysql_native_password or caching_sha2_password fast path) →
  * COM_QUERY with text-format resultsets.
  *
  * Framing: every packet is `length:int24-LE, sequence:byte, payload`;
  * the sequence id resets at each command and increments per packet.
  * Integers are little-endian (the opposite of pg); strings in the
  * text protocol are length-encoded.
  */
object MySqlWire {

  val MaxPacket = 16 * 1024 * 1024 - 1

  // command bytes
  val ComQuit: Byte = 0x01
  val ComQuery: Byte = 0x03
  val ComPing: Byte = 0x0e
  val ComStmtPrepare: Byte = 0x16
  val ComStmtExecute: Byte = 0x17
  val ComStmtClose: Byte = 0x19

  // response headers
  val OkHeader = 0x00
  val EofHeader = 0xfe
  val ErrHeader = 0xff
  val AuthMoreDataHeader = 0x01
  val AuthSwitchHeader = 0xfe // same byte as EOF; length disambiguates
  val NullValue = 0xfb

  // capability flags (the subset spoken here)
  val ClientLongPassword = 0x00000001
  val ClientLongFlag = 0x00000004
  val ClientConnectWithDb = 0x00000008
  val ClientSsl = 0x00000800
  val ClientProtocol41 = 0x00000200
  val ClientSecureConnection = 0x00008000
  val ClientPluginAuth = 0x00080000

  /** utf8mb4_general_ci — the charset every value travels in. */
  val CharsetUtf8mb4: Int = 45

  final case class Packet(seq: Int, payload: Array[Byte])

  def readPacket(in: DataInputStream): Packet = {
    val a = in.read(); val b = in.read(); val c = in.read()
    if ((a | b | c) < 0) throw new java.io.EOFException("mysql: stream closed")
    val len = a | (b << 8) | (c << 16)
    val seq = in.read()
    if (len > MaxPacket)
      throw new MySqlProtocolException(s"mysql: insane packet length $len")
    val payload = new Array[Byte](len)
    in.readFully(payload)
    Packet(seq, payload)
  }

  def writePacket(out: DataOutputStream, seq: Int, payload: Array[Byte]): Unit = {
    require(payload.length <= MaxPacket, s"mysql: packet too big ${payload.length}")
    out.write(payload.length & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(payload)
  }

  // --------------------------------------------------- wire primitives

  /** Cursor over a packet payload (little-endian ints, lenenc values). */
  final class Reader(buf: Array[Byte]) {
    var pos = 0
    def remaining: Int = buf.length - pos
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def peek: Int = buf(pos) & 0xff
    def u16(): Int = u8() | (u8() << 8)
    def u24(): Int = u8() | (u8() << 8) | (u8() << 16)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def u64(): Long = u32() | (u32() << 32)
    def bytes(n: Int): Array[Byte] = {
      val v = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; v
    }
    def restOfPacket(): Array[Byte] = bytes(remaining)
    def nulString(): String = {
      val start = pos
      while (pos < buf.length && buf(pos) != 0) pos += 1
      val s = new String(buf, start, pos - start, UTF_8)
      pos += 1 // the NUL
      s
    }
    def lenencInt(): Long = u8() match {
      case 0xfc => u16().toLong
      case 0xfd => u24().toLong
      case 0xfe => u64()
      case n => n.toLong
    }
    def lenencBytes(): Array[Byte] = bytes(lenencInt().toInt)
    def lenencString(): String = new String(lenencBytes(), UTF_8)
    /** A text-protocol column value: NULL (0xfb) or a lenenc string. */
    def columnValue(): Option[Array[Byte]] =
      if (peek == NullValue) { pos += 1; None } else Some(lenencBytes())
  }

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): this.type = { out.write(v & 0xff); this }
    def u16(v: Int): this.type = { u8(v); u8(v >> 8); this }
    def u24(v: Int): this.type = { u8(v); u8(v >> 8); u8(v >> 16); this }
    def u32(v: Long): this.type = { u16(v.toInt); u16((v >> 16).toInt); this }
    def u64(v: Long): this.type = { u32(v); u32(v >>> 32); this }
    def bytes(b: Array[Byte]): this.type = { out.write(b); this }
    def zeros(n: Int): this.type = { out.write(new Array[Byte](n)); this }
    def nulString(s: String): this.type = { out.write(s.getBytes(UTF_8)); u8(0) }
    def lenencInt(v: Long): this.type =
      if (v < 251) u8(v.toInt)
      else if (v < 65536) { u8(0xfc); u16(v.toInt) }
      else if (v < 16777216) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u32(v); u32(v >> 32) }
    def lenencBytes(b: Array[Byte]): this.type = { lenencInt(b.length); bytes(b) }
    def lenencString(s: String): this.type = lenencBytes(s.getBytes(UTF_8))
    def result(): Array[Byte] = out.toByteArray
  }

  // ------------------------------------------------------- column types

  // text-protocol type codes (MySQL Internals, Protocol::ColumnType)
  val TypeDecimal = 0x00; val TypeTiny = 0x01; val TypeShort = 0x02
  val TypeLong = 0x03; val TypeFloat = 0x04; val TypeDouble = 0x05
  val TypeNull = 0x06; val TypeTimestamp = 0x07; val TypeLongLong = 0x08
  val TypeInt24 = 0x09; val TypeDate = 0x0a; val TypeTime = 0x0b
  val TypeDatetime = 0x0c; val TypeYear = 0x0d; val TypeVarchar = 0x0f
  val TypeBit = 0x10; val TypeNewDecimal = 0xf6; val TypeEnum = 0xf7
  val TypeSet = 0xf8; val TypeTinyBlob = 0xf9; val TypeMediumBlob = 0xfa
  val TypeLongBlob = 0xfb; val TypeBlob = 0xfc; val TypeVarString = 0xfd
  val TypeString = 0xfe

  val FlagUnsigned = 0x20
  /** The binary pseudo-charset: a blob/string column with charset 63
    * carries raw bytes, not text. */
  val BinaryCharset = 63

  /** One column of a resultset (Protocol::ColumnDefinition41). */
  final case class ColumnDef(name: String, tpe: Int, charset: Int,
      length: Long, flags: Int, decimals: Int)

  def parseColumnDef(payload: Array[Byte]): ColumnDef = {
    val r = new Reader(payload)
    r.lenencString() // catalog, always "def"
    r.lenencString() // schema
    r.lenencString() // table
    r.lenencString() // org_table
    val name = r.lenencString()
    r.lenencString() // org_name
    r.lenencInt() // length of fixed fields, 0x0c
    val charset = r.u16()
    val length = r.u32()
    val tpe = r.u8()
    val flags = r.u16()
    val decimals = r.u8()
    ColumnDef(name, tpe, charset, length, flags, decimals)
  }

  def renderColumnDef(c: ColumnDef): Array[Byte] =
    new Writer()
      .lenencString("def").lenencString("").lenencString("")
      .lenencString("").lenencString(c.name).lenencString(c.name)
      .lenencInt(0x0c)
      .u16(c.charset).u32(c.length).u8(c.tpe).u16(c.flags).u8(c.decimals)
      .u16(0) // filler
      .result()

  /** MySQL column type → Spark type. DATETIME is wall-clock (no zone) →
    * TimestampNTZ; TIMESTAMP is UTC-normalized → Timestamp. An unsigned
    * BIGINT can exceed Long → Decimal(20,0), same rule as Spark's JDBC
    * dialect. */
  def sparkTypeOf(c: ColumnDef): DataType = c.tpe match {
    // BOOLEAN is TINYINT(1) in MySQL; display width 1 marks it (the
    // same inference Spark's JDBC MySQL dialect applies)
    case TypeTiny if c.length == 1 => BooleanType
    case TypeTiny | TypeShort | TypeInt24 | TypeYear => IntegerType
    case TypeLong =>
      if ((c.flags & FlagUnsigned) != 0) LongType else IntegerType
    case TypeLongLong =>
      if ((c.flags & FlagUnsigned) != 0) DecimalType(20, 0) else LongType
    case TypeFloat => FloatType
    case TypeDouble => DoubleType
    case TypeDecimal | TypeNewDecimal =>
      // column_length counts sign and decimal point characters
      val scale = c.decimals
      val precision = math.min(38,
        math.max(1, c.length.toInt - (if (scale > 0) 2 else 1)))
      DecimalType(math.max(precision, scale), scale)
    case TypeDate => DateType
    case TypeDatetime => TimestampNTZType
    case TypeTimestamp => TimestampType
    case TypeBit => LongType
    case TypeTinyBlob | TypeMediumBlob | TypeLongBlob | TypeBlob |
        TypeVarString | TypeString | TypeVarchar =>
      if (c.charset == BinaryCharset) BinaryType else StringType
    case _ => StringType
  }

  /** Spark type → (type code, charset, flags) for the stub's column
    * definitions — the reverse direction, so encode/decode can't drift. */
  def columnOf(name: String, dt: DataType): ColumnDef = dt match {
    case IntegerType => ColumnDef(name, TypeLong, BinaryCharset, 11, 0, 0)
    case LongType => ColumnDef(name, TypeLongLong, BinaryCharset, 20, 0, 0)
    case ShortType | ByteType => ColumnDef(name, TypeShort, BinaryCharset, 6, 0, 0)
    case FloatType => ColumnDef(name, TypeFloat, BinaryCharset, 12, 0, 31)
    case DoubleType => ColumnDef(name, TypeDouble, BinaryCharset, 22, 0, 31)
    case d: DecimalType =>
      ColumnDef(name, TypeNewDecimal, BinaryCharset,
        d.precision + (if (d.scale > 0) 2 else 1), 0, d.scale)
    case BooleanType => ColumnDef(name, TypeTiny, BinaryCharset, 1, 0, 0)
    case DateType => ColumnDef(name, TypeDate, BinaryCharset, 10, 0, 0)
    case TimestampNTZType => ColumnDef(name, TypeDatetime, BinaryCharset, 26, 0, 6)
    case TimestampType => ColumnDef(name, TypeTimestamp, BinaryCharset, 26, 0, 6)
    case BinaryType => ColumnDef(name, TypeBlob, BinaryCharset, 65535, 0, 0)
    case _ => ColumnDef(name, TypeVarString, CharsetUtf8mb4, 65535, 0, 0)
  }

  /** Text-format value → the Catalyst-internal value for `dt` (same
    * contract as PgTypes.decode, so both partition readers feed
    * InternalRow identically). MySQL's zero-dates would not parse —
    * they surface as a loud error, never a silent null. BOOLEAN
    * round-trips as TINYINT 0/1. TIMESTAMP text is read as UTC (the
    * client pins time_zone = '+00:00' at connect). */
  def decode(bytes: Array[Byte], dt: DataType): Any = dt match {
    case BinaryType => bytes
    case _ =>
      val text = new String(bytes, UTF_8)
      dt match {
        case IntegerType => text.toInt
        case LongType => text.toLong
        case ShortType => text.toShort
        case ByteType => text.toByte
        case FloatType => text.toFloat
        case DoubleType => text.toDouble
        case d: DecimalType =>
          org.apache.spark.sql.types.Decimal(BigDecimal(text), d.precision, d.scale)
        case BooleanType => text != "0"
        case DateType =>
          java.time.LocalDate.parse(text).toEpochDay.toInt
        case TimestampNTZType =>
          val ldt = java.time.LocalDateTime.parse(text.replace(' ', 'T'))
          java.time.temporal.ChronoUnit.MICROS.between(
            java.time.LocalDateTime.of(1970, 1, 1, 0, 0), ldt)
        case TimestampType =>
          val ldt = java.time.LocalDateTime.parse(text.replace(' ', 'T'))
          java.time.temporal.ChronoUnit.MICROS.between(
            java.time.Instant.EPOCH,
            ldt.toInstant(java.time.ZoneOffset.UTC))
        case _ => org.apache.spark.unsafe.types.UTF8String.fromString(text)
      }
  }

  private val tsFormat =
    java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")

  /** JVM (external Row) value → text-format bytes (the stub's encode
    * side). TIMESTAMP renders at UTC — the session zone the client
    * pins. */
  def encode(value: Any, dt: DataType): Array[Byte] = (value, dt) match {
    case (b: Array[Byte], BinaryType) => b
    case (b: Boolean, BooleanType) => (if (b) "1" else "0").getBytes(UTF_8)
    case (t: java.sql.Timestamp, TimestampType) =>
      tsFormat.format(t.toInstant.atOffset(java.time.ZoneOffset.UTC)).getBytes(UTF_8)
    case (t: java.time.Instant, TimestampType) =>
      tsFormat.format(t.atOffset(java.time.ZoneOffset.UTC)).getBytes(UTF_8)
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      tsFormat.format(t).getBytes(UTF_8)
    case (d: java.math.BigDecimal, _: DecimalType) =>
      d.toPlainString.getBytes(UTF_8)
    case (d: BigDecimal, _: DecimalType) =>
      d.bigDecimal.toPlainString.getBytes(UTF_8)
    case (v, _) => String.valueOf(v).getBytes(UTF_8)
  }

  // ------------------------------------------- binary (prepared) protocol

  /** Binary-protocol resultset row → the TEXT representation the shared
    * [[decode]] path consumes — ONE value-decode contract for both
    * protocols, with numbers rendered in their canonical round-trip
    * form (Float/Double.toString round-trips bit-exactly). NULLs live
    * in the row's bitmap at offset 2, not inline. */
  def parseBinaryRow(cols: Seq[ColumnDef],
      payload: Array[Byte]): Array[Option[Array[Byte]]] = {
    val r = new Reader(payload)
    if (r.u8() != 0x00)
      throw new MySqlProtocolException("mysql: bad binary row header")
    val bitmap = r.bytes((cols.length + 9) / 8)
    def isNull(i: Int) = (bitmap((i + 2) >> 3) & (1 << ((i + 2) & 7))) != 0
    cols.toArray.zipWithIndex.map { case (c, i) =>
      if (isNull(i)) None else Some(binaryValueText(c, r))
    }
  }

  private def binaryValueText(c: ColumnDef, r: Reader): Array[Byte] = {
    val unsigned = (c.flags & FlagUnsigned) != 0
    def s(v: String) = v.getBytes(UTF_8)
    c.tpe match {
      case TypeTiny =>
        val v = r.u8(); s((if (unsigned) v else v.toByte.toInt).toString)
      case TypeShort | TypeYear =>
        val v = r.u16(); s((if (unsigned) v else v.toShort.toInt).toString)
      case TypeInt24 | TypeLong =>
        val v = r.u32(); s((if (unsigned) v else v.toInt.toLong).toString)
      case TypeLongLong =>
        val v = r.u64()
        s(if (unsigned) java.lang.Long.toUnsignedString(v) else v.toString)
      case TypeFloat =>
        s(java.lang.Float.intBitsToFloat(r.u32().toInt).toString)
      case TypeDouble =>
        s(java.lang.Double.longBitsToDouble(r.u64()).toString)
      case TypeDate | TypeDatetime | TypeTimestamp =>
        val len = r.u8()
        var y = 0; var mo = 0; var d = 0
        var h = 0; var mi = 0; var sec = 0; var micro = 0L
        if (len >= 4) { y = r.u16(); mo = r.u8(); d = r.u8() }
        if (len >= 7) { h = r.u8(); mi = r.u8(); sec = r.u8() }
        if (len >= 11) micro = r.u32()
        if (c.tpe == TypeDate) s(f"$y%04d-$mo%02d-$d%02d")
        else if (micro > 0)
          s(f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$sec%02d.$micro%06d")
        else s(f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$sec%02d")
      case TypeTime =>
        val len = r.u8()
        if (len == 0) s("00:00:00")
        else {
          val neg = r.u8() == 1
          val days = r.u32(); val h = r.u8(); val mi = r.u8(); val sec = r.u8()
          val micro = if (len >= 12) r.u32() else 0L
          val hh = days * 24 + h
          val sign = if (neg) "-" else ""
          val base = f"$sign$hh%02d:$mi%02d:$sec%02d"
          s(if (micro > 0) f"$base.$micro%06d" else base)
        }
      // decimals, strings, blobs, enum/set travel length-encoded in the
      // binary protocol too — identical bytes to the text protocol
      case _ => r.lenencBytes()
    }
  }

  /** The encode twin (the stub server's binary-row writer), from the
    * same JVM values [[encode]] accepts — kept beside the decoder so
    * the two directions can't drift. Appends to `w` WITHOUT the row
    * header/bitmap (the caller owns those). */
  def writeBinaryValue(w: Writer, value: Any, dt: DataType): Unit =
    (value, dt) match {
      case (b: Boolean, BooleanType) => w.u8(if (b) 1 else 0)
      case (v: Byte, _) => w.u16(v.toInt & 0xffff)
      case (v: Short, _) => w.u16(v.toInt & 0xffff)
      case (v: Int, _) => w.u32(v.toLong & 0xffffffffL)
      case (v: Long, _) => w.u64(v)
      case (v: Float, _) => w.u32(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL)
      case (v: Double, _) => w.u64(java.lang.Double.doubleToLongBits(v))
      case (d: java.sql.Date, DateType) =>
        val ld = d.toLocalDate
        w.u8(4); w.u16(ld.getYear); w.u8(ld.getMonthValue); w.u8(ld.getDayOfMonth)
      case (d: java.time.LocalDate, DateType) =>
        w.u8(4); w.u16(d.getYear); w.u8(d.getMonthValue); w.u8(d.getDayOfMonth)
      case (t: java.sql.Timestamp, TimestampType) =>
        writeBinaryDatetime(w, t.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime)
      case (t: java.time.Instant, TimestampType) =>
        writeBinaryDatetime(w, t.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime)
      case (t: java.time.LocalDateTime, TimestampNTZType) =>
        writeBinaryDatetime(w, t)
      case (d: java.math.BigDecimal, _: DecimalType) =>
        w.lenencBytes(d.toPlainString.getBytes(UTF_8))
      case (d: BigDecimal, _: DecimalType) =>
        w.lenencBytes(d.bigDecimal.toPlainString.getBytes(UTF_8))
      case (b: Array[Byte], _) => w.lenencBytes(b)
      case (v, _) => w.lenencBytes(String.valueOf(v).getBytes(UTF_8))
    }

  private def writeBinaryDatetime(w: Writer, t: java.time.LocalDateTime): Unit = {
    val micro = t.getNano / 1000
    w.u8(if (micro > 0) 11 else 7)
    w.u16(t.getYear); w.u8(t.getMonthValue); w.u8(t.getDayOfMonth)
    w.u8(t.getHour); w.u8(t.getMinute); w.u8(t.getSecond)
    if (micro > 0) w.u32(micro.toLong)
  }

  // ---------------------------------------------------------- handshake

  /** Initial Handshake (Protocol::HandshakeV10), parsed client-side. */
  final case class Handshake(serverVersion: String, threadId: Long,
      capabilities: Int, nonce: Array[Byte], authPlugin: String)

  def parseHandshake(payload: Array[Byte]): Handshake = {
    val r = new Reader(payload)
    val proto = r.u8()
    if (proto != 10)
      throw new MySqlProtocolException(s"mysql: protocol version $proto, need 10")
    val version = r.nulString()
    val threadId = r.u32()
    val part1 = r.bytes(8)
    r.u8() // filler
    val capLow = r.u16()
    var caps = capLow
    var authPlugin = "mysql_native_password"
    var nonce = part1
    if (r.remaining > 0) {
      r.u8() // charset
      r.u16() // status
      val capHigh = r.u16()
      caps |= capHigh << 16
      val authLen = r.u8()
      r.bytes(10) // reserved
      if ((caps & ClientSecureConnection) != 0) {
        // part-2 is max(13, authLen - 8); the 20-byte nonce drops the
        // trailing NUL byte servers append
        val part2 = r.bytes(math.max(13, authLen - 8))
        nonce = part1 ++ part2.take(12)
      }
      if ((caps & ClientPluginAuth) != 0) authPlugin = r.nulString()
    }
    Handshake(version, threadId, caps, nonce, authPlugin)
  }

  def renderHandshake(nonce: Array[Byte], authPlugin: String,
      withSsl: Boolean = false): Array[Byte] = {
    require(nonce.length == 20, "mysql: handshake nonce must be 20 bytes")
    val caps = ClientProtocol41 | ClientSecureConnection | ClientPluginAuth |
      ClientConnectWithDb | ClientLongPassword |
      (if (withSsl) ClientSsl else 0)
    new Writer()
      .u8(10).nulString("9.0.0-graft").u32(1L)
      .bytes(nonce.take(8)).u8(0)
      .u16(caps & 0xffff).u8(CharsetUtf8mb4).u16(2 /* autocommit */)
      .u16((caps >> 16) & 0xffff).u8(21).zeros(10)
      .bytes(nonce.drop(8)).u8(0) // part-2 (12) + NUL = 13 bytes
      .nulString(authPlugin)
      .result()
  }

  /** Protocol::HandshakeResponse41. */
  final case class HandshakeResponse(capabilities: Int, user: String,
      authResponse: Array[Byte], database: String, authPlugin: String)

  def renderHandshakeResponse(user: String, authResponse: Array[Byte],
      database: String, authPlugin: String,
      withSsl: Boolean = false): Array[Byte] = {
    val caps = responseCaps(database, withSsl)
    val w = new Writer()
      .u32(caps.toLong).u32(MaxPacket.toLong).u8(CharsetUtf8mb4).zeros(23)
      .nulString(user)
      .u8(authResponse.length).bytes(authResponse) // SECURE_CONNECTION form
    if (database.nonEmpty) w.nulString(database)
    w.nulString(authPlugin)
    w.result()
  }

  /** Protocol::SSLRequest — the 32-byte HandshakeResponse prefix (caps
    * with CLIENT_SSL, max packet, charset, filler) sent in the clear;
    * the TLS handshake follows, then the real HandshakeResponse rides
    * encrypted. */
  def renderSslRequest(database: String): Array[Byte] =
    new Writer()
      .u32(responseCaps(database, withSsl = true).toLong)
      .u32(MaxPacket.toLong).u8(CharsetUtf8mb4).zeros(23)
      .result()

  private def responseCaps(database: String, withSsl: Boolean): Int =
    ClientProtocol41 | ClientSecureConnection | ClientPluginAuth |
      (if (database.nonEmpty) ClientConnectWithDb else 0) |
      ClientLongPassword | (if (withSsl) ClientSsl else 0)

  def parseHandshakeResponse(payload: Array[Byte]): HandshakeResponse = {
    val r = new Reader(payload)
    val caps = r.u32().toInt
    r.u32() // max packet
    r.u8() // charset
    r.bytes(23)
    val user = r.nulString()
    val auth = r.bytes(r.u8())
    val db = if ((caps & ClientConnectWithDb) != 0) r.nulString() else ""
    val plugin = if ((caps & ClientPluginAuth) != 0) r.nulString() else ""
    HandshakeResponse(caps, user, auth, db, plugin)
  }

  // ------------------------------------------------------ auth scrambles

  /** mysql_native_password: SHA1(pwd) XOR SHA1(nonce ++ SHA1(SHA1(pwd)));
    * empty password → empty response (documented). */
  def nativePasswordScramble(password: String, nonce: Array[Byte]): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else {
      val sha1 = MessageDigest.getInstance("SHA-1")
      val h1 = sha1.digest(password.getBytes(UTF_8))
      sha1.reset()
      val h2 = sha1.digest(h1)
      sha1.reset()
      sha1.update(nonce.take(20)); sha1.update(h2)
      xor(h1, sha1.digest())
    }

  /** caching_sha2_password: XOR(SHA256(pwd),
    * SHA256(SHA256(SHA256(pwd)) ++ nonce)). */
  def cachingSha2Scramble(password: String, nonce: Array[Byte]): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else {
      val sha = MessageDigest.getInstance("SHA-256")
      val h1 = sha.digest(password.getBytes(UTF_8))
      sha.reset()
      val h2 = sha.digest(h1)
      sha.reset()
      sha.update(h2); sha.update(nonce.take(20))
      xor(h1, sha.digest())
    }

  /** Server-side verification for either scramble: recover the first
    * hash from the client response and compare its second hash. */
  def verifyNative(response: Array[Byte], nonce: Array[Byte],
      password: String): Boolean =
    MessageDigest.isEqual(response, nativePasswordScramble(password, nonce))

  def verifyCachingSha2(response: Array[Byte], nonce: Array[Byte],
      password: String): Boolean =
    MessageDigest.isEqual(response, cachingSha2Scramble(password, nonce))

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** caching_sha2 full-auth obfuscation for the RSA path: the
    * NUL-terminated password XORed with the handshake nonce repeated —
    * ties the ciphertext to this session so a captured blob can't be
    * replayed against another connection. */
  def xorPasswordWithNonce(password: String, nonce: Array[Byte]): Array[Byte] = {
    val pwd = password.getBytes(UTF_8) :+ 0.toByte
    pwd.zipWithIndex.map { case (b, i) =>
      (b ^ nonce(i % nonce.length)).toByte
    }
  }

  /** PEM "PUBLIC KEY" (SubjectPublicKeyInfo) → RSA public key — the
    * format the server sends for the full-auth public-key request. */
  def parsePemPublicKey(pem: String): java.security.PublicKey = {
    val b64 = pem.linesIterator
      .filterNot(l => l.contains("-----") || l.trim.isEmpty)
      .mkString
    val der = java.util.Base64.getMimeDecoder.decode(b64)
    java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
  }

  /** The cipher suite MySQL's full-auth RSA exchange uses
    * (RSA_PKCS1_OAEP_PADDING, SHA-1/MGF1 — what Connector/J negotiates
    * as sha256_password/caching_sha2 key exchange). */
  val RsaOaepTransform = "RSA/ECB/OAEPWithSHA-1AndMGF1Padding"

  // ------------------------------------------------------ basic packets

  def okPacket(affected: Long = 0): Array[Byte] =
    new Writer().u8(OkHeader).lenencInt(affected).lenencInt(0)
      .u16(2 /* autocommit */).u16(0).result()

  def eofPacket(): Array[Byte] =
    new Writer().u8(EofHeader).u16(0).u16(2).result()

  def errPacket(code: Int, sqlState: String, message: String): Array[Byte] =
    new Writer().u8(ErrHeader).u16(code).u8('#'.toInt)
      .bytes(sqlState.take(5).padTo(5, '0').getBytes(UTF_8))
      .bytes(message.getBytes(UTF_8)).result()

  final case class MySqlServerError(code: Int, sqlState: String, message: String)
      extends RuntimeException(s"mysql error $code ($sqlState): $message")

  def parseErr(payload: Array[Byte]): MySqlServerError = {
    val r = new Reader(payload)
    r.u8() // 0xff
    val code = r.u16()
    val (state, msgStart) =
      if (r.remaining > 0 && r.peek == '#'.toInt) {
        r.u8()
        (new String(r.bytes(5), UTF_8), r.pos)
      } else ("HY000", r.pos)
    MySqlServerError(code, state,
      new String(payload, msgStart, payload.length - msgStart, UTF_8))
  }

  /** EOF packet = 0xfe with a SHORT payload (<9 bytes); a lenenc-int
    * 0xfe would carry 8 more bytes. */
  def isEof(payload: Array[Byte]): Boolean =
    payload.nonEmpty && (payload(0) & 0xff) == EofHeader && payload.length < 9
}

class MySqlProtocolException(msg: String) extends RuntimeException(msg)
