package graft.sources.clickhouse

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types._

/** ClickHouse NATIVE TCP protocol — the packet/block codec shared by the
  * wire CLIENT ([[ClickHouseWireConnection]], powering the `clickhouse`
  * source type) and the in-repo test server stub. Hand-built from the
  * public protocol documentation (ClickHouse docs, "Native Protocol":
  * hello/query/data packets, varint+string primitives, columnar block
  * layout); no driver jar.
  *
  * This re-expresses the transport under the reference's clickhouse
  * connector (/root/reference/crates/connectors/src/sources/sql/
  * clickhouse.rs:28-217 — there carried by datafusion-table-providers'
  * ClickHouse pool): Hello exchange (plaintext credentials, like the
  * protocol defines) → Query packet with client info → columnar Data
  * blocks both ways → Progress/ProfileInfo → EndOfStream.
  *
  * Protocol revision is pinned to 54060 (quota-key era): both sides
  * negotiate min(client, server), real servers remain
  * backward-compatible with it, and it predates the revision-gated
  * extras (typed settings 54429, custom serialization 54454) that add
  * surface without value for a read-only source. Compression is
  * declined (0) — correctness first; the wire stays debuggable.
  */
object ClickHouseWire {

  /** The revision this implementation speaks (both sides take the min). */
  val Revision = 54060L
  val MinRevisionWithTempTables = 50264L
  val MinRevisionWithBlockInfo = 51903L
  val MinRevisionWithTotalRows = 51554L
  val MinRevisionWithClientInfo = 54032L
  val MinRevisionWithServerTimezone = 54058L
  val MinRevisionWithQuotaKey = 54060L

  // client → server packet ids
  object Client {
    val Hello = 0; val Query = 1; val Data = 2; val Cancel = 3; val Ping = 4
  }
  // server → client packet ids
  object Server {
    val Hello = 0; val Data = 1; val Exception = 2; val Progress = 3
    val Pong = 4; val EndOfStream = 5; val ProfileInfo = 6; val Totals = 7
    val Extremes = 8; val TablesStatus = 9; val Log = 10; val TableColumns = 11
  }

  // ------------------------------------------------------ wire primitives

  def writeVarUInt(out: DataOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.writeByte(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte((v & 0x7f).toInt)
  }

  def readVarUInt(in: DataInputStream): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      b = in.readUnsignedByte()
      v |= (b & 0x7fL) << shift
      shift += 7
      if (shift > 63) throw new ClickHouseProtocolException("varuint too long")
    } while ((b & 0x80) != 0)
    v
  }

  def writeString(out: DataOutputStream, s: String): Unit =
    writeBytes(out, s.getBytes(UTF_8))

  def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    writeVarUInt(out, b.length.toLong)
    out.write(b)
  }

  def readString(in: DataInputStream): String =
    new String(readBytes(in), UTF_8)

  def readBytes(in: DataInputStream): Array[Byte] = {
    val n = readVarUInt(in)
    if (n > 64L * 1024 * 1024)
      throw new ClickHouseProtocolException(s"string length $n out of range")
    val b = new Array[Byte](n.toInt)
    in.readFully(b)
    b
  }

  // fixed-width little-endian
  def writeU8(out: DataOutputStream, v: Int): Unit = out.writeByte(v)
  def writeU16(out: DataOutputStream, v: Int): Unit = {
    out.writeByte(v & 0xff); out.writeByte((v >> 8) & 0xff)
  }
  def writeU32(out: DataOutputStream, v: Long): Unit = {
    writeU16(out, (v & 0xffff).toInt); writeU16(out, ((v >> 16) & 0xffff).toInt)
  }
  def writeU64(out: DataOutputStream, v: Long): Unit = {
    writeU32(out, v & 0xffffffffL); writeU32(out, (v >>> 32) & 0xffffffffL)
  }
  def readU8(in: DataInputStream): Int = in.readUnsignedByte()
  def readU16(in: DataInputStream): Int = readU8(in) | (readU8(in) << 8)
  def readU32(in: DataInputStream): Long =
    readU16(in).toLong | (readU16(in).toLong << 16)
  def readU64(in: DataInputStream): Long = readU32(in) | (readU32(in) << 32)
  def readI32(in: DataInputStream): Int = readU32(in).toInt

  // ------------------------------------------------------------- blocks

  /** One column of a native block: name, the ClickHouse type STRING (the
    * wire's schema carrier), and decoded values (null = SQL NULL). */
  final case class Column(name: String, chType: String, values: Array[Any])

  final case class Block(columns: Seq[Column]) {
    def rows: Int = if (columns.isEmpty) 0 else columns.head.values.length
  }

  /** BlockInfo (since 51903): field-tagged is_overflows/bucket_num. */
  def writeBlockInfo(out: DataOutputStream): Unit = {
    writeVarUInt(out, 1); writeU8(out, 0) // is_overflows = false
    writeVarUInt(out, 2); writeU32(out, 0xffffffffL) // bucket_num = -1
    writeVarUInt(out, 0) // end of fields
  }

  def readBlockInfo(in: DataInputStream): Unit = {
    var field = readVarUInt(in)
    while (field != 0) {
      field match {
        case 1 => readU8(in)
        case 2 => readU32(in)
        case other =>
          throw new ClickHouseProtocolException(s"unknown BlockInfo field $other")
      }
      field = readVarUInt(in)
    }
  }

  def writeBlock(out: DataOutputStream, block: Block): Unit = {
    writeBlockInfo(out)
    writeVarUInt(out, block.columns.length.toLong)
    writeVarUInt(out, block.rows.toLong)
    block.columns.foreach { c =>
      writeString(out, c.name)
      writeString(out, c.chType)
      writeColumnData(out, c.chType, c.values)
    }
  }

  def readBlock(in: DataInputStream): Block = {
    readBlockInfo(in)
    val nCols = readVarUInt(in).toInt
    val nRows = readVarUInt(in).toInt
    Block((0 until nCols).map { _ =>
      val name = readString(in)
      val tpe = readString(in)
      Column(name, tpe, readColumnData(in, tpe, nRows))
    })
  }

  // ------------------------------------------------------- type strings

  private val DecimalRe = """Decimal\((\d+),\s*(\d+)\)""".r
  private val DateTime64Re = """DateTime64\((\d+)(?:,\s*'[^']*')?\)""".r
  private val DateTimeTzRe = """DateTime(?:\('[^']*'\))?""".r
  private val NullableRe = """Nullable\((.+)\)""".r
  private val FixedStringRe = """FixedString\((\d+)\)""".r

  /** ClickHouse type string → Spark type (the read-side schema map). */
  def sparkTypeOf(chType: String): DataType = chType match {
    case NullableRe(inner) => sparkTypeOf(inner)
    case "Int8" | "Int16" | "Int32" | "UInt8" | "UInt16" => IntegerType
    case "Int64" | "UInt32" => LongType
    case "UInt64" => DecimalType(20, 0) // may exceed Long, same as mysql
    case "Float32" => FloatType
    case "Float64" => DoubleType
    case "Bool" => BooleanType
    case "String" => StringType
    case FixedStringRe(_) => StringType
    case "Date" | "Date32" => DateType
    case DateTime64Re(_) => TimestampType
    case s if DateTimeTzRe.matches(s) => TimestampType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case other =>
      throw new ClickHouseProtocolException(s"unsupported ClickHouse type $other")
  }

  /** Spark type → the ClickHouse type the stub serves (reverse map, so
    * encode/decode can't drift). Everything nullable-wrapped — Spark
    * schemas are nullable by default. */
  def chTypeOf(dt: DataType): String = {
    val base = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case BooleanType => "Bool"
      case StringType => "String"
      case BinaryType => "String" // CH strings are byte-safe
      case DateType => "Date32"
      case TimestampType => "DateTime64(6)"
      case TimestampNTZType => "DateTime64(6)"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case other =>
        throw new ClickHouseProtocolException(s"no ClickHouse type for $other")
    }
    s"Nullable($base)"
  }

  // ------------------------------------------------------- column codec

  /** Decode `n` values of `chType`. Values are JVM-external (String,
    * Long, java.math.BigDecimal, java.sql.Timestamp µs instants …);
    * the DSv2 reader converts to Catalyst. */
  def readColumnData(in: DataInputStream, chType: String, n: Int): Array[Any] =
    chType match {
      case NullableRe(inner) =>
        val mask = new Array[Byte](n)
        in.readFully(mask)
        val vals = readColumnData(in, inner, n)
        var i = 0
        while (i < n) { if (mask(i) != 0) vals(i) = null; i += 1 }
        vals
      case "Int8" => Array.fill[Any](n)(readU8(in).toByte.toInt)
      case "UInt8" => Array.fill[Any](n)(readU8(in))
      case "Bool" => Array.fill[Any](n)(readU8(in) != 0)
      case "Int16" => Array.fill[Any](n)(readU16(in).toShort.toInt)
      case "UInt16" => Array.fill[Any](n)(readU16(in))
      case "Int32" => Array.fill[Any](n)(readI32(in))
      case "UInt32" => Array.fill[Any](n)(readU32(in))
      case "Int64" => Array.fill[Any](n)(readU64(in))
      case "UInt64" => Array.fill[Any](n) {
        val v = readU64(in)
        new java.math.BigDecimal(java.lang.Long.toUnsignedString(v))
      }
      case "Float32" => Array.fill[Any](n)(
        java.lang.Float.intBitsToFloat(readI32(in)))
      case "Float64" => Array.fill[Any](n)(
        java.lang.Double.longBitsToDouble(readU64(in)))
      case "String" => Array.fill[Any](n)(new String(readBytes(in), UTF_8))
      case FixedStringRe(len) =>
        val w = len.toInt
        Array.fill[Any](n) {
          val b = new Array[Byte](w); in.readFully(b)
          // FixedString(N) pads with trailing 0x00; interior NULs are
          // legitimate payload (binary-ish fixed keys) — strip only the
          // trailing run
          var end = w
          while (end > 0 && b(end - 1) == 0) end -= 1
          new String(b, 0, end, UTF_8)
        }
      case "Date" => Array.fill[Any](n)(
        java.time.LocalDate.ofEpochDay(readU16(in).toLong))
      case "Date32" => Array.fill[Any](n)(
        java.time.LocalDate.ofEpochDay(readI32(in).toLong))
      case s if DateTimeTzRe.matches(s) => Array.fill[Any](n)(
        java.time.Instant.ofEpochSecond(readU32(in)))
      case DateTime64Re(p) =>
        val scale = math.pow(10, p.toInt).toLong
        Array.fill[Any](n) {
          val ticks = readU64(in)
          // scale is a power of 10: convert without the ticks*1e6
          // intermediate, which overflows Long for µs-precision epochs
          val micros =
            if (scale == 1000000L) ticks
            else if (scale < 1000000L) ticks * (1000000L / scale)
            else ticks / (scale / 1000000L)
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L)
        }
      case DecimalRe(p, s) =>
        val prec = p.toInt
        Array.fill[Any](n) {
          val unscaled =
            if (prec <= 9) java.math.BigInteger.valueOf(readI32(in).toLong)
            else if (prec <= 18) java.math.BigInteger.valueOf(readU64(in))
            else { // Decimal128: 16 bytes little-endian two's complement
              val b = new Array[Byte](16); in.readFully(b)
              new java.math.BigInteger(b.reverse)
            }
          new java.math.BigDecimal(unscaled, s.toInt)
        }
      case other =>
        throw new ClickHouseProtocolException(s"cannot decode type $other")
    }

  /** Encode values of `chType` (the stub's write side). Accepts the JVM
    * types Spark Rows carry externally. */
  def writeColumnData(out: DataOutputStream, chType: String,
      values: Array[Any]): Unit = chType match {
    case NullableRe(inner) =>
      values.foreach(v => writeU8(out, if (v == null) 1 else 0))
      // null slots still carry a placeholder value (the wire is columnar
      // fixed-layout); zero of the inner type
      writeColumnData(out, inner, values.map(v =>
        if (v != null) v else zeroOf(inner)))
    case "Int8" => values.foreach(v => writeU8(out, asLong(v).toInt & 0xff))
    case "UInt8" => values.foreach(v => writeU8(out, asLong(v).toInt & 0xff))
    case "Bool" => values.foreach(v =>
      writeU8(out, if (v.asInstanceOf[Boolean]) 1 else 0))
    case "Int16" | "UInt16" => values.foreach(v =>
      writeU16(out, asLong(v).toInt & 0xffff))
    case "Int32" | "UInt32" => values.foreach(v => writeU32(out, asLong(v)))
    case "Int64" | "UInt64" => values.foreach(v => writeU64(out, asLong(v)))
    case "Float32" => values.foreach(v => writeU32(out,
      java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL))
    case "Float64" => values.foreach(v => writeU64(out,
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])))
    case "String" => values.foreach {
      case b: Array[Byte] => writeBytes(out, b)
      case s => writeString(out, String.valueOf(s))
    }
    case "Date" => values.foreach(v => writeU16(out, epochDay(v).toInt))
    case "Date32" => values.foreach(v => writeU32(out, epochDay(v)))
    case DateTime64Re(p) =>
      val scale = math.pow(10, p.toInt).toLong
      values.foreach { v =>
        val micros = microsOf(v)
        // power-of-10 scale: convert without the micros*scale
        // intermediate, which overflows Long for µs-precision epochs
        val ticks =
          if (scale == 1000000L) micros
          else if (scale > 1000000L) Math.multiplyExact(micros, scale / 1000000L)
          else micros / (1000000L / scale)
        writeU64(out, ticks)
      }
    case s if DateTimeTzRe.matches(s) =>
      values.foreach(v => writeU32(out, microsOf(v) / 1000000L))
    case DecimalRe(p, s) =>
      val prec = p.toInt
      values.foreach { v =>
        val unscaled = (v match {
          case d: java.math.BigDecimal => d.setScale(s.toInt)
          case d: BigDecimal => d.bigDecimal.setScale(s.toInt)
          case other => new java.math.BigDecimal(String.valueOf(other))
            .setScale(s.toInt)
        }).unscaledValue()
        if (prec <= 9) writeU32(out, unscaled.longValueExact())
        else if (prec <= 18) writeU64(out, unscaled.longValueExact())
        else {
          val raw = unscaled.toByteArray.reverse // to little-endian
          val b = new Array[Byte](16)
          // sign-extend
          if (unscaled.signum() < 0) java.util.Arrays.fill(b, 0xff.toByte)
          System.arraycopy(raw, 0, b, 0, math.min(raw.length, 16))
          out.write(b)
        }
      }
    case other =>
      throw new ClickHouseProtocolException(s"cannot encode type $other")
  }

  private def zeroOf(chType: String): Any = chType match {
    case "Bool" => false
    case "Float32" => 0.0f
    case "Float64" => 0.0d
    case "String" => ""
    case "Date" | "Date32" => java.time.LocalDate.ofEpochDay(0)
    case s if s.startsWith("DateTime") => java.time.Instant.EPOCH
    case DecimalRe(_, s) => new java.math.BigDecimal(
      java.math.BigInteger.ZERO, s.toInt)
    case _ => 0L
  }

  private def asLong(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue()
    case d: BigDecimal => d.toLongExact
    case other => String.valueOf(other).toLong
  }

  private def epochDay(v: Any): Long = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case n: java.lang.Number => n.longValue()
    case other => throw new ClickHouseProtocolException(s"not a date: $other")
  }

  private def microsOf(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      Math.addExact(Math.multiplyExact(t.toInstant.getEpochSecond, 1000000L),
        t.toInstant.getNano / 1000L)
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L)
    case l: java.time.LocalDateTime =>
      val i = l.toInstant(java.time.ZoneOffset.UTC)
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L)
    case other =>
      throw new ClickHouseProtocolException(s"not a timestamp: $other")
  }

  // -------------------------------------------------------- exceptions

  /** Server Exception packet: code, name, message, stack, nested flag. */
  final case class ClickHouseServerError(code: Int, name: String,
      message: String) extends RuntimeException(s"$name ($code): $message")

  def writeException(out: DataOutputStream, code: Int, name: String,
      message: String): Unit = {
    writeU32(out, code.toLong)
    writeString(out, name)
    writeString(out, message)
    writeString(out, "") // stack trace
    writeU8(out, 0) // no nested
  }

  def readException(in: DataInputStream): ClickHouseServerError = {
    val code = readI32(in)
    val name = readString(in)
    val message = readString(in)
    readString(in) // stack trace
    val hasNested = readU8(in)
    if (hasNested != 0) readException(in) // innermost wins? keep outer
    ClickHouseServerError(code, name, message)
  }
}

class ClickHouseProtocolException(msg: String) extends RuntimeException(msg)
