package graft.sources.pg

import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL type OIDs ↔ Spark types, and the text-format value codec
  * (format code 0 — the only format the simple-query protocol uses).
  * OIDs are pg_type's well-known stable assignments (public catalog
  * headers); the reference's arrow mapping for the same types is
  * postgres_federation.rs:100-160.
  *
  * Both directions live here so the client (decode) and the edge
  * (encode) cannot drift: the spec round-trips every type through
  * encode→decode.
  */
object PgTypes {
  val BoolOid = 16
  val ByteaOid = 17
  val Int8Oid = 20
  val Int2Oid = 21
  val Int4Oid = 23
  val TextOid = 25
  val Float4Oid = 700
  val Float8Oid = 701
  val BpcharOid = 1042
  val VarcharOid = 1043
  val DateOid = 1082
  val TimestampOid = 1114
  val TimestamptzOid = 1184
  val NumericOid = 1700
  val NameOid = 19
  val OidOid = 26
  val JsonOid = 114
  val JsonbOid = 3802

  /** pg typmod for numeric(p,s); -1 means unconstrained. */
  def numericTypmod(precision: Int, scale: Int): Int = ((precision << 16) | scale) + 4

  def sparkTypeOf(oid: Int, typmod: Int): DataType = oid match {
    case BoolOid => BooleanType
    case ByteaOid => BinaryType
    case Int2Oid => ShortType
    case Int4Oid | OidOid => IntegerType
    case Int8Oid => LongType
    case Float4Oid => FloatType
    case Float8Oid => DoubleType
    case DateOid => DateType
    case TimestampOid => TimestampNTZType
    case TimestamptzOid => TimestampType
    case NumericOid =>
      if (typmod == -1) DecimalType(38, 18)
      else DecimalType((typmod - 4) >> 16, (typmod - 4) & 0xffff)
    case _ => StringType // text, varchar, bpchar, name, json(b), unknowns
  }

  /** Spark type → (oid, typmod) for RowDescription. Complex types (array/
    * struct/map) serve as their JSON text rendering under the text OID —
    * the lossless text-protocol stance for types pg has no scalar for. */
  def oidOf(dt: DataType): (Int, Int) = dt match {
    case BooleanType => (BoolOid, -1)
    case BinaryType => (ByteaOid, -1)
    case ByteType | ShortType => (Int2Oid, -1)
    case IntegerType => (Int4Oid, -1)
    case LongType => (Int8Oid, -1)
    case FloatType => (Float4Oid, -1)
    case DoubleType => (Float8Oid, -1)
    case DateType => (DateOid, -1)
    case TimestampNTZType => (TimestampOid, -1)
    case TimestampType => (TimestamptzOid, -1)
    case d: DecimalType => (NumericOid, numericTypmod(d.precision, d.scale))
    case _ => (TextOid, -1)
  }

  private val tsFormat = DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")

  /** External (Row) value → pg text format. */
  def encode(value: Any, dt: DataType): String = (value, dt) match {
    case (b: Boolean, BooleanType) => if (b) "t" else "f"
    case (b: Array[Byte], BinaryType) =>
      "\\x" + b.map("%02x".format(_)).mkString
    case (d: java.sql.Date, DateType) => d.toLocalDate.toString
    case (d: LocalDate, DateType) => d.toString
    case (t: java.sql.Timestamp, TimestampType) =>
      tsFormat.format(t.toInstant.atOffset(ZoneOffset.UTC)) + "+00"
    case (t: Instant, TimestampType) =>
      tsFormat.format(t.atOffset(ZoneOffset.UTC)) + "+00"
    case (t: LocalDateTime, TimestampNTZType) => tsFormat.format(t)
    case (d: java.math.BigDecimal, _: DecimalType) => d.toPlainString
    case (d: BigDecimal, _: DecimalType) => d.bigDecimal.toPlainString
    case (v, _) => String.valueOf(v)
  }

  /** pg text format → the Catalyst-internal value for `dt`. */
  def decode(text: String, dt: DataType): Any = dt match {
    case BooleanType => text == "t" || text == "true"
    case ShortType => text.toShort
    case IntegerType => text.toInt
    case LongType => text.toLong
    case FloatType => text.toFloat
    case DoubleType => text.toDouble
    case BinaryType =>
      if (!text.startsWith("\\x"))
        throw new PgProtocolException(s"pg: bytea not in hex format: ${text.take(8)}")
      text.drop(2).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    case DateType => LocalDate.parse(text).toEpochDay.toInt
    case TimestampNTZType =>
      val ldt = LocalDateTime.parse(text.replace(' ', 'T'))
      ChronoUnit.MICROS.between(LocalDateTime.of(1970, 1, 1, 0, 0), ldt)
    case TimestampType =>
      // pg renders timestamptz with a possibly-short zone offset (+00,
      // +05:30); normalize to an ISO offset before parsing
      val iso = text.replace(' ', 'T') match {
        case s if s.length >= 3 && (s(s.length - 3) == '+' || s(s.length - 3) == '-') =>
          s + ":00"
        case s => s
      }
      val odt = OffsetDateTime.parse(iso)
      ChronoUnit.MICROS.between(Instant.EPOCH, odt.toInstant)
    case d: DecimalType =>
      org.apache.spark.sql.types.Decimal(BigDecimal(text), d.precision, d.scale)
    case StringType => UTF8String.fromString(text)
    case other =>
      throw new PgProtocolException(s"pg: no text decoder for $other")
  }
}
