package graft.sql

import org.apache.spark.sql.types._
import SqlAst._

/** A remote-SQL dialect: identifier quoting, sort/values capabilities,
  * type names for CAST, and a function-translation mapper. Mirrors the
  * reference's `Dialect` + `DialectCapabilities` + `TypeMapper` traits
  * (/root/reference/crates/sql/src/sql_generator/dialect.rs,
  * dialects/oracle.rs:296-339, dialects/snowflake.rs:118-150).
  */
trait SqlDialect {
  def name: String
  def identQuote: Char = '"'
  def supportsNullsFirstInSort: Boolean = true
  def supportsDistinctOn: Boolean = false
  def supportsValuesClause: Boolean = true
  /** Oracle: zero-table selects read FROM DUAL. */
  def requiresFromDual: Boolean = false
  /** SQL-standard engines (Derby) type AVG(int) as INTEGER — truncating
    * division. Spark's Average over integers is fractional, so those
    * dialects need the argument cast to DOUBLE before the aggregate. */
  def integralAvgTruncates: Boolean = false
  def mapper: FunctionMapper = FunctionMapper.empty

  /** Escape a string literal's CONTENT (quotes are added by the caller).
    * ANSI doubles single quotes; MySQL additionally treats backslash as an
    * escape character, so it must be doubled or a value like `x\` breaks
    * out of the literal (data-driven SQL injection). */
  def escapeStringContent(s: String): String = s.replace("'", "''")

  /** Null-safe equality (`<=>`): ANSI `IS NOT DISTINCT FROM` by default;
    * engines without it override (MySQL `<=>`, Oracle/Derby a NULL-aware
    * disjunction). */
  def nullSafeEq(l: SqlExpr, r: SqlExpr): SqlExpr =
    BinOp(l, "IS NOT DISTINCT FROM", r)

  /** Render LIMIT/OFFSET; ANSI engines without LIMIT override with
    * OFFSET ... ROWS / FETCH NEXT ... ROWS ONLY. Rendered AFTER ORDER BY. */
  def renderLimitOffset(limit: Option[String], offset: Option[String]): String = {
    val sb = new StringBuilder
    limit.foreach(l => sb.append(" LIMIT ").append(l))
    offset.foreach(o => sb.append(" OFFSET ").append(o))
    sb.toString
  }

  /** Dialect type name for CAST targets; default mapping is ANSI-ish. */
  def typeName(dt: DataType): String = dt match {
    case StringType                => "VARCHAR"
    case LongType | IntegerType |
         ShortType | ByteType      => "BIGINT"
    case DoubleType                => "DOUBLE PRECISION"
    case FloatType                 => "REAL"
    case BooleanType               => "BOOLEAN"
    case DateType                  => "DATE"
    case _: TimestampType          => "TIMESTAMP"
    case d: DecimalType            => s"NUMERIC(${d.precision}, ${d.scale})"
    case BinaryType                => "BYTEA"
    case other =>
      throw SqlGenError(s"no SQL type mapping for $other in dialect $name")
  }
}

/** Raised for anything the generator can't express in the target dialect;
  * the federation layer catches it and falls back to local execution. */
final case class SqlGenError(message: String) extends RuntimeException(message)

object PostgresDialect extends SqlDialect {
  val name = "postgres"
}

/** Null-safe equality for engines without IS NOT DISTINCT FROM, as a
  * CASE that is TOTAL (never NULL): a bare `l = r OR (both null)` yields
  * NULL for one-sided nulls, which inverts incorrectly under NOT and
  * projects as NULL instead of false. The CASE form also avoids boolean
  * expressions outside predicates, which Oracle (pre-23) rejects. */
private[sql] object NullSafeEqRewrite {
  def apply(l: SqlExpr, r: SqlExpr): SqlExpr =
    BinOp(
      CaseWhen(Seq(
        (BinOp(PostfixOp(l, "IS NULL"), "AND", PostfixOp(r, "IS NULL")), NumberLit("1")),
        (BinOp(l, "=", r), NumberLit("1"))), Some(NumberLit("0"))),
      "=", NumberLit("1"))
}

object MySqlDialect extends SqlDialect {
  val name = "mysql"
  override def identQuote: Char = '`'
  override def supportsNullsFirstInSort: Boolean = false
  override def escapeStringContent(s: String): String =
    super.escapeStringContent(s).replace("\\", "\\\\")
  override def nullSafeEq(l: SqlExpr, r: SqlExpr): SqlExpr =
    BinOp(l, "<=>", r)
  override def typeName(dt: DataType): String = dt match {
    case StringType   => "CHAR"
    case DoubleType   => "DOUBLE"
    case BinaryType   => "BLOB"
    case other        => super.typeName(other)
  }
}

/** ClickHouse: backtick identifiers (double quotes also legal; backtick
  * is the convention its own tooling emits), native LIMIT/OFFSET and
  * NULLS FIRST/LAST, MySQL-style backslash escapes in string literals,
  * no IS NOT DISTINCT FROM (the CASE rewrite is total and portable),
  * VALUES is a table FUNCTION with a schema argument — not the ANSI
  * clause — so constant relations route through the no-VALUES shape.
  * Types are ClickHouse's own names (String/Float64/DateTime64/
  * Decimal(p,s)). The reference reaches ClickHouse through
  * datafusion-table-providers (clickhouse.rs:28-217); the live source
  * here is `sources/clickhouse/` over the native wire protocol. */
object ClickHouseDialect extends SqlDialect {
  val name = "clickhouse"
  override def identQuote: Char = '`'
  override def supportsValuesClause: Boolean = false
  override def escapeStringContent(s: String): String =
    super.escapeStringContent(s).replace("\\", "\\\\")
  override def nullSafeEq(l: SqlExpr, r: SqlExpr): SqlExpr =
    NullSafeEqRewrite(l, r)
  override def typeName(dt: DataType): String = dt match {
    case StringType   => "String"
    case LongType | IntegerType |
         ShortType | ByteType => "Int64"
    case DoubleType   => "Float64"
    case FloatType    => "Float32"
    case BooleanType  => "Bool"
    case DateType     => "Date32"
    case _: TimestampType => "DateTime64(6)"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case BinaryType   => "String"
    case other =>
      throw SqlGenError(s"no SQL type mapping for $other in dialect $name")
  }
}

object SqliteDialect extends SqlDialect {
  val name = "sqlite"
  /** SQLite's native null-safe comparison is the `IS` operator (every
    * version); `IS NOT DISTINCT FROM` only arrived as an alias in 3.39. */
  override def nullSafeEq(l: SqlExpr, r: SqlExpr): SqlExpr =
    BinOp(l, "IS", r)
  override def typeName(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case DoubleType => "REAL"
    case BinaryType => "BLOB"
    case other      => super.typeName(other)
  }
}

/** Apache Derby: ANSI FETCH-style limits, no LIMIT keyword. Not in the
  * reference's router (it has no Derby source) — included here because it
  * is the one dialect this repo can EXECUTE against offline, turning the
  * generator's string tests into a live differential proof
  * (SqlGenExecSpec). */
object DerbyDialect extends SqlDialect {
  val name = "derby"
  override def supportsValuesClause: Boolean = false
  override def integralAvgTruncates: Boolean = true
  override def nullSafeEq(l: SqlExpr, r: SqlExpr): SqlExpr =
    NullSafeEqRewrite(l, r)
  override def renderLimitOffset(limit: Option[String],
      offset: Option[String]): String = {
    // ANSI order: OFFSET precedes FETCH
    val sb = new StringBuilder
    offset.foreach(o => sb.append(" OFFSET ").append(o).append(" ROWS"))
    limit.foreach(l => sb.append(" FETCH NEXT ").append(l).append(" ROWS ONLY"))
    sb.toString
  }
  override def typeName(dt: DataType): String = dt match {
    case StringType => "VARCHAR(32672)"
    case DoubleType => "DOUBLE"
    case BinaryType => "BLOB"
    case other      => super.typeName(other)
  }
}

/** DuckDB: near-ANSI surface — double-quote idents, LIMIT/OFFSET,
  * IS NOT DISTINCT FROM, VALUES, NULLS FIRST/LAST all native, so the
  * base dialect needs no overrides beyond type names. The reference
  * routes DuckDB through its Substrait producer
  * (substrait_producer.rs:529-536); this repo routes it through SQL text
  * instead because that path can be EXECUTED and differentially verified
  * offline (DuckDbExecSpec runs the generated SQL in a real DuckDB via
  * the oracle's python module) — `datafusion` stays on the Substrait
  * marker tier. */
object DuckDbDialect extends SqlDialect {
  val name = "duckdb"
  override def supportsDistinctOn: Boolean = true
  override def typeName(dt: DataType): String = dt match {
    case DoubleType => "DOUBLE"
    case BinaryType => "BLOB"
    case other      => super.typeName(other)
  }
}

/** Oracle: NVL/INSTR/SYSTIMESTAMP/LISTAGG surface, `||` concat, VARCHAR2
  * casts, FROM DUAL. Function rules port oracle.rs:62-294 one-for-one. */
object OracleDialect extends SqlDialect {
  val name = "oracle"
  override def supportsValuesClause: Boolean = false
  override def requiresFromDual: Boolean = true
  override def nullSafeEq(l: SqlExpr, r: SqlExpr): SqlExpr =
    NullSafeEqRewrite(l, r)

  private def arg(args: Seq[SqlExpr], i: Int): SqlExpr =
    args.lift(i).getOrElse(NullLit)

  private def concatChain(args: Seq[SqlExpr]): SqlExpr =
    if (args.isEmpty) NullLit
    else args.reduceLeft((a, b) => BinOp(a, "||", b))

  override val mapper: FunctionMapper = FunctionMapper.empty
    // NULL handling
    .rename("coalesce", "NVL")
    .rename("nullif", "NULLIF")
    .transform("ifnull")(a => Func("NVL", Seq(arg(a, 0), arg(a, 1))))
    // strings
    .rename("length", "LENGTH")
    .rename("char_length", "LENGTH")
    .rename("substr", "SUBSTR")
    .rename("substring", "SUBSTR")
    .rename("upper", "UPPER")
    .rename("lower", "LOWER")
    .rename("trim", "TRIM")
    .rename("ltrim", "LTRIM")
    .rename("rtrim", "RTRIM")
    .transform("concat")(concatChain)
    .transform("concat_ws") { args =>
      if (args.length < 2) NullLit
      else {
        val sep = args.head
        args.tail.reduceLeft((a, b) => BinOp(BinOp(a, "||", sep), "||", b))
      }
    }
    .transform("strpos")(a => Func("INSTR", Seq(arg(a, 0), arg(a, 1))))
    // ANSI position(needle IN haystack) → INSTR(haystack, needle)
    .transform("position")(a => Func("INSTR", Seq(arg(a, 1), arg(a, 0))))
    .transform("regexp_replace")(a =>
      Func("REGEXP_REPLACE", Seq(arg(a, 0), arg(a, 1), arg(a, 2))))
    .transform("regexp_like")(a => Func("REGEXP_LIKE", Seq(arg(a, 0), arg(a, 1))))
    // numerics
    .rename("abs", "ABS")
    .rename("ceil", "CEIL")
    .rename("floor", "FLOOR")
    .rename("round", "ROUND")
    .rename("trunc", "TRUNC")
    .rename("mod", "MOD")
    .rename("power", "POWER")
    .rename("sqrt", "SQRT")
    .transform("random")(_ => RawIdent("DBMS_RANDOM", "VALUE"))
    .transform("rand")(_ => RawIdent("DBMS_RANDOM", "VALUE"))
    // date/time
    .transform("current_timestamp")(_ => RawIdent("SYSTIMESTAMP"))
    .transform("current_date")(_ => RawIdent("SYSDATE"))
    .transform("now")(_ => RawIdent("SYSTIMESTAMP"))
    .transform("extract") { a =>
      val field = a.headOption match {
        case Some(StringLit(s, _)) => s.toUpperCase
        case _                     => "YEAR"
      }
      ExtractExpr(field, a.lift(1).getOrElse(RawIdent("SYSDATE")))
    }
    .transform("date_part") { a =>
      val field = a.headOption match {
        case Some(StringLit(s, _)) => s.toUpperCase
        case _                     => "YEAR"
      }
      ExtractExpr(field, a.lift(1).getOrElse(RawIdent("SYSDATE")))
    }
    .transform("to_date")(a =>
      Func("TO_DATE", Seq(arg(a, 0),
        a.lift(1).getOrElse(StringLit("YYYY-MM-DD")))))
    .transform("to_timestamp") { a =>
      if (a.length <= 1) Func("TO_TIMESTAMP", Seq(arg(a, 0)))
      else Func("TO_TIMESTAMP", Seq(arg(a, 0), arg(a, 1)))
    }
    .transform("from_unixtime") { a =>
      val ts = a.headOption.getOrElse(NumberLit("0"))
      val epoch = Func("TO_DATE", Seq(StringLit("1970-01-01"), StringLit("YYYY-MM-DD")))
      BinOp(epoch, "+", Nested(BinOp(ts, "/", NumberLit("86400"))))
    }
    // aggregates
    .rename("count", "COUNT")
    .rename("sum", "SUM")
    .rename("avg", "AVG")
    .rename("min", "MIN")
    .rename("max", "MAX")
    .transform("string_agg") { a =>
      val expr = arg(a, 0)
      val sep = a.lift(1).getOrElse(StringLit(","))
      Func("LISTAGG", Seq(expr, sep),
        withinGroup = Seq(SortItem(expr, ascending = true, nullsFirst = None)))
    }

  override def typeName(dt: DataType): String = dt match {
    case StringType                           => "VARCHAR2"
    case LongType | IntegerType | ShortType |
         ByteType                             => "NUMERIC"
    case DoubleType                           => "DOUBLE"
    case FloatType                            => "FLOAT"
    case BooleanType                          => "NUMERIC(1, 0)"
    case DateType                             => "DATE"
    case _: TimestampType                     => "TIMESTAMP"
    case other                                => super.typeName(other)
  }
}

/** Snowflake: LISTAGG/ARRAY_AGG/CURRENT_TIMESTAMP surface; function rules
  * port snowflake.rs:57-116 one-for-one. */
object SnowflakeDialect extends SqlDialect {
  val name = "snowflake"

  private def arg(args: Seq[SqlExpr], i: Int): SqlExpr =
    args.lift(i).getOrElse(NullLit)

  override val mapper: FunctionMapper = FunctionMapper.empty
    .rename("length", "LENGTH")
    .rename("substr", "SUBSTR")
    .rename("upper", "UPPER")
    .rename("lower", "LOWER")
    .rename("trim", "TRIM")
    .rename("coalesce", "COALESCE")
    .rename("abs", "ABS")
    .rename("ceil", "CEIL")
    .rename("floor", "FLOOR")
    .rename("round", "ROUND")
    .rename("concat", "CONCAT")
    .rename("to_timestamp", "TO_TIMESTAMP")
    .rename("to_date", "TO_DATE")
    .rename("nvl", "NVL")
    .rename("iff", "IFF")
    .transform("string_agg")(a =>
      Func("LISTAGG", Seq(arg(a, 0), a.lift(1).getOrElse(StringLit(",")))))
    .transform("array_agg")(a => Func("ARRAY_AGG", Seq(arg(a, 0))))
    .transform("current_timestamp")(_ =>
      Func("CURRENT_TIMESTAMP", Nil, argless = true))
    .transform("now")(_ => Func("CURRENT_TIMESTAMP", Nil, argless = true))
    .transform("from_unixtime")(a => Func("TO_TIMESTAMP", Seq(arg(a, 0))))

  override def typeName(dt: DataType): String = dt match {
    case StringType                           => "VARCHAR"
    case LongType | IntegerType | ShortType |
         ByteType                             => "NUMERIC"
    case DoubleType | FloatType               => "FLOAT"
    case BooleanType                          => "BOOLEAN"
    case DateType                             => "DATE"
    case _: TimestampType                     => "TIMESTAMP"
    case other                                => super.typeName(other)
  }
}

/** Routes a source type string to its translation path — the reference's
  * four-tier router (/root/reference/crates/sql/src/dialect_router.rs:50-105):
  * native dialects, custom enterprise dialects, Substrait-capable engines
  * (binary plans, not SQL text), and local-execution fallback for unknown
  * sources.
  */
/** Spark SQL itself — the dialect a REMOTE graft/Spark engine speaks,
  * used when federating whole subtrees to the Arrow-carrying engine-to-
  * engine sources (`arrowhttp`, `flight`): backtick identifiers, native
  * `<=>` null-safe equality, NULLS FIRST/LAST, LIMIT/OFFSET, VALUES,
  * and Spark DDL type names for CAST targets. Function names pass
  * through unmapped — the remote resolver IS Spark's. */
object SparkDialect extends SqlDialect {
  val name = "spark"
  override def identQuote: Char = '`'
  override def escapeStringContent(s: String): String =
    super.escapeStringContent(s).replace("\\", "\\\\")
  override def nullSafeEq(l: SqlExpr, r: SqlExpr): SqlExpr =
    BinOp(l, "<=>", r)
  override def typeName(dt: DataType): String = dt match {
    case StringType => "STRING"
    case LongType   => "BIGINT"
    case IntegerType => "INT"
    case ShortType  => "SMALLINT"
    case ByteType   => "TINYINT"
    case DoubleType => "DOUBLE"
    case FloatType  => "FLOAT"
    case BinaryType => "BINARY"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case other      => super.typeName(other)
  }
}

object DialectRouter {
  sealed trait DialectPath
  final case class Sql(dialect: SqlDialect) extends DialectPath
  case object Substrait extends DialectPath
  case object LocalExecution extends DialectPath

  def route(sourceType: String): DialectPath =
    sourceType.toLowerCase match {
      case "postgres" | "postgresql" => Sql(PostgresDialect)
      case "mysql" | "mariadb"       => Sql(MySqlDialect)
      case "clickhouse"              => Sql(ClickHouseDialect)
      case "sqlite"                  => Sql(SqliteDialect)
      case "oracle"                  => Sql(OracleDialect)
      case "snowflake"               => Sql(SnowflakeDialect)
      case "derby"                   => Sql(DerbyDialect)
      case "duckdb"                  => Sql(DuckDbDialect)
      // engine-to-engine: the remote speaks Spark SQL (a graft peer)
      case "spark" | "arrowhttp" | "flight" => Sql(SparkDialect)
      case "datafusion"              => Substrait
      case _                         => LocalExecution
    }

  def isSubstraitSource(sourceType: String): Boolean =
    route(sourceType) == Substrait

  def isLocalExecution(sourceType: String): Boolean =
    route(sourceType) == LocalExecution
}
