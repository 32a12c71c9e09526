package graft.sql

/** Minimal SQL expression AST with deterministic rendering — the Scala
  * analogue of the sqlparser AST surface the reference's dialect layer
  * builds against (/root/reference/crates/sql/src/dialects/function_mapper.rs:6-18).
  * Rendering conventions match sqlparser's `Display`: `, ` between
  * function args, `(` only when a function has an argument list, binary
  * operators space-separated and unparenthesised unless wrapped in
  * [[SqlAst.Nested]].
  */
object SqlAst {

  sealed trait SqlExpr { def render: String }

  /** Unquoted identifier (or dot-compound), e.g. `SYSTIMESTAMP`,
    * `DBMS_RANDOM.VALUE`. */
  final case class RawIdent(parts: String*) extends SqlExpr {
    def render: String = parts.mkString(".")
  }

  /** Quoted, sanitized identifier path, e.g. `"rel_0"."id"`. */
  final case class QuotedIdent(quote: Char, parts: Seq[String]) extends SqlExpr {
    def render: String =
      parts.map(p => s"$quote${graft.util.Sanitize.validateIdentifier(p)}$quote")
        .mkString(".")
  }

  final case class StringLit(s: String,
      escape: String => String = StringLit.ansi) extends SqlExpr {
    def render: String = "'" + escape(s) + "'"
  }

  object StringLit {
    /** ANSI escaping: double single quotes. Dialects with additional
      * escape characters (MySQL backslashes) pass their own escaper. */
    val ansi: String => String = _.replace("'", "''")
  }

  final case class NumberLit(text: String) extends SqlExpr {
    def render: String = text
  }

  case object NullLit extends SqlExpr { def render: String = "NULL" }

  final case class BoolLit(b: Boolean) extends SqlExpr {
    def render: String = if (b) "TRUE" else "FALSE"
  }

  /** Bind-parameter placeholder, e.g. `$1` or `?`. */
  final case class Placeholder(text: String) extends SqlExpr {
    def render: String = text
  }

  /** Pre-rendered fragment (typed literals like `DATE '2024-01-15'`, `*`).
    * Only the generator itself constructs these — never from user input. */
  final case class RawSql(sql: String) extends SqlExpr {
    def render: String = sql
  }

  final case class Func(name: String, args: Seq[SqlExpr],
      distinct: Boolean = false,
      withinGroup: Seq[SortItem] = Nil,
      argless: Boolean = false) extends SqlExpr {
    def render: String = {
      val base =
        if (argless) name
        else {
          val d = if (distinct) "DISTINCT " else ""
          s"$name($d${args.map(_.render).mkString(", ")})"
        }
      if (withinGroup.isEmpty) base
      else s"$base WITHIN GROUP (ORDER BY ${withinGroup.map(_.render).mkString(", ")})"
    }
  }

  final case class BinOp(left: SqlExpr, op: String, right: SqlExpr) extends SqlExpr {
    def render: String = s"${left.render} $op ${right.render}"
  }

  final case class Nested(e: SqlExpr) extends SqlExpr {
    def render: String = s"(${e.render})"
  }

  final case class PrefixOp(op: String, e: SqlExpr) extends SqlExpr {
    def render: String = s"$op ${e.render}"
  }

  final case class PostfixOp(e: SqlExpr, op: String) extends SqlExpr {
    def render: String = s"${e.render} $op"
  }

  final case class CastExpr(e: SqlExpr, typeName: String) extends SqlExpr {
    def render: String = s"CAST(${e.render} AS $typeName)"
  }

  final case class ExtractExpr(field: String, source: SqlExpr) extends SqlExpr {
    def render: String = s"EXTRACT($field FROM ${source.render})"
  }

  final case class InList(e: SqlExpr, list: Seq[SqlExpr], negated: Boolean) extends SqlExpr {
    def render: String =
      s"${e.render} ${if (negated) "NOT IN" else "IN"} (${list.map(_.render).mkString(", ")})"
  }

  final case class LikeExpr(e: SqlExpr, pattern: SqlExpr, negated: Boolean,
      escape: Option[String] = None) extends SqlExpr {
    def render: String = {
      val esc = escape.map(c => s" ESCAPE '$c'").getOrElse("")
      s"${e.render} ${if (negated) "NOT LIKE" else "LIKE"} ${pattern.render}$esc"
    }
  }

  final case class Between(e: SqlExpr, lo: SqlExpr, hi: SqlExpr) extends SqlExpr {
    def render: String = s"${e.render} BETWEEN ${lo.render} AND ${hi.render}"
  }

  final case class CaseWhen(branches: Seq[(SqlExpr, SqlExpr)],
      otherwise: Option[SqlExpr]) extends SqlExpr {
    def render: String = {
      val whens = branches.map { case (c, v) => s"WHEN ${c.render} THEN ${v.render}" }
      val els = otherwise.map(e => s" ELSE ${e.render}").getOrElse("")
      s"CASE ${whens.mkString(" ")}$els END"
    }
  }

  final case class SortItem(e: SqlExpr, ascending: Boolean,
      nullsFirst: Option[Boolean]) extends SqlExpr {
    def render: String = {
      val dir = if (ascending) "ASC" else "DESC"
      val nulls = nullsFirst match {
        case Some(true)  => " NULLS FIRST"
        case Some(false) => " NULLS LAST"
        case None        => ""
      }
      s"${e.render} $dir$nulls"
    }
  }

  /** True if the expression tree contains a window application — such
    * expressions may appear in SELECT/ORDER BY but never WHERE/HAVING/
    * GROUP BY/aggregate arguments, so the generator nests a derived table
    * before referencing them there. */
  def containsWindow(e: SqlExpr): Boolean = e match {
    case _: OverWindow          => true
    case Func(_, args, _, wg, _) => args.exists(containsWindow) || wg.exists(containsWindow)
    case BinOp(l, _, r)         => containsWindow(l) || containsWindow(r)
    case Nested(x)              => containsWindow(x)
    case PrefixOp(_, x)         => containsWindow(x)
    case PostfixOp(x, _)        => containsWindow(x)
    case CastExpr(x, _)         => containsWindow(x)
    case ExtractExpr(_, x)      => containsWindow(x)
    case InList(x, list, _)     => containsWindow(x) || list.exists(containsWindow)
    case LikeExpr(x, p, _, _)   => containsWindow(x) || containsWindow(p)
    case Between(x, lo, hi)     => Seq(x, lo, hi).exists(containsWindow)
    case CaseWhen(bs, e2)       => bs.exists(b => containsWindow(b._1) || containsWindow(b._2)) || e2.exists(containsWindow)
    case SortItem(x, _, _)      => containsWindow(x)
    case _                      => false
  }

  final case class OverWindow(func: SqlExpr, partitionBy: Seq[SqlExpr],
      orderBy: Seq[SortItem], frame: Option[String]) extends SqlExpr {
    def render: String = {
      val parts = Seq(
        if (partitionBy.nonEmpty)
          Some(s"PARTITION BY ${partitionBy.map(_.render).mkString(", ")}")
        else None,
        if (orderBy.nonEmpty)
          Some(s"ORDER BY ${orderBy.map(_.render).mkString(", ")}")
        else None,
        frame
      ).flatten
      s"${func.render} OVER (${parts.mkString(" ")})"
    }
  }
}
