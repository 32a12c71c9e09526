package graft.sql

import SqlAst._

/** Declarative registry translating engine function names to
  * dialect-specific SQL — the reference's sqlglot-inspired mapper
  * (/root/reference/crates/sql/src/dialects/function_mapper.rs:38-148):
  * a rule is either a simple rename or a transform with access to the
  * already-translated argument expressions. `translate` returns None when
  * no rule exists (caller falls back to default `NAME(args)` rendering).
  */
final class FunctionMapper private (
    rules: Map[String, Either[String, Seq[SqlExpr] => SqlExpr]]) {

  /** Simple rename: "coalesce" → "NVL". */
  def rename(from: String, to: String): FunctionMapper =
    new FunctionMapper(rules + (from.toLowerCase -> Left(to)))

  /** Custom transform with access to arguments. */
  def transform(from: String)(f: Seq[SqlExpr] => SqlExpr): FunctionMapper =
    new FunctionMapper(rules + (from.toLowerCase -> Right(f)))

  def translate(func: String, args: Seq[SqlExpr]): Option[SqlExpr] =
    rules.get(func.toLowerCase).map {
      case Left(newName) => Func(newName, args)
      case Right(f)      => f(args)
    }

  def hasRule(func: String): Boolean = rules.contains(func.toLowerCase)
}

object FunctionMapper {
  val empty: FunctionMapper = new FunctionMapper(Map.empty)

  def buildFunc(name: String, args: Seq[SqlExpr]): SqlExpr = Func(name, args)
}
