package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{catalyst => cexpr}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

import SqlAst._

/** Catalyst `LogicalPlan` → dialect SQL text, for pushing federated
  * subplans to remote engines. The Spark-side analogue of the reference's
  * plan unparser (/root/reference/crates/sql/src/sql_generator/): the same
  * output conventions — systematic `rel_N` aliases for every relation
  * (translator/mod.rs scope contexts), sanitized quoted identifiers
  * everywhere (sanitize.rs), explicit column lists instead of `*`, a
  * recursion cap of 50 (translator/mod.rs:169), and scope-violation errors
  * that list the columns actually in scope (context.rs resolve_column).
  *
  * Architecture is Spark-first: rather than porting DataFusion's unparser,
  * plans fold bottom-up into mutable SELECT blocks; an operator merges
  * into its child's block when the corresponding SQL slot is still free
  * (Filter→WHERE/HAVING, Project→select list, Sort→ORDER BY, ...), and
  * otherwise the child nests as a derived table `(...) AS "rel_N"`.
  * Column references resolve by Catalyst `ExprId`, so generation is
  * immune to name shadowing — the reason the reference needed provenance
  * tracking in its scope stack.
  */
final class SqlGenerator(val dialect: SqlDialect,
    strict: Boolean = false) {

  private val MaxDepth = 50
  private var relCounter = 0
  private def nextRel(): String = { val a = s"rel_$relCounter"; relCounter += 1; a }

  private def q(parts: String*): QuotedIdent = QuotedIdent(dialect.identQuote, parts)

  /** One output column of a SELECT block: Catalyst id, exposed name, and
    * how to render it inside the block. */
  private case class Out(id: ExprId, name: String, expr: SqlExpr)

  /** A SELECT under assembly. `env` renders any in-scope ExprId; `out` is
    * the current output column list (order = plan output order). */
  private case class Sel(
      out: Seq[Out],
      env: Map[ExprId, SqlExpr],
      fromSql: String,
      joinable: Boolean,          // FROM is a plain join chain, extendable
      projected: Boolean = false, // select list explicitly set
      distinct: Boolean = false,
      where: Option[SqlExpr] = None,
      groupBy: Option[Seq[SqlExpr]] = None,
      having: Option[SqlExpr] = None,
      orderBy: Seq[SortItem] = Nil,
      limit: Option[SqlExpr] = None,
      offset: Option[SqlExpr] = None,
      verbatim: Option[String] = None, // set-op trees render as-is at top level
      volatileOut: Boolean = false, // select list has non-deterministic exprs
      hasWindow: Boolean = false // select list computes window functions
  ) {
    def untouched: Boolean = !projected && !distinct && where.isEmpty &&
      groupBy.isEmpty && having.isEmpty && orderBy.isEmpty &&
      limit.isEmpty && offset.isEmpty
  }

  // CTE registry: id → (name, declared column names); SQL accumulates in
  // definition order, `recursive` flips the WITH keyword.
  private val cteNames = scala.collection.mutable.Map.empty[Long, (String, Seq[String])]
  private val cteSqls = scala.collection.mutable.ArrayBuffer.empty[String]
  private var cteRecursive = false

  def generate(plan: LogicalPlan): String = {
    relCounter = 0
    cteNames.clear(); cteSqls.clear(); cteRecursive = false
    val body = render(build(plan, 0))
    if (cteSqls.isEmpty) body
    else s"WITH ${if (cteRecursive) "RECURSIVE " else ""}${cteSqls.mkString(", ")} $body"
  }

  // ------------------------------------------------------------- rendering

  private def render(s: Sel): String = s.verbatim match {
    case Some(sql) if s.untouched => sql
    case _ =>
      val items = s.out.map { o =>
        o.expr match {
          case qi: QuotedIdent if qi.parts.lastOption.contains(o.name) => qi.render
          case e => s"${e.render} AS ${q(o.name).render}"
        }
      }
      val sb = new StringBuilder("SELECT ")
      if (s.distinct) sb.append("DISTINCT ")
      sb.append(items.mkString(", "))
      if (s.fromSql.nonEmpty) sb.append(" FROM ").append(s.fromSql)
      s.where.foreach(w => sb.append(" WHERE ").append(w.render))
      s.groupBy.filter(_.nonEmpty).foreach(g =>
        sb.append(" GROUP BY ").append(g.map(_.render).mkString(", ")))
      s.having.foreach(h => sb.append(" HAVING ").append(h.render))
      if (s.orderBy.nonEmpty)
        sb.append(" ORDER BY ").append(s.orderBy.map(_.render).mkString(", "))
      sb.append(dialect.renderLimitOffset(s.limit.map(_.render), s.offset.map(_.render)))
      sb.toString
  }

  /** Nest a block as a derived table and re-expose its columns. */
  private def derive(s: Sel): Sel = {
    val alias = nextRel()
    val out = s.out.map(o => Out(o.id, o.name, q(alias, o.name)))
    Sel(out, out.map(o => o.id -> o.expr).toMap,
      s"(${render(s)}) AS ${q(alias).render}", joinable = true)
  }

  /** Nest a SORTED block and restate its ORDER BY on the outer block:
    * SQL gives no ordering guarantee for derived tables, so LIMIT/OFFSET
    * above one would otherwise pick engine-dependent rows. Requires every
    * sort key to be exposed by the inner select list. */
  private def deriveKeepingOrder(s0: Sel, node: String): Sel = {
    if (s0.orderBy.isEmpty) derive(s0)
    else {
      val byRender = s0.out.map(o => o.expr.render -> o.name).toMap
      val d = derive(s0)
      val alias = d.out.headOption.map(_.expr).collect {
        case QuotedIdent(_, parts) => parts.head
      }.getOrElse(throw SqlGenError(s"$node over an empty subquery"))
      val outer = s0.orderBy.map { si =>
        byRender.get(si.e.render) match {
          case Some(name) => si.copy(e = q(alias, name))
          case None => throw SqlGenError(
            s"$node above a sorted subquery whose sort key is not in its select list")
        }
      }
      d.copy(orderBy = outer)
    }
  }

  // ------------------------------------------------------------- plan fold

  private def build(plan: LogicalPlan, depth: Int): Sel = {
    if (depth > MaxDepth)
      throw SqlGenError(s"Maximum recursion depth ($MaxDepth) exceeded")
    plan match {

      // base table: an aliased leaf (temp view, catalog table, JDBC scan);
      // a CTE or recursive self-reference keeps its CTE name — user
      // aliases are systematic rel_N anyway
      case SubqueryAlias(ident, child) if isLeafish(child) =>
        leafOf(child) match {
          case Some(r: CTERelationRef) => build(r, depth + 1)
          case Some(lr: UnionLoopRef)  => build(lr, depth + 1)
          case _ => baseTable(ident.name, plan.output)
        }

      // user alias over something else: systematic aliases replace user
      // aliases (reference translator does the same with rel_N)
      case SubqueryAlias(_, child) =>
        val c = build(child, depth + 1)
        if (isBase(child)) c else derive(c)

      case View(_, _, child, _) => build(child, depth + 1)

      case Project(list, child) =>
        val c0 = build(child, depth + 1)
        val c = if (!c0.distinct && c0.orderBy.isEmpty && c0.limit.isEmpty &&
          c0.offset.isEmpty && !c0.volatileOut) c0 else derive(c0)
        val items = list.map(ne => namedOut(ne, c.env))
        // a non-deterministic item (random(), ...) must evaluate exactly
        // once: later operators may not re-render it outside a subquery
        c.copy(projected = true, out = items,
          env = c.env ++ items.map(o => o.id -> o.expr),
          volatileOut = c.volatileOut || list.exists(!_.deterministic),
          hasWindow = c.hasWindow && items.exists(i => SqlAst.containsWindow(i.expr)))

      case Filter(cond, child) =>
        val c0 = build(child, depth + 1)
        lazy val e0 = expr(cond, c0.env, "Filter")
        if (c0.groupBy.isDefined && c0.having.isEmpty && c0.orderBy.isEmpty &&
            c0.limit.isEmpty && c0.offset.isEmpty && !c0.distinct &&
            !c0.volatileOut && !c0.hasWindow && !SqlAst.containsWindow(e0)) {
          c0.copy(having = Some(e0))
        } else {
          // never merge into a window-computing SELECT: SQL evaluates
          // WHERE before window functions, Spark filters AFTER the window
          // is computed over all rows — merging silently renumbers
          val mergeable = !c0.distinct && c0.orderBy.isEmpty &&
            c0.limit.isEmpty && c0.offset.isEmpty && c0.groupBy.isEmpty &&
            !c0.volatileOut && !c0.hasWindow && !SqlAst.containsWindow(e0)
          val c = if (mergeable) c0 else derive(c0)
          val e = expr(cond, c.env, "Filter")
          c.copy(where = Some(c.where.map(w => BinOp(w, "AND", e)).getOrElse(e)))
        }

      case Aggregate(grouping, aggs, child, _) =>
        if (grouping.exists(_.exists(_.isInstanceOf[BaseGroupingSets])))
          throw SqlGenError("GROUPING SETS / ROLLUP / CUBE cannot be pushed to a remote SQL source")
        val c0 = build(child, depth + 1)
        val c1 = if (!c0.distinct && c0.groupBy.isEmpty && c0.orderBy.isEmpty &&
          c0.limit.isEmpty && c0.offset.isEmpty && !c0.volatileOut) c0 else derive(c0)
        // aggregating a window column requires the window in a subquery
        val c = if ((aggs.map(ne => namedOut(ne, c1.env).expr) ++
            grouping.map(g => expr(g, c1.env, "Aggregate")))
            .exists(SqlAst.containsWindow)) derive(c1) else c1
        val items = aggs.map(ne => namedOut(ne, c.env))
        c.copy(projected = true, out = items,
          groupBy = Some(grouping.map(g => expr(g, c.env, "Aggregate"))),
          env = c.env ++ items.map(o => o.id -> o.expr),
          volatileOut = aggs.exists(!_.deterministic))

      case w: Window =>
        val c0 = build(w.child, depth + 1)
        // !hasWindow: a second Window referencing the first's output would
        // otherwise render SUM(ROW_NUMBER() OVER ...) OVER ... — illegal
        val c = if (!c0.distinct && c0.orderBy.isEmpty && c0.limit.isEmpty &&
          c0.offset.isEmpty && c0.having.isEmpty && !c0.volatileOut &&
          !c0.hasWindow) c0 else derive(c0)
        val passthrough = w.child.output.map(a =>
          Out(a.exprId, a.name, expr(a, c.env, "Window")))
        val winItems = w.windowExpressions.map(ne => namedOut(ne, c.env))
        val items = passthrough ++ winItems
        c.copy(projected = true, out = items,
          env = c.env ++ items.map(o => o.id -> o.expr), hasWindow = true,
          volatileOut = c.volatileOut || w.windowExpressions.exists(!_.deterministic))

      case Sort(order, true, child, _) =>
        val c0 = build(child, depth + 1)
        val c = if (c0.orderBy.isEmpty && c0.limit.isEmpty && c0.offset.isEmpty &&
          !c0.volatileOut) c0 else derive(c0)
        c.copy(orderBy = order.map(sortItem(_, c.env)))

      case Sort(_, false, _, _) =>
        throw SqlGenError("sortWithinPartitions has no SQL equivalent")

      case GlobalLimit(l, child) =>
        val c0 = build(child, depth + 1)
        val c = if (c0.limit.isEmpty) c0 else deriveKeepingOrder(c0, "LIMIT")
        c.copy(limit = Some(expr(l, c.env, "Limit")))

      case LocalLimit(_, child) => build(child, depth + 1)

      case Offset(o, child) =>
        val c0 = build(child, depth + 1)
        if (c0.offset.isEmpty && c0.limit.isEmpty)
          c0.copy(offset = Some(expr(o, c0.env, "Offset")))
        else (o, c0.limit) match {
          // Spark's Offset(o, Limit(l)) takes l rows THEN skips o; SQL
          // applies OFFSET before the fetch — fold to OFFSET o LIMIT l-o
          // so the ORDER BY stays in the same (governing) block
          case (Literal(ov: Int, IntegerType), Some(NumberLit(lt)))
              if c0.offset.isEmpty && lt.forall(_.isDigit) =>
            val remaining = math.max(lt.toLong - ov, 0L)
            c0.copy(offset = Some(NumberLit(ov.toString)),
              limit = Some(NumberLit(remaining.toString)))
          case _ =>
            val c = deriveKeepingOrder(c0, "OFFSET")
            c.copy(offset = Some(expr(o, c.env, "Offset")))
        }

      case Distinct(child) => distinctOf(child, depth)

      case d: Deduplicate =>
        val allOut = d.child.output.map(_.exprId).toSet
        if (d.keys.map(_.exprId).toSet != allOut)
          throw SqlGenError("dropDuplicates on a key subset has no direct SQL form; project first")
        distinctOf(d.child, depth)

      case u: Union => setOp(u.children, "UNION ALL", depth, u.output)

      case i: Intersect =>
        setOp(Seq(i.left, i.right),
          if (i.isAll) "INTERSECT ALL" else "INTERSECT", depth, i.output)

      case e: Except =>
        setOp(Seq(e.left, e.right),
          if (e.isAll) "EXCEPT ALL" else "EXCEPT", depth, e.output)

      case j: Join => join(j, depth)

      case lr: LocalRelation => localRelation(lr)

      case _: OneRowRelation =>
        Sel(Nil, Map.empty,
          fromSql = if (dialect.requiresFromDual) "DUAL" else "",
          joinable = false)

      // WITH ... AS (...): register each definition, then build the main
      // plan; refs render as named relations (reference translator CTE
      // scopes, set_ops.rs recursive path)
      case wc: WithCTE =>
        wc.cteDefs.foreach {
          case d: CTERelationDef => registerCte(d, depth)
          case other => throw SqlGenError(s"unexpected CTE def ${other.nodeName}")
        }
        build(wc.plan, depth + 1)

      case r: CTERelationRef =>
        val (name, cols) = cteNames.getOrElse(r.cteId,
          throw SqlGenError(s"unresolved CTE reference ${r.cteId}"))
        namedRelation(name, r.output, cols)

      case lr: UnionLoopRef =>
        val (name, cols) = cteNames.getOrElse(lr.loopId,
          throw SqlGenError(s"recursive self-reference outside its CTE (loop ${lr.loopId})"))
        namedRelation(name, lr.output, cols)

      case other =>
        throw SqlGenError(
          s"unsupported operator for remote SQL generation: ${other.nodeName}")
    }
  }

  /** A named relation (CTE or recursive self-reference) exposed under a
    * fresh rel alias; the ref's fresh ExprIds map positionally onto the
    * declared column names. */
  private def namedRelation(name: String, refOutput: Seq[Attribute],
      cols: Seq[String]): Sel = {
    val alias = nextRel()
    val out = refOutput.zip(cols).map { case (a, c) => Out(a.exprId, c, q(alias, c)) }
    Sel(out, out.map(o => o.id -> o.expr).toMap,
      s"${q(name).render} AS ${q(alias).render}", joinable = true)
  }

  private def registerCte(d: CTERelationDef, depth: Int): Unit = {
    val (name, inner) = d.child match {
      case SubqueryAlias(ident, c) => (ident.name, c)
      case c                       => (s"cte_${d.id}", c)
    }
    val declared = d.output.map(_.name)
    // recursive definitions contain a UnionLoop under optional renames
    findUnionLoop(inner) match {
      case Some(loop) =>
        cteRecursive = true
        cteNames(d.id) = (name, declared)
        cteNames(loop.id) = (name, declared) // UnionLoopRef keys on loop id
        val anchor = renameOut(build(loop.anchor, depth + 1), declared)
        val rec = renameOut(build(loop.recursion, depth + 1), declared)
        val colList = declared.map(c => q(c).render).mkString(", ")
        cteSqls += s"${q(name).render} ($colList) AS (${render(anchor)} UNION ALL ${render(rec)})"
      case None =>
        val sel = build(inner, depth + 1)
        cteNames(d.id) = (name, sel.out.map(_.name))
        cteSqls += s"${q(name).render} AS (${render(sel)})"
    }
  }

  /** Force a block's output names positionally (CTE column lists name the
    * columns; branch-local names like `(i + 1)` are not identifiers). */
  private def renameOut(s: Sel, names: Seq[String]): Sel =
    s.copy(out = s.out.zip(names).map { case (o, n) => o.copy(name = n) },
      projected = true)

  private def findUnionLoop(p: LogicalPlan): Option[UnionLoop] = p match {
    case ul: UnionLoop          => Some(ul)
    case Project(_, c)          => findUnionLoop(c)
    case SubqueryAlias(_, c)    => findUnionLoop(c)
    case _                      => None
  }

  private def distinctOf(child: LogicalPlan, depth: Int): Sel = child match {
    case u: Union => setOp(u.children, "UNION", depth, u.output)
    case _ =>
      val c0 = build(child, depth + 1)
      val c = if (c0.untouched || (c0.projected && c0.where.isEmpty &&
        c0.groupBy.isEmpty && c0.orderBy.isEmpty && c0.limit.isEmpty &&
        c0.offset.isEmpty && !c0.distinct)) c0
      else if (!c0.distinct && c0.orderBy.isEmpty && c0.limit.isEmpty &&
        c0.offset.isEmpty) c0
      else derive(c0)
      c.copy(distinct = true)
  }

  private def setOp(children: Seq[LogicalPlan], op: String, depth: Int,
      output: Seq[Attribute]): Sel = {
    val parts = children.map { c =>
      val sel = build(c, depth + 1)
      // a branch with ORDER BY / LIMIT / OFFSET (or a nested set-op) must
      // become SELECT ... FROM (branch) — bare concatenation with the
      // set operator is a syntax error on Postgres/Derby
      val wrapped =
        if (sel.orderBy.nonEmpty || sel.limit.isDefined ||
          sel.offset.isDefined || sel.verbatim.isDefined) derive(sel) else sel
      render(wrapped)
    }
    val sql = parts.mkString(s" $op ")
    val alias = nextRel()
    val out = output.map(a => Out(a.exprId, a.name, q(alias, a.name)))
    Sel(out, out.map(o => o.id -> o.expr).toMap,
      s"($sql) AS ${q(alias).render}", joinable = true,
      verbatim = Some(sql))
  }

  private def join(j: Join, depth: Int): Sel = {
    val kw = j.joinType match {
      case Inner      => "INNER JOIN"
      case LeftOuter  => "LEFT OUTER JOIN"
      case RightOuter => "RIGHT OUTER JOIN"
      case FullOuter  => "FULL OUTER JOIN"
      case Cross      => "CROSS JOIN"
      case other =>
        throw SqlGenError(s"join type $other cannot be rendered as SQL text")
    }
    val l0 = build(j.left, depth + 1)
    val left = if (l0.joinable && l0.untouched) l0 else derive(l0)
    val r0 = build(j.right, depth + 1)
    val right = if (r0.joinable && r0.untouched && !r0.fromSql.contains(" JOIN "))
      r0 else derive(r0)
    val env = left.env ++ right.env
    val on = j.condition.map(c => s" ON ${expr(c, env, "Join").render}").getOrElse {
      if (j.joinType == Cross) "" else " ON TRUE"
    }
    val out = left.out ++ right.out
    Sel(out, env, s"${left.fromSql} $kw ${right.fromSql}$on", joinable = true)
  }

  private def baseTable(name: String, output: Seq[Attribute]): Sel = {
    val alias = nextRel()
    val out = output.map(a => Out(a.exprId, a.name, q(alias, a.name)))
    Sel(out, out.map(o => o.id -> o.expr).toMap,
      s"${q(name).render} AS ${q(alias).render}", joinable = true)
  }

  private def localRelation(lr: LocalRelation): Sel = {
    val alias = nextRel()
    if (lr.data.isEmpty) {
      // reference renders empty relations as SELECT NULL ... WHERE 1 = 0
      // (translator/scan.rs EmptyRelation path)
      val out =
        if (lr.output.isEmpty) Seq(Out(ExprId(-1L), "dummy", NullLit))
        else lr.output.map(a => Out(a.exprId, a.name, NullLit))
      Sel(out, out.map(o => o.id -> o.expr).toMap,
        fromSql = if (dialect.requiresFromDual) "DUAL" else "",
        joinable = false, projected = true,
        where = Some(BinOp(NumberLit("1"), "=", NumberLit("0"))))
    } else if (dialect.supportsValuesClause) {
      val rows = lr.data.map { row =>
        lr.output.indices.map { i =>
          literal(Literal(row.get(i, lr.output(i).dataType), lr.output(i).dataType))
            .render
        }.mkString("(", ", ", ")")
      }
      val cols = lr.output.map(a => q(a.name).render).mkString(", ")
      val out = lr.output.map(a => Out(a.exprId, a.name, q(alias, a.name)))
      Sel(out, out.map(o => o.id -> o.expr).toMap,
        s"(VALUES ${rows.mkString(", ")}) AS ${q(alias).render} ($cols)",
        joinable = true)
    } else {
      // Oracle: VALUES is not supported — SELECT ... FROM DUAL UNION ALL ...
      // (dialects/oracle.rs:300-305 requires_from_dual)
      val selects = lr.data.map { row =>
        val items = lr.output.zipWithIndex.map { case (a, i) =>
          s"${literal(Literal(row.get(i, a.dataType), a.dataType)).render} AS ${q(a.name).render}"
        }
        s"SELECT ${items.mkString(", ")} FROM DUAL"
      }
      val out = lr.output.map(a => Out(a.exprId, a.name, q(alias, a.name)))
      Sel(out, out.map(o => o.id -> o.expr).toMap,
        s"(${selects.mkString(" UNION ALL ")}) AS ${q(alias).render}",
        joinable = true)
    }
  }

  private def isBase(p: LogicalPlan): Boolean = p match {
    case SubqueryAlias(_, child) => isLeafish(child)
    case View(_, _, child, _)    => isBase(child)
    case _                       => false
  }

  private def isLeafish(p: LogicalPlan): Boolean = p match {
    case _: View           => true
    case SubqueryAlias(_, c) => isLeafish(c)
    case _: LeafNode       => true
    case _                 => false
  }

  private def leafOf(p: LogicalPlan): Option[LogicalPlan] = p match {
    case SubqueryAlias(_, c) => leafOf(c)
    case v: View             => Some(v)
    case leaf: LeafNode      => Some(leaf)
    case _                   => None
  }

  // ------------------------------------------------------- expressions

  private def namedOut(ne: NamedExpression, env: Map[ExprId, SqlExpr]): Out =
    ne match {
      case Alias(child, name) => Out(ne.exprId, name, expr(child, env, "Projection"))
      case a: AttributeReference => Out(a.exprId, a.name, expr(a, env, "Projection"))
      case other => Out(other.exprId, other.name, expr(other, env, "Projection"))
    }

  private def sortItem(so: SortOrder, env: Map[ExprId, SqlExpr]): SortItem = {
    val nulls =
      if (!dialect.supportsNullsFirstInSort) None
      else Some(so.nullOrdering == NullsFirst)
    SortItem(expr(so.child, env, "Sort"), so.direction == Ascending, nulls)
  }

  private def scopeError(a: Attribute, env: Map[ExprId, SqlExpr], node: String): Nothing = {
    val available = env.values.collect { case qi: QuotedIdent =>
      qi.parts.map(p => p).mkString(".")
    }.toSeq.sorted.mkString(", ")
    throw SqlGenError(
      s"Column '${a.name}' not found in scope for $node. Available: $available")
  }

  private[sql] def expr(e: Expression, env: Map[ExprId, SqlExpr],
      node: String): SqlExpr = {
    def t(x: Expression): SqlExpr = expr(x, env, node)
    def binop(l: Expression, op: String, r: Expression): SqlExpr = {
      def side(x: Expression): SqlExpr = t(x) match {
        case b: BinOp => Nested(b)
        case other    => other
      }
      BinOp(side(l), op, side(r))
    }
    e match {
      case a: AttributeReference =>
        env.getOrElse(a.exprId, scopeError(a, env, node))
      case Alias(child, _) => t(child)
      case l: Literal      => literal(l)

      // fold analyzer-inserted numeric widening casts of literals — the
      // reference unparses optimizer output where these are already folded
      case Cast(l: Literal, dt, _, _) if isNumeric(l.dataType) && isNumeric(dt) =>
        literal(l)
      case c: Cast => CastExpr(t(c.child), dialect.typeName(c.dataType))

      case Add(l, r, _)       => binop(l, "+", r)
      case Subtract(l, r, _)  => binop(l, "-", r)
      case Multiply(l, r, _)  => binop(l, "*", r)
      case Divide(l, r, _)    => binop(l, "/", r)
      case Remainder(l, r, _) => binop(l, "%", r)
      case UnaryMinus(c, _)   => PrefixOp("-", t(c))

      case EqualTo(l, r)            => binop(l, "=", r)
      case LessThan(l, r)           => binop(l, "<", r)
      case LessThanOrEqual(l, r)    => binop(l, "<=", r)
      case GreaterThan(l, r)        => binop(l, ">", r)
      case GreaterThanOrEqual(l, r) => binop(l, ">=", r)
      case EqualNullSafe(l, r)      => dialect.nullSafeEq(t(l), t(r))
      case Not(EqualTo(l, r))       => binop(l, "<>", r)
      case Not(In(v, list))         => InList(t(v), list.map(t), negated = true)
      case Not(l: Like)             => likeOf(l, env, node, negated = true)
      case Not(c)                   => PrefixOp("NOT", Nested(t(c)))
      case And(l, r)                => BinOp(nestIfOr(t(l)), "AND", nestIfOr(t(r)))
      case Or(l, r)                 => BinOp(t(l), "OR", t(r))
      case IsNull(c)                => PostfixOp(t(c), "IS NULL")
      case IsNotNull(c)             => PostfixOp(t(c), "IS NOT NULL")
      case In(v, list)              => InList(t(v), list.map(t), negated = false)
      case l: Like                  => likeOf(l, env, node, negated = false)

      case Contains(l, Literal(null, StringType)) =>
        LikeExpr(t(l), NullLit, negated = false)
      case StartsWith(l, Literal(null, StringType)) =>
        LikeExpr(t(l), NullLit, negated = false)
      case EndsWith(l, Literal(null, StringType)) =>
        LikeExpr(t(l), NullLit, negated = false)
      case Contains(l, Literal(p, StringType)) =>
        substringMatch(t(l), String.valueOf(p), "%", "%")
      case StartsWith(l, Literal(p, StringType)) =>
        substringMatch(t(l), String.valueOf(p), "", "%")
      case EndsWith(l, Literal(p, StringType)) =>
        substringMatch(t(l), String.valueOf(p), "%", "")

      case cexpr.expressions.CaseWhen(branches, elseValue) =>
        SqlAst.CaseWhen(branches.map { case (c, v) => (t(c), t(v)) },
          elseValue.map(t))
      case If(p, tr, fa) =>
        SqlAst.CaseWhen(Seq((t(p), t(tr))), Some(t(fa)))

      case agg: AggregateExpression => aggregate(agg, env, node)
      case we: WindowExpression     => window(we, env, node)

      // uncorrelated subquery expressions render inline; correlated ones
      // would need the enclosing scope pushed into the subplan — refused,
      // matching the reference unparser's surface
      case sq: ScalarSubquery =>
        requireUncorrelated(sq.outerAttrs, "scalar subquery")
        Nested(RawSql(render(build(sq.plan, MaxDepth - 10))))
      case ex: Exists =>
        requireUncorrelated(ex.outerAttrs, "EXISTS subquery")
        RawSql(s"EXISTS (${render(build(ex.plan, MaxDepth - 10))})")
      case in: InSubquery =>
        requireUncorrelated(in.query.outerAttrs, "IN subquery")
        val v = in.values.map(t) match {
          case Seq(single) => single
          case many => Nested(RawSql(many.map(_.render).mkString(", ")))
        }
        BinOp(v, "IN", Nested(RawSql(render(build(in.query.plan, MaxDepth - 10)))))

      case fn => function(fn, env, node)
    }
  }

  private def requireUncorrelated(outer: Seq[Expression], what: String): Unit =
    if (outer.nonEmpty)
      throw SqlGenError(s"correlated $what cannot be rendered as standalone SQL")

  private def isNumeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType => true
    case _ => false
  }

  /** User LIKE: emit the pattern as-is; add an ESCAPE clause only when the
    * literal pattern actually contains the escape character. */
  private def likeOf(l: Like, env: Map[ExprId, SqlExpr], node: String,
      negated: Boolean): SqlExpr = {
    val esc = l.right match {
      case Literal(p, StringType) if p != null &&
        !String.valueOf(p).contains(l.escapeChar) => None
      case _ => Some(dialect.escapeStringContent(l.escapeChar.toString))
    }
    LikeExpr(expr(l.left, env, node), expr(l.right, env, node), negated, esc)
  }

  /** Contains/StartsWith/EndsWith → LIKE with %/_/\ escaped in the raw
    * value and an explicit ESCAPE clause whenever escaping was applied —
    * without it, engines with no default escape character (Derby, Oracle)
    * would match the backslashes literally. */
  private def substringMatch(e: SqlExpr, raw: String, prefix: String,
      suffix: String): SqlExpr = {
    val escaped = likeEscape(raw)
    val esc = if (escaped != raw) Some(dialect.escapeStringContent("\\")) else None
    LikeExpr(e,
      StringLit(prefix + escaped + suffix, dialect.escapeStringContent),
      negated = false, esc)
  }

  private def nestIfOr(e: SqlExpr): SqlExpr = e match {
    case b @ BinOp(_, "OR", _) => Nested(b)
    case other                 => other
  }

  private def likeEscape(s: String): String =
    s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

  private def literal(l: Literal): SqlExpr = l.value match {
    case null => NullLit
    case v => l.dataType match {
      case StringType  => StringLit(v.toString, dialect.escapeStringContent)
      case BooleanType => BoolLit(v.asInstanceOf[Boolean])
      case DateType =>
        RawSql(s"DATE '${java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)}'")
      case _: TimestampType =>
        val micros = v.asInstanceOf[Long]
        val inst = java.time.Instant.EPOCH.plus(micros, java.time.temporal.ChronoUnit.MICROS)
        RawSql(s"TIMESTAMP '${inst.toString.replace("T", " ").stripSuffix("Z")}'")
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType => NumberLit(v.toString)
      case other =>
        throw SqlGenError(s"cannot render literal of type $other as SQL")
    }
  }

  /** Engine-facing function name for a Catalyst expression — the names the
    * reference's FunctionMapper rules key on (DataFusion spellings). */
  /** Functions VETTED to exist (or be mapper-translated) across the SQL
    * dialects; anything else renders `PRETTYNAME(args)` only in lenient
    * mode. Strict mode (automatic federation) refuses un-vetted,
    * un-mapped functions — shipping a Spark-only function would turn a
    * locally-runnable query into a remote runtime error. */
  private def vettedName(e: Expression): Option[String] = Some(e).collect {
    case _: Coalesce          => "coalesce"
    case _: NullIf            => "nullif"
    case _: Nvl               => "ifnull"
    case _: Length            => "length"
    case _: Substring         => "substring"
    case _: Upper             => "upper"
    case _: Lower             => "lower"
    case _: StringTrim        => "trim"
    case _: StringTrimLeft    => "ltrim"
    case _: StringTrimRight   => "rtrim"
    case _: Concat            => "concat"
    case _: ConcatWs          => "concat_ws"
    case _: StringInstr       => "strpos"
    case _: RegExpReplace     => "regexp_replace"
    case _: RLike             => "regexp_like"
    case _: Abs               => "abs"
    case _: Ceil              => "ceil"
    case _: Floor             => "floor"
    case _: Round             => "round"
    case _: Pow               => "power"
    case _: Sqrt              => "sqrt"
    case _: Rand              => "random"
    case _: CurrentTimestamp  => "current_timestamp"
    case _: Now               => "now"
    case _: CurrentDate       => "current_date"
    case _: ParseToDate       => "to_date"
    case _: ParseToTimestamp  => "to_timestamp"
    case _: FromUnixTime      => "from_unixtime"
  }

  private def function(fn: Expression, env: Map[ExprId, SqlExpr],
      node: String): SqlExpr = {
    val vetted = vettedName(fn)
    val name = vetted.getOrElse(fn.prettyName)
    val args = fn match {
      case _: Rand => Nil // Spark's internal seed literal is not SQL surface
      case _       => fn.children.map(expr(_, env, node))
    }
    dialect.mapper.translate(name, args).getOrElse {
      if (strict && vetted.isEmpty)
        throw SqlGenError(
          s"function '$name' is not in the federation-safe set for " +
            s"${dialect.name} — keeping the subtree local")
      if (!name.matches("[A-Za-z_][A-Za-z0-9_]*"))
        throw SqlGenError(
          s"expression ${fn.getClass.getSimpleName} ('$name') has no SQL rendering")
      Func(name.toUpperCase, args)
    }
  }

  private def aggregate(agg: AggregateExpression, env: Map[ExprId, SqlExpr],
      node: String): SqlExpr = {
    val (name, args) = agg.aggregateFunction match {
      case Count(Seq(Literal(1, IntegerType))) => ("count", Seq(RawSql("*")))
      case c: Count       => ("count", c.children.map(expr(_, env, node)))
      case s: Sum         => ("sum", Seq(expr(s.child, env, node)))
      case m: Min         => ("min", Seq(expr(m.child, env, node)))
      case m: Max         => ("max", Seq(expr(m.child, env, node)))
      case a: Average =>
        val arg = expr(a.child, env, node)
        // Spark's avg over integers is fractional; standard-typed AVG
        // (Derby) would truncate — widen the argument remotely
        val integral = a.child.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        val widened =
          if (dialect.integralAvgTruncates && integral)
            CastExpr(arg, dialect.typeName(DoubleType))
          else arg
        ("avg", Seq(widened))
      case l: ListAgg     => ("string_agg", l.children.map(expr(_, env, node)))
      case c: CollectList => ("array_agg", Seq(expr(c.child, env, node)))
      case other =>
        throw SqlGenError(s"aggregate ${other.prettyName} cannot be pushed to SQL")
    }
    val base = dialect.mapper.translate(name, args)
      .getOrElse(Func(name.toUpperCase, args))
    (base, agg.isDistinct) match {
      case (f: Func, true) => f.copy(distinct = true)
      case (b, _)          => b
    }
  }

  private def window(we: WindowExpression, env: Map[ExprId, SqlExpr],
      node: String): SqlExpr = {
    val spec = we.windowSpec
    val (fnSql, rankLike) = we.windowFunction match {
      case _: RowNumber  => (Func("ROW_NUMBER", Nil), true)
      case _: Rank       => (Func("RANK", Nil), true)
      case _: DenseRank  => (Func("DENSE_RANK", Nil), true)
      case nt: NTile     => (Func("NTILE", Seq(expr(nt.buckets, env, node))), true)
      case lg: Lag =>
        (Func("LAG", Seq(expr(lg.input, env, node), expr(lg.offset, env, node),
          expr(lg.default, env, node))), true)
      case ld: Lead =>
        (Func("LEAD", Seq(expr(ld.input, env, node), expr(ld.offset, env, node),
          expr(ld.default, env, node))), true)
      case agg: AggregateExpression => (aggregate(agg, env, node), false)
      case other =>
        throw SqlGenError(s"window function ${other.prettyName} cannot be pushed to SQL")
    }
    val frame = spec.frameSpecification match {
      case _ if rankLike => None // rank-family frames are implicit
      case SpecifiedWindowFrame(frameType, lower, upper) =>
        val unit = frameType match {
          case RowFrame   => "ROWS"
          case RangeFrame => "RANGE"
        }
        Some(s"$unit BETWEEN ${frameBound(lower, isLower = true)} AND ${frameBound(upper, isLower = false)}")
      case UnspecifiedFrame => None
    }
    OverWindow(fnSql, spec.partitionSpec.map(expr(_, env, node)),
      spec.orderSpec.map(sortItem(_, env)), frame)
  }

  private def frameBound(e: Expression, isLower: Boolean): String = e match {
    case UnboundedPreceding => "UNBOUNDED PRECEDING"
    case UnboundedFollowing => "UNBOUNDED FOLLOWING"
    case CurrentRow         => "CURRENT ROW"
    case Literal(v, _) =>
      val n = v.toString.toLong
      if (n == 0) "CURRENT ROW"
      else if (n < 0) s"${-n} PRECEDING"
      else s"$n FOLLOWING"
    case other => throw SqlGenError(s"window frame bound $other not renderable")
  }
}

/** Entry point mirroring the reference's `get_sql_for_plan`
  * (/root/reference/crates/sql/src/sql_gen.rs:23-80): route the source
  * type, return None for unknown sources (caller executes locally), and
  * refuse Substrait-tier sources, which transmit binary plans instead of
  * SQL text.
  */
object GraftSqlGen {
  import DialectRouter._

  def forPlan(plan: LogicalPlan, sourceType: String,
      strict: Boolean = false): Option[String] =
    route(sourceType) match {
      case Sql(d)    => Some(new SqlGenerator(d, strict).generate(plan))
      case Substrait =>
        throw SqlGenError(
          s"Source '$sourceType' uses Substrait plan transmission, not SQL text")
      case LocalExecution => None
    }

  def forDataFrame(df: DataFrame, sourceType: String): Option[String] =
    forPlan(df.queryExecution.analyzed, sourceType)

  /** Binary-plan twin of forPlan for Substrait-tier sources — the path
    * the reference reserves for DuckDB's `from_substrait(?)`
    * (substrait_producer.rs:14-21, sources/sql/duckdb.rs:44-110).
    * Some(plan bytes) when the source speaks Substrait, None otherwise
    * (SQL-tier sources keep their text path, unknown sources run
    * locally). Encoding is Acero-verified by SubstraitExecSpec. */
  def substraitForPlan(plan: LogicalPlan, sourceType: String): Option[Array[Byte]] =
    route(sourceType) match {
      case Substrait =>
        Some(graft.sql.substrait.SubstraitProducer.produce(plan))
      case _ => None
    }

  def substraitForDataFrame(df: DataFrame, sourceType: String): Option[Array[Byte]] =
    substraitForPlan(df.queryExecution.analyzed, sourceType)
}
