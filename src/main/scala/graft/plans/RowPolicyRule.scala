package graft.plans

import graft.session.{AuthenticatedUser, MaskingRule, TablePolicy}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Concat, Expression, Literal, NamedExpression, Sha2, Substring}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Row-level security + column masking, applied as a logical-plan rewrite.
  *
  * The reference carries `rules: Map<table, {rls_filter, masking}>` on the
  * authenticated user and injects them into the session
  * (/root/reference/crates/common/src/auth.rs:158-181,
  * config/policies.yaml:1-14). Here the same data model drives a
  * Catalyst rewrite: every relation/subquery-alias whose name matches a
  * governed table is wrapped in `Filter(parse(rls_filter))` and a
  * projection that replaces masked columns:
  *
  *   Redact       → 'MASKED' literal
  *   Hash         → sha2(col, 256)
  *   KeepFirst(n) → substring(col, 1, n) ++ '***'
  *   Default(s)   → s literal
  *
  * The rewrite happens BELOW any user expressions, so filters and
  * aggregates a user writes over a masked column see only masked data —
  * and because the RLS filter lands directly above the scan, Catalyst
  * pushes it into the parquet/JDBC source like any other predicate (at
  * 100 TB the policy filter prunes partitions instead of post-filtering).
  */
final case class RowPolicyRule(
    parser: ParserInterface,
    policies: () => Map[String, TablePolicy])
    extends Rule[LogicalPlan] {

  /** Fully-resolved mask expression over the child attribute (resolved
    * construction matters: transformUpWithNewOutput needs the new aliases'
    * exprIds immediately). */
  private def maskExpr(rule: MaskingRule, attr: Attribute): Expression = {
    def asString = Cast(attr, StringType)
    rule match {
      case MaskingRule.Redact => Literal("MASKED")
      // Sha2 takes BINARY; cast explicitly (no implicit-cast pass runs on
      // directly-constructed expressions)
      case MaskingRule.Hash => Sha2(Cast(asString, BinaryType), Literal(256))
      case MaskingRule.KeepFirst(n) =>
        Concat(Seq(Substring(asString, Literal(1), Literal(n)), Literal("***")))
      case MaskingRule.Default(v) => Literal(v)
    }
  }

  /** Wrap a resolved relation subtree with this table's policy. Masked
    * columns get FRESH exprIds (a masked projection that reused the
    * child's ids would look like an identity projection and be eliminated
    * by the optimizer); the returned mapping lets the analyzer rewrite
    * every ancestor reference to the new attributes. */
  private def applyPolicy(rel: LogicalPlan, policy: TablePolicy)
      : (LogicalPlan, Seq[(Attribute, Attribute)]) = {
    val filtered = policy.rlsFilter match {
      case Some(sql) => Filter(parser.parseExpression(sql), rel)
      case None => rel
    }
    if (policy.masking.isEmpty) (filtered, Nil)
    else {
      val aliased = filtered.output.map { attr =>
        policy.masking.get(attr.name) match {
          case Some(rule) =>
            val a = Alias(maskExpr(rule, attr), attr.name)()
            (a: NamedExpression, Some(attr -> a.toAttribute))
          case None => (attr: NamedExpression, None)
        }
      }
      (Project(aliased.map(_._1), filtered), aliased.flatMap(_._2))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rules = policies()
    // wait for full resolution: the new-output rewrite remaps ancestor
    // references, which requires every ancestor expression to be resolved;
    // the fixpoint analyzer re-runs this rule once that's true
    if (rules.isEmpty || !plan.resolved) plan
    else plan.resolveOperatorsUpWithNewOutput {
      // temp views resolve through SubqueryAlias(name, child); tag the
      // rewritten child with an inner alias so the fixpoint analyzer
      // doesn't rewrap on the next batch run
      case s @ SubqueryAlias(ident, child)
          if rules.contains(ident.name) && !alreadyGoverned(child) =>
        val (governed, mapping) = applyPolicy(child, rules(ident.name))
        (SubqueryAlias(s.identifier, SubqueryAlias(governedTag, governed)),
          mapping)
    }
  }

  private val governedTag = "__graft_governed"
  private def alreadyGoverned(p: LogicalPlan): Boolean = p match {
    case SubqueryAlias(id, _) => id.name == governedTag
    case _ => false
  }
}

object RowPolicyRule {
  /** Session-local policy store: the analyzer rule reads the policies for
    * the session's current user here (set by GraftSession.executeQuery). */
  private val current = new java.lang.ThreadLocal[Map[String, TablePolicy]] {
    override def initialValue(): Map[String, TablePolicy] = Map.empty
  }
  def setUser(user: AuthenticatedUser): Unit = current.set(user.rules)
  def clear(): Unit = current.remove()
  def active(): Map[String, TablePolicy] = current.get()
}
