package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Injects `LIMIT defaultLimit` at the root of any query that has no
  * aggregate, no distinct, and no explicit limit — stopping runaway fetches
  * from interactive/agent clients.
  *
  * Port of the reference's DefensiveLimitRule semantics
  * (/root/reference/crates/sql/src/optimizer/defensive_trace.rs:249-323,
  * default 1000 rows via crates/common/src/config.rs:20): a plan whose
  * root is already a Limit, or that aggregates (size-bounded output), or
  * that is a distinct, is left untouched; everything else is wrapped.
  *
  * At scale this is also a performance guard: an un-limited SELECT over a
  * 100 TB table becomes a `CollectLimitExec` that stops after the first
  * partitions instead of a full scan.
  */
final case class DefensiveLimitRule(defaultLimit: Int = 1000)
    extends Rule[LogicalPlan] {

  private def isBounded(plan: LogicalPlan): Boolean = plan match {
    case _: GlobalLimit | _: LocalLimit => true
    case _: Aggregate => true
    case _: Distinct => true
    case _: Deduplicate => true
    // descend through root nodes that don't change cardinality semantics
    case p: Project => isBounded(p.child)
    case s: Sort => isBounded(s.child)
    case s: SubqueryAlias => isBounded(s.child)
    case w: WithCTE => isBounded(w.plan)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (isBounded(plan)) plan
    else Limit(Literal(defaultLimit), plan)
}
