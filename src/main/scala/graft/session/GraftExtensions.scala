package graft.session

import graft.plans.RowPolicyRule
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions installer for the engine's Catalyst additions.
  * Use via `GraftSession.builder(...)` or
  * `spark.sql.extensions=graft.session.GraftExtensions`.
  *
  * Mirrors how the reference assembles its session: DataFusion defaults
  * plus custom rules registered at context build time
  * (/root/reference/crates/runtime/src/federation.rs:159-273).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // RLS + masking: resolution-stage rewrite reading the session-local
    // user policies installed by GraftSession.executeQuery
    e.injectResolutionRule(s =>
      RowPolicyRule(s.sessionState.sqlParser, () => RowPolicyRule.active()))
    // lazy Iceberg scan resolution: the query's own pushed-down filter
    // prunes the file inventory before the distributed scan is planned
    // (the reference provider's scan-time filter shape). Injected BEFORE
    // federation so its leaves are plain relations by the time the
    // federation walk runs.
    e.injectPreCBORule(s => graft.plans.IcebergPruneRule(s))
    // same-source subplan federation: after operator optimization
    // (filters/projects already placed), before V2 scan planning — the
    // reference's FederationOptimizerRule slot (federation.rs:226-240)
    e.injectPreCBORule(s => graft.plans.FederationRule(s))
  }
}
