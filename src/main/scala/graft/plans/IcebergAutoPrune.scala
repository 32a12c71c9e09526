package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

import graft.sources.iceberg.{IcebergPrune, IcebergRest, IcebergScanFiles, IcebergTableMeta}

/** Lazy Iceberg scan leaf: the registry registers THIS instead of an
  * eagerly-planned parquet read, and [[IcebergPruneRule]] resolves it
  * at optimization time — AFTER Spark has pushed the query's own
  * filters down to sit directly above the leaf. The query's predicate
  * then prunes the file inventory (partition tuples + column bounds,
  * [[graft.sources.iceberg.IcebergPrune]]) before the distributed scan
  * is planned: `spark.table("lake_orders").where("o_orderdate >= ...")`
  * opens one month's files with no explicit filter option anywhere —
  * the same pushed-filter-at-scan-time shape the reference's provider
  * implements (`crates/connectors/src/sources/iceberg/provider.rs:
  * 39-120`, DataFusion hands `TableProvider::scan` the filters).
  *
  * The inventory (manifest walk) is captured ONCE at registration;
  * per-query work is driver-side tuple/bound comparisons over file
  * COUNT — metadata, not data. Statistics report the live inventory's
  * byte size (from the manifests' `file_size_in_bytes`), so join
  * planning over registered lake tables sees real sizes.
  */
final case class IcebergScanPlan(
    label: String,
    meta: IcebergTableMeta,
    scan: IcebergScanFiles,
    options: Map[String, String],
    tableSchema: StructType,
    output: Seq[Attribute])
    extends LeafNode with MultiInstanceRelation {

  override def newInstance(): IcebergScanPlan =
    copy(output = output.map(_.newInstance()))

  override def computeStats(): Statistics = {
    val bytes = scan.dataEntries.map(_.sizeBytes).sum
    Statistics(sizeInBytes =
      if (bytes > 0) BigInt(bytes) else BigInt(conf.defaultSizeInBytes))
  }

  override def simpleString(maxFields: Int): String =
    s"IcebergScanPlan $label [${scan.dataFiles.size} files]"
}

/** Resolves every [[IcebergScanPlan]] leaf, pruning its file inventory
  * with the conjunction sitting directly above it (top-down, so the
  * `Filter(cond, leaf)` pair is seen before the bare leaf). Runs in the
  * Pre-CBO batch: the operator-optimization batch has already pushed
  * filters into place, and V2/V1 scan planning hasn't happened yet.
  * Replacement plans re-expose the leaf's original attribute ids via an
  * aliasing Project, so nothing upstream re-resolves. The pruner is
  * conservative (unresolvable conjuncts keep every file) and the
  * filter itself remains in the plan, so resolution can never change
  * results — only the set of files the scan opens. */
final case class IcebergPruneRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val has = (plan +: plan.subqueriesAll).exists(_.exists {
      case _: IcebergScanPlan => true
      case _ => false
    })
    if (!has) plan else rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = {
    val step = plan match {
      case f @ Filter(cond, rel: IcebergScanPlan) =>
        f.copy(child = resolveLeaf(rel, Some(cond)))
      // column pruning may slot a Project between the filter and the
      // leaf. Only the attribute-only shape qualifies: an ALIAS in the
      // projection could shadow a real column's name (e.g. a
      // non-deterministic expression the optimizer refused to push
      // through, renamed to `o_orderdate`), and name-based pruning
      // would then prune on the wrong values
      case f @ Filter(cond, p @ Project(projList, rel: IcebergScanPlan))
          if projList.forall(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.AttributeReference]) =>
        f.copy(child = p.copy(child = resolveLeaf(rel, Some(cond))))
      case rel: IcebergScanPlan => resolveLeaf(rel, None)
      case other => other.mapChildren(rewrite)
    }
    step.transformExpressions {
      case s: SubqueryExpression => s.withNewPlan(rewrite(s.plan))
    }
  }

  private def resolveLeaf(rel: IcebergScanPlan,
      cond: Option[Expression]): LogicalPlan = {
    val pruned = cond.fold(rel.scan)(c =>
      IcebergPrune.pruneExpr(rel.scan, rel.meta, rel.tableSchema, c))
    if (pruned.dataFiles.isEmpty) return LocalRelation(rel.output)
    val df = IcebergRest.readScan(spark, pruned, rel.meta, rel.options,
      Some(rel.tableSchema))
    val resolved = df.queryExecution.analyzed
    val byName = resolved.output.map(a => a.name -> a).toMap
    // re-expose the leaf's attribute ids: everything above the leaf
    // references them, and a replacement with fresh ids would unravel
    // the already-analyzed plan
    Project(rel.output.map { old =>
      Alias(byName.getOrElse(old.name, throw new IllegalStateException(
        s"auto-prune: column '${old.name}' of ${rel.label} lost in " +
          s"resolution (have ${resolved.output.map(_.name).mkString(", ")})")),
        old.name)(exprId = old.exprId, qualifier = old.qualifier,
        explicitMetadata = Some(old.metadata))
    }, resolved)
  }
}
