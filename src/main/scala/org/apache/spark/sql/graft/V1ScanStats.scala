package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{SupportsReportStatistics, V1Scan, Statistics => V2Statistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Spark's `V2ScanRelationPushDown` replaces every [[V1Scan]] with a
  * plain [[V1ScanWrapper]] for execution — and the wrapper implements
  * ONLY `Scan`, so a `SupportsReportStatistics` mix-in on the original
  * scan is silently dropped: `DataSourceV2ScanRelation.computeStats`
  * falls back to `defaultSizeInBytes` (Long.MaxValue). The consequence
  * at scale is severe and invisible: every catalog/DSv2 read of a
  * snapshot table looks infinitely large to the join planner, so a
  * 100 KB dimension joined through the catalog sort-merge-joins a
  * 100 TB fact instead of broadcasting (AQE may repair it at runtime,
  * but only after the first plan materializes both shuffle sides).
  *
  * This wrapper subclass restores the mix-in by delegating to the
  * wrapped scan; [[V1ScanStatsRule]] swaps it in post-pushdown. The
  * physical strategy still pattern-matches `V1ScanWrapper(...)` — a
  * subclass instance satisfies the companion extractor, so execution
  * is untouched. */
class StatsV1ScanWrapper(v1: V1Scan, handled: Seq[Filter],
                         ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()
  // inherited case-class equality would make this wrapper == the plain
  // one it replaces, and TreeNode.transformDown KEEPS the original node
  // when the rewrite compares equal — the replacement would be silently
  // dropped. Same-class equality preserves the swap (and keeps the
  // rule's idempotence guard meaningful).
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
  override def hashCode(): Int = 31 * super.hashCode() + 1
}

/** Post-pushdown rewrite: any stats-capable V1Scan that Spark wrapped
  * into a stats-less [[V1ScanWrapper]] gets the stats-forwarding
  * wrapper instead. Registered through `experimental.extraOptimizations`
  * (the "User Provided Optimizers" batch — the last one, safely after
  * `V2ScanRelationPushDown`) by [[GraftFunctions.register]], and through
  * the extensions class for configured sessions. Idempotent: the
  * replacement wrapper itself implements the mix-in, so it never
  * matches twice. */
object V1ScanStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case rel: DataSourceV2ScanRelation => rel.scan match {
      case w: V1ScanWrapper if !w.isInstanceOf[SupportsReportStatistics] &&
          w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
        rel.copy(scan =
          new StatsV1ScanWrapper(w.v1Scan, w.handledFilters, w.pushedDownOperators))
      case _ => rel
    }
  }
}
