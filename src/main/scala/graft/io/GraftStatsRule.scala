package graft.io

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{SupportsReportStatistics, V1Scan, Statistics => V2Statistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** [[V1ScanWrapper]] that FORWARDS its inner scan's statistics (X250).
  *
  * Spark's V2 pushdown wraps every [[V1Scan]] in a plain
  * `V1ScanWrapper`, and `DataSourceV2ScanRelation.computeStats` type-
  * checks THE WRAPPER for [[SupportsReportStatistics]] — so a V1-
  * bridged scan's manifest-served stats ([[GraftScan]]) are invisible
  * to the join planner and every catalog table sizes as
  * `defaultSizeInBytes` ("huge", never broadcast). This subclass is
  * the V1ScanWrapper it already is, plus the one interface the stats
  * probe looks for; [[GraftStatsRule]] swaps it in post-pushdown. */
private[io] class GraftV1StatsWrapper(
    v1: V1Scan, handled: Seq[Filter], ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // V1ScanWrapper is a case class, so the inherited Product equality
  // would make this wrapper EQUAL to the plain one it replaces — and
  // TreeNode.transformDown drops a rewrite whose result equals the
  // original, silently undoing the swap. Equality is therefore
  // type-strict in both directions (canEqual breaks plain==stats,
  // equals breaks stats==plain).
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[GraftV1StatsWrapper]
  override def equals(that: Any): Boolean = that match {
    case g: GraftV1StatsWrapper => super.equals(g)
    case _ => false
  }
}

/** Post-pushdown optimizer rule: re-wraps a graft V1 scan so its
  * manifest statistics reach `DataSourceV2ScanRelation.computeStats`
  * — the seam that decides auto-broadcast for SQL joins over catalog
  * tables. Registered by [[GraftCatalog.initialize]] into the
  * session's `experimental.extraOptimizations` ("User Provided
  * Optimizers"), the ONE extension batch that runs after Spark's
  * "Early Filter and Projection Push-Down" (where the stats-hiding
  * V1ScanWrapper appears — the pre-CBO and operator-optimization
  * extension seams both run before it, verified against the 4.1
  * batch order). Scoped to graft's own scans: other V1 sources in
  * the session keep Spark's stock behavior. Idempotent: already-
  * forwarding wrappers don't match. */
object GraftStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation =>
      r.scan match {
        case w: V1ScanWrapper if !w.isInstanceOf[SupportsReportStatistics] &&
            (w.v1Scan.isInstanceOf[GraftScan] ||
              w.v1Scan.isInstanceOf[GraftAggServe]) =>
          r.copy(scan = new GraftV1StatsWrapper(
            w.v1Scan, w.handledFilters, w.pushedDownOperators))
        case _ => r
      }
  }
}
