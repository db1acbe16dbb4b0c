package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics => V2Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Spark's `V2ScanRelationPushDown` wraps every [[V1Scan]] in a
  * [[V1ScanWrapper]] that does NOT forward [[SupportsReportStatistics]] —
  * so a V1-bridged connector's carefully-computed statistics silently
  * degrade to `defaultSizeInBytes` (8 EiB) at join-planning time and
  * nothing V1-bridged can ever be auto-broadcast. This wrapper subclass
  * restores the forwarding; [[RestoreV1ScanStatistics]] (a pre-CBO rule
  * registered by graft.GraftExtensions) swaps it in after pushdown.
  * `DataSourceV2Strategy` keeps matching it through the parent's case
  * class extractor, so execution is untouched.
  */
class StatsV1ScanWrapper(v1: V1Scan, handled: Seq[Filter],
    ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // MUST differ from the bare wrapper under the parent's case-class
  // equality, or Catalyst's transform sees the swap as a no-op (fastEquals)
  // and keeps the stats-less original
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
  override def hashCode(): Int = super.hashCode() ^ 0x5f3759df
}

case class RestoreV1ScanStatistics(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case r: DataSourceV2ScanRelation => r.scan match {
      case w: V1ScanWrapper if !w.isInstanceOf[SupportsReportStatistics] &&
          w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
        r.copy(scan = new StatsV1ScanWrapper(
          w.v1Scan, w.handledFilters, w.pushedDownOperators))
      case _ => r
    }
  }
}
