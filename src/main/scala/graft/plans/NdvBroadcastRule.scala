package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Statistics-driven broadcast planning from the catalog's `_ndv`
  * sidecar ([[graft.core.TableCatalog.analyzeNdv]]) — the missing half
  * of a cost-based optimizer that size-only planning cannot express:
  *
  * Spark's own broadcast decision uses `sizeInBytes`, and a `Filter`
  * does not shrink it (non-CBO `SizeInBytesOnlyStatsPlanVisitor` passes
  * the child size through). So `fact ⋈ dim.filter(status = 'F')` keeps
  * the dim's FULL file size in the estimate, and a dim bigger than the
  * broadcast threshold shuffle-joins even when the filter keeps 1/NDV
  * of it. ANALYZE-style statistics fix exactly this: with the sidecar's
  * exact row count, merged-HLL distinct counts, and min/max ranges
  * ([[NdvStats]]), the filtered size is sizeInBytes × Π selectivities
  * (1/ndv per equality conjunct, interval fraction per range conjunct),
  * and a side that fits under the threshold gets a BROADCAST join
  * hint — at 100 TB the difference between shuffling the fact and not
  * moving it at all.
  *
  * Scope and safety: fires only on [Project*] → Filter → parquet
  * relation chains whose scan root carries `_ndv_summary.json` (written
  * by `analyzeNdv`, version-scoped — a stale layout simply has no file
  * and the rule stays silent), only for equality/range conjuncts over
  * sidecar-covered columns, and never overrides an existing user hint.
  * The estimate errs conservative: conjuncts the sidecar cannot see
  * contribute no selectivity. Join-side legality stays the planner's
  * call: a BROADCAST hint on an ineligible side is ignored by
  * JoinSelection, never forced.
  *
  * Threshold: `spark.graft.ndv.broadcastThreshold` bytes (default 10 MB;
  * ≤ 0 disables) — deliberately independent of
  * `spark.sql.autoBroadcastJoinThreshold`, so statistics-driven
  * broadcast still works when size-based auto-broadcast is off.
  */
case class NdvBroadcastRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val thresholdKey = "spark.graft.ndv.broadcastThreshold"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold =
      try spark.conf.get(thresholdKey, (10L * 1024 * 1024).toString).toLong
      catch { case _: NumberFormatException => return plan }
    if (threshold <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, _, _, hint) =>
        val lh = hint.leftHint.orElse(
          if (fitsBroadcast(l, threshold)) Some(HintInfo(Some(BROADCAST)))
          else None)
        val rh = hint.rightHint.orElse(
          if (fitsBroadcast(r, threshold)) Some(HintInfo(Some(BROADCAST)))
          else None)
        if ((lh ne hint.leftHint) && lh.isDefined ||
            (rh ne hint.rightHint) && rh.isDefined)
          j.copy(hint = JoinHint(lh.orElse(hint.leftHint),
            rh.orElse(hint.rightHint)))
        else j
    }
  }

  /** Post-filter size estimate from the sidecar, when the side is a
    * filtered scan of an analyzed table and at least one conjunct is
    * sidecar-covered (equality via ndv, range via lo/hi). */
  private def fitsBroadcast(side: LogicalPlan, threshold: Long): Boolean = {
    val (rel, conjuncts) = NdvStats.collect(side) match {
      case (Some(lr), cs) if cs.nonEmpty => (lr, cs)
      case _ => return false
    }
    val summary = NdvStats.summaryFor(rel) match {
      case Some(s) if s.nRows > 0 => s
      case _ => return false
    }
    val (sel, covered) = NdvStats.selectivity(conjuncts, summary)
    if (covered == 0) return false
    val estBytes = rel.stats.sizeInBytes.toDouble * sel
    estBytes <= threshold
  }
}
