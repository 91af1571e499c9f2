package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Statistics-driven join ORDERING from the catalog's `_ndv` sidecar —
  * the second consumer of [[NdvStats]] beside [[NdvBroadcastRule]]:
  * where that rule decides HOW to execute a join (broadcast vs
  * shuffle), this one decides WHICH join to execute first.
  *
  * The shape it fixes: `(fact ⋈ dimA) ⋈ dimB` written in declaration
  * order, where dimB's filter keeps a sliver of it while dimA doesn't
  * shrink the fact at all. Size-only Spark keeps the user's order (CBO
  * join reorder needs ANALYZE stats it doesn't have here), so every
  * fact row flows through the first join before the selective dim gets
  * a chance to drop it. With the sidecar's exact row counts, merged-HLL
  * NDVs, and min/max ranges, each dim's FAN-OUT per fact row is
  * estimable from metadata alone:
  *
  *   fanOut(dim, cond) = nRows(dim) × Π selectivity(filter conjuncts)
  *                       / Π ndv(dim-side equi-join keys)
  *
  * — the textbook |F ⋈ D| / |F| under uniform-FK assumptions (an
  * unfiltered PK dim has fanOut 1; a dim filtered to 5% has 0.05). If
  * the outer dim's fan-out beats the inner's by margin (< 0.8×), the
  * two joins swap, with a Project on top restoring the original output
  * order. Column-identical by construction: both joins are INNER and
  * the swap is the associativity rewrite
  * `(F ⋈c1 A) ⋈c2 B → (F ⋈c2 B) ⋈c1 A`, legal exactly when c2 does not
  * reference A — which is the guard.
  *
  * Scope and safety: INNER joins with no user hints on either level;
  * both dims must be [Project*] → [Filter*] → parquet scans of
  * sidecar-analyzed tables (anything else → no estimate → no action);
  * equi-join keys only. The 0.8 margin both absorbs HLL error (±2-3%)
  * and makes the rewrite a fixed point: after the swap the reversed
  * comparison can never clear the same margin, so the rule cannot
  * oscillate across optimizer iterations. Disable with
  * `spark.graft.ndv.joinReorder=false`.
  */
case class NdvJoinOrderRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val enableKey = "spark.graft.ndv.joinReorder"
  private val Margin = 0.8

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get(enableKey, "true") != "true") return plan
    plan.transformUp {
      // ColumnPruning interposes an attribute-only Project between the
      // two joins; see through it (the swap reinstates every attribute,
      // and the pruning re-derives on the next optimizer iteration —
      // this rule runs inside the operator-optimization fixed point).
      case j @ Join(PrunedJoin(Join(fact, dimA, Inner, Some(c1), JoinHint.NONE)),
          dimB, Inner, Some(c2), JoinHint.NONE)
          // c2 must not touch dimA, or the order is semantically forced
          if c2.references.subsetOf(fact.outputSet ++ dimB.outputSet) =>
        (for {
          fanA <- fanOut(dimA, c1)
          fanB <- fanOut(dimB, c2)
          if fanB < fanA * Margin
        } yield Project(j.output,
          Join(Join(fact, dimB, Inner, Some(c2), JoinHint.NONE),
            dimA, Inner, Some(c1), JoinHint.NONE))).getOrElse(j)
    }
  }

  /** The left side of the outer join, through at most one
    * attribute-only (pruning) Project. */
  private object PrunedJoin {
    def unapply(p: LogicalPlan): Option[Join] = p match {
      case j: Join => Some(j)
      case Project(pl, j: Join) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        Some(j)
      case _ => None
    }
  }

  /** Estimated join output rows PER FACT ROW for this dim side, from
    * the sidecar alone; None when the side or its join keys are not
    * estimable (→ the rule stays silent). */
  private def fanOut(dim: LogicalPlan, cond: Expression): Option[Double] = {
    val (rel, conjuncts) = NdvStats.collect(dim) match {
      case (Some(lr), cs) => (lr, cs)
      case _ => return None
    }
    val summary = NdvStats.summaryFor(rel) match {
      case Some(s) if s.nRows > 0 => s
      case _ => return None
    }
    val dimAttrs = dim.outputSet
    val keyNdvs = NdvStats.splitConjuncts(cond).map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        val dimKey = if (dimAttrs.contains(x)) Some(x)
          else if (dimAttrs.contains(y)) Some(y) else None
        dimKey.flatMap(k => summary.ndv.get(k.name).filter(_ >= 1.0))
      case _ => None
    }
    // every join conjunct must be an estimable dim-side equi-key —
    // a partially-understood condition is not a basis for reordering
    if (keyNdvs.isEmpty || keyNdvs.exists(_.isEmpty)) return None
    val (sel, _) = NdvStats.selectivity(conjuncts, summary)
    Some(keyNdvs.flatten.foldLeft(summary.nRows * sel)(_ / _))
  }
}
