package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native keyed point-in-interval range join — the second operator taken
  * down the full custom ladder after [[AsOfJoin]]: INNER-join each left
  * point row (keys, value) with every right interval row (keys, lo, hi)
  * of the same keys satisfying `lo <= value < hi`, emitting the
  * requested right payload columns.
  *
  * Why the native form earns its keep beside
  * [[graft.ext.RangeJoin.binnedJoin]] (which stays as the executable
  * specification): the binned form replicates every interval into each
  * bin it covers — shuffle volume Σ widths/binWidth, with binWidth a
  * tuning knob that degrades either way (too fine → replication blowup
  * on long intervals, too coarse → residual-filter waste). The merge
  * sweep shuffles each row exactly once with NO tuning parameter: both
  * sides hash-cluster on the keys, sort within partitions (left by
  * value, right by interval start), and a single forward pass activates
  * intervals as the point sweep reaches their `lo` and retires them
  * forever once `value >= hi` (points are non-decreasing within a key,
  * so a retired interval can never match again). Per-partition state is
  * the ACTIVE interval set — bounded by the maximum simultaneous overlap
  * depth per key, not the interval count.
  *
  * Null contract (enforced by the [[graft.ext.RangeJoin.nativeJoin]]
  * wrapper, matching SQL comparison semantics where any null bound
  * disqualifies): null `value` rows never match; null `lo`/`hi`
  * intervals are dropped at build time — the exec's natural ascending
  * ordering would otherwise sort them first and mis-activate.
  */
case class RangeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    value: Expression,
    lo: Expression,
    hi: Expression,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, lk, rk, v, lo, hi, payload) =>
      RangeJoinExec(lk, rk, v, lo, hi, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    value: Expression,
    lo: Expression,
    hi: Expression,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Left: (keys, value); right: (keys, lo, hi) — the hi tiebreak makes
    * duplicate (keys, lo) activation order, and therefore multi-match
    * emission order, deterministic. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ value).map(SortOrder(_, Ascending)),
    (rightKeys :+ lo :+ hi).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val vType = value.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lValProj = UnsafeProjection.create(Seq(value), left.output)
      val rLoProj = UnsafeProjection.create(Seq(lo), right.output)
      val rHiProj = UnsafeProjection.create(Seq(hi), right.output)
      val payloadProj = UnsafeProjection.create(payload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val vOrd = RowOrdering.createNaturalAscendingOrdering(Seq(vType))
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // ACTIVE intervals of the current key: (hi, payload) copies —
        // bounded by the key's max simultaneous overlap depth.
        private val active = scala.collection.mutable.ArrayBuffer.empty[(UnsafeRow, UnsafeRow)]
        private var curKey: UnsafeRow = _
        // Right lookahead that sorted beyond the sweep position.
        private var pending: InternalRow = _
        private val outBuf = scala.collection.mutable.Queue.empty[InternalRow]

        private def fill(): Unit = {
          while (outBuf.isEmpty && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
              active.clear()
              curKey = lKey.copy()
            }
            val vRow = lValProj(l) // stable: r*Proj use their own buffers
            // activate every interval of this key with lo <= value
            var scan = true
            while (scan) {
              if (pending == null && rIter.hasNext) pending = rIter.next()
              if (pending == null) scan = false
              else {
                val c = keyOrd.compare(rKeyProj(pending), curKey)
                if (c < 0) pending = null // key had no left rows — skip
                else if (c > 0) scan = false
                else if (vOrd.compare(rLoProj(pending), vRow) <= 0) {
                  active += ((rHiProj(pending).copy(), payloadProj(pending).copy()))
                  pending = null
                } else scan = false
              }
            }
            // sweep: retire hi <= value (can never match again), emit the rest
            var i = 0
            while (i < active.length) {
              val (hiRow, pay) = active(i)
              if (vOrd.compare(hiRow, vRow) <= 0) active.remove(i)
              else {
                outBuf.enqueue(resultProj(joined(l, pay)).copy())
                i += 1
              }
            }
          }
        }

        override def hasNext: Boolean = { fill(); outBuf.nonEmpty }
        override def next(): InternalRow = { fill(); outBuf.dequeue() }
      }
    }
  }
}
