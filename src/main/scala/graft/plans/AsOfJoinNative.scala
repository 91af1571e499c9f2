package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator form of
  * [[graft.ext.AsOf.joinBackward]], taken down the full custom-operator
  * ladder: a LogicalPlan node, a SparkStrategy, and a SparkPlan whose
  * merge sweep runs in one pass over key-clustered, time-sorted
  * partitions.
  *
  * Why a custom operator earns its keep here (vs the composed
  * union+window form, which stays as the executable specification):
  *
  *  - the composed form funnels BOTH inputs through one union, so every
  *    right row is carried as a null-padded left-shaped row (and vice
  *    versa) through the shuffle and the window sort;
  *  - the window materializes `last(payload, ignoreNulls)` per row with
  *    a frame scan, and the final filter throws the right rows away
  *    again;
  *  - the merge sweep shuffles each side in its own shape, holds exactly
  *    ONE buffered right row per partition, and emits left rows as it
  *    goes — O(|L|+|R|) time, O(1) state beyond the sort.
  *
  * Both sides hash-cluster on the join keys (EnsureRequirements inserts
  * the exchanges + intra-partition sorts from the declared requirements),
  * so the plan scales exactly like a sort-merge join: no interval
  * explosion, no broadcast requirement, skew behaves like any keyed
  * shuffle (salt upstream if one key dwarfs a partition).
  *
  * Semantics (identical to the composed form, verified bit-for-bit by
  * the shared DuckDB `ASOF LEFT JOIN` oracle): for each left row, the
  * payload of the right row with the same key and the greatest
  * `rightTs <= leftTs`; among right ties on (key, ts) the greatest
  * `tiebreak` wins; unmatched left rows keep null payload. Null keys
  * group together (SQL window semantics, not join-null semantics). The
  * exec itself sorts a null right ts first ("known since forever"), so
  * [[graft.ext.AsOf.joinBackwardNative]] filters null-ts right rows at
  * build time to hold the shared null-ts contract (null right ts ignored,
  * null left ts → null payload) across all four as-of forms.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    tiebreak: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; a no-op for every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, payload, tb) =>
      AsOfJoinExec(lk, rk, lts, rts, payload, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    tiebreak: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  /** Positionally-matched clusterings → EnsureRequirements co-partitions
    * the sides (same mechanism as shuffled joins). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (keys, ts[, tiebreak]) intra-partition sort on each side; the right
    * tiebreak makes "last seen wins" deterministic for duplicate (key, ts). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs :+ tiebreak).map(SortOrder(_, Ascending)))

  /** Left rows pass through in place — downstream ops keyed on the same
    * columns reuse this partitioning/ordering with no extra exchange. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val payloadProj = UnsafeProjection.create(payload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // Best-so-far right payload for the current key (copied: projection
        // buffers and iterator rows are reused by the upstream operators).
        private var held: UnsafeRow = _
        private var heldKey: UnsafeRow = _
        // Right lookahead that sorted beyond the current left row.
        private var pending: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          if (heldKey != null && keyOrd.compare(heldKey, lKey) != 0) {
            held = null; heldKey = null
          }
          val lTsRow = lTsProj(l) // stable: rTsProj uses its own buffer
          var scan = true
          while (scan) {
            if (pending == null && rIter.hasNext) pending = rIter.next()
            if (pending == null) scan = false
            else {
              val c = keyOrd.compare(rKeyProj(pending), lKey)
              if (c < 0) pending = null // key exhausted before left caught up
              else if (c > 0) scan = false
              else if (tsOrd.compare(rTsProj(pending), lTsRow) <= 0) {
                held = payloadProj(pending).copy()
                if (heldKey == null) heldKey = lKey.copy()
                pending = null
              } else scan = false
            }
          }
          resultProj(joined(l, if (held != null) held else nullPayload))
        }
      }
    }
  }
}
