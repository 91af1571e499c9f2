package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — Spark's runtime-filter machinery
  * (`InjectRuntimeFilter`) exposed as an explicit operator, for the join
  * shape where it matters most at 100 TB: a huge fact table joined to a
  * SELECTIVE dimension subset that is still too large (or too late — e.g.
  * produced by an earlier stage) for the optimizer to broadcast.
  *
  * Mechanics: one pass over the dimension keys aggregates a fixed-size
  * Bloom sketch (Spark's native `BloomFilterAggregate` — mergeable
  * map-side partial state, so the shuffle carries sketches, not keys);
  * the single binary row is pulled to the driver (bounded: `numBits`/8
  * bytes, ~1 MiB at the defaults — the same "scalar subquery → literal"
  * shape Spark's own runtime filter plans) and re-enters the fact side as
  * a foldable literal inside `BloomFilterMightContain`, which codegens
  * into the scan-stage filter. The fact rows that survive are then
  * exactly semi-joined, so Bloom false positives never reach the result:
  * the filter only PRUNES the fact-side exchange — with a ~1% FP rate the
  * shuffle shrinks to ~(selectivity + 0.01) of the fact table — while the
  * join keeps exact semantics. Both expressions are Spark-internal
  * (registered for the optimizer, not SQL), hence the [[Bridge]] wrappers.
  */
object BloomPrune {

  /** Aggregate a Bloom filter over `keyHash` (an `xxhash64` LONG column —
    * the hash space `BloomFilterMightContain` probes). */
  def bloomAgg(keyHash: Column, estimatedItems: Long, numBits: Long): Column =
    Bridge.column(
      new BloomFilterAggregate(Bridge.expression(keyHash),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe (hashes `key` with the same `xxhash64` the build
    * side used) against a driver-held sketch; foldable literal left side
    * keeps the expression scan-pushable and codegen'd. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(xxhash64(key))))

  /** Build the dim-side sketch (one job; single bounded binary row). */
  def buildFilter(dimKeys: DataFrame, key: String,
                  estimatedItems: Long = 1L << 20,
                  numBits: Long = 1L << 23): Array[Byte] =
    dimKeys.select(bloomAgg(xxhash64(col(key)), estimatedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Exact `fact SEMI JOIN dim ON key` with a Bloom pre-filter pruning the
    * fact side before its exchange. No broadcast hint on the join: the
    * operator targets exactly the regime where the dim does NOT broadcast
    * (when it would, a broadcast semi join alone is the right plan and the
    * sketch adds nothing). */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     estimatedItems: Long = 1L << 20,
                     numBits: Long = 1L << 23): DataFrame = {
    val bf = buildFilter(dim.select(col(key)), key, estimatedItems, numBits)
    // left_semi already ignores duplicate build-side keys — no distinct()
    // (it would add a full aggregate pass over the dim keys for nothing)
    fact.filter(mightContain(bf, col(key)))
      .join(dim.select(col(key)), Seq(key), "left_semi")
  }
}
