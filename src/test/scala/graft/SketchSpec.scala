package graft

import graft.queries.Parity
import org.apache.spark.sql.functions._

/** Approximate aggregates: the sketches a 100 TB rollup reaches for when
  * exact distinct counts / percentiles would shuffle every value. Both
  * are mergeable fixed-size partial aggregates (HyperLogLog++ and
  * KLL-style quantile summaries), so the state crossing the shuffle is
  * O(sketch), not O(values). Pinned against exact answers with the
  * documented error bounds. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within rsd of exact") {
    val li = Parity.table(spark, sf, "lineitem")
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"HLL error $err (exact=$exact approx=$approx) beyond 3x rsd")
  }

  test("HLL sketch columns are mergeable: partial-sketch rollup == whole-corpus sketch") {
    // The sketch-table pattern: persist one hll_sketch_agg per shard,
    // answer distinct-count queries by hll_union_agg over the shards —
    // at 100 TB the nightly rollup stores O(shards × sketch) bytes and
    // a cross-shard distinct costs a sketch merge, not a data shuffle.
    // Register merging is max-exact, but the union operates in the
    // 8-bit HLL mode while a direct sketch may stay in the compact
    // 4-bit mode with a different estimator curve — so the merged and
    // one-pass ESTIMATES may differ slightly (measured ~0.4% here),
    // while both stay inside the sketch's error bound vs exact.
    val li = Parity.table(spark, sf, "lineitem")
    val whole = li.select(
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))")).head().getLong(0)
    val merged = li.groupBy(col("l_suppkey") % 16)
      .agg(expr("hll_sketch_agg(l_orderkey)").as("s"))
      .select(expr("hll_sketch_estimate(hll_union_agg(s))")).head().getLong(0)
    assert(math.abs(merged - whole).toDouble / whole <= 0.01,
      s"sketch merge drifted beyond mode-change tolerance: merged=$merged whole=$whole")
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    for ((tag, est) <- Seq("merged" -> merged, "whole" -> whole)) {
      val err = math.abs(est - exact).toDouble / exact
      assert(err <= 0.05, s"HLL $tag estimate err $err (exact=$exact est=$est)")
    }
  }

  test("approx percentile within rank tolerance of exact") {
    val li = Parity.table(spark, sf, "lineitem")
    val n = li.count()
    val accuracy = 1000 // rank error <= n/accuracy
    val approxP50 = li.select(percentile_approx(col("l_extendedprice"),
      lit(0.5), lit(accuracy))).head().getDouble(0)
    // exact rank of the approximate answer must sit within the bound
    val below = li.filter(col("l_extendedprice") <= approxP50).count()
    val rankErr = math.abs(below - n / 2).toDouble / n
    assert(rankErr <= 1.0 / accuracy + 0.001,
      s"approx p50 rank off by $rankErr (n=$n, below=$below)")
  }
}
