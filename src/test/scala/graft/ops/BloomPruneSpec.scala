package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = spark.range(0, 20000)
    .select((col("id") % 5000).as("k"), col("id").as("payload"))
  private lazy val dim = spark.range(0, 5000)
    .filter(col("id") % 40 === 0).select(col("id").as("k")) // 2.5% selective

  test("pruned semi join is exactly the semi join (false positives removed)") {
    val got = BloomPrune.prunedSemiJoin(fact, dim, "k")
      .select("k", "payload").collect().map(_.toSeq).toSet
    val want = fact.join(dim, Seq("k"), "left_semi")
      .select("k", "payload").collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("the sketch has no false negatives: every dim key passes mightContain") {
    val bf = BloomPrune.buildFilter(dim, "k")
    val missed = dim.filter(!BloomPrune.mightContain(bf, col("k"))).count()
    assert(missed == 0L)
  }

  test("the bloom filter prunes the fact side BEFORE its exchange") {
    val bf = BloomPrune.buildFilter(dim, "k")
    val pruned = fact.filter(BloomPrune.mightContain(bf, col("k")))
    // the probe filters to roughly selectivity + FP rate, never everything
    val kept = pruned.count()
    assert(kept < 20000, "bloom filter kept every row — it pruned nothing")
    assert(kept >= fact.join(dim, Seq("k"), "left_semi").count())
    // plan shape with broadcast disabled (the regime the operator is
    // FOR: a dim too big to broadcast): the might_contain filter must
    // render BELOW the fact side's shuffle exchange — plan trees print
    // parents above children, so the filter's line index must come after
    // the Exchange's — meaning the pruned, not full, fact side pays it.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = pruned.join(dim, Seq("k"), "left_semi")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val ex = plan.indexOf("Exchange hashpartitioning")
      val mc = plan.indexOf("might_contain")
      assert(mc >= 0, s"no might_contain filter in plan:\n$plan")
      assert(ex >= 0, s"expected a shuffle join with broadcast disabled:\n$plan")
      assert(mc > ex, s"might_contain filter sits above the exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
