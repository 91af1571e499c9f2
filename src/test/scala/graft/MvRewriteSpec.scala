package graft

import graft.plans.{MaterializedViews, MvRewriteRule}
import graft.queries.Parity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Materialized-view rewrite: aggregates over the base table must
  * transparently redirect to the summary when (and ONLY when) the
  * partial-state algebra makes them derivable — and produce identical
  * results either way. */
class MvRewriteSpec extends SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val basePath = s"$sf/orders.parquet"
  private lazy val mvPath = Parity.tmp("spec-mv-orders", sf)

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  override def beforeAll(): Unit = {
    super.beforeAll()
    // The shared test session has no extensions config; attach the rule
    // through the runtime extension point instead.
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule(spark)
    MaterializedViews.clear()
    MaterializedViews.create(spark, basePath, mvPath,
      groupCols = Seq("o_orderstatus", "o_orderpriority"),
      sums = Seq(dec(col("o_totalprice"))),
      mins = Seq(col("o_orderdate")),
      maxs = Seq(col("o_orderdate")))
  }

  override def afterAll(): Unit = {
    MaterializedViews.clear()
    super.afterAll()
  }

  private def scans(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString
      .split('\n').toSeq.filter(_.contains("FileScan parquet"))

  private def readsSummary(df: DataFrame): Boolean =
    scans(df).exists(_.contains("spec-mv-orders"))

  private def base = spark.read.parquet(basePath)

  /** Ground-truth computations must NOT themselves be redirected to the
    * summary under test. */
  private def withoutRule[T](f: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try f finally spark.experimental.extraOptimizations = saved
  }

  test("derivable rollup reads the summary, not the base, with identical results") {
    val q = base.groupBy("o_orderstatus")
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n"),
        min(col("o_orderdate")).as("lo"),
        max(col("o_orderdate")).as("hi"))
    assert(readsSummary(q), scans(q).mkString("\n"))
    // ground truth without the rule: same aggregate against the base
    val expected = {
      val saved = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations = Nil
      try base.groupBy("o_orderstatus")
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n"),
          min(col("o_orderdate")).as("lo"),
          max(col("o_orderdate")).as("hi"))
        .collect().map(_.toSeq).toSet
      finally spark.experimental.extraOptimizations = saved
    }
    assert(q.collect().map(_.toSeq).toSet == expected)
  }

  test("full-superset grouping and exact-group rollup both rewrite") {
    val both = base.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    assert(readsSummary(both), scans(both).mkString("\n"))
  }

  test("no rewrite when a measure is not registered (different input expr)") {
    val q = base.groupBy("o_orderstatus")
      .agg(sum(col("o_orderkey")).as("s"))
    assert(!readsSummary(q), scans(q).mkString("\n"))
  }

  test("no rewrite for distinct aggregates, avg, or non-grouping columns") {
    val distinctQ = base.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(!readsSummary(distinctQ))
    val avgQ = base.groupBy("o_orderstatus")
      .agg(avg(col("o_totalprice")).as("a"))
    assert(!readsSummary(avgQ))
    val otherKey = base.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(!readsSummary(otherKey))
  }

  test("no rewrite through a filter (summary covers the whole base only)") {
    val q = base.filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(!readsSummary(q), scans(q).mkString("\n"))
  }

  test("no rewrite for scans of other tables") {
    val q = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!readsSummary(q))
  }

  test("incremental refresh folds a batch in partial-state algebra") {
    val d = MaterializedViews.registered.find(_.mvPath == mvPath).get
    val batch = base.limit(100)
    // expected: rebuild from scratch over base ∪ batch
    val full = base.unionByName(batch)
    val expected = full.groupBy("o_orderstatus", "o_orderpriority")
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("s"),
        count(lit(1)).as("n"),
        min(col("o_orderdate")).as("lo"),
        max(col("o_orderdate")).as("hi"))
      .collect().map(_.toSeq).toSet
    MaterializedViews.refresh(spark, d, batch)
    val got = spark.read.parquet(mvPath)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(
        sum(col("mv_sum_0")).cast("double").as("s"),
        sum(col("mv_cnt")).as("n"),
        min(col("mv_min_0")).as("lo"),
        max(col("mv_max_0")).as("hi"))
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    // restore the un-refreshed summary for other tests / reruns
    MaterializedViews.create(spark, basePath, mvPath,
      groupCols = Seq("o_orderstatus", "o_orderpriority"),
      sums = Seq(dec(col("o_totalprice"))),
      mins = Seq(col("o_orderdate")),
      maxs = Seq(col("o_orderdate")))
    // REBUILD SOUNDNESS: that create() ran with its own def already
    // registered — its rebuild aggregate must read the BASE, not get
    // rewritten to the refreshed summary it is replacing. The on-disk
    // summary must therefore equal the base aggregate exactly.
    val rebuilt = spark.read.parquet(mvPath)
      .select("o_orderstatus", "o_orderpriority", "mv_sum_0", "mv_cnt")
      .collect().map(_.toSeq).toSet
    val fromBase = withoutRule {
      base.groupBy("o_orderstatus", "o_orderpriority")
        .agg(sum(dec(col("o_totalprice"))).as("mv_sum_0"),
          count(lit(1)).as("mv_cnt"))
        .collect().map(_.toSeq).toSet
    }
    assert(rebuilt == fromBase,
      "re-create() with a registered def must rebuild from the base")
  }

  test("refresh batch partials come from the batch, not a rewritten summary read") {
    // Own base copy so it can drift from its summary (stale summary is
    // the discriminating state: a mid-refresh rewrite would fold in the
    // OLD summary instead of the batch rows).
    val basePath2 = Parity.tmp("spec-mv-refresh-base", sf)
    val mvPath2 = Parity.tmp("spec-mv-refresh-mv", sf)
    base.write.mode("overwrite").parquet(basePath2)
    val d = MaterializedViews.create(spark, basePath2, mvPath2,
      groupCols = Seq("o_orderstatus"), sums = Seq(dec(col("o_totalprice"))))
    // Drift: the base grows by 100 rows the summary has not seen.
    base.limit(100).write.mode("append").parquet(basePath2)
    // A batch that IS a bare scan of the (grown) base path: its partial
    // aggregate must be computed from the batch rows, not redirected to
    // the stale summary mid-refresh.
    MaterializedViews.refresh(spark, d, spark.read.parquet(basePath2))
    val got = spark.read.parquet(mvPath2)
      .select(col("o_orderstatus"), col("mv_cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (oldCnt, grownCnt) = withoutRule {
      (base.groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
       spark.read.parquet(basePath2).groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    // expected = stale summary (old counts) + batch partial (grown counts)
    assert(got == grownCnt.map { case (k, v) => k -> (v + oldCnt.getOrElse(k, 0L)) })
  }

  test("global aggregates (no GROUP BY) rewrite, and COUNT(*) over an empty base is 0") {
    val q = base.agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("s"))
    assert(readsSummary(q), scans(q).mkString("\n"))
    val Array(row) = q.collect()
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val expect =
      try base.agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("s")).collect()(0)
      finally spark.experimental.extraOptimizations = saved
    assert(row.toSeq == expect.toSeq)
    // empty base: COUNT(*) must stay 0 through the SUM(mv_cnt) rewrite
    val emptyBase = Parity.tmp("spec-mv-empty-base", sf)
    val emptyMv = Parity.tmp("spec-mv-empty-mv", sf)
    base.limit(0).write.mode("overwrite").parquet(emptyBase)
    MaterializedViews.create(spark, emptyBase, emptyMv,
      groupCols = Seq("o_orderstatus"), sums = Seq(dec(col("o_totalprice"))))
    val eq = spark.read.parquet(emptyBase).agg(count(lit(1)).as("n"))
    assert(scans(eq).exists(_.contains("spec-mv-empty-mv")), scans(eq).mkString("\n"))
    assert(eq.collect()(0).getLong(0) == 0L)
  }
}
