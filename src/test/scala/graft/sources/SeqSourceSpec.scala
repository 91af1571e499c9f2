package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class SeqSourceSpec extends SparkSpec {

  private def load(n: Long = 100000L, slices: Int = 16) =
    spark.read.format("graft.sources.SeqSource")
      .option("n", n.toString).option("slices", slices.toString).load()

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString("; ")

  test("values are the deterministic sequence; slices tile the range exactly") {
    val got = load(n = 10L, slices = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq.sortBy(_._1) == (0L until 10L).map(i => (i, s"doc-$i")))
    // 3 slices over 10 rows: no row lost or duplicated across partitions
    assert(load(n = 10L, slices = 3).rdd.getNumPartitions == 3)
  }

  test("id range filters push into the scan and narrow planned partitions") {
    val df = load().filter(col("id") >= 1000L && col("id") <= 2000L)
    assert(scanDesc(df).contains("graft-seq[1000..2000]"), scanDesc(df))
    assert(df.count() == 1001)
    // an impossible range plans zero partitions instead of scanning
    val empty = load().filter(col("id") > 50L && col("id") < 10L)
    assert(empty.count() == 0)
    // equality collapses the range to one row
    val eq = load().filter(col("id") === 77L)
    assert(scanDesc(eq).contains("graft-seq[77..77]"), scanDesc(eq))
    assert(eq.collect().map(_.getString(1)).toSeq == Seq("doc-77"))
  }

  test("Long-extreme pushed bounds yield empty, not wraparound; slices=0 clamps") {
    // id > Long.MaxValue must return 0 rows — the filter is consumed by
    // the scan, so an overflowed lo bound would return EVERY row with
    // nothing left to re-check it
    assert(load(n = 100L).filter(col("id") > Long.MaxValue).count() == 0)
    assert(load(n = 100L).filter(col("id") < Long.MinValue).count() == 0)
    assert(load(n = 10L, slices = 0).count() == 10)
  }

  test("column pruning reaches the reader (doc-only projection drops id)") {
    val df = load(n = 100L).select("doc")
    assert(scanDesc(df).contains("cols=[doc]"), scanDesc(df))
    assert(df.count() == 100)
    // non-pushable predicate stays with Spark as a residual and still works
    val residual = load(n = 100L).filter(col("doc").endsWith("-42"))
    assert(residual.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("runtime V2 filtering: a broadcast join's keys narrow the scan at execution") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // dim keys: even multiples of 7 in [504, 588] — the modulo filter is
    // "selective" (so dynamic pruning plans the runtime filter) but
    // yields NO static range constraint on the join key, so only the
    // runtime IN-hull clamp can narrow the fact scan
    val dim = spark.range(72, 86).select((col("id") * 7).as("k"))
      .filter(col("k") % 2 === 0)
    val fact = load(n = 1000000L, slices = 8)
    val j = fact.join(dim.hint("broadcast"), col("id") === col("k"))
    assert(j.collect().length == 7)
    // the planned runtime filter reached the V2 scan…
    assert(j.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      j.queryExecution.executedPlan.toString)
    // …and actually narrowed it: the scan emits the [504..588] hull
    // (85 rows), not the full 1M (query stages hide the scan from
    // collectLeaves, hence the manual recursion)
    def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(j.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    assert(scanned.nonEmpty && scanned.min <= 85L,
      s"scan not runtime-narrowed: emitted ${scanned.mkString(",")} rows")
  }

  test("reported statistics reflect pushdown: a narrowed scan auto-broadcasts") {
    // big × big would sort-merge; the filter narrows the right side to
    // 100 rows and the REPORTED post-pushdown stats let the planner pick
    // a broadcast join with no hint
    val big = load(n = 1000000L)
    val slice = load(n = 1000000L)
      .filter(col("id") >= 10L && col("id") < 110L)
      .select(col("id").as("k"))
    val j = big.join(slice, col("id") === col("k"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(j.count() == 100L)
  }

  test("columnar read path: vectorized batches through ColumnarToRow, same results") {
    val colDf = spark.read.format("graft.sources.SeqSource")
      .option("n", "10000").option("slices", "4")
      .option("columnar", "true").load()
    // the vectorized path is actually planned (ColumnarToRow feeds codegen)
    val plan = colDf.filter(col("id") >= 5000L).queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    // bit-identical content vs the row path, through filters + projection
    val rowDf = load(n = 10000L, slices = 4)
    def fingerprint(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("id") % 7 === 0).select(col("id"), col("doc"))
        .agg(count(lit(1)), sum(col("id")), min(col("doc")), max(col("doc")))
        .head()
    assert(fingerprint(colDf) == fingerprint(rowDf))
    // batch boundaries (4096) don't drop or duplicate rows
    assert(colDf.count() == 10000L)
    assert(colDf.select("doc").distinct().count() == 10000L)
  }

  test("ungrouped count/min/max push completely: one constant row, no scan") {
    val q = load(n = 1000000L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    // the aggregate was answered by the source in closed form
    assert(scanDesc(q).contains("graft-seq-agg"), scanDesc(q))
    assert(q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      == Seq((1000000L, 0L, 999999L)))
    // composes with filter pushdown: the narrowed range answers the agg
    val f = load(n = 1000000L).filter(col("id") >= 10L && col("id") < 20L)
      .agg(count(lit(1)), min(col("id")), max(col("id")))
    assert(scanDesc(f).contains("graft-seq-agg[10..19]"), scanDesc(f))
    assert(f.head() == org.apache.spark.sql.Row(10L, 10L, 19L))
    // empty range: SQL global-agg-over-empty semantics (0, null, null)
    val e = load(n = 100L).filter(col("id") > 1000L)
      .agg(count(lit(1)), min(col("id")), max(col("id")))
    val er = e.head()
    assert(er.getLong(0) == 0L && er.isNullAt(1) && er.isNullAt(2))
    // grouped aggregates do NOT push — the row scan still serves them
    // (sparkPlan: the grouped query wraps in AdaptiveSparkPlan, which
    // hides BatchScanExec from executedPlan until execution)
    val g = load(n = 100L).groupBy((col("id") % 10).as("m")).count()
    val gScan = g.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString("; ")
    assert(gScan.contains("graft-seq[") && !gScan.contains("graft-seq-agg"), gScan)
    assert(g.collect().map(_.getLong(1)).forall(_ == 10L))
  }
}
