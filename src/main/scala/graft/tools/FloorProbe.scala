package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Fixed-cost floor probe (r11 verdict item 6): the sub-second TPC-H
  * anchors pay ~1 s/query at sf10 where DuckDB pays ~0.1 s — ~90% of it
  * fixed per-query cost, not data work. This probe breaks the floor
  * into measurable layers for a given query and times the candidate
  * mitigations, so BASELINE.md records a measured breakdown and an
  * applied win or an honest negative.
  *
  * Layers (fresh DataFrame per measurement, min of PASSES):
  *   analyze   — queryExecution.analyzed (catalog + resolution)
  *   optimize  — optimizedPlan (Catalyst rules) minus analyze
  *   plan      — executedPlan (strategies + AQE prep) minus optimize
  *   exec1     — first full run (includes Janino codegen compile)
  *   exec2     — second run of the SAME DataFrame object (plan reuse:
  *               what a plan cache would buy)
  *   fresh2    — second run with a FRESH DataFrame (steady-state
  *               per-query cost: codegen cache warm, plans re-derived)
  * Variants on the fresh path: wholeStage codegen off, AQE off.
  *
  * Usage: runMain graft.tools.FloorProbe <sfDir> <query> [passes]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf10")
    val name = if (args.length > 1) args(1) else "tpch_q22"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    val fn = SparkEntry.queries(name)
    // absorb the cold costs shared by every variant: file listing,
    // parquet footers, page cache, first Janino compile of THIS query
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    def best(what: String)(body: => Unit): Double = {
      val t = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[floorprobe] $name%-10s $what%-14s $t%8.3f s")
      t
    }

    best("analyze") { fn(spark, sfDir).queryExecution.analyzed }
    best("optimize") { fn(spark, sfDir).queryExecution.optimizedPlan }
    best("plan") { fn(spark, sfDir).queryExecution.executedPlan }
    val df = fn(spark, sfDir)
    best("exec1") { df.write.format("noop").mode("overwrite").save() }
    best("exec2-reuse") { df.write.format("noop").mode("overwrite").save() }
    best("fresh") {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    def withConf(k: String, v: String)(body: => Unit): Unit = {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try body finally prev match {
        case Some(p) => spark.conf.set(k, p); case None => spark.conf.unset(k)
      }
    }
    withConf("spark.sql.codegen.wholeStage", "false") {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      best("no-codegen") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    withConf("spark.sql.adaptive.enabled", "false") {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      best("no-aqe") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
