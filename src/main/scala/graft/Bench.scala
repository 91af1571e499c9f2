package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): one JSON line with
  * per-query wall seconds over SPARK_GRAFT_SF_DIR.
  *
  * Queries are forced through the `noop` sink, not `.count()` — count()
  * lets Catalyst prune every projected column, which would skip the
  * expression work (hashing, folds) that IS the workload being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // Untimed warmup: JIT/codegen/session/parquet-reader init and the
    // cold first read of every table should not bill the first measured
    // query (alphabetical order made a1_aggregates absorb the whole
    // lineitem page-cache miss).
    spark.range(100000).selectExpr("sum(id * 2)").write.format("noop").mode("overwrite").save()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        if (t == "events")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.mode("overwrite").format("noop").save()
      }
      catch { case _: Throwable => () }
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Diagnostics (stderr only; stdout JSON is the driver contract):
    // cumulative executor task time and JVM GC time bracketing each query
    // separate real distributed work from driver stalls and GC pauses.
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorRunTime)
    })
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // Third tuple element: did the run succeed? Failed-run wall times are
    // kept only as a last resort (never preferred by min() over a
    // successful measurement).
    def pass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val (task0, gc0) = (taskMs.get, gcMs)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            if (!failed.contains(name)) failed += name
            false
          }
        val t = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-28s wall=$t%8.2fs task=${(taskMs.get - task0) / 1e3}%8.1fs gc=${(gcMs - gc0) / 1e3}%6.1fs")
        // Outside the timed region: drop any blocks a query left persisted
        // (e.g. a final localCheckpoint) so no query pays GC/memory rent
        // for its predecessors. Queries are self-contained — nothing
        // persists RDD state across entries (file-backed memos excepted).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (name, t, ok)
      }
    // Per-query min of up to two passes: single-run timings on a shared
    // host carry multi-second jitter — and occasionally multi-MINUTE
    // stalls (observed wall≫task-time with idle executors: host-level
    // contention, not query work). Min-of-2 removes one-off hits. When a
    // full second pass would run too long, re-measure just the slowest
    // pass-1 entries (the ones a stall distorts most, and the ones read
    // as regressions) within a bounded wall budget.
    val pass1 = pass()
    // A rerun that throws contributes NO timing (its short failure wall
    // would win the min() and mask a genuine regression) and is recorded
    // in `failed` like a pass-1 failure.
    def rerun(names: Set[String]): Map[String, Double] =
      SparkEntry.queries.toSeq.filter(q => names(q._1)).sortBy(_._1).flatMap {
        case (name, fn) =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name rerun failed: ${e.getMessage}")
              if (!failed.contains(name)) failed += name
              false
            }
          val t = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] $name%-28s re-measured wall=$t%8.2fs")
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          if (ok) Some(name -> t) else None
      }.toMap
    // Combine measurements: min over SUCCESSFUL runs only; a query with
    // no successful run keeps its (failure) wall time and sits in `failed`.
    def best(n: String, runs: Seq[(Double, Boolean)]): (String, Double) = {
      val good = runs.collect { case (t, true) => t }
      n -> (if (good.nonEmpty) good.min else runs.map(_._1).min)
    }
    val results =
      if (pass1.map(_._2).sum <= 300.0)
        pass1.zip(pass()).map { case ((n, a, ao), (_, b, bo)) =>
          best(n, Seq((a, ao), (b, bo))) }
      else {
        var budget = 180.0
        val redo = pass1.sortBy(-_._2).takeWhile { case (_, t, _) =>
          val ok = budget > 0; budget -= t; ok
        }.map(_._1).toSet
        val second = rerun(redo) // successful reruns only
        pass1.map { case (n, t, ok) =>
          best(n, (t, ok) +: second.get(n).map(s => (s, true)).toSeq) }
      }
    // Millisecond precision keeps the JSON line as short as possible: the
    // driver captures a bounded output tail, and full-precision doubles
    // pushed the line past that window (r2/r3 records show it truncated
    // mid-line, defeating machine parsing of the per-query dict).
    def ms3(v: Double) = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${ms3(total)},"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}"""
    println(line)
    // Also keep a local copy: the stdout capture window can still clip the
    // line, and round-over-round analysis needs the full per-query dict.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_local.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
