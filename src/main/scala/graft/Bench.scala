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
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          if (!failed.contains(name)) failed += name
        }
        val t = (System.nanoTime() - t0) / 1e9
        // Outside the timed region: drop any blocks a query left persisted
        // (e.g. a final localCheckpoint) so no query pays GC/memory rent
        // for its predecessors. Queries are self-contained — nothing
        // persists RDD state across entries (file-backed memos excepted).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        name -> t
      }
    // Per-query min of up to two passes: single-run timings on a shared
    // host carry multi-second jitter, and min-of-2 removes one-off hits
    // (GC, page-cache misses, neighbor contention). The second pass is
    // skipped when the first already ran long, bounding total wall time.
    val pass1 = pass()
    val results =
      if (pass1.map(_._2).sum > 150.0) pass1
      else pass1.zip(pass()).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
