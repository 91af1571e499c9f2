package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Mirrors the capability of the reference's session factory
  * (`utils/sparksession.py:3-12`) but fixes its misspelled AQE key
  * (`spark.sql.adaptive.enable` → `spark.sql.adaptive.enabled`, see
  * SURVEY.md §4) and sizes shuffle partitions for the actual runtime
  * instead of a hard-coded 200.
  *
  * Scale posture: AQE on (runtime coalescing, skew-join splitting,
  * broadcast demotion), UTC session time zone for reproducible
  * date/timestamp semantics, and shuffle partitions defaulting to the
  * local core count (on a real cluster, callers pass ~2-3× total cores).
  */
object Sessions {

  def local(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Option[Int] = None,
      appName: String = "graft",
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Tune an externally-provided session (e.g. the driver harness's) with
    * the engine's semantics-critical confs without rebuilding it. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Shuffle-sizing posture for a REAL cluster (the 1000-executor /
    * 100 TB deployment this library is designed for) — the conf block a
    * cluster session should be built with, also applicable to a live
    * session via `conf.set` (all keys are runtime-settable).
    *
    * Why this exists: a fixed `spark.sql.shuffle.partitions` cannot be
    * right across a 100 TB contract — `= cores` (the local[32] gate
    * setting) under-splits big shuffles into executor-memory-blowing
    * partitions, while `= 10 × cores` makes every small query pay
    * thousands of empty tasks. The scalable posture is: let AQE size
    * reducers by BYTES, not by a global constant —
    *
    *  - `initialPartitionNum` (default here `oversubscription ×
    *    totalCores`) is the map-side bucket count — the CEILING on
    *    post-shuffle parallelism. Oversubscribe it: unused buckets are
    *    coalesced away at runtime, but a too-low ceiling cannot be
    *    raised after the map stage ran. At 1000 × 8 cores the default
    *    is 64k buckets — safely above any reducer count a 100 TB
    *    shuffle wants.
    *  - `advisoryPartitionSizeInBytes` (128 MB default) is what AQE
    *    coalesces TO: each reducer gets ~one HDFS-block of shuffle
    *    data regardless of total volume, so a 10× data growth becomes
    *    10× more reducers, not 10× bigger ones — the weak-scaling
    *    contract, decided at runtime from observed map output sizes.
    *  - `parallelismFirst = false` makes AQE honor the advisory size
    *    (the default `true` floors partilism at minPartitionSize=1MB
    *    and produces core-count-matched tiny partitions — right for a
    *    laptop, wrong for a cluster where the scheduler round-trips
    *    dominate tiny tasks).
    *  - `skewJoin` splits any reducer whose size exceeds 5× the median
    *    into advisory-sized chunks — the runtime complement to the
    *    engine's own salting/degree-caps.
    *  - `shuffle.partitions` (2 × totalCores) only matters where AQE
    *    cannot see (first stage of a streaming query, non-AQE paths);
    *    everything else is sized by the rules above.
    *
    * Local gate note: the sf0.01..sf10 gates intentionally keep
    * `shuffle.partitions = cpus` with AQE defaults — at ≤1.5 GB inputs
    * the advisory coalescing collapses most shuffles to ONE reducer,
    * which serializes the very parallelism the gates measure. The
    * posture split (cores-sized locally, bytes-sized on the cluster) is
    * itself the design: partition counts are a per-DEPLOYMENT knob, and
    * `SessionsSpec` pins that the ceiling — not the constant — governs
    * reducer counts under this conf block. */
  def clusterConf(
      totalCores: Int,
      advisoryPartitionBytes: Long = 128L << 20,
      oversubscription: Int = 8): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> (2 * totalCores).toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" ->
      (oversubscription.toLong * totalCores).toString,
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
      advisoryPartitionBytes.toString,
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    "spark.sql.adaptive.skewJoin.enabled" -> "true")
}
