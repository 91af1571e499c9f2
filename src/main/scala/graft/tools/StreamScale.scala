package graft.tools

import graft.streaming.{EventStreams, StateV2}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-at-scale probe (r11 verdict item 8): drive the stateful
  * streaming paths with a 10×-rows event stream (the sf1 events table
  * staged as a time-ordered multi-file landing dir, one file per
  * micro-batch) and record per-path throughput and state-store size
  * over time. The suite's streaming specs pin CORRECTNESS on small
  * fixtures; this records the SCALE evidence: rows/sec through each
  * stateful operator, and that watermark/TTL expiry actually bounds
  * state (max in-flight state rows ≪ total input rows).
  *
  * Paths probed (all through the noop sink, fresh checkpoint each):
  *   hourly_rollup   — watermarked tumbling-window aggregate
  *   session_window  — native session_window merge (append on close)
  *   sessionize_fgws — flatMapGroupsWithState gap sessionization
  *   dedup_ids       — dropDuplicatesWithinWatermark on event_id
  *   ss_join         — stream-stream interval join (purchases ⋈ clicks)
  *   user_state_tws  — transformWithState running profile (RocksDB)
  *
  * Usage: runMain graft.tools.StreamScale [sfDir] [files]
  * Prints one `[streamscale] json=` line per path plus a `total` line;
  * tools/run_streamscale.sh composes SCALING_streaming.json. */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val nFiles = if (args.length > 1) args(1).toInt else 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark

    // Stage the landing dir: range-partition by ts so part-file ORDER is
    // event-time order (FileStreamSource processes oldest-first, path
    // tie-break), one file per micro-batch — watermarks advance the way
    // they would on a live, in-order feed.
    val landing = "target/streamscale/landing"
    val fs = new java.io.File(landing)
    if (!fs.exists()) {
      graft.queries.Parity.events(spark, sfDir)
        .repartitionByRange(nFiles, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(landing)
    }
    val totalRows = spark.read.parquet(landing).count()
    println(s"[streamscale] staged $totalRows rows in $nFiles files from $sfDir")

    def src(): DataFrame = EventStreams.readEventStream(spark, landing)

    def run(name: String, mode: String = "append")(out: => DataFrame): Unit = {
      val ckpt = s"target/streamscale/ckpt-$name-${System.nanoTime()}"
      val t0 = System.nanoTime()
      val q = out.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress
      val inRows = progs.map(_.numInputRows).sum
      val batches = progs.count(_.numInputRows > 0)
      // state evidence: rows + bytes per progress; max vs last shows
      // whether expiry bounds the store
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal).headOption)
      val stateBytes = progs.flatMap(_.stateOperators.map(_.memoryUsedBytes).headOption)
      val dropped = progs.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark).headOption).sum
      q.stop()
      val maxState = if (stateRows.isEmpty) 0L else stateRows.max
      val endState = stateRows.lastOption.getOrElse(0L)
      val maxBytes = if (stateBytes.isEmpty) 0L else stateBytes.max
      println(f"""[streamscale] json={"path":"$name","rows":$inRows,"wall_sec":$wall%.1f,"rows_per_sec":${(inRows / wall).toLong},"batches":$batches,"max_state_rows":$maxState,"end_state_rows":$endState,"max_state_bytes":$maxBytes,"rows_dropped_late":$dropped}""")
    }

    run("hourly_rollup") {
      EventStreams.streamingHourlyRollup(src())
    }
    run("session_window") {
      EventStreams.sessionWindowStream(
        src().withWatermark("ts", "2 hours"))
    }
    run("sessionize_fgws") {
      EventStreams.sessionizeStream(
        src().withWatermark("ts", "2 hours")).toDF()
    }
    run("dedup_ids") {
      EventStreams.dedupedStream(src().withWatermark("ts", "2 hours"))
    }
    run("ss_join") {
      val p = src().filter(col("event_type") === "purchase")
      val c = src().filter(col("event_type") === "click")
      EventStreams.clickAttribution(p, c)
    }
    // transformWithState needs the RocksDB store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run("user_state_tws", mode = "update") {
      StateV2.userStatsStream(src()).toDF()
    }
    spark.stop()
  }
}
