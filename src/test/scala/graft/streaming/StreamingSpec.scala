package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming semantics: the watermarked hourly rollup over a memory
  * stream must converge to the batch rollup over the same rows. */
class StreamingSpec extends SparkSpec {

  test("streamingHourlyRollup over a memory stream matches batch rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      ("click", "2024-01-01 00:10:00", 1.5),
      ("click", "2024-01-01 00:40:00", 2.5),
      ("view",  "2024-01-01 00:20:00", 4.0),
      ("click", "2024-01-01 01:05:00", 8.0))
      .map { case (t, ts, v) => (t, Timestamp.valueOf(ts), v) }

    val mem = MemoryStream[(String, Timestamp, Double)]
    mem.addData(rows: _*)
    val events = mem.toDF().toDF("event_type", "ts", "value")
      .withColumn("props", lit("""{"k": 1}"""))

    val q = EventStreams.streamingHourlyRollup(events)
      .writeStream.format("memory").queryName("rollup_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // Append mode only emits *closed* windows (watermark passed); push a
      // late-hour row so the first two windows close, then re-check.
      mem.addData(("view", Timestamp.valueOf("2024-01-01 05:00:00"), 0.5))
      q.processAllAvailable()

      val got = spark.table("rollup_test")
        .select("event_type", "hour_epoch", "n", "sum_value")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap

      val epoch0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
      assert(got(("click", epoch0)) == (2L, 4.0))
      assert(got(("view", epoch0)) == (1L, 4.0))
      assert(got(("click", epoch0 + 3600)) == (1L, 8.0))
    } finally q.stop()
  }

  test("batch hourlyRollup groups by hour and sums exactly") {
    import spark.implicits._
    val events = Seq(
      ("a", Timestamp.valueOf("2024-03-05 10:59:59"), 0.1, """{"k": 2}"""),
      ("a", Timestamp.valueOf("2024-03-05 10:00:00"), 0.2, """{"k": 3}"""),
      ("a", Timestamp.valueOf("2024-03-05 11:00:00"), 0.3, """{"k": 4}"""))
      .toDF("event_type", "ts", "value", "props")
    val out = EventStreams.hourlyRollup(events)
      .sort("hour_epoch").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2 && out(0).getAs[Double]("sum_value") == 0.3
      && out(0).getAs[Long]("sum_k") == 5)
    assert(out(1).getAs[Long]("n") == 1 && out(1).getAs[Long]("sum_k") == 4)
  }
}
