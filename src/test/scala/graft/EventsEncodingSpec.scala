package graft

import graft.queries.Parity
import graft.streaming.EventStreams

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Drift-proofing for the events `ts` physical encoding: the driver has
  * regenerated testdata across rounds with DIFFERENT parquet timestamp
  * encodings (int64 nanoseconds readable as LongType in rounds ≤3,
  * timestamp[us] = TIMESTAMP_NTZ from round 4), and a loader hard-coded
  * to one of them silently zeroes every events-backed query when the
  * other shows up. This suite writes the same logical rows in every
  * encoding Spark can produce and asserts the batch loader and the
  * streaming reader normalize all of them to IDENTICAL session-UTC
  * TimestampType rows — so a future regeneration can't break the events
  * surface again without failing here first.
  */
class EventsEncodingSpec extends SparkSpec {

  // Known logical rows: (event_id, micros-since-epoch, user_id, type, value, props)
  private val baseMicros = 1704067200000000L // 2024-01-01 00:00:00 UTC
  private val logical = Seq(
    (1L, baseMicros, 7L, "view", 1.5, """{"k":1}"""),
    (2L, baseMicros + 59L * 60L * 1000000L + 999999L, 7L, "click", 2.5, """{"k":2}"""),
    (3L, baseMicros + 3600L * 1000000L, 8L, "view", 3.0, """{"k":3}"""))

  /** Write the logical rows with ts as int64 nanoseconds (the rounds-≤3
    * shape: parquet TIMESTAMP(NANOS) decodes to LongType under the legacy
    * nanos-as-long conf; a plain int64 column reads as the same LongType,
    * exercising the identical loader branch). */
  private def writeNanosLong(dir: String): Unit = {
    val rows = logical.map { case (id, us, u, t, v, p) => Row(id, us * 1000L, u, t, v, p) }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(dir)
  }

  /** Write with ts as TIMESTAMP_NTZ (the round-4+ shape: parquet
    * timestamp[us] without zone). */
  private def writeNtz(dir: String): Unit = {
    val rows = logical.map { case (id, us, u, t, v, p) =>
      Row(id, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC),
        u, t, v, p)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(dir)
  }

  /** Write with ts as zoned TimestampType (micros, UTC session). */
  private def writeLtz(dir: String): Unit = {
    val rows = logical.map { case (id, us, u, t, v, p) =>
      Row(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L)), u, t, v, p)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(dir)
  }

  private def collectNormalized(df: DataFrame): Seq[(Long, Long, Long, String)] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._1)

  private val expected = logical.map { case (id, us, u, t, _, _) => (id, us, u, t) }

  test("batch loader normalizes every ts encoding to identical rows") {
    val encodings = Seq[(String, String => Unit)](
      ("nanos-long", writeNanosLong), ("ntz", writeNtz), ("ltz", writeLtz))
    for ((tag, write) <- encodings) {
      val dir = Files.createTempDirectory(s"graft-enc-$tag").toString
      write(s"$dir/events.parquet")
      val got = collectNormalized(Parity.events(spark, dir))
      assert(Parity.events(spark, dir).schema("ts").dataType == TimestampType,
        s"$tag: loader must yield TimestampType")
      assert(got == expected, s"$tag: normalized rows differ: $got")
    }
  }

  test("streaming reader agrees with the batch loader on every encoding") {
    val encodings = Seq[(String, String => Unit)](
      ("nanos-long", writeNanosLong), ("ntz", writeNtz))
    for ((tag, write) <- encodings) {
      val dir = Files.createTempDirectory(s"graft-senc-$tag").toString
      write(s"$dir/events.parquet")
      // The streaming reader takes a directory of files; point it at the
      // parquet part dir itself.
      val stream = EventStreams.readEventStream(spark, s"$dir/events.parquet")
      assert(stream.schema("ts").dataType == TimestampType,
        s"$tag: stream must yield TimestampType")
      val name = s"enc_${tag.replace("-", "_")}"
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = collectNormalized(spark.table(name))
        assert(got == expected, s"$tag: streamed rows differ: $got")
      } finally q.stop()
    }
  }
}
