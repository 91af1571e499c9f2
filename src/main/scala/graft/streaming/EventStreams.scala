package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table — a faithful
  * extension beyond the batch-only reference (SURVEY.md §2.8): the same
  * hourly rollup runs identically as a batch DataFrame (oracle-checkable)
  * and as a watermarked streaming aggregation (`readStream` →
  * `withWatermark` → windowed group → sink), which is the Spark-idiomatic
  * shape for incremental bronze ingestion at scale.
  */
object EventStreams {

  /** Events file schema; ts arrives as nanosecond longs (see
    * graft.queries.Parity.events) and is normalized to a micro timestamp
    * with exact integer arithmetic. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def normalize(raw: DataFrame): DataFrame =
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Hourly rollup: count, exact decimal value sum (order-independent),
    * and JSON-extracted metric sum per (event_type, hour). Shared by the
    * batch oracle query and the streaming pipeline. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("hour_epoch", unix_timestamp(date_trunc("hour", col("ts"))))
      .groupBy(col("event_type"), col("hour_epoch"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))

  /** Streaming source over the events parquet dir (file source → the
    * production shape for landing-zone ingestion; swap path for a Kafka
    * source URI at deploy time). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir))
  }

  /** Watermarked streaming hourly rollup: tumbling event-time window with
    * 2h lateness bound — state is bounded, late rows beyond the watermark
    * drop instead of growing state forever. */
  def streamingHourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("n"), col("sum_value"))
}
