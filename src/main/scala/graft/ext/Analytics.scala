package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

/** Event-log analytics: cohort retention and ordered conversion funnels —
  * the product-analytics queries a training-data pipeline's telemetry
  * side runs at the same scale as the corpus side.
  *
  * Scale posture: both operators are single-key-shuffle designs. Cohort
  * retention folds each user's week set on the map side of ONE user_id
  * exchange (collect_set is bounded by #distinct weeks per user, not
  * events); the funnel computes all three stage timestamps in one
  * user_id-partitioned window pipeline — Spark reuses the exchange across
  * the three window passes, so the raw event table is shuffled once.
  */
object Analytics {

  /** Weekly cohort retention over an event log.
    *
    * cohort_week = ISO week (Monday-truncated) of the user's first event;
    * week_offset = whole weeks since the cohort week; n_users = distinct
    * users from that cohort active in that offset week.
    *
    * One wide shuffle on user_id; the second groupBy runs over
    * (cohort, offset) cardinality — O(#weeks²) rows, trivial at any SF.
    */
  def cohortRetention(events: DataFrame, ts: String = "ts",
                      user: String = "user_id"): DataFrame = {
    val weeks = events
      .select(col(user), date_trunc("week", col(ts)).cast(DateType).as("week"))
      .groupBy(col(user))
      .agg(collect_set(col("week")).as("weeks"))
      .select(col(user), array_min(col("weeks")).as("cohort_week"),
        explode(col("weeks")).as("week"))
    weeks
      .groupBy(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").cast(LongType).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered three-stage conversion funnel (signup → click → purchase),
    * grouped by signup cohort week. A stage only counts if it happens at
    * or after the previous stage's first completion — the strict-order
    * semantics `count distinct per type` gets wrong.
    *
    * All three stage timestamps come from whole-partition min-windows over
    * the same user_id partitioning: one exchange, three in-partition
    * passes, no self-joins of the event table.
    */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("signup", "click", "purchase"),
             ts: String = "ts", user: String = "user_id",
             eventType: String = "event_type"): DataFrame = {
    require(stages.nonEmpty)
    val byUser = Window.partitionBy(user)
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (stage, i)) =>
      val cond: Column =
        if (i == 0) col(eventType) === stage
        else col(eventType) === stage && col(ts) >= col(s"stage${i - 1}_ts")
      df.withColumn(s"stage${i}_ts", min(when(cond, col(ts))).over(byUser))
    }
    val perUser = staged
      .select(col(user) +: stages.indices.map(i => col(s"stage${i}_ts")): _*)
      .distinct()
      .where(col("stage0_ts").isNotNull)
    val counts = stages.indices.map(i =>
      count(col(s"stage${i}_ts")).as(s"n_${stages(i)}"))
    perUser
      .groupBy(date_trunc("week", col("stage0_ts")).cast(DateType).as("cohort_week"))
      .agg(counts.head, counts.tail: _*)
      .withColumn("conv",
        col(s"n_${stages.last}").cast(DoubleType) /
          col(s"n_${stages.head}").cast(DoubleType))
  }
}
