package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table — a faithful
  * extension beyond the batch-only reference (SURVEY.md §2.8): the same
  * hourly rollup runs identically as a batch DataFrame (oracle-checkable)
  * and as a watermarked streaming aggregation (`readStream` →
  * `withWatermark` → windowed group → sink), which is the Spark-idiomatic
  * shape for incremental bronze ingestion at scale.
  */
object EventStreams {

  /** Events file schema as of the nanos-era data generation (ts as
    * nanosecond longs). Kept as the fallback when the landing directory is
    * empty at stream start; live dirs are footer-probed instead (see
    * [[readEventStream]]) because the physical ts encoding has drifted
    * across data generations (int64-nanos vs timestamp[us]). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize `ts` to session-zone TimestampType whichever physical
    * encoding it was read as — same dispatch as the batch loader
    * (graft.queries.Parity.normalizeEventTs), so batch and stream agree. */
  def normalize(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
    case _                => raw
  }

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
    // A file stream needs a declared schema; probe the landing dir's real
    // footer (one cheap driver-side metadata read) instead of hard-coding
    // one encoding — the batch read applies the same legacy-nanos conf and
    // therefore yields exactly the schema the stream will decode with.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fallback ONLY for the empty/missing-dir start case (Spark raises
    // AnalysisException for both): a transient IO/corruption failure on a
    // live directory must propagate at stream start instead of silently
    // pinning the legacy-nanos schema for the stream's lifetime and
    // surfacing later as a confusing decode error.
    val schema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => rawSchema }
    normalize(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir))
  }

  /** Gap-based sessionization, batch form: a session breaks after
    * `gapSeconds` of inactivity per user. Two windows — a lag to flag
    * session starts, a running sum to number sessions — then one
    * aggregation per (user, session). All integer epoch arithmetic, so
    * the DuckDB oracle matches exactly.
    *
    * Scale: both windows and the final group share the `user_id` hash
    * partitioning, so the whole flow is ONE shuffle; sessions never
    * cross partitions. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("tse", unix_timestamp(col("ts")))
      .withColumn("is_new",
        when(col("tse") - lag(col("tse"), 1).over(byUser) > gapSeconds ||
          lag(col("tse"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tse")).as("start_epoch"),
        max(col("tse")).as("end_epoch"))
      .withColumn("duration_s", col("end_epoch") - col("start_epoch"))
  }

  /** Streaming exact dedup: drop re-deliveries of the same event id,
    * with state bounded by the watermark horizon
    * (`dropDuplicatesWithinWatermark` expires ids older than the
    * watermark — the streaming twin of `ext.Dedup.exactGroups`). */
  def dedupedStream(events: DataFrame, idCols: Seq[String] = Seq("event_id")): DataFrame =
    events.dropDuplicatesWithinWatermark(idCols)

  /** Open-session state carried between micro-batches per user. */
  case class SessionState(sessionSeq: Long, startEpoch: Long, lastEpoch: Long, nEvents: Long)

  /** One closed (or timeout-flushed) session. */
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
                        start_epoch: Long, end_epoch: Long)

  /** Gap-based sessionization, streaming form: custom per-key state via
    * `flatMapGroupsWithState` (the Spark-idiomatic stateful operator the
    * batch `sessionize` windows can't express incrementally). Sessions
    * close when a later event for the same user exceeds the gap, or when
    * the event-time watermark passes `gapSeconds` after the last seen
    * event (timeout flush) — state stays bounded by active users.
    *
    * Events must carry a watermark on `ts` before this is applied. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800)
      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .select(col("user_id").cast(LongType), unix_timestamp(col("ts")).as("tse"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed: flush the open session and drop state
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.sessionSeq, s.nEvents, s.startEpoch, s.lastEpoch))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var closed = List.empty[SessionOut]
            var st = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
            sorted.foreach { t =>
              if (st.startEpoch < 0) st = SessionState(1L, t, t, 1L)
              else if (t - st.lastEpoch > gapSeconds) {
                closed ::= SessionOut(user, st.sessionSeq, st.nEvents, st.startEpoch, st.lastEpoch)
                st = SessionState(st.sessionSeq + 1, t, t, 1L)
              } else st = st.copy(lastEpoch = t, nEvents = st.nEvents + 1)
            }
            if (st.startEpoch >= 0) {
              state.update(st)
              // flush when no event arrives within the gap (event time)
              state.setTimeoutTimestamp((st.lastEpoch + gapSeconds) * 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Native session-window streaming aggregate — the declarative twin of
    * [[sessionizeStream]]: `session_window` lets Catalyst plan the
    * dedicated session-merge exec (UpdatingSessions + MergingSessionsExec
    * folding overlapping [event, event+gap) windows per user inside one
    * keyed exchange, state bounded by the watermark), instead of
    * hand-rolled `flatMapGroupsWithState` bookkeeping. Append mode emits
    * each session exactly once, when the watermark passes its end —
    * windows are [first, last+gap), the same rule as the batch
    * `x_session_window` query, so the two twins agree row-for-row on
    * closed sessions. Events must carry a watermark on `ts`. */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("start_epoch"),
        unix_timestamp(col("sw.end")).as("end_epoch"),
        col("n_events"))

  /** Incremental SCD2 over a stream: every micro-batch merges into the
    * versioned dimension table via `foreachBatch` — the streaming form of
    * the reference's silver merge job (`b2s_yfinance.py:142-186`, which
    * runs per scheduled batch; here the scheduler is the stream trigger).
    * Each merge is the same deterministic batch dataflow as
    * [[graft.scd.Scd2.merge]], and [[graft.core.TableCatalog]]'s
    * versioned-pointer overwrite gives the read-modify-write step the
    * single-writer atomicity Delta's MERGE provided in the reference.
    * Returns a started query; callers own its lifecycle. */
  def scd2Sink(
      source: DataFrame,
      scd: graft.scd.Scd2,
      catalog: graft.core.TableCatalog,
      table: String): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        scd2Apply(batch.toDF(), scd, catalog, table)
      }
      .start()

  /** The exact read-merge-overwrite fold [[scd2Sink]] runs per
    * micro-batch — extracted so the deterministic batch twin
    * (`st_scd2_sink`) drives the IDENTICAL code under the DuckDB gate:
    * the stream and the twin cannot drift apart, because there is one
    * body. */
  def scd2Apply(batch: DataFrame, scd: graft.scd.Scd2,
      catalog: graft.core.TableCatalog, table: String): Unit = {
    val spark = batch.sparkSession
    val merged =
      if (catalog.exists(table)) scd.merge(catalog.read(spark, table), batch)
      else scd.initialize(batch)
    catalog.overwrite(merged, table)
  }

  /** Streaming incremental view maintenance: fold each micro-batch into
    * a registered summary table ([[graft.plans.MaterializedViews]]) with
    * the same partial-state algebra the rollup rewrite reads (sum+sum,
    * min of mins, max of maxs, cnt+cnt). The summary stays queryable —
    * and rewrite-eligible — while the stream runs, and each batch costs
    * O(|batch| + |summary|), never a base-table rescan: this is the
    * streaming half of the classic lambda architecture collapsed into
    * one artifact (the batch rewrite and the stream refresh share the
    * measure definitions, so they cannot drift). */
  def mvRefreshSink(
      source: DataFrame,
      mv: graft.plans.MaterializedViews.MvDef): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.plans.MaterializedViews.refresh(batch.sparkSession, mv, batch.toDF())
      }
      .start()

  /** Watermarked stream-stream interval join: each purchase picks up the
    * same user's clicks from the preceding `lookbackSeconds` (click
    * attribution). Both sides watermark, and the join condition bounds
    * click time BOTH ways relative to purchase time, so each side's
    * buffered state expires as the other side's watermark advances —
    * without the range bound a stream-stream join must hold every row
    * forever. Works unchanged on batch frames (watermarks no-op). */
  def clickAttribution(
      purchases: DataFrame,
      clicks: DataFrame,
      lookbackSeconds: Long = 3600): DataFrame =
    attributionJoin(purchases, clicks, lookbackSeconds, "inner")

  /** LEFT OUTER form of [[clickAttribution]]: purchases with no click in
    * the lookback still emit — with null click columns — once the click-
    * side watermark passes the end of their lookback window (the engine
    * can only then prove no match will arrive). The state-cleanup
    * contract is identical to the inner join; the outer semantics add
    * the "unattributed purchase" rows a funnel-loss report needs, which
    * an inner join silently drops. */
  def clickAttributionOuter(
      purchases: DataFrame,
      clicks: DataFrame,
      lookbackSeconds: Long = 3600): DataFrame =
    attributionJoin(purchases, clicks, lookbackSeconds, "left_outer")

  private def attributionJoin(
      purchases: DataFrame,
      clicks: DataFrame,
      lookbackSeconds: Long,
      joinType: String): DataFrame = {
    val p = purchases
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    val c = clicks
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    p.join(c,
        col("click_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookbackSeconds SECONDS"),
        joinType)
      .select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")
  }

  /** Stream-static enrichment join: every micro-batch joins the event
    * stream
    * against a dimension snapshot. A stream-static join holds NO
    * streaming state (the static side is simply joined per micro-batch),
    * and the broadcast hint keeps the streaming side shuffle-free: at
    * 1000 executors the events never move. Left join so unmatched events
    * survive with null enrichment (they'd silently drop on an inner
    * join). */
  def enrichedStream(events: DataFrame, dim: DataFrame,
      keys: Seq[String] = Seq("user_id")): DataFrame =
    events.join(broadcast(dim), keys, "left")

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

  /** Streaming drift monitor — the windowed twin of the batch `x_drift`
    * gate: per (event_type, 1 h event-time window, width-50 value bin),
    * compare the observed count against a STATIC reference profile of
    * expected-per-hour rates (e.g. yesterday's batch, hourly-averaged)
    * by chi-square component — the live "did the feed's distribution
    * move" alarm. Bins the reference never saw emit a NULL component
    * (new-regime signal), mirroring the batch gate.
    *
    * Shape notes: the reference joins BEFORE the windowed aggregation —
    * a stateless broadcast stream-static join (a post-aggregation join
    * would be another stateful operator); the expected rate rides
    * through the aggregate as `min` (constant per group). Watermarked
    * append mode: each (window, bin) row emits exactly once when its
    * window closes, state is O(open windows × bins), never O(rows). */
  def driftStream(events: DataFrame, hourlyRef: DataFrame): DataFrame =
    events
      .withColumn("bin", floor(col("value") / lit(50.0)).cast("long"))
      .join(broadcast(hourlyRef), Seq("event_type", "bin"), "left")
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"), col("bin"))
      .agg(count(lit(1)).as("n_cur"), min(col("expected")).as("expected"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("bin"), col("n_cur"), col("expected"),
        ((col("n_cur").cast("double") - col("expected")) *
          (col("n_cur").cast("double") - col("expected")) / col("expected"))
          .as("chi2_component"))

  /** Hourly-averaged reference profile for [[driftStream]], built from a
    * BATCH of reference events: expected count per (event_type, bin) per
    * hour = total bin count / distinct hours observed. */
  def hourlyReference(events: DataFrame): DataFrame = {
    val binned = events.select(col("event_type"),
      floor(col("value") / lit(50.0)).cast("long").as("bin"),
      (unix_timestamp(col("ts")) / 3600L).cast("long").as("hr"))
    val hours = binned.agg(countDistinct(col("hr")).as("n_hours"))
    binned.groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
      .join(broadcast(hours))
      .select(col("event_type"), col("bin"),
        (col("n").cast("double") / col("n_hours").cast("double"))
          .as("expected"))
  }

  /** Streaming OHLC bars — the incremental twin of the batch
    * `x_ohlc_bars` query: per (event_type, hour) window, open/close are
    * `min_by`/`max_by` on the deterministic (ts, event_id) order (both
    * are declarative aggregates, so they fold incrementally across
    * micro-batches and merge across partial states — no sort, no custom
    * state), high/low/volume are plain extremes and an exact decimal
    * sum. Append mode emits each bar exactly once when the watermark
    * closes its hour; out-of-order rows inside the lateness bound land
    * in the right bar because every aggregate here is order-free over
    * the final row set. Events must carry `event_id` for the tiebreak. */
  def ohlcStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("volume"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("n"), col("open"), col("close"), col("high"), col("low"),
        col("volume"))

  /** Streaming ingestion into a versioned catalog table: each micro-batch
    * goes through [[graft.core.TableCatalog.append]] — the full commit
    * protocol (staging + OCC lock + hardlink/sidecar carry), so streaming
    * ingestion composes with every catalog feature for free: with
    * `optimize.write=true` on a curve-laid-out table, every micro-batch
    * is re-staged onto the pinned grid and the table stays FULLY
    * clustered batch over batch — no separate maintenance tick between a
    * stream and good data skipping (StreamingSpec pins this). */
  def appendSink(source: DataFrame, catalog: graft.core.TableCatalog,
                 table: String, appId: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        appId match {
          // exactly-once: the micro-batch id is the transaction version;
          // a batch foreachBatch re-delivers after a checkpoint-commit
          // crash is dropped by the catalog's in-commit ledger check
          case Some(a) => catalog.appendTxn(batch.toDF(), table, a, id); ()
          case None    => catalog.append(batch.toDF(), table)
        }
      }
      .start()
}
