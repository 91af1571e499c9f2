package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode,
  TimerValues, ValueState}
import org.apache.spark.sql.types.LongType

/** Arbitrary stateful streaming via the Spark 4 `transformWithState` API
  * (state-v2): composable, TYPED state variables (ValueState / MapState /
  * ListState) backed by the RocksDB state store, replacing the single
  * opaque blob `flatMapGroupsWithState` forces per key.
  *
  * The operator here is a streaming running-profile: per user, cumulative
  * event count, exact value sum in cents, and distinct event-type count —
  * the always-fresh per-entity feature vector a telemetry pipeline serves.
  * Versus the gap-session processor in [[EventStreams.sessionizeStream]],
  * the win is state SHAPE: the distinct-type tally lives in a MapState
  * whose per-type entries update point-wise (RocksDB column-family puts),
  * so a hot user's state write is O(types touched this batch), not a full
  * blob rewrite — the property that keeps checkpoint commit time flat when
  * per-key state grows at 100 TB.
  *
  * Totals are exact longs (cents from a decimal(18,2) cast, the repo-wide
  * money convention), so the streaming result is bit-comparable with the
  * batch twin `x_user_state` — StreamingSpec pins that equivalence across
  * multi-batch input with re-keyed updates.
  */
object StateV2 {

  /** One running per-user profile row (emitted per key per micro-batch). */
  case class UserStat(user_id: Long, n_events: Long, sum_cents: Long,
                      n_types: Long)

  /** State-v2 processor: one ValueState for the (count, cents) totals +
    * one MapState for per-type counts. Emits the refreshed profile for
    * every key touched in the batch (Update-mode semantics). */
  class UserStatsProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, (Long, String, Long), UserStat] {
    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var typeCounts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttl)
      typeCounts = getHandle.getMapState[String, Long]("types",
        Encoders.STRING, Encoders.scalaLong, ttl)
    }

    /** Load a batch-computed profile into this key's state (the
      * initial-state bootstrap path — see [[UserStatsProcessorWithInit]]). */
    private[streaming] def seedState(seed: UserSeed): Unit = {
      totals.update((seed.n_events, seed.sum_cents))
      seed.type_counts.foreach { case (t, n) => typeCounts.updateValue(t, n) }
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
                                 timerValues: TimerValues): Iterator[UserStat] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, tpe, c) =>
        n += 1L
        cents += c
        val cur = if (typeCounts.containsKey(tpe)) typeCounts.getValue(tpe) else 0L
        typeCounts.updateValue(tpe, cur + 1L)
      }
      totals.update((n, cents))
      Iterator.single(UserStat(key, n, cents, typeCounts.keys().size.toLong))
    }
  }

  /** Running per-user profile over a (possibly streaming) events frame.
    * Update mode: each micro-batch emits the refreshed row for every user
    * it touched; the latest row per user is the current profile. */
  def userStatsStream(events: DataFrame)
                     (implicit spark: SparkSession): Dataset[UserStat] = {
    import spark.implicits._
    events
      .select(col("user_id").cast(LongType),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast(LongType).as("cents"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** [[userStatsStream]] with per-key state TTL (processing-time): a
    * user idle longer than `ttl` has their profile EVICTED from the
    * RocksDB store — the bounded-state posture for a 100 TB stream whose
    * key space grows without end (most user IDs go quiet forever; state
    * for them is rent with no income). TTL requires
    * TimeMode.ProcessingTime — expiry is judged against the store's
    * clock at batch time, value-state reads of an expired entry return
    * "absent", so a returning user simply starts a fresh profile. The
    * trade is explicit: profiles are exact only within a TTL window;
    * the unbounded-exact form is [[userStatsStream]]. */
  def userStatsStreamTtl(events: DataFrame, ttl: java.time.Duration)
                        (implicit spark: SparkSession): Dataset[UserStat] = {
    import spark.implicits._
    events
      .select(col("user_id").cast(LongType),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast(LongType).as("cents"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor(new TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Batch twin of [[userStatsStream]] — the same profile as one exact
    * keyed aggregation (count / decimal-cents sum / distinct types on a
    * single user_id exchange); the driver's `x_user_state` contract query. */
  def userStatsBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast(LongType))
          .as("sum_cents"),
        count_distinct(col("event_type")).as("n_types"))

  /** One closed session (same shape as
    * [[EventStreams.SessionOut]] — kept separate so the two stateful
    * APIs' encoders stay independent). */
  case class SessionRow(user_id: Long, session_seq: Long, n_events: Long,
                        start_epoch: Long, end_epoch: Long)

  /** Open-session state; `deadline` is the registered timer's expiry
    * (ms), kept so a newer batch can delete the superseded timer. */
  case class SessionSt(seq: Long, start: Long, last: Long, n: Long,
                       deadline: Long)

  /** Gap sessionization on the state-v2 TIMER API — the event-time
    * timeout flush [[EventStreams.sessionizeStream]] gets from
    * GroupStateTimeout, re-expressed with explicit per-key timers:
    * each batch re-arms one timer at (last event + gap), deleting the
    * timer it supersedes, and `handleExpiredTimer` flushes the open
    * session when the watermark crosses that deadline. Versus the
    * GroupState form, timers are a first-class multi-instance facility
    * (a processor can arm several per key) and state/timer lifecycles
    * are decoupled — this processor is the minimal correct use:
    * exactly one live timer per key with open state.
    * StreamingSpec pins both APIs to identical session sets. */
  class SessionTimerProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, (Long, Long, java.sql.Timestamp), SessionRow] {
    @transient private var open: ValueState[SessionSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionSt]("open",
        Encoders.product[SessionSt], TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, java.sql.Timestamp)],
        tv: TimerValues): Iterator[SessionRow] = {
      val sorted = rows.map(_._2).toSeq.sorted
      var closed = List.empty[SessionRow]
      var st =
        if (open.exists()) open.get() else SessionSt(0L, -1L, -1L, 0L, -1L)
      if (st.deadline >= 0) getHandle.deleteTimer(st.deadline)
      sorted.foreach { t =>
        if (st.start < 0) st = SessionSt(st.seq + 1, t, t, 1L, -1L)
        else if (t - st.last > gapSeconds) {
          closed ::= SessionRow(user, st.seq, st.n, st.start, st.last)
          st = SessionSt(st.seq + 1, t, t, 1L, -1L)
        } else st = st.copy(last = t, n = st.n + 1)
      }
      if (st.start >= 0) {
        val deadline = (st.last + gapSeconds) * 1000L
        open.update(st.copy(deadline = deadline))
        getHandle.registerTimer(deadline)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionRow] = {
      if (!open.exists()) return Iterator.empty
      val st = open.get()
      // a timer this batch superseded can still fire once; ignore it
      if (info.getExpiryTimeInMs < st.deadline) return Iterator.empty
      open.clear()
      Iterator.single(SessionRow(user, st.seq, st.n, st.start, st.last))
    }
  }

  /** One user's bootstrap state: historical totals plus the per-type
    * count breakdown (the MapState can't be rebuilt from totals alone). */
  case class UserSeed(n_events: Long, sum_cents: Long,
                      type_counts: Seq[(String, Long)])

  /** [[UserStatsProcessor]] with batch-bootstrapped state — the
    * backfill → stream handoff every production stateful job needs: the
    * historical profile is computed ONCE as a batch aggregate, loaded
    * into the state store through `handleInitialState` before the first
    * micro-batch, and the stream continues incrementally from there —
    * no replaying months of history through the stream path, and no
    * torn window where the profile double- or under-counts. */
  class UserStatsProcessorWithInit
      extends StatefulProcessorWithInitialState[Long, (Long, String, Long),
        UserStat, UserSeed] {
    private val inner = new UserStatsProcessor
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      inner.setHandle(getHandle)
      inner.init(outputMode, timeMode)
    }
    override def handleInitialState(key: Long, seed: UserSeed,
        timerValues: TimerValues): Unit =
      inner.seedState(seed)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[UserStat] =
      inner.handleInputRows(key, rows, timerValues)
  }

  /** [[userStatsStream]] bootstrapped from a batch-computed profile
    * (`history`: the raw historical events frame — seeded per user with
    * totals AND the per-type breakdown). */
  def userStatsStreamFrom(events: DataFrame, history: DataFrame)
                         (implicit spark: SparkSession): Dataset[UserStat] = {
    import spark.implicits._
    val seeds = history
      .select(col("user_id").cast(LongType),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast(LongType).as("cents"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"), sum(col("c")).as("sum_cents"),
        collect_list(struct(col("event_type"), col("n"))).as("type_counts"))
      .as[(Long, Long, Long, Seq[(String, Long)])]
      .map { case (u, n, c, t) => (u, UserSeed(n, c, t)) }
      .groupByKey(_._1)
      .mapValues(_._2)
    events
      .select(col("user_id").cast(LongType),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast(LongType).as("cents"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessorWithInit, TimeMode.None(),
        OutputMode.Update(), seeds)
  }

  /** Gap sessionization via [[SessionTimerProcessor]]. `events` must
    * carry a watermark on `ts` (event-time timers fire against it). */
  def sessionizeTimers(events: DataFrame, gapSeconds: Long = 1800)
                      (implicit spark: SparkSession): Dataset[SessionRow] = {
    import spark.implicits._
    events
      .select(col("user_id").cast(LongType),
        unix_timestamp(col("ts")).as("tse"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
