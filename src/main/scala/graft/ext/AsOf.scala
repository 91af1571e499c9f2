package graft.ext

import graft.plans.{AsOfJoin, AsOfJoinStrategy}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Backward as-of join: each left row picks up the payload of the most
  * recent right row with the same key and `right.ts <= left.ts`
  * (inclusive) — the point-in-time lookup every time-series enrichment
  * needs (quotes→trades, rates→transactions, last-login→event).
  *
  * The reference pipeline has no such operator; DuckDB ships it as
  * `ASOF JOIN`, which the oracle uses directly.
  *
  * Spark-first composition rather than a custom `SparkPlan`: tag both
  * inputs, union them, and carry the right payload forward with
  * `last(payload, ignoreNulls)` over a key-partitioned, time-ordered
  * window. Cost is ONE shuffle on the key — same as the theoretical
  * minimum for a co-partitioned merge — with no interval explosion and
  * no range-condition nested-loop fallback, and it survives arbitrarily
  * many right rows per key. Skewed keys behave exactly like any other
  * window aggregation (salt upstream if a single key exceeds a
  * partition).
  */
object AsOf {

  /** @param leftTs / rightTs orderable time columns (same type family)
    * @param payload right columns to carry onto left rows (must not
    *        collide with left column names)
    * @param tiebreak right column ordering the winner when several right
    *        rows share (key, ts) — the greatest (ts, tiebreak) wins, so
    *        results are deterministic for non-unique timestamps. */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String): DataFrame =
    joinDirectional(left, right, keys, leftTs, rightTs, payload, tiebreak,
      forward = false)

  /** Forward as-of join: each left row picks up the payload of the FIRST
    * right row with the same key and `right.ts >= left.ts` (inclusive) —
    * next-quote / follow-up-event attribution. Among right ties on
    * (key, ts) the SMALLEST tiebreak wins (first-seen convention, the
    * mirror of [[joinBackward]]'s greatest-wins). Same one-shuffle
    * union+window shape. */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String): DataFrame =
    joinDirectional(left, right, keys, leftTs, rightTs, payload, tiebreak,
      forward = true)

  /** Null-timestamp contract (all four forms agree, matching the DuckDB
    * `ASOF JOIN` oracle whose `>=` comparison never matches null): right
    * rows with a null timestamp are IGNORED — a quote with no time is not
    * "known since forever" — and left rows with a null timestamp keep a
    * null payload. */
  private def joinDirectional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String,
      forward: Boolean): DataFrame = {
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload collides with left columns: $clash")

    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val keyCols: Seq[Column] = keys.map(col)
    val lSchema = left.select(leftCols.map(col): _*).schema
    val rSchema = right.select(payload.map(col): _*).schema
    // The tiebreak orders in its NATIVE type — a cast (to long, say) would
    // null out strings (nondeterministic ties) or truncate fractions,
    // silently diverging from the native/broadcast forms.
    val tbType = right.schema(right.schema.fieldIndex(tiebreak)).dataType

    // Side ordering puts the right row on the INCLUSIVE side of the left
    // row at equal ts: backward scans [start, current] so right sorts
    // first (side 0 < 1); forward scans [current, end] so right sorts
    // last (side 1 > 0). The winner among right (key, ts) ties is the one
    // nearest the left row in scan order: greatest tiebreak for last(),
    // smallest for first().
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val l = left.select(keyCols ++ Seq(
      col(leftTs).as("__ts"), lit(lSide).as("__side"),
      lit(null).cast(tbType).as("__ord"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rSchema).as("__r")): _*)

    val r = right.filter(col(rightTs).isNotNull)
      .select(keyCols ++ Seq(
        col(rightTs).as("__ts"), lit(rSide).as("__side"),
        col(tiebreak).as("__ord"),
        lit(null).cast(lSchema).as("__l"),
        struct(payload.map(col): _*).as("__r")): _*)

    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__ord"))
    val (w, pick) =
      if (forward)
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__r"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__r"), ignoreNulls = true))

    r.unionByName(l)
      // Null left ts sorts before every real right ts, which would hand a
      // forward-scanning first() a spurious match — gate the pick instead.
      .withColumn("__asof", when(col("__ts").isNotNull, pick.over(w)))
      .filter(col("__side") === lSide)
      .select(keyCols ++ Seq(col("__ts").as(leftTs)) ++
        leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Broadcast form of [[joinBackward]] for a SMALL right side (a
    * quote/rate/dim-like table): the right side collapses to one row per
    * key holding its (ts, tiebreak, payload) structs sorted ascending,
    * that tiny table broadcasts, and each left row takes the last struct
    * at or before its timestamp — the big side is never shuffled at all
    * (the other two forms cost one key shuffle of the left). Linear scan
    * per left row over the key's right rows; right-per-key is small by
    * precondition, so prefer this only when the packed right side fits
    * the broadcast threshold. */
  def joinBackwardBroadcast(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload collides with left columns: $clash")

    // sort_array orders structs field-by-field: (ts, tiebreak, ...) —
    // identical winner-among-ties rule as the other forms. Null right
    // timestamps need no explicit filter here: `x("__ts") <= leftTs` is
    // null for them, and array `filter` drops non-true elements — the
    // shared null-ts contract (see joinDirectional) for free. A null left
    // ts likewise empties `hits` → null payload.
    val packed = right.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(rightTs).as("__ts"), col(tiebreak).as("__tb"),
        struct(payload.map(col): _*).as("__p")))).as("__arr"))

    val hits = filter(col("__arr"), x => x("__ts") <= col(leftTs))
    left.join(broadcast(packed), keys, "left")
      // ANSI mode: element_at on an empty array throws — gate on size.
      .withColumn("__best",
        when(size(hits) > 0, element_at(hits, -1)("__p")))
      .select(left.columns.map(col) ++
        payload.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** Whole-operator form of [[joinBackward]] via the native
    * [[graft.plans.AsOfJoinExec]] merge sweep (same semantics, same
    * oracle; one hash-clustered shuffle per SIDE in its own row shape
    * instead of one union-shaped shuffle, and O(1) join state per
    * partition). Output: every left column, then the payload columns. */
  def joinBackwardNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload collides with left columns: $clash")

    val spark = left.sparkSession
    Bridge.installStrategy(spark, AsOfJoinStrategy)
    // Prune the right side explicitly: generic optimizer rules don't see
    // through a custom node, so column pruning must happen at build time.
    // Both sides re-alias every column to itself: when left and right
    // derive from the SAME relation, DeduplicateRelations re-instances
    // one subtree's exprIds, and it does not rewrite expressions held by
    // a node type it doesn't know. Fresh boundary Aliases keep their
    // exprIds through that rewrite, so the node's key/ts/payload
    // references stay valid no matter which side gets re-instanced.
    val rCols = (keys ++ Seq(rightTs, tiebreak) ++ payload).distinct
    // Shared null-ts contract (see joinDirectional): without this filter
    // the exec's natural ascending ordering sorts a null right ts first
    // and its `<=` compare matches every left row ("known since forever").
    // Null LEFT ts needs no guard — those rows sort before any surviving
    // right row of their key, so the sweep holds no payload yet.
    val rPlan = Bridge.analyzed(right.filter(col(rightTs).isNotNull)
      .select(rCols.map(c => col(c).as(c)): _*))
    val lPlan = Bridge.analyzed(left.select(left.columns.toSeq.map(c => col(c).as(c)): _*))
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    Bridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      payload.map(attr(rPlan, _)), attr(rPlan, tiebreak)))
  }
}
