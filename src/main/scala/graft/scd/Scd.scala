package graft.scd

import graft.core.Clock
import graft.ops.Hashing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure-Spark slowly-changing-dimension engine.
  *
  * The reference implements SCD1/2/3 with Delta `MERGE`
  * (`utils/scd/scd.py:52-59,74-109,124-143` and the inline SCD2 at
  * `medallion/silver/b2s_yfinance.py:103-186`). This runtime has no Delta
  * jars, so each type is re-expressed as a deterministic functional
  * merge: `(target, source) => newTarget` built from joins + conditional
  * projections + `unionByName` (SURVEY.md §7.4). Persistence (versioned
  * Parquet overwrite) lives in [[graft.core.TableCatalog]]; these
  * functions are storage-agnostic and fully testable in-memory.
  *
  * Scale notes: every join shuffles on the business key only; the source
  * batch is typically ≪ target, so AQE broadcast-joins it. At 100 TB the
  * rewrite cost is bounded by partition-scoped merges — partition the
  * target by a stable key-derived column and rewrite only partitions
  * containing touched keys (`Scd2.merge` preserves partition pruning
  * because untouched rows pass through unchanged).
  */
case class ScdColumns(
    hash: String = "row_hash",
    from: String = "effective_from",
    to: String = "effective_to",
    current: String = "is_current")

object Scd {

  /** S9 equivalent — `ALTER TABLE ADD COLUMN` for SCD bookkeeping
    * (`b2s_yfinance.py:46-61`): null-pad any missing columns. Legacy rows
    * get `is_current = null` and are thereafter frozen history, matching
    * the reference's merge-condition semantics (`t.is_current = true`
    * never matches null). */
  def ensureScdColumns(df: DataFrame, cols: ScdColumns = ScdColumns()): DataFrame = {
    val want: Seq[(String, DataType)] = Seq(
      cols.hash -> StringType, cols.from -> DateType,
      cols.to -> DateType, cols.current -> BooleanType)
    want.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(t))
    }
  }

  private def keyCond(left: DataFrame, right: DataFrame, keys: Seq[String]): Column =
    keys.map(k => left(k) === right(k)).reduce(_ && _)

  /** Reduce a source batch to exactly one row per business key — a
    * raw-zone re-delivery may carry a key twice, and inserting both would
    * break the one-current-row invariant. Winner selection is a
    * deterministic argmax: greatest `sourceOrder` columns first (e.g. an
    * ingestion timestamp = keep latest), then the remaining columns as
    * total tiebreak. Runs as a single partial-aggregating
    * `max(struct(...))` shuffle on the keys — no window, no second pass. */
  def dedupeByKeys(src: DataFrame, keys: Seq[String],
      sourceOrder: Seq[String] = Seq.empty): DataFrame = {
    val rest = src.columns.filterNot(keys.contains).toSeq
    val payload = sourceOrder ++ rest.filterNot(sourceOrder.contains)
    src.groupBy(keys.map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__winner"))
      .select(keys.map(col) ++ payload.map(c => col(s"__winner.$c").as(c)): _*)
  }
}

/** SCD Type 2 — hash-based row versioning (`b2s_yfinance.py:103-186`,
  * `scd.py:74-109`). Maintains the invariant: at most one
  * `is_current = true` row per business key; expired rows carry
  * `[effective_from, effective_to)`.
  */
class Scd2(
    keys: Seq[String],
    tracked: Seq[String],
    cols: ScdColumns = ScdColumns(),
    clock: Clock = Clock.Wall,
    strictHash: Boolean = false,
    sourceOrder: Seq[String] = Seq.empty) extends Serializable {

  private def today: Column = lit(java.sql.Date.valueOf(clock.today))

  def withHash(src: DataFrame): DataFrame =
    if (src.columns.contains(cols.hash)) src
    else Hashing.withRowHash(src, tracked, cols.hash, strictHash)

  /** One row per business key via [[Scd.dedupeByKeys]] (row hash rides in
    * the payload, so the argmax tiebreak is total). */
  private def dedupeSource(src: DataFrame): DataFrame =
    Scd.dedupeByKeys(src, keys, sourceOrder)

  /** First run — create the initial version set
    * (`b2s_yfinance.py:119-131`); deduped so the one-current-row-per-key
    * invariant holds from the very first batch. */
  def initialize(source: DataFrame): DataFrame =
    dedupeSource(withHash(source))
      .withColumn(cols.from, today)
      .withColumn(cols.to, lit(null).cast(DateType))
      .withColumn(cols.current, lit(true))

  /** Incremental merge — the reference's two Delta jobs (expire-changed
    * MERGE then anti-join append, `b2s_yfinance.py:142-186`) collapsed
    * into one deterministic dataflow:
    *
    *  - history rows (`is_current` ≠ true) pass through untouched;
    *  - current rows with a matching source key and a *different* hash are
    *    expired (`effective_to = today`, `is_current = false`);
    *  - current rows with no source match, or an identical hash, persist;
    *  - source rows without a surviving current match (changed or
    *    brand-new keys) insert as fresh current versions.
    *
    * Source rows with an unchanged hash are anti-joined away (no
    * duplicate versions), exactly like the reference's second job
    * re-reading the target *after* the expiry job. */
  def merge(target0: DataFrame, source: DataFrame): DataFrame = {
    val target = Scd.ensureScdColumns(target0, cols)
    val src = dedupeSource(withHash(source))

    val current = target.filter(col(cols.current) === true)
    val history = target.filter(col(cols.current).isNull || col(cols.current) =!= true)

    // Only the key + hash of the source matter for the expiry decision;
    // src is already one-row-per-key so this projection is dup-free.
    val srcKeys = src.select((keys :+ cols.hash).map(col): _*)
      .withColumnRenamed(cols.hash, "__src_hash")

    val joined = current.join(srcKeys, keys, "left")

    val expired = joined
      .filter(col("__src_hash").isNotNull && col(cols.hash) =!= col("__src_hash"))
      .drop("__src_hash")
      .withColumn(cols.to, today)
      .withColumn(cols.current, lit(false))

    val kept = joined
      .filter(col("__src_hash").isNull || col(cols.hash) === col("__src_hash"))
      .drop("__src_hash")

    val inserts = src
      .join(kept.select(keys.map(col): _*), keys, "left_anti")
      .withColumn(cols.from, today)
      .withColumn(cols.to, lit(null).cast(DateType))
      .withColumn(cols.current, lit(true))

    history
      .unionByName(expired)
      .unionByName(kept)
      .unionByName(inserts, allowMissingColumns = true)
  }

  /** initialize-or-merge entry point (`b2s_yfinance.py:116-186`). */
  def apply(target: Option[DataFrame], source: DataFrame): DataFrame =
    target match {
      case None    => initialize(source)
      case Some(t) => merge(t, source)
    }
}

/** SCD Type 4 — history table: the hot dimension holds exactly one row
  * per key (overwritten in place, SCD1-style), and every superseded
  * version is archived to a SEPARATE append-only history table stamped
  * with its validity interval. Completes the reference's SCD1/2/3 family
  * (`utils/scd/scd.py`) with the type it leaves out.
  *
  * Why this type exists at scale: SCD2 makes every dimension read pay
  * for history (filter `is_current` over current ∪ expired rows), and
  * every merge rewrite the full row set. Here the current table stays
  * O(keys) — joins against it broadcast where an SCD2 table wouldn't —
  * and the history side is append-only, which
  * [[graft.core.TableCatalog.append]] performs in O(batch) via hardlink
  * carry-over.
  *
  * Current-table schema: keys ++ tracked ++ row_hash ++ effective_from.
  * Archived rows add effective_to (the merge date that superseded them).
  */
class Scd4(
    keys: Seq[String],
    tracked: Seq[String],
    cols: ScdColumns = ScdColumns(),
    clock: Clock = Clock.Wall,
    strictHash: Boolean = false,
    sourceOrder: Seq[String] = Seq.empty) extends Serializable {

  private def today: Column = lit(java.sql.Date.valueOf(clock.today))

  private def withHash(src: DataFrame): DataFrame =
    if (src.columns.contains(cols.hash)) src
    else Hashing.withRowHash(src, tracked, cols.hash, strictHash)

  /** First run: deduped source becomes the current table; history starts
    * empty. */
  def initialize(source: DataFrame): DataFrame =
    Scd.dedupeByKeys(withHash(source), keys, sourceOrder)
      .withColumn(cols.from, today)

  /** One merge step: returns (newCurrent, archived).
    *
    *  - current rows with a matching source key and a different hash are
    *    replaced; the replaced version lands in `archived` with
    *    `effective_to = today`;
    *  - current rows with no source match, or an identical hash, persist
    *    with their original `effective_from`;
    *  - source rows for changed or brand-new keys enter current with
    *    `effective_from = today`.
    *
    * Both outputs are filters over the ONE [[mergeUnified]] dataflow;
    * append `archived` to the history table — never rewrite it. */
  def merge(current: DataFrame, source: DataFrame): (DataFrame, DataFrame) = {
    val u = mergeUnified(current, source)
    (u.filter(col("scd_table") === "current").drop("scd_table", cols.to),
      u.filter(col("scd_table") === "history").drop("scd_table"))
  }

  /** The merge as ONE dataflow: current ∪ history rows tagged by a
    * `scd_table` column, from a single full-outer key join whose rows
    * each explode into their branch outputs (kept / archived / entering
    * — a changed key emits two). The union-of-three-branches form pays
    * the upstream (dedupe + join) once per branch — 3× at plan level;
    * this form pays it once, and the dedupe's key partitioning feeds the
    * join with no re-exchange. Current-table invariant (≤ 1 row per key
    * on both inputs) is the caller's; outputs preserve it. */
  def mergeUnified(current: DataFrame, source: DataFrame): DataFrame = {
    val src = Scd.dedupeByKeys(withHash(source), keys, sourceOrder)
    val payload = current.columns.filterNot(keys.contains).toSeq // tracked ++ hash ++ from
    val s = payload.foldLeft(src.withColumn(cols.from, today)) {
      (d, c) => d.withColumnRenamed(c, s"__s_$c")
    }
    val joined = current.join(s, keys, "full_outer")
    val srcHash = col(s"__s_${cols.hash}")
    // row_hash is a non-null sha2 on both sides, so null ⇔ side absent
    val changed = srcHash.isNotNull && col(cols.hash).isNotNull &&
      col(cols.hash) =!= srcHash
    def row(side: String => Column, to: Column, table: String) = struct(
      payload.map(c => side(c).as(c)) :+ to.as(cols.to) :+
        lit(table).as("scd_table"): _*)
    val nullTo = lit(null).cast(DateType)
    val kept = when(srcHash.isNull || (col(cols.hash) === srcHash),
      row(col, nullTo, "current"))
    val arch = when(changed, row(col, today, "history"))
    val enter = when(col(cols.hash).isNull || changed,
      row(c => col(s"__s_$c"), nullTo, "current"))
    joined.select(
      keys.map(col) :+
        explode(filter(array(kept, arch, enter), _.isNotNull)).as("__r"): _*)
      .select(keys.map(col) ++ payload.map(c => col(s"__r.$c")) :+
        col(s"__r.${cols.to}") :+ col("__r.scd_table"): _*)
  }
}

/** SCD Type 1 — overwrite in place, no history (`scd.py:41-66`):
  * matched rows take the source's tracked values, unmatched target rows
  * persist, unmatched source rows insert. */
class Scd1(keys: Seq[String], tracked: Seq[String]) extends Serializable {

  def merge(target: DataFrame, source: DataFrame): DataFrame = {
    val passthrough = target.columns.filterNot(c => keys.contains(c) || tracked.contains(c))
    val t = target.alias("t")
    // Explicit matched marker: a matched row takes the source's tracked
    // values even when the source value is null (Delta whenMatchedUpdate
    // semantics) — coalesce would silently keep the old value instead.
    // Deterministic argmax dedupe, not dropDuplicates: a re-delivered key
    // must not flip which payload wins between runs.
    val s = Scd.dedupeByKeys(source, keys)
      .withColumn("__matched", lit(true)).alias("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val matchedOrKept = t.join(s, cond, "left").select(
      keys.map(k => col(s"t.$k").as(k)) ++
      tracked.map(c =>
        when(col("__matched"), col(s"s.$c")).otherwise(col(s"t.$c")).as(c)) ++
      passthrough.map(c => col(s"t.$c").as(c)): _*)
    val inserts = s.join(t, cond, "left_anti")
      .select(keys.map(k => col(k)) ++ tracked.map(col(_)): _*)
    matchedOrKept.unionByName(inserts, allowMissingColumns = true)
  }
}

/** SCD Type 3 — limited history: current + previous column
  * (`scd.py:114-143`): on change, previous ← old current, current ← new;
  * new keys insert with null previous. */
class Scd3(keys: Seq[String], currentCol: String, previousCol: String) extends Serializable {

  def merge(target: DataFrame, source: DataFrame): DataFrame = {
    val t = target.alias("t")
    // deterministic argmax dedupe (see Scd1.merge)
    val srcOne = Scd.dedupeByKeys(source, keys)
    val s = srcOne.select((keys :+ currentCol).map(col): _*)
      .withColumnRenamed(currentCol, "__s_cur").alias("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val others = target.columns
      .filterNot(c => keys.contains(c) || c == currentCol || c == previousCol)
    // MERGE updates only when values *differ* (`t.cur <> s.cur`), which in
    // SQL three-valued logic never fires on nulls — matching the
    // reference's condition exactly.
    val changed = col(s"t.$currentCol") =!= col("__s_cur")
    val updated = t.join(s, cond, "left").select(
      keys.map(k => col(s"t.$k").as(k)) ++ Seq(
        when(changed, col("__s_cur")).otherwise(col(s"t.$currentCol")).as(currentCol),
        when(changed, col(s"t.$currentCol")).otherwise(col(s"t.$previousCol")).as(previousCol)) ++
      others.map(c => col(s"t.$c").as(c)): _*)
    val inserts = srcOne
      .select((keys :+ currentCol).map(col): _*).alias("s")
      .join(t, keys.map(k => col(s"s.$k") === col(s"t.$k")).reduce(_ && _), "left_anti")
      .withColumn(previousCol, lit(null).cast(target.schema(previousCol).dataType))
    updated.unionByName(inserts, allowMissingColumns = true)
  }
}

/** SCD Type 6 — the HYBRID dimension (1+2+3 = 6): full Type-2 row
  * versioning PLUS, on every row (history included), a Type-1 overlay
  * (`current_<c>` = the key's present value, overwritten in place as it
  * changes) and a Type-3 glance-back (`prev_<c>` = the immediately
  * preceding version's value). The point: historical fact rows joined to
  * this dimension can group by EITHER the attribute as-it-was (the
  * Type-2 column) or as-it-is (the overlay) without a second join to a
  * current-only table, and deltas read off one row.
  *
  * Built BY composition on [[Scd2]]: merge strips the decorations,
  * delegates the row-versioning (so every Type-2 invariant and its spec
  * coverage carries over verbatim), and re-derives the overlay columns —
  * a current-rows broadcast-size join for `current_*`, one lag window
  * per key for `prev_*`. Decorations are DERIVED state: recomputing
  * them per merge is O(history of touched keys), exactly the rows the
  * merge already shuffles. */
class Scd6(
    keys: Seq[String],
    tracked: Seq[String],
    cols: ScdColumns = ScdColumns(),
    clock: Clock = Clock.Wall,
    sourceOrder: Seq[String] = Seq.empty) extends Serializable {

  private val scd2 = new Scd2(keys, tracked, cols, clock, sourceOrder = sourceOrder)

  private def decorations: Seq[String] =
    tracked.flatMap(c => Seq(s"current_$c", s"prev_$c"))

  private def decorate(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cur = df.filter(col(cols.current) === true)
      .select(keys.map(col) ++ tracked.map(c => col(c).as(s"current_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(cols.from))
    val withPrev = tracked.foldLeft(df) { (d, c) =>
      d.withColumn(s"prev_$c", lag(col(c), 1).over(w))
    }
    withPrev.join(cur, keys, "left")
  }

  def initialize(source: DataFrame): DataFrame = decorate(scd2.initialize(source))

  def merge(target: DataFrame, source: DataFrame): DataFrame =
    decorate(scd2.merge(target.drop(decorations: _*), source))
}
