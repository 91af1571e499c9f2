package graft.ext

import graft.plans.{RangeJoinPlan, RangeJoinStrategy}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Point-in-interval range joins: attach to each point row the interval
  * row(s) with `lo <= value < hi`. Spark has no native range-join
  * strategy, and the naive `a.join(b, a(v) >= b(lo) && a(v) < b(hi))`
  * plans as a nested-loop — O(points × intervals) compares.
  *
  * Two scale paths:
  *  - [[broadcastJoin]]: when the interval side is a small dimension
  *    (band tables, rate cards), broadcast it and let every executor do a
  *    local per-row scan — no shuffle at all; at a few thousand intervals
  *    this beats any clever structure.
  *  - [[binnedJoin]]: when both sides are large, discretize: each
  *    interval replicates into the fixed-width bins it covers
  *    (`sequence`+`explode`), each point keys into its single bin, and an
  *    ordinary shuffled equi-join on the bin plus an exact residual filter
  *    finishes the job. Shuffle volume is |points| + Σ interval-widths/bin
  *    — linear, skew-safe, AQE-coalescible; pick binWidth near the median
  *    interval width so replication stays O(1) per interval.
  */
object RangeJoin {

  def broadcastJoin(points: DataFrame, value: String,
                    intervals: DataFrame, lo: String, hi: String): DataFrame =
    points.join(broadcast(intervals),
      points(value) >= intervals(lo) && points(value) < intervals(hi))

  def binnedJoin(points: DataFrame, value: String,
                 intervals: DataFrame, lo: String, hi: String,
                 binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ip = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        endBin(col(lo), col(hi), binWidth))))
    val pp = points.withColumn("__bin", floor(col(value) / binWidth).cast("long"))
    pp.join(ip, Seq("__bin"))
      .filter(col(value) >= col(lo) && col(value) < col(hi))
      .drop("__bin")
  }

  /** Last bin a half-open interval [lo, hi) reaches, computed exactly:
    * `floor(hi/w)` except when `hi` sits exactly on a bin edge, where the
    * exclusive bound means the interval does not enter that bin. No float
    * epsilon — a subtraction like `hi - 1e-9` can land BELOW the bin of
    * `greatest(aLo, bLo)` for sub-epsilon overlaps, silently dropping a
    * genuinely overlapping pair from the owning-bin gate. Clamped to the
    * start bin so degenerate `hi <= lo` intervals replicate into exactly
    * one bin (ascending `sequence`) and die in the residual filter. */
  private def endBin(lo: org.apache.spark.sql.Column,
                     hi: org.apache.spark.sql.Column, binWidth: Long) =
    greatest(
      floor(lo / binWidth).cast("long"),
      floor(hi / binWidth).cast("long") -
        when(hi % binWidth === 0, 1L).otherwise(0L))

  /** Interval-overlap join for two LARGE interval sets (half-open
    * intervals; overlap iff `aLo < bHi && bLo < aHi`): both sides
    * replicate into the fixed-width bins they span and equi-join on the
    * bin. A pair overlapping across several shared bins would emit once
    * per bin, so each emission is gated to the pair's OWNING bin — the
    * bin of `greatest(aLo, bLo)`, the first bin where both are present —
    * which dedups without a `distinct` shuffle. Shuffle volume stays
    * linear in Σ widths/bin per side. */
  def overlapJoin(a: DataFrame, aLo: String, aHi: String,
                  b: DataFrame, bLo: String, bHi: String,
                  binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(
          floor(col(lo) / binWidth).cast("long"),
          endBin(col(lo), col(hi), binWidth))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("__bin"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__bin") ===
        floor(greatest(col(aLo), col(bLo)) / binWidth).cast("long"))
      .drop("__bin")
  }

  /** Whole-operator form of the keyed point-in-interval join via the
    * native [[graft.plans.RangeJoinExec]] merge sweep: same semantics as
    * `points ⋈ intervals ON keys ∧ lo <= value < hi` (the binned form
    * stays as the executable spec), but each side shuffles exactly once
    * in its own shape with no binWidth knob, and join state is the
    * active-overlap depth, not the interval count. Null values and null
    * interval bounds never match (filtered at build — the exec's natural
    * ascending ordering would otherwise sort them first and
    * mis-activate). Output: every left column, then `payload`. */
  def nativeJoin(points: DataFrame, keys: Seq[String], value: String,
      intervals: DataFrame, lo: String, hi: String,
      payload: Seq[String]): DataFrame = {
    val clash = payload.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty, s"payload collides with point columns: $clash")
    val spark = points.sparkSession
    Bridge.installStrategy(spark, RangeJoinStrategy)
    // Build-time pruning + self-alias boundary (see AsOf.joinBackwardNative:
    // fresh Aliases survive DeduplicateRelations re-instancing).
    val rCols = (keys ++ Seq(lo, hi) ++ payload).distinct
    val rPlan = Bridge.analyzed(intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull)
      .select(rCols.map(c => col(c).as(c)): _*))
    val lPlan = Bridge.analyzed(points.filter(col(value).isNotNull)
      .select(points.columns.toSeq.map(c => col(c).as(c)): _*))
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name)}"))
    Bridge.ofRows(spark, RangeJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, value), attr(rPlan, lo), attr(rPlan, hi),
      payload.map(attr(rPlan, _))))
  }
}
