package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold-layer operators: promotion hygiene, KPIs, layout clustering
  * (SURVEY.md §2.2 P3, §2.5 W1, §2.1 S10).
  */
object Gold {

  /** P3 — strip technical columns before gold (`medallion/gold/s2g.py:48-53`). */
  def dropTechnical(df: DataFrame,
      technical: Seq[String] = Seq("file_path", "file_name", "last_updated_ts")): DataFrame =
    technical.foldLeft(df)((d, c) => if (d.columns.contains(c)) d.drop(c) else d)

  /** Dimension "latest state": keep only current SCD rows when the source
    * is SCD-managed (`s2g.py:86-87`). */
  def currentOnly(df: DataFrame): DataFrame =
    if (df.columns.contains("is_current")) df.filter(col("is_current") === true) else df

  /** W1 — QoQ growth via `lag` over a per-entity date-ordered window plus
    * the guarded-`when` EBITDA margin (null else-branch, no `otherwise`)
    * (`s2g.py:126-140`). `orderCols` should include a unique tiebreaker for
    * deterministic results when dates can repeat. */
  def fundamentalsKpis(df: DataFrame,
      entityCol: String = "company_number",
      orderCols: Seq[String] = Seq("quarter_end_date")): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(orderCols.map(col): _*)
    df.withColumn("revenue_qoq_growth",
        (col("total_revenue") - lag(col("total_revenue"), 1).over(w)) /
          lag(col("total_revenue"), 1).over(w))
      .withColumn("ebitda_margin",
        when(col("total_revenue") > 0, col("ebitda") / col("total_revenue")))
  }

  /** S10 substitute — `OPTIMIZE ... ZORDER BY (k)` without Delta
    * (`s2g.py:98-101,151-154`): range-repartition then sort within
    * partitions so Parquet footer min/max stats give the same data-skipping
    * effect; AQE coalescing handles the compaction half (SURVEY.md §7.4).
    */
  def clusterBy(df: DataFrame, cols: Seq[String], partitions: Option[Int] = None): DataFrame = {
    val cs: Seq[Column] = cols.map(col)
    val rep = partitions match {
      case Some(n) => df.repartitionByRange(n, cs: _*)
      case None    => df.repartitionByRange(cs: _*)
    }
    rep.sortWithinPartitions(cs: _*)
  }

  /** S10's ZORDER half in its true multi-dimensional form: bucket two
    * numeric columns into `2^bits` uniform cells over their [min, max],
    * Morton-interleave the cell ids ([[graft.functions.InterleaveBits]],
    * native codegen), then range-partition + sort on the Z-value —
    * exactly Delta's `OPTIMIZE ... ZORDER BY (a, b)` recipe
    * (`medallion/gold/s2g.py:98-101`). [[clusterBy]] skips perfectly on
    * its leading column only; this keeps Parquet footer min/max tight on
    * BOTH columns, so either predicate prunes files at 100 TB.
    *
    * The min/max pass is one tiny aggregate (bounded driver metadata —
    * the same class of collect as `approxQuantile`). Nulls go to cell 0
    * (nulls-first). Uniform cells are skew-sensitive in the extreme;
    * heavy-tailed layouts should pre-transform (e.g. log) the column.
    */
  def zorderBy(df: DataFrame, c1: String, c2: String, bits: Int = 16,
      partitions: Option[Int] = None): DataFrame =
    zorderBy(df, Seq(c1, c2), bits, partitions)

  /** n-ary Z-order clustering (2..8 columns) — Delta's `ZORDER BY`
    * accepts arbitrary arity and real tables cluster 3–4 columns; the
    * per-dimension cell budget shrinks to `⌊62/n⌋` bits automatically
    * (`bits` is a cap, not a promise). */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int,
      partitions: Option[Int]): DataFrame =
    curveBy(df, cols, bits, partitions, graft.functions.InterleaveBits.apply)

  /** Hilbert-curve clustering — same quantize → curve-index →
    * range-partition recipe as [[zorderBy]], but the cell ids map to
    * their distance along the Hilbert curve
    * ([[graft.functions.HilbertIndex]]) instead of the Morton
    * interleave. The Hilbert curve never jumps (consecutive indices are
    * grid neighbors), so per-file bounding boxes come out tighter than
    * Morton's at the power-of-two seams — measurably fewer
    * false-positive files under min/max skipping on either dimension
    * (DataSkippingSpec compares the two on identical data). */
  def hilbertBy(df: DataFrame, c1: String, c2: String, bits: Int = 16,
      partitions: Option[Int] = None): DataFrame =
    hilbertBy(df, Seq(c1, c2), bits, partitions)

  /** n-ary Hilbert clustering (2..8 columns) — the Skilling-transform
    * kernel takes over above two dimensions
    * ([[graft.functions.CurveOps.hilbertN]]); per-dimension cell budget
    * is `min(bits, ⌊62/n⌋)`. */
  def hilbertBy(df: DataFrame, cols: Seq[String], bits: Int,
      partitions: Option[Int]): DataFrame =
    curveBy(df, cols, bits, partitions, graft.functions.HilbertIndex.apply)

  /** Shared space-filling-curve clustering core: bucket `n` numeric
    * columns into `2^b` uniform cells each over their [min, max]
    * (`b = min(bits, ⌊62/n⌋)` so the packed curve index always fits one
    * non-negative long), map the cell tuple to a curve index, then
    * range-partition + sort on it.
    *
    * The min/max pass is one tiny aggregate (bounded driver metadata —
    * the same class of collect as `approxQuantile`). Nulls go to cell 0
    * (nulls-first). Uniform cells are skew-sensitive in the extreme;
    * heavy-tailed layouts should pre-transform (e.g. log) the column. */
  private def curveBy(df: DataFrame, cols: Seq[String], bits: Int,
      partitions: Option[Int],
      curve: Seq[Column] => Column): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8,
      s"curve clustering takes 2..8 columns, got ${cols.size}")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val b = math.min(bits, 62 / cols.size)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    // a dimension with no non-null values has no range to quantize —
    // fall back to plain lexicographic clustering
    if (cols.indices.exists(i => mm.isNullAt(2 * i)))
      return clusterBy(df, cols, partitions)
    val n = 1 << b
    def cell(c: String, lo: Double, hi: Double): Column =
      if (hi > lo)
        // nanvl: a stray NaN must land in a cell (ANSI cast would throw),
        // and coalesce sends nulls to cell 0 (nulls-first).
        coalesce(least(lit(n - 1), greatest(lit(0),
          floor(nanvl((col(c).cast("double") - lit(lo)) / lit(hi - lo), lit(0.0)) * lit(n))
            .cast("int")))
          .cast("int"), lit(0))
      else lit(0)
    val z = curve(cols.zipWithIndex.map { case (c, i) =>
      cell(c, mm.getDouble(2 * i), mm.getDouble(2 * i + 1)) })
    val withZ = df.withColumn("_graft_z", z)
    val rep = partitions match {
      case Some(p) => withZ.repartitionByRange(p, col("_graft_z"))
      case None    => withZ.repartitionByRange(col("_graft_z"))
    }
    rep.sortWithinPartitions(col("_graft_z")).drop("_graft_z")
  }
}
