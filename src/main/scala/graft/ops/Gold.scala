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
    curveBy(df, cols, bits, partitions, "zorder")

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
    curveBy(df, cols, bits, partitions, "hilbert")

  /** Numeric ordering proxy for a clustering column. Numerics (and
    * timestamps/dates) cast to double directly. STRING columns — Delta's
    * ZORDER takes them, and the reference's own cluster key
    * (`company_number`, `s2g.py:98-101`) is one — map through their
    * 7-byte UTF-8 prefix read as a base-16 integer: order-preserving
    * (UTF-8 byte order = code-point order, and the big-endian prefix
    * value is monotone in the string), always positive (7 bytes = 56
    * bits), and depending only on the column's VALUE and declared type,
    * so an incremental re-cluster derives the identical proxy without
    * anything extra persisted in the `_layout` grid. Strings sharing a
    * 7-byte prefix land in one cell — the same collision a range
    * partitioner has at any fixed prefix depth; fine for keys, ids, and
    * codes (the use case), not for long common-prefix URLs (pre-strip
    * the scheme). */
  private def curveProxy(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        conv(hex(substring(col(c).cast("binary"), 1, 7)), 16, 10).cast("double")
      case _ => col(c).cast("double")
    }

  /** Per-column quantization grid for curve clustering, as a boundary
    * descriptor per column:
    *  - length 2 `[lo, hi]` — UNIFORM cells over the proxy range
    *    (numeric/timestamp columns, where uniform-width cells are cheap
    *    and usually fine);
    *  - length > 2 — explicit QUANTILE cell boundaries (string columns:
    *    their prefix proxies are wildly non-uniform — digit ids with a
    *    shared prefix collapse into a handful of uniform cells — so the
    *    grid comes from `approxQuantile` over the proxy, Delta's
    *    range-id approach, giving every cell ~equal population whatever
    *    the value distribution).
    * One tiny aggregate + one approximate-quantile pass (bounded driver
    * metadata); `None` when some column has no non-null values.
    * Persisted by the catalog's `_layout` sidecar so an incremental
    * OPTIMIZE re-buckets appended rows into the SAME grid the original
    * layout used. */
  def curveBounds(df: DataFrame, cols: Seq[String],
      bits: Int): Option[Seq[Seq[Double]]] = {
    val aggs = cols.flatMap(c =>
      Seq(min(curveProxy(df, c)), max(curveProxy(df, c))))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    if (cols.indices.exists(i => mm.isNullAt(2 * i))) return None
    val b = math.min(bits, 62 / cols.size)
    Some(cols.zipWithIndex.map { case (c, i) =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          // cap the boundary list: 2^b can be thousands, but ~128
          // population-balanced cells already give file-level pruning,
          // and the list must stay cheap driver metadata in `_layout`
          val nb = math.min((1 << b) - 1, 127)
          val probed = df.select(curveProxy(df, c).as("_p"))
            .stat.approxQuantile("_p",
              (1 to nb).map(_.toDouble / (nb + 1)).toArray, 0.001)
          val bs = probed.toSeq.distinct.sorted
          // degenerate spread (≤1 distinct boundary) → uniform fallback
          if (bs.size < 2) Seq(mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
          else bs
        case _ => Seq(mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
      }
    })
  }

  /** Curve-cluster `df` on a FIXED quantization grid: bucket each column
    * into cells per its boundary descriptor (uniform `[lo, hi]` split
    * into `2^b` cells, `b = min(bits, ⌊62/n⌋)`, so the packed curve
    * index always fits one non-negative long; or explicit quantile
    * boundaries — cell = count of boundaries ≤ proxy), map the cell
    * tuple to the named curve's index, then range-partition + sort on
    * it. Values outside the grid clamp to the edge cells, so
    * re-clustering an appended batch against the ORIGINAL table's grid
    * is safe — new out-of-range keys just land in the boundary cells.
    *
    * Nulls go to cell 0 (nulls-first). Uniform cells are skew-sensitive
    * in the extreme; heavy-tailed layouts should pre-transform (e.g.
    * log) the column or rely on the quantile path. */
  def clusterOnGrid(df: DataFrame, cols: Seq[String],
      bounds: Seq[Seq[Double]], bits: Int, partitions: Option[Int],
      curve: String): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8,
      s"curve clustering takes 2..8 columns, got ${cols.size}")
    require(bounds.size == cols.size,
      s"bounds arity ${bounds.size} != cols arity ${cols.size}")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val curveFn: Seq[Column] => Column = curve match {
      case "zorder"  => graft.functions.InterleaveBits.apply
      case "hilbert" => graft.functions.HilbertIndex.apply
      case other => throw new IllegalArgumentException(
        s"unknown curve '$other' (zorder|hilbert)")
    }
    val b = math.min(bits, 62 / cols.size)
    val n = 1 << b
    def cell(c: String, bs: Seq[Double]): Column = bs match {
      case Seq(lo, hi) if hi > lo =>
        // nanvl: a stray NaN must land in a cell (ANSI cast would throw),
        // and coalesce sends nulls to cell 0 (nulls-first).
        coalesce(least(lit(n - 1), greatest(lit(0),
          floor(nanvl((curveProxy(df, c) - lit(lo)) / lit(hi - lo), lit(0.0)) * lit(n))
            .cast("int")))
          .cast("int"), lit(0))
      case Seq(_, _) | Seq(_) => lit(0) // degenerate range: single cell
      case qs =>
        // quantile boundaries: cell = #(boundaries ≤ proxy) — an O(k)
        // codegen'd lambda over a literal array (k ≤ 127); nulls give a
        // null-predicate filter → size 0 → cell 0 (nulls-first)
        val p = curveProxy(df, c)
        least(lit(n - 1),
          size(filter(array(qs.map(lit): _*), q => q <= p))).cast("int")
    }
    val z = curveFn(cols.zip(bounds).map { case (c, bs) => cell(c, bs) })
    val withZ = df.withColumn("_graft_z", z)
    val rep = partitions match {
      case Some(p) => withZ.repartitionByRange(p, col("_graft_z"))
      case None    => withZ.repartitionByRange(col("_graft_z"))
    }
    rep.sortWithinPartitions(col("_graft_z")).drop("_graft_z")
  }

  /** Shared one-shot curve clustering: compute the grid from the data,
    * then cluster on it; falls back to plain lexicographic clustering
    * when some dimension is all-null. */
  private def curveBy(df: DataFrame, cols: Seq[String], bits: Int,
      partitions: Option[Int], curve: String): DataFrame =
    curveBounds(df, cols, bits) match {
      case Some(b) => clusterOnGrid(df, cols, b, bits, partitions, curve)
      case None    => clusterBy(df, cols, partitions)
    }
}
