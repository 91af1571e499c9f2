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
}
