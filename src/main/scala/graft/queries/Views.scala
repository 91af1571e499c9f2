package graft.queries

import graft.plans.MaterializedViews

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized-view queries — the driver-checked face of
  * [[graft.plans.MvRewriteRule]]. The query is written against the BASE
  * orders table; the optimizer redirects it to the pre-aggregated
  * summary (MvRewriteSpec pins the redirected scan), and the oracle runs
  * the same SQL against the base in DuckDB — so the driver gate proves
  * the rewrite is invisible to results, not just present in the plan.
  */
object Views {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Summary of orders by (status, priority); queries rolling up to any
    * subset of those keys rewrite to it. */
  def ensureMv(spark: SparkSession, sfDir: String): Unit =
    Parity.setupOnce("mv-orders", sfDir) {
      MaterializedViews.create(spark,
        basePath = s"$sfDir/orders.parquet",
        mvPath = Parity.tmp("mv-orders", sfDir),
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq(dec(col("o_totalprice"))),
        mins = Seq(col("o_orderdate")),
        maxs = Seq(col("o_orderdate")))
    }

  /** Rollup to one of the summary's two keys: sum/count/min/max all
    * derive from partial state, so the whole query reads the summary
    * (thousands of rows) instead of the fact. */
  def mvRollup(spark: SparkSession, sfDir: String): DataFrame = {
    ensureMv(spark, sfDir)
    Parity.table(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n_orders"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mv_rollup_rewrite" -> mvRollup _)

  def oracleSql: Map[String, String] = Map(
    "mv_rollup_rewrite" ->
      """SELECT o_orderstatus,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
           count(*) AS n_orders,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
         FROM orders
         GROUP BY o_orderstatus""")
}
