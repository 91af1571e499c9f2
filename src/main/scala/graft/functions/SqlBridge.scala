package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into `private[sql]` helpers so graft's native Expressions and
  * LogicalPlans can be exposed through the public Column/DataFrame API.
  * Standard extension-library pattern: the object lives under
  * `org.apache.spark.sql` purely for access; no Spark internals are
  * modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for wrapping in custom nodes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].queryExecution.analyzed

  /** DataFrame over a custom LogicalPlan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently install an extra planner strategy on a live session
    * (the route for sessions built without `spark.sql.extensions`). */
  def installStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }

  /** Drain the async listener bus: block (bounded) until every queued
    * SparkListener event is delivered. Task-end events arrive
    * asynchronously after an action returns, so metric counters read
    * immediately afterwards can attribute a query's tail tasks to its
    * successor; draining first makes per-query deltas attributable.
    * Lives here because `SparkContext.listenerBus` is `private[spark]`.
    * Best-effort: a timeout (stuck listener) must not fail the caller —
    * the residual attribution error is the pre-drain status quo. */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long = 5000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Whether the session's SparkContext has been stopped (the liveness
    * probe the table-frame cache prunes on; `SparkContext.isStopped` is
    * `private[spark]`, hence bridged here). */
  def isStopped(spark: SparkSession): Boolean = spark.sparkContext.isStopped

  /** Re-issue a localCheckpoint'd frame with its carried statistics
    * CAPPED at Long.MaxValue bytes/rows.
    *
    * Why this exists: `Dataset.localCheckpoint` carries the origin
    * plan's statistics onto the resulting LogicalRDD
    * (`rewriteStatsAndConstraints`), and the size-only visitor estimates
    * a Join as the PRODUCT of its children's sizeInBytes. An iterative
    * loop that checkpoints every round therefore compounds the estimate
    * multiplicatively — a round body with k references to the previous
    * label table makes the carried BigInt's BIT LENGTH grow k^round, and
    * driver-side stats estimation (BigInteger.multiply, Toom-Cook) comes
    * to dominate wall time long before anything overflows. The round-10
    * 100×-rows probe measured 57 CPU-minutes of the driver inside
    * BigInteger.multiply on a 10-round connected-components loop.
    *
    * Above ~9 EB (Long.MaxValue bytes) an estimate carries no planning
    * information — every threshold comparison already saturates — so the
    * cap is plan-neutral while bounding every later stats computation on
    * the loop's plans to O(1) bits. Constraints are preserved. Frames
    * whose stats are already under the cap pass through untouched. */
  def capCheckpointStats(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    analyzed(df) match {
      case lr: LogicalRDD =>
        val s = lr.stats // cached — computed eagerly at checkpoint time
        val lim = BigInt(Long.MaxValue)
        if (s.sizeInBytes <= lim && s.rowCount.forall(_ <= lim)) df
        else ofRows(spark, lr.copy()(
          spark.asInstanceOf[classic.SparkSession],
          Some(Statistics(sizeInBytes = s.sizeInBytes.min(lim),
            rowCount = s.rowCount.map(_.min(lim)))),
          Some(lr.constraints)))
      case _ => df
    }
  }
}
