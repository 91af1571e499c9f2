package graft

import graft.queries.Subqueries

import org.apache.spark.sql.DataFrame

/** Subquery decorrelation: each subquery form must optimize into the
  * join/aggregate the engine scales — a surviving subquery node in the
  * physical plan would mean per-row re-execution, the O(rows × subquery)
  * shape that cannot run at 100 TB. */
class SubquerySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("EXISTS decorrelates to a left-semi hash join") {
    val plan = planOf(Subqueries.q4Exists(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.toLowerCase.contains("subqueryexec"), plan)
  }

  test("NOT EXISTS decorrelates to a left-anti join; scalar mean evaluates once") {
    val plan = planOf(Subqueries.q22ColdCustomers(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
    // the uncorrelated scalar threshold runs as a one-row subquery reused
    // as a literal — not per-row
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"), plan)
  }

  test("correlated scalar aggregate decorrelates to a per-key aggregate + join") {
    val plan = planOf(Subqueries.q17CorrelatedScalar(spark, sf))
    assert(!plan.toLowerCase.contains("nestedloop") || plan.contains("Broadcast"),
      s"correlated scalar must not plan a non-broadcast nested loop:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("IN + grouped HAVING plans the subquery once as a semi join") {
    val plan = planOf(Subqueries.q18InHaving(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
  }

  test("NOT IN with nullable subquery column plans a null-aware anti join") {
    val plan = planOf(Subqueries.qNotInNullAware(spark, sf))
    // a plain LeftAnti would be wrong under three-valued IN; Spark marks
    // the broadcast hash join null-aware with a trailing `true` flag
    // (BroadcastHashJoinExec.isNullAwareAntiJoin) in the plan string
    assert(plan.contains("LeftAnti, BuildRight, true") ||
      (plan.contains("LeftAnti") && plan.contains("BroadcastNestedLoop")), plan)
  }

  test("correlated LATERAL top-N decorrelates to a WindowGroupLimit, not per-row re-execution") {
    val plan = planOf(Subqueries.qLateralTopK(spark, sf))
    // the correlated ORDER BY + LIMIT becomes a rank window with
    // map-side group-limit pushdown — per-partition top-k crosses the
    // shuffle, never the full orders table per customer
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }

  test("subquery anchors return rows at sf0.001") {
    for ((name, fn) <- Subqueries.queries)
      assert(fn(spark, sf).limit(1).count() == 1L, s"$name returned no rows")
  }

  test("q13 zero-order customers survive the conditioned outer join") {
    val df = Subqueries.q13Distribution(spark, sf)
    val total = df.selectExpr("sum(custdist)").head().getLong(0)
    val cust = graft.queries.Parity.table(spark, sf, "customer").count()
    assert(total == cust, s"distribution must cover every customer: $total != $cust")
  }
}
