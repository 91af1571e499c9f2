package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch: the ≤k minima must be the exact k smallest DISTINCT
  * values whatever the partitioning (partial/merge path), duplicates
  * must not occupy slots, and the SQL registration must agree with the
  * Column API. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def minsOf(values: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val df = values.toDF("v").repartition(parts)
    df.agg(KmvSketch(col("v"), k).as("m"))
      .collect()(0).getSeq[Long](0)
  }

  test("k smallest distinct values, sorted, across many partitions") {
    val vals = Seq(50L, 10L, 30L, 10L, 20L, 90L, 20L, 40L, 60L)
    assert(minsOf(vals, 4, 1) === Seq(10L, 20L, 30L, 40L))
    assert(minsOf(vals, 4, 7) === Seq(10L, 20L, 30L, 40L)) // merge path
  }

  test("fewer than k distinct values returns them all") {
    assert(minsOf(Seq(5L, 5L, 3L), 10, 3) === Seq(3L, 5L))
  }

  test("duplicates never evict a smaller value") {
    // stream of many copies of 1 must leave room for later small values
    val vals = Seq.fill(100)(1L) ++ Seq(3L, 2L)
    assert(minsOf(vals, 3, 5) === Seq(1L, 2L, 3L))
  }

  test("SQL registration graft_kmv(expr, k) matches the Column API") {
    GraftExtensions.register(spark)
    spark.range(0, 1000).selectExpr("(id * 37) % 101 AS v")
      .createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT graft_kmv(CAST(v AS BIGINT), 5) AS m FROM kmv_in")
      .collect()(0).getSeq[Long](0)
    assert(viaSql === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("grouped sketches stay per-group") {
    val df = Seq(("a", 5L), ("a", 1L), ("b", 9L), ("a", 3L), ("b", 2L))
      .toDF("g", "v").repartition(3)
    val got = df.groupBy("g").agg(KmvSketch(col("v"), 2).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(1L, 3L))
    assert(got("b") === Seq(2L, 9L))
  }
}
