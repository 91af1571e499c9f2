package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native merge-sweep range join: multi-match emission, half-open
  * bounds, key isolation, retirement correctness, null contract, and
  * equivalence with the binned compositional form. */
class RangeJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Double)],
                  ivs: Seq[(Long, Long, Double, Double)]): Set[(Long, Long)] =
    RangeJoin.nativeJoin(
        pts.toDF("k", "id", "v").repartition(4),
        Seq("k"), "v",
        ivs.toDF("k", "band", "lo", "hi").repartition(3),
        "lo", "hi", Seq("band"))
      .select("id", "band").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-match, half-open bounds, key isolation") {
    val got = run(
      Seq((1L, 1L, 5.0), (1L, 2L, 10.0), (2L, 3L, 5.0)),
      Seq((1L, 10L, 0.0, 10.0), (1L, 11L, 5.0, 15.0), (2L, 12L, 0.0, 6.0)))
    // id 1 (v=5) hits both overlapping bands of key 1; id 2 (v=10) only
    // band 11 (10 not < 10); id 3 matches key 2's band only
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 12L)))
  }

  test("retired intervals never resurface; later intervals activate") {
    val got = run(
      Seq((1L, 1L, 1.0), (1L, 2L, 50.0), (1L, 3L, 99.0)),
      Seq((1L, 20L, 0.0, 10.0), (1L, 21L, 40.0, 60.0), (1L, 22L, 90.0, 100.0)))
    assert(got === Set((1L, 20L), (2L, 21L), (3L, 22L)))
  }

  test("nested intervals: outer stays active across inner's lifetime") {
    val got = run(
      Seq((1L, 1L, 5.0), (1L, 2L, 15.0), (1L, 3L, 25.0)),
      Seq((1L, 30L, 0.0, 30.0), (1L, 31L, 10.0, 20.0)))
    assert(got === Set((1L, 30L), (2L, 30L), (2L, 31L), (3L, 30L)))
  }

  test("null values and null bounds never match") {
    val pts = Seq[(Long, Long, Option[Double])](
      (1L, 1L, Some(5.0)), (1L, 2L, None)).toDF("k", "id", "v")
    val ivs = Seq[(Long, Long, Option[Double], Option[Double])](
      (1L, 40L, Some(0.0), Some(10.0)), (1L, 41L, None, Some(10.0)),
      (1L, 42L, Some(0.0), None)).toDF("k", "band", "lo", "hi")
    val got = RangeJoin.nativeJoin(pts, Seq("k"), "v", ivs, "lo", "hi", Seq("band"))
      .select("id", "band").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 40L)))
  }

  test("agrees with the binned compositional form on a pseudo-random workload") {
    val pts = spark.range(0, 2000).select(
      (col("id") % 13).as("k"), col("id"),
      ((col("id") * 37 % 1000).cast("double")).as("v"))
    val ivs = spark.range(0, 200).select(
      (col("id") % 13).as("k"), col("id").as("band"),
      ((col("id") * 17 % 900).cast("double")).as("lo"))
      .withColumn("hi", col("lo") + (col("band") % 5 + 1) * 40.0)
    val native = RangeJoin.nativeJoin(pts, Seq("k"), "v", ivs, "lo", "hi", Seq("band"))
      .select("id", "band").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = RangeJoin.binnedJoin(
        pts.withColumnRenamed("k", "pk"), "v", ivs, "lo", "hi", binWidth = 50)
      .filter(col("pk") === col("k"))
      .select("id", "band").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === binned)
    assert(native.nonEmpty)
  }

  test("the plan runs through RangeJoinExec") {
    val pts = Seq((1L, 1L, 5.0)).toDF("k", "id", "v")
    val ivs = Seq((1L, 9L, 0.0, 10.0)).toDF("k", "band", "lo", "hi")
    val plan = RangeJoin.nativeJoin(pts, Seq("k"), "v", ivs, "lo", "hi", Seq("band"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), plan)
  }
}
