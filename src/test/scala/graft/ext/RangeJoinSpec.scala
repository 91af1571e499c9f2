package graft.ext

import graft.SparkSpec

/** Binned range join must agree exactly with the naive inequality join,
  * including interval edges and bin-misaligned widths. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    ("a", 10.0, 20.0), ("b", 20.0, 40.0), ("c", 35.0, 36.0), ("d", 0.0, 7.0))
    .toDF("name", "lo", "hi")
  private val points = (0 to 50).map(_.toDouble).toDF("v")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Double, String)] =
    df.select("v", "name").as[(Double, String)].collect().toSet

  test("binned join matches broadcast inequality join for every bin width") {
    val expected = pairs(RangeJoin.broadcastJoin(points, "v", intervals, "lo", "hi"))
    assert(expected.contains((10.0, "a")) && !expected.contains((20.0, "a")), "edges: lo inclusive, hi exclusive")
    for (w <- Seq(1L, 3L, 7L, 20L, 100L)) {
      assert(pairs(RangeJoin.binnedJoin(points, "v", intervals, "lo", "hi", w)) == expected,
        s"binWidth=$w disagrees")
    }
  }

  test("interval ending exactly on a bin edge does not bleed into the next bin") {
    // [10,20) with width 10 must cover bins 1 only — a point at 20 is out.
    val out = pairs(RangeJoin.binnedJoin(points, "v", intervals, "lo", "hi", 10L))
    assert(!out.contains((20.0, "a")) && out.contains((19.0, "a")))
  }
}
