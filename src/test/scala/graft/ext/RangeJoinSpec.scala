package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("sub-epsilon overlap straddling a bin edge is not dropped") {
    // Overlap width 5e-11 < the old 1e-9 epsilon, with the owning bin
    // (bin 1) above the epsilon-truncated end bin of `a` — the exact
    // end-bin computation must still co-locate the pair.
    val a = Seq(("a0", 0.0, 10.0000000001)).toDF("an", "alo", "ahi")
    val b = Seq(("b0", 10.00000000005, 20.0)).toDF("bn", "blo", "bhi")
    val got = RangeJoin.overlapJoin(a, "alo", "ahi", b, "blo", "bhi", 10L)
      .select("an", "bn").as[(String, String)].collect().toSet
    assert(got == Set(("a0", "b0")))
  }

  test("degenerate hi <= lo intervals match like the naive predicate, without bin explosion") {
    val weird = Seq(("e", 30.0, 30.0), ("f", 50.0, 10.0)).toDF("name", "lo", "hi")
    // no point satisfies lo <= v < hi on an empty interval
    assert(pairs(RangeJoin.binnedJoin(points, "v", weird, "lo", "hi", 10L)).isEmpty)
    // the overlap CONTRACT is the raw predicate aLo < bHi && bLo < aHi —
    // which a naive join satisfies even for empty intervals inside a
    // proper one — and the clamped end bin must reproduce it exactly
    // (the old descending `sequence` replicated f into bins 1..5 and
    // still missed the owning bin for e)
    val b = Seq(("b0", 0.0, 100.0)).toDF("bn", "blo", "bhi")
    val naive = weird.join(b, col("lo") < col("bhi") && col("blo") < col("hi"))
      .select("name", "bn").as[(String, String)].collect().toSet
    val got = RangeJoin.overlapJoin(weird, "lo", "hi", b, "blo", "bhi", 10L)
      .select("name", "bn").as[(String, String)].collect().toSet
    assert(got == naive && naive == Set(("e", "b0"), ("f", "b0")))
  }

  test("overlap join matches the naive inequality join, once per pair") {
    val rnd = new scala.util.Random(5)
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val lo = rnd.nextInt(200).toDouble
      (s"$tag$i", lo, lo + 1 + rnd.nextInt(40))
    }
    val a = mk(80, "a").toDF("an", "alo", "ahi")
    val b = mk(60, "b").toDF("bn", "blo", "bhi")
    val naive = a.join(b, col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("an", "bn").as[(String, String)].collect().toSeq
    for (w <- Seq(1L, 8L, 33L, 500L)) {
      val got = RangeJoin.overlapJoin(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("an", "bn").as[(String, String)].collect().toSeq
      // multiset equality: owning-bin gating must emit each pair EXACTLY once
      assert(got.sorted == naive.sorted, s"binWidth=$w disagrees")
    }
  }
}
