package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SlidingMinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(a: Seq[Long], w: Int): Seq[Long] =
    if (a.length < w) Seq.empty
    else (0 to a.length - w).map(i => a.slice(i, i + w).min)

  test("matches brute-force window minima on random arrays (property)") {
    val gen = for {
      n <- Gen.choose(0, 60)
      a <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
      w <- Gen.choose(1, 12)
    } yield (a, w)
    val cases = (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    // group by w so each distinct expression evaluates one batch
    cases.groupBy(_._2).foreach { case (w, group) =>
      val df = group.map(_._1).toDF("a")
      val got = df.select(SlidingMin(col("a"), w).as("m"))
        .collect().map(_.getSeq[Long](0))
      got.zip(group.map(g => brute(g._1, w))).foreach { case (g, b) =>
        assert(g == b, s"w=$w")
      }
    }
  }

  test("ties, plateaus and monotone runs keep the deque honest") {
    val hard = Seq(
      Seq(5L, 5L, 5L, 5L),               // all ties
      Seq(1L, 2L, 3L, 4L, 5L),           // increasing
      Seq(5L, 4L, 3L, 2L, 1L),           // decreasing
      Seq(2L, 1L, 2L, 1L, 2L, 1L),       // alternating
      Seq(Long.MinValue, 0L, Long.MaxValue, Long.MinValue))
    hard.foreach { a =>
      (1 to a.length).foreach { w =>
        val got = Seq(Tuple1(a)).toDF("a")
          .select(SlidingMin(col("a"), w)).head().getSeq[Long](0)
        assert(got == brute(a, w), s"a=$a w=$w")
      }
    }
  }

  test("graft_sliding_min registers as a SQL function; short input is empty") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_sliding_min(array(3L,1L,2L,5L), 2) AS m")
      .head().getSeq[Long](0) == Seq(1L, 1L, 2L))
    assert(spark.sql("SELECT graft_sliding_min(array(3L), 2) AS m")
      .head().getSeq[Long](0).isEmpty)
  }

  test("nullable array elements are rejected at analysis, not read as 0") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sliding_min(array(3L, NULL, 2L), 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_sliding_min"), e.getMessage)
  }
}
