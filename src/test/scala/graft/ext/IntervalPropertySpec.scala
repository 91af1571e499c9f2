package graft.ext

import graft.SparkSpec

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the interval sweeps: the distributed window
  * forms must agree with direct single-machine reference algorithms on
  * random interval sets — including the tie/adjacency cases a curated
  * example can miss (simultaneous starts, end==start chains, full
  * containment, duplicate intervals). */
class IntervalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // small value domain on purpose: collisions (shared endpoints,
  // duplicates, touching intervals) are the interesting cases
  private val intervalGen: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(0L, 30L)
    len <- Gen.chooseNum(1L, 12L)
  } yield (s, s + len)

  private def caseGen(nKeys: Int): Gen[Seq[(String, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 24)
    ivs <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, nKeys - 1)
      iv <- intervalGen
    } yield (s"k$k", iv._1, iv._2))
  } yield ivs

  /** Reference peak concurrency: literal definition — for every start
    * point, count intervals covering it ([s,e) semantics). The sweep's
    * peak always lands on some interval's start. */
  private def refPeak(ivs: Seq[(Long, Long)]): (Long, Long) = {
    val peaks = ivs.map(_._1).distinct.sorted.map { t =>
      (t, ivs.count { case (s, e) => s <= t && t < e }.toLong)
    }
    val mx = peaks.map(_._2).max
    (mx, peaks.filter(_._2 == mx).map(_._1).min)
  }

  /** Reference union length: walk the sorted intervals merging overlaps
    * and adjacency. */
  private def refUnion(ivs: Seq[(Long, Long)]): (Long, Long) = {
    val sorted = ivs.sorted
    var islands = 0L
    var covered = 0L
    var curS = Long.MinValue
    var curE = Long.MinValue
    sorted.foreach { case (s, e) =>
      if (islands == 0L || s > curE) {
        if (islands > 0L) covered += curE - curS
        islands += 1; curS = s; curE = e
      } else curE = math.max(curE, e)
    }
    if (islands > 0L) covered += curE - curS
    (islands, covered)
  }

  test("maxConcurrency agrees with the literal coverage count on random inputs") {
    for (ivs <- samples(caseGen(nKeys = 3), 30)) {
      val df = ivs.toDF("k", "start_s", "end_s")
      val got = Analytics.maxConcurrency(df, key = "k").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = ivs.groupBy(_._1).map { case (k, g) =>
        k -> refPeak(g.map(iv => (iv._2, iv._3)))
      }
      assert(got == want, s"intervals=$ivs")
    }
  }

  test("sessionFeatures agrees with a per-user sequential walk on random inputs") {
    val gapSeconds = 10L
    val caseG: Gen[Seq[(Long, Long, Long)]] = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(0L, 2L)
        t <- Gen.chooseNum(0L, 120L) // small domain → tied timestamps occur
      } yield (u, t))
    } yield rows.zipWithIndex.map { case ((u, t), i) => (u, i.toLong, t) }

    def reference(rows: Seq[(Long, Long, Long)]) =
      rows.groupBy(_._1).flatMap { case (_, g) =>
        // same total order as the operator: (ts, event_id)
        val sorted = g.sortBy(r => (r._3, r._2))
        var seq = 0L; var idx = 0L; var start = 0L; var prev = Option.empty[Long]
        sorted.map { case (_, id, t) =>
          if (prev.isEmpty || t - prev.get > gapSeconds) {
            seq += 1; idx = 1; start = t
          } else idx += 1
          val out = id -> (seq, idx, t - start,
            prev.map(t - _).getOrElse(-1L))
          prev = Some(t)
          out
        }
      }

    for (rows <- samples(caseG, 25)) {
      val df = rows.map { case (u, id, t) =>
        (u, id, new java.sql.Timestamp(t * 1000L))
      }.toDF("user_id", "event_id", "ts")
      val got = Analytics.sessionFeatures(df, gapSeconds).collect()
        .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
      assert(got == reference(rows), s"rows=$rows")
    }
  }

  test("intervalUnion agrees with the merge-walk reference on random inputs") {
    for (ivs <- samples(caseGen(nKeys = 3), 30)) {
      val withIds = ivs.zipWithIndex.map { case ((k, s, e), i) =>
        (k, i.toLong, s, e)
      }
      val df = withIds.toDF("k", "event_id", "start_s", "end_s")
      val got = Analytics.intervalUnion(df, key = "k").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val want = ivs.groupBy(_._1).map { case (k, g) =>
        val (islands, covered) = refUnion(g.map(iv => (iv._2, iv._3)))
        k -> (g.size.toLong, islands, covered)
      }
      assert(got == want, s"intervals=$ivs")
    }
  }
}
