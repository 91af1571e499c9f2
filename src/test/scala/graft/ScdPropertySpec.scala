package graft

import graft.core.Clock
import graft.scd.Scd2

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SCD2 property tests (SURVEY.md §5.3): invariants over generated update
  * sequences with pinned clocks. Small domains force key collisions and
  * value churn. Sampling is seeded (no scalatestplus bridge in this
  * runtime), so failures reproduce. */
class ScdPropertySpec extends SparkSpec {
  import spark.implicits._

  private val keyGen = Gen.oneOf("a", "b", "c", "d")
  private val valGen = Gen.oneOf("0", "1", "2")
  private val batchGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(keyGen, valGen))
  private val seqGen: Gen[List[Map[String, String]]] =
    Gen.listOfN(4, batchGen)

  private def samples(n: Int): Seq[List[Map[String, String]]] =
    (0 until n).flatMap { i =>
      seqGen.apply(Gen.Parameters.default, Seed(42L + i))
    }

  test("scd2 invariants hold for every generated update sequence") {
    samples(10).foreach { batches =>
      if (batches.nonEmpty && batches.head.nonEmpty) {
        var day = 1
        def scd = new Scd2(Seq("k"), Seq("v"), clock = Clock.fixed(f"2026-03-$day%02d"))
        var state = scd.initialize(batches.head.toSeq.toDF("k", "v"))
        var expected = batches.head // key -> current value
        batches.tail.filter(_.nonEmpty).foreach { b =>
          day += 1
          state = scd.merge(state, b.toSeq.toDF("k", "v"))
          expected = expected ++ b
        }
        val rows = state.collect()
        val current = rows.filter(_.getAs[Boolean]("is_current"))
        // exactly one current row per key ever seen, carrying the latest value
        assert(current.map(_.getAs[String]("k")).sorted.toSeq ==
          expected.keys.toSeq.sorted)
        current.foreach { r =>
          assert(r.getAs[String]("v") == expected(r.getAs[String]("k")),
            s"stale current value for ${r.getAs[String]("k")}")
        }
        // every expired row is closed and interval-ordered
        rows.filterNot(_.getAs[Boolean]("is_current")).foreach { r =>
          val to = r.getAs[java.sql.Date]("effective_to")
          assert(to != null, "expired row without effective_to")
          assert(!to.before(r.getAs[java.sql.Date]("effective_from")))
        }
        // version count per key == 1 + number of observed value changes
        val changes = batches.tail.filter(_.nonEmpty)
          .foldLeft((batches.head, Map.empty[String, Int].withDefaultValue(0))) {
            case ((prev, counts), b) =>
              val c2 = b.foldLeft(counts) { case (cs, (k, v)) =>
                if (prev.get(k).exists(_ != v)) cs.updated(k, cs(k) + 1)
                else if (!prev.contains(k)) cs.updated(k, cs(k)) // new key: no extra version
                else cs
              }
              (prev ++ b, c2)
          }._2
        val versionCounts = rows.groupBy(_.getAs[String]("k")).view.mapValues(_.length)
        versionCounts.foreach { case (k, n) =>
          assert(n == 1 + changes(k), s"key $k: $n versions, expected ${1 + changes(k)}")
        }
      }
    }
  }
}

