package graft.ext

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** shardPlan (two-phase distributed prefix sum) must equal both the
  * single-window reference form and a driver-side sequential fold on
  * arbitrary corpora — doc counts, token sizes, source skew, and budget
  * all drawn by the generator. Seeded sampling (no scalatestplus bridge
  * in this runtime) so failures reproduce. */
class ShardPlanPropertySpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, source, n_tokens): ids unique, 1-3 sources, 1-40 tokens
  private val corpusGen: Gen[(List[(Long, String, Int)], Long)] = for {
    n <- Gen.chooseNum(1, 60)
    srcs <- Gen.chooseNum(1, 3)
    toks <- Gen.listOfN(n, Gen.chooseNum(1, 40))
    budget <- Gen.chooseNum(5L, 120L)
  } yield (toks.zipWithIndex.map { case (t, i) =>
    (i.toLong, s"s${i % srcs}", t)
  }, budget)

  /** Reference: per source, sort by the same (bucket, hash, id) key and
    * fold the running token total sequentially. */
  private def reference(rows: Seq[(Long, String, Int)],
      budget: Long): Map[Long, (Long, Long)] = {
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
    rows.groupBy(_._2).flatMap { case (_, docs) =>
      var cum = 0L
      docs.map { case (id, src, t) =>
        val h = polyHash(s"shard-v1:$id")
        (id, h % 256, h, t.toLong)
      }.sortBy { case (id, b, h, _) => (b, h, id) }
        .map { case (id, _, _, t) =>
          val start = cum; cum += t
          id -> (start, start / budget)
        }
    }
  }

  test("two-phase shard plan equals the window form AND a sequential fold") {
    (0 until 6).foreach { i =>
      corpusGen.apply(Gen.Parameters.default, Seed(11L + i)).foreach {
        case (rows, budget) =>
          val docs = rows.toDF("doc_id", "source", "nt")
            .select(col("doc_id"), col("source"),
              // text with exactly nt whitespace tokens
              concat_ws(" ", transform(sequence(lit(1), col("nt")),
                j => concat(lit("w"), j))).as("text"))
          val expected = reference(rows, budget)
          val win = Mixture.shardPlanWindow(docs, budget)
            .select("doc_id", "start", "shard_id").collect()
            .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
          val two = Mixture.shardPlan(docs.repartition(5), budget)
            .select("doc_id", "start", "shard_id").collect()
            .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
          assert(win == expected, s"window vs fold, seed=${11 + i} budget=$budget")
          assert(two == expected, s"two-phase vs fold, seed=${11 + i} budget=$budget")
      }
    }
  }
}
