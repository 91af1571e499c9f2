package graft.ext

import graft.SparkSpec

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** duplicateClusters must equal a reference union-find on arbitrary pair
  * graphs — star, chain, cycle, and disconnected shapes all arise from
  * the generator. Seeded sampling (no scalatestplus bridge in this
  * runtime) so failures reproduce. */
class DedupClusterPropertySpec extends SparkSpec {
  import spark.implicits._

  private val pairGen: Gen[(Long, Long)] =
    Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)).suchThat { case (a, b) => a != b }
  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, pairGen))

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("cluster labels equal reference union-find on random graphs") {
    (0 until 8).foreach { i =>
      graphGen.apply(Gen.Parameters.default, Seed(7L + i)).foreach { pairs =>
        val expected = unionFind(pairs)
        val got = Dedup.duplicateClusters(pairs.toDF("a", "b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"seed=${7 + i} pairs=$pairs")
      }
    }
  }

  test("a 200-node chain converges inside an explicit 30-round cap (pointer jumping is O(log diameter))") {
    // Diameter 199: plain neighbor-min propagation needs ~199 rounds and
    // blew the cap — exactly what the round-10 100×-rows probe hit on the
    // loose-threshold embedding near-dup graph. The label(label(v)) jump
    // term makes this ~12 rounds; the EXPLICIT maxIters pins the
    // O(log diameter) bound independently of the default (100), and the
    // chain's near-constant changed-count trips the r11 progress gate so
    // doubling engages at round 4.
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.duplicateClusters(pairs, maxIters = 30).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200 && got.values.forall(_ == 0L), s"got=$got")
  }
}
