package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L
  private def h(i: Int, v: Long, w: Int): Int =
    ((((java.lang.Math.floorMod(v, P)) * (2 * i + 1) + i) % P) % w).toInt

  /** Brute-force grid from exact counts — the oracle's construction. */
  private def refGrid(vals: Seq[Long], d: Int, w: Int): Seq[Long] = {
    val g = new Array[Long](d * w)
    for (v <- vals; i <- 0 until d) g(i * w + h(i, v, w)) += 1L
    g.toSeq
  }

  private def sketch(vals: Seq[Long], d: Int, w: Int, parts: Int): Seq[Long] =
    vals.toDF("v").repartition(parts)
      .agg(CmsSketch(col("v"), d, w).as("cells"))
      .collect().head.getSeq[Long](0)

  test("grid matches the exact-count replay, any partitioning") {
    val vals = (1 to 500).map(i => (i % 37).toLong * 13 + 5)
    val want = refGrid(vals, 3, 16)
    assert(sketch(vals, 3, 16, 1) == want)
    assert(sketch(vals, 3, 16, 7) == want)   // merge path == single partition
  }

  test("estimates never undercount; exact when width avoids collisions") {
    val vals = Seq.fill(3)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(7)(900L)
    val exact = vals.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // wide grid: distinct cells per row for 3 keys is near-certain at w=512
    val g = sketch(vals, 4, 512, 3)
    def est(grid: Seq[Long], d: Int, w: Int, v: Long): Long =
      (0 until d).map(i => grid(i * w + h(i, v, w))).min
    for ((k, n) <- exact) assert(est(g, 4, 512, k) == n)
    // narrow grid (w=2): collisions certain, estimate bounded below by exact
    val g2 = sketch(vals, 2, 2, 3)
    for ((k, n) <- exact) assert(est(g2, 2, 2, k) >= n)
    // total mass per row is preserved regardless of collisions
    for (i <- 0 until 2)
      assert(g2.slice(i * 2, i * 2 + 2).sum == vals.size.toLong)
  }

  test("SQL registration: graft_cms(expr, d, w) works through the parser") {
    graft.functions.GraftExtensions.register(spark)
    val g = spark.sql(
      "SELECT graft_cms(v, 2, 8) FROM VALUES (1L), (1L), (9L) AS t(v)")
      .collect().head.getSeq[Long](0)
    assert(g == refGrid(Seq(1L, 1L, 9L), 2, 8))
    // 1 and 9 collide in row 0 at w=8 (1 % 8 == 9 % 8)
    assert(g(h(0, 1L, 8)) == 3L)
  }

  test("null keys are skipped, not counted") {
    val df = Seq(Some(1L), None, Some(1L)).toDF("v")
    val g = df.agg(CmsSketch(col("v"), 2, 8).as("c"))
      .collect().head.getSeq[Long](0)
    assert(g.sum == 4L) // 2 rows × depth 2
  }
}
