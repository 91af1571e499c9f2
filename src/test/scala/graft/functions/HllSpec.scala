package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private val P = 10
  private val W = 20
  private val M = 1 << P

  /** Reference registers from first principles — the oracle's replay. */
  private def refRegs(vals: Seq[Long]): Seq[Long] = {
    val r = new Array[Long](M)
    for (h <- vals) {
      val b = (h % M).toInt
      val v = h / M
      val rho =
        if (v == 0L) W + 1
        else W - (63 - java.lang.Long.numberOfLeadingZeros(v))
      if (rho > r(b)) r(b) = rho.toLong
    }
    r.toSeq
  }

  private def sketch(vals: Seq[Long], parts: Int): Seq[Long] =
    vals.toDF("v").repartition(parts)
      .agg(HllSketch(col("v"), P, W).as("regs"))
      .collect().head.getSeq[Long](0)

  /** Estimate with the standard small-range (linear counting) correction
    * — the spec-side derivation the oracle contract deliberately omits
    * (libm log is not exactly rounded across engines). */
  private def estimate(regs: Seq[Long]): Double = {
    val s = regs.map(m => math.pow(2.0, -m.toDouble)).sum
    val raw = HllSketch.alphaNumerator(P, W) / (s * math.pow(2.0, (W + 1).toDouble))
    val zeros = regs.count(_ == 0L)
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }

  private def hash(i: Long): Long = {
    // splitmix64 finalizer (public domain) into [0, 1e9+7) — a uniform
    // stand-in for the production polyHash range
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    java.lang.Math.floorMod(z, 1000000007L)
  }

  test("registers match the first-principles replay, any partitioning") {
    val vals = (1 to 2000).map(i => hash(i.toLong))
    val want = refRegs(vals)
    assert(sketch(vals, 1) == want)
    assert(sketch(vals, 13) == want) // merge path == single partition
  }

  test("merge is elementwise max: sketch(A ++ B) == max(sketch(A), sketch(B))") {
    val a = (1 to 900).map(i => hash(i.toLong))
    val b = (500 to 1400).map(i => hash(i.toLong))
    val sa = sketch(a, 3)
    val sb = sketch(b, 3)
    val union = sketch(a ++ b, 5)
    assert(union == sa.zip(sb).map { case (x, y) => math.max(x, y) })
  }

  test("corrected estimate tracks exact distinct within the error envelope") {
    // 1.04/sqrt(1024) = 3.25% standard error; allow 4 sigma plus the
    // documented top-sliver bias of the polyHash range (P(rho=1)=0.463).
    for (n <- Seq(300, 3000, 30000)) {
      val vals = (1 to n).map(i => hash(i.toLong))
      val exact = vals.distinct.size
      val est = estimate(sketch(vals, 7))
      val err = math.abs(est - exact) / exact.toDouble
      assert(err <= 0.15, s"n=$n exact=$exact est=$est err=$err")
    }
  }

  test("duplicates do not move the registers") {
    val once = (1 to 500).map(i => hash(i.toLong))
    assert(sketch(once, 3) == sketch(once ++ once ++ once, 9))
  }

  test("SQL registration: graft_hll(expr, p, w) works through the parser") {
    graft.functions.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_hll(v, 10, 20) FROM VALUES (5L), (5L), (99999L) AS t(v)")
      .collect().head.getSeq[Long](0)
    assert(got == refRegs(Seq(5L, 5L, 99999L)))
  }

  test("null inputs are skipped") {
    val df = Seq(Some(hash(1L)), None, Some(hash(1L))).toDF("v")
    val got = df.agg(HllSketch(col("v"), P, W).as("r"))
      .collect().head.getSeq[Long](0)
    assert(got == refRegs(Seq(hash(1L))))
  }
}
