package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the ML-evaluation metrics: invariances a
  * correct implementation must hold on ANY sample (rank metrics ignore
  * monotone score transforms; two-sample statistics are symmetric up to
  * complement; association is column-order symmetric), checked against
  * pseudo-random label/score sets rather than the hand cases in
  * MlEvalSpec. Every generated score is a centi-exact double (k/100) so
  * the integer score path is bit-stable under the affine transforms. */
class MlEvalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // (label, score) sets with ties and both classes present
  private def scoredSet(seed: Long): Seq[(String, Double)] = {
    val g = for {
      lab <- Gen.oneOf("pos", "neg")
      k <- Gen.chooseNum(0, 80) // coarse: guarantees ties
    } yield (lab, k / 100.0 * 50)
    val s = samples(g, 60, seed)
    // ensure both classes appear
    s :+ (("pos", 1.0)) :+ (("neg", 2.0))
  }

  private def aucOf(rows: Seq[(String, Double)]): Map[String, Double] =
    MlEval.aucOneVsRest(rows.toDF("label", "score"), "label", "score")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("AUC: invariant under positive affine score transforms") {
    for (seed <- 1L to 5L) {
      val rows = scoredSet(seed * 97)
      val scaled = rows.map { case (l, s) => (l, s * 3 + 41) }
      assert(aucOf(rows) == aucOf(scaled))
    }
  }

  test("AUC: negating scores complements the metric; range [0,1]") {
    for (seed <- 1L to 5L) {
      val rows = scoredSet(seed * 131)
      val flipped = rows.map { case (l, s) => (l, 100 - s) }
      val a = aucOf(rows)
      val b = aucOf(flipped)
      for ((k, v) <- a) {
        assert(v >= 0.0 && v <= 1.0)
        // exact complement: both come from the same integer U statistic
        assert(math.abs(b(k) - (1.0 - v)) < 1e-12, s"$k: $v vs ${b(k)}")
      }
      // two classes: one-vs-rest AUCs are complements of each other
      assert(math.abs(a("pos") - (1.0 - a("neg"))) < 1e-12)
    }
  }

  test("KS: bounded [0,1], zero against itself, symmetric under swap") {
    for (seed <- 1L to 5L) {
      val rows = samples(Gen.chooseNum(0, 60), 80, seed * 17)
        .zipWithIndex.map { case (k, i) => ("g", k / 2.0, i % 2 == 0) }
      def ks(flip: Boolean) = MlEval.ksDrift(
        rows.toDF("grp", "score", "is_ref"), "grp", "score",
        if (flip) !col("is_ref") else col("is_ref"))
        .collect().head.getDouble(3)
      val d = ks(false)
      assert(d >= 0.0 && d <= 1.0)
      assert(ks(true) == d) // |F1-F2| is swap-symmetric
      val same = rows.map { case (_, s, _) => ("g", s) }
        .flatMap(p => Seq((p._1, p._2, true), (p._1, p._2, false)))
      val zero = MlEval.ksDrift(same.toDF("grp", "score", "is_ref"),
        "grp", "score", col("is_ref")).collect().head.getDouble(3)
      assert(zero == 0.0)
    }
  }

  test("chi-square: nonnegative, and V symmetric in column order") {
    for (seed <- 1L to 5L) {
      val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(0L, 3L)), 120, seed * 29)
      val df = rows.toDF("x", "y")
      val v1 = MlEval.chiSquare(df, "x", "y")
        .select("cramers_v", "chi2").collect().head
      val v2 = MlEval.chiSquare(df.select(col("y").as("x2"), col("x").as("y2")),
        "x2", "y2").select("cramers_v", "chi2").collect().head
      assert(v1.getDouble(1) >= 0.0)
      assert(math.abs(v1.getDouble(0) - v2.getDouble(0)) < 1e-9)
      assert(v1.getDouble(0) >= 0.0 && v1.getDouble(0) <= 1.0 + 1e-12)
    }
  }

  test("HHI: bounded [1/k, 1]; diversity complements exactly") {
    for (seed <- 1L to 5L) {
      val rows = samples(Gen.zip(Gen.chooseNum(1L, 6L), Gen.oneOf("a", "b", "c", "d")),
        100, seed * 53)
      val r = MlEval.categoricalConcentration(rows.toDF("u", "t"), "u", "t")
        .collect()
      for (x <- r) {
        val (k, hhi, div) = (x.getLong(2), x.getDouble(3), x.getDouble(4))
        assert(hhi >= 1.0 / k - 1e-12 && hhi <= 1.0 + 1e-12)
        assert(div == 1.0 - hhi)
      }
    }
  }

  test("classification report: marginals and counts reconcile") {
    for (seed <- 1L to 5L) {
      val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "d")),
        90, seed * 71)
      val rep = MlEval.classificationReport(rows.toDF("act", "pred"), "act", "pred")
        .collect()
      // tp+fn over classes = rows; tp+fp over classes = rows
      assert(rep.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum == rows.size)
      assert(rep.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp")).sum == rows.size)
      // class "d" is never actual: recall null; "c" never predicted: precision null
      val byClass = rep.map(r => r.getString(0) -> r).toMap
      assert(byClass("d").isNullAt(byClass("d").fieldIndex("recall")))
      assert(byClass("c").isNullAt(byClass("c").fieldIndex("precision")))
    }
  }

  test("prCurve: matches brute-force counts at every threshold") {
    for (seed <- 1L to 5L) {
      val rows = scoredSet(seed * 173)
      val got = MlEval.prCurve(rows.toDF("label", "score"),
          col("label") === "pos", "score")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val centi = rows.map { case (l, s) => (l, math.round(s * 100)) }
      val p = centi.count(_._1 == "pos").toLong
      for ((t, (tp, fp, fn)) <- got) {
        val predPos = centi.filter(_._2 >= t)
        assert(tp == predPos.count(_._1 == "pos").toLong)
        assert(fp == predPos.count(_._1 != "pos").toLong)
        assert(fn == p - tp)
      }
      assert(got.size == centi.map(_._2).distinct.size)
    }
  }

  test("conformalThreshold: q_hat covers >= ceil((n+1)a)-1 of n residuals") {
    for (seed <- 1L to 5L) {
      val rows = scoredSet(seed * 211).map { case (_, s) => ("g", s) }
      val r = MlEval.conformalThreshold(rows.toDF("grp", "score"),
        "grp", "score").collect().head
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("k"))
      val med = r.getAs[Long]("med_centi")
      val qhat = r.getAs[Long]("qhat_centi")
      val centi = rows.map(x => math.round(x._2 * 100))
      // the engine's median is the rank-((n-1) div 2 + 1) value
      assert(med == centi.sorted.apply((((n - 1) / 2) + 1 - 1).toInt))
      val res = centi.map(s => math.abs(s - med)).sorted
      assert(qhat == res((k - 1).toInt), "q_hat is the k-th smallest residual")
      assert(res.count(_ <= qhat) >= k)
    }
  }
}
