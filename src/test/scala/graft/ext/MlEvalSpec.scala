package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlEvalSpec extends SparkSpec {
  import spark.implicits._

  // Hand-computable score/label set (scores in units, centi() sees ×100):
  //   pos scores: 3, 5, 5        neg scores: 1, 3, 4
  // Pairs (pos, neg): pos wins when pos > neg, ties half.
  //   3 vs (1,3,4) -> 1 + 0.5 + 0   = 1.5
  //   5 vs (1,3,4) -> 3  (twice)    = 6.0
  // AUC = 7.5 / 9
  private def scored = Seq(
    ("pos", 3.0), ("pos", 5.0), ("pos", 5.0),
    ("neg", 1.0), ("neg", 3.0), ("neg", 4.0)
  ).toDF("label", "score")

  test("aucOneVsRest: tie-corrected AUC matches the pairwise count") {
    val r = MlEval.aucOneVsRest(scored, "label", "score")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("pos") == ((3L, 3L, 7.5 / 9.0)))
    // neg as positive class: wins 4>3 (1) + tie 3=3 (0.5) = 1.5 of 9
    assert(r("neg") == ((3L, 3L, 1.5 / 9.0)))
  }

  test("aucOneVsRest: perfect separation gives 1.0, reversed gives 0.0") {
    val df = Seq(("a", 10.0), ("a", 9.0), ("b", 1.0), ("b", 2.0))
      .toDF("label", "score")
    val r = MlEval.aucOneVsRest(df, "label", "score")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("a") == 1.0 && r("b") == 0.0)
  }

  test("ksDrift: identical samples give 0, disjoint give 1") {
    val same = Seq(("g", 1.0, true), ("g", 1.0, false),
      ("g", 2.0, true), ("g", 2.0, false)).toDF("grp", "score", "is_ref")
    val r0 = MlEval.ksDrift(same, "grp", "score", col("is_ref")).collect()
    assert(r0.head.getDouble(3) == 0.0)
    val disjoint = Seq(("g", 1.0, true), ("g", 2.0, true),
      ("g", 10.0, false), ("g", 11.0, false)).toDF("grp", "score", "is_ref")
    val r1 = MlEval.ksDrift(disjoint, "grp", "score", col("is_ref")).collect()
    assert(r1.head.getDouble(3) == 1.0)
  }

  test("ksDrift: hand case — max CDF gap at the interleave point") {
    // ref: 1,2,3,4   cur: 3,4,5,6 → max gap at score 2: |2/4 − 0/4| = 0.5
    val df = (Seq(1, 2, 3, 4).map(v => ("g", v.toDouble, true)) ++
      Seq(3, 4, 5, 6).map(v => ("g", v.toDouble, false)))
      .toDF("grp", "score", "is_ref")
    val r = MlEval.ksDrift(df, "grp", "score", col("is_ref")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((4L, 4L, 0.5)))
  }

  test("calibrationBins: per-bin counts, rate, and mean score") {
    val df = Seq((10.0, true), (20.0, false), (60.0, true), (80.0, true))
      .toDF("score", "y")
    val r = MlEval.calibrationBins(df, col("y"), "score", binWidthCenti = 5000L)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(0L) == ((2L, 1L, 0.5, 15.0)))   // scores 10, 20
    assert(r(1L) == ((2L, 2L, 1.0, 70.0)))   // scores 60, 80
  }

  test("psiBins: probabilities and rational ratio; zero side nulls ratio") {
    val df = Seq(("g", 10.0, true), ("g", 10.0, true), ("g", 60.0, true),
      ("g", 10.0, false), ("g", 60.0, false), ("g", 60.0, false),
      ("g", 120.0, false)).toDF("grp", "score", "is_ref")
    val r = MlEval.psiBins(df, "grp", "score", col("is_ref"), 5000L)
      .collect().map(x => x.getLong(1) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))).toMap
    assert(r(0L) == ((2L, 1L, 2.0 / 3.0, 0.25)))
    assert(r(1L) == ((1L, 2L, 1.0 / 3.0, 0.5)))
    val zeroRef = MlEval.psiBins(df, "grp", "score", col("is_ref"), 5000L)
      .filter(col("bin") === 2L).collect().head
    assert(zeroRef.getLong(2) == 0L && zeroRef.isNullAt(7))
  }

  test("chiSquare: independent 2x2 gives chi2 = 0; V well-defined") {
    // perfectly independent: every (a,b) cell = 25
    val rows = for (a <- Seq("x", "y"); b <- Seq(0L, 1L); _ <- 1 to 25)
      yield (a, b)
    val r = MlEval.chiSquare(rows.toDF("a", "b"), "a", "b").collect()
    assert(r.length == 4)
    assert(r.forall(_.getAs[Double]("chi2") == 0.0))
    assert(r.forall(_.getAs[Double]("cramers_v") == 0.0))
    assert(r.forall(_.getAs[Double]("expected") == 25.0))
  }

  test("chiSquare: fully dependent 2x2 gives V = 1, zero cells included") {
    val rows = (1 to 10).map(_ => ("x", 0L)) ++ (1 to 10).map(_ => ("y", 1L))
    val r = MlEval.chiSquare(rows.toDF("a", "b"), "a", "b").collect()
    // densified: the two never-observed cells appear with n_ab = 0
    assert(r.length == 4)
    assert(r.count(_.getAs[Long]("n_ab") == 0L) == 2)
    // chi2 = N for a perfect 2x2 association; V = sqrt(N/(N·1)) = 1
    assert(r.forall(x => math.abs(x.getAs[Double]("cramers_v") - 1.0) < 1e-12))
  }

  test("pairwiseClusterMetrics: hand-counted pair table and ARI") {
    // items: pred clusters {p1: a,a,b}, {p2: b}  (gold a×2, b×2)
    //   cells: (p1,a)=2 (p1,b)=1 (p2,b)=1
    //   tp = C(2,2)=1; pred pairs = C(3,2)=3; gold pairs = 1+1 = 2
    //   total pairs = C(4,2) = 6
    val items = Seq(("p1", "a"), ("p1", "a"), ("p1", "b"), ("p2", "b"))
      .toDF("pred", "gold")
    val r = MlEval.pairwiseClusterMetrics(items, "pred", "gold").collect().head
    assert(r.getAs[Long]("tp_pairs") == 1L)
    assert(r.getAs[Long]("pred_pairs") == 3L)
    assert(r.getAs[Long]("gold_pairs") == 2L)
    assert(r.getAs[Long]("total_pairs") == 6L)
    assert(r.getAs[Double]("precision") == 1.0 / 3.0)
    assert(r.getAs[Double]("recall") == 0.5)
    assert(r.getAs[Double]("f1") == 2.0 / 5.0)
    // ARI = (1 − 3·2/6) / ((3+2)/2 − 3·2/6) = 0 / 1.5 = 0
    assert(r.getAs[Double]("ari") == 0.0)
  }

  test("pairwiseClusterMetrics: perfect clustering gives P=R=F1=ARI=1") {
    val items = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L), ("z", 3L))
      .toDF("pred", "gold")
    val r = MlEval.pairwiseClusterMetrics(items, "pred", "gold").collect().head
    assert(r.getAs[Double]("precision") == 1.0 &&
      r.getAs[Double]("recall") == 1.0 && r.getAs[Double]("f1") == 1.0 &&
      r.getAs[Double]("ari") == 1.0)
  }

  test("bcubedPerCluster: per-cluster purity moments") {
    // pred p1 = {a,a,b}: ssq = 4+1 = 5, sz = 3 → bcubed = 5/9
    val items = Seq(("p1", "a"), ("p1", "a"), ("p1", "b"), ("p2", "b"))
      .toDF("pred", "gold")
    val r = MlEval.bcubedPerCluster(items, "pred", "gold")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val p1 = r(("pred", "p1"))
    assert(p1.getAs[Long]("sz") == 3L && p1.getAs[Long]("ssq") == 5L)
    assert(p1.getAs[Double]("bcubed") == 5.0 / 9.0)
    // gold b = {p1:1, p2:1}: ssq = 2, sz = 2 → bcubed recall = 0.5
    val gb = r(("gold", "b"))
    assert(gb.getAs[Long]("sz") == 2L && gb.getAs[Double]("bcubed") == 0.5)
  }

  private val ndcgW = Seq("1.0", "0.6309297535714574", "0.5",
    "0.43067655807339306", "0.38685280723454163")
  private val ndcgCum = Seq("1.0", "1.6309297535714573",
    "2.1309297535714573", "2.56160631164485", "2.948459118879392")

  test("ndcgBinary: perfect ranking gives 1.0; miss-at-top discounts") {
    // q1: hits at ranks 1,2 of 5 → dcg = 1 + w2 = cum2 → ndcg = 1
    // q2: hits at ranks 2,3     → dcg = w2 + 0.5, idcg = cum2
    // q3: no hits               → ndcg null
    val ranked = Seq(
      (1L, 1, 1L), (1L, 2, 1L), (1L, 3, 0L), (1L, 4, 0L), (1L, 5, 0L),
      (2L, 1, 0L), (2L, 2, 1L), (2L, 3, 1L), (2L, 4, 0L), (2L, 5, 0L),
      (3L, 1, 0L), (3L, 2, 0L), (3L, 3, 0L), (3L, 4, 0L), (3L, 5, 0L)
    ).toDF("q_id", "rank", "rel")
    val r = MlEval.ndcgBinary(ranked, ndcgW, ndcgCum)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("ndcg") == 1.0)
    val q2dcg = 0.0 + 0.6309297535714574 + 0.5
    assert(r(2L).getAs[Double]("dcg") == q2dcg)
    assert(r(2L).getAs[Double]("ndcg") == q2dcg / 1.6309297535714573)
    assert(r(3L).isNullAt(r(3L).fieldIndex("ndcg")))
    assert(r(3L).getAs[Double]("dcg") == 0.0)
  }

  test("avgPrecisionBinary: textbook AP — precision at each hit, averaged") {
    // q1 hits at ranks 1,3: AP = (1/1 + 2/3) / 2
    // q2 no hits: ap null, sum_p 0
    val ranked = Seq(
      (1L, 1, 1L), (1L, 2, 0L), (1L, 3, 1L), (1L, 4, 0L), (1L, 5, 0L),
      (2L, 1, 0L), (2L, 2, 0L), (2L, 3, 0L), (2L, 4, 0L), (2L, 5, 0L)
    ).toDF("q_id", "rank", "rel")
    val r = MlEval.avgPrecisionBinary(ranked)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("ap") == (1.0 / 1.0 + 2.0 / 3.0) / 2.0)
    assert(r(2L).isNullAt(r(2L).fieldIndex("ap")))
    assert(r(2L).getAs[Double]("sum_p") == 0.0)
  }

  test("cuped: perfectly correlated covariate removes all variance") {
    // y = 2x exactly → rho2 = 1, var_ratio = 0, theta = 2
    val units = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)).toDF("x", "y")
    val r = MlEval.cuped(units).collect().head
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("rho2") == 1.0)
    assert(r.getAs[Double]("var_ratio") == 0.0)
  }

  test("cuped: independent covariate — hand moments, theta from cov/var") {
    // x: 0,0,10,10  y: 0,10,0,10 → cov = n·sxy − sx·sy = 4·100 − 20·20 = 0
    val units = Seq((0L, 0L), (0L, 10L), (10L, 0L), (10L, 10L)).toDF("x", "y")
    val r = MlEval.cuped(units).collect().head
    assert(r.getAs[Double]("cov") == 0.0)
    assert(r.getAs[Double]("theta") == 0.0)
    assert(r.getAs[Double]("var_ratio") == 1.0)
    // constant x → vx = 0 → theta/rho2 null
    val const = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val rc = MlEval.cuped(const).collect().head
    assert(rc.isNullAt(rc.fieldIndex("theta")) &&
      rc.isNullAt(rc.fieldIndex("var_ratio")))
  }

  test("cuped: moments beyond BIGINT survive as correctly-rounded doubles") {
    // The r11 100x-rows campaign blew the former checked-BIGINT readout
    // at vx = 3.7e19: centered moments grow ~N^2*v^2. The decimal
    // algebra is exact; the readout rounds once to double.
    val big = 3000000000L // 3e9 centi-units per x
    val units = Seq((big, 1L), (2L * big, 2L), (3L * big, 3L), (4L * big, 4L))
      .toDF("x", "y")
    val r = MlEval.cuped(units).collect().head
    // vx = n*sxx − sx² = 4·270e18 − (30e9)² = 1.8e20 exactly (decimal),
    // read out as the correctly-rounded double 1.8E20 — 20× past the
    // old BIGINT limit without a raise
    assert(r.getAs[Double]("vx") == 1.8e20, s"vx=${r.getAs[Double]("vx")}")
    assert(r.getAs[Double]("theta") > 0.0)
  }

  test("cuped: decimal(38,0) moment overflow raises, never a silent null") {
    // A decimal(38,0) moment past 1e38 must fail LOUDLY in every session
    // mode, because the DuckDB oracle's HUGEINT raises at that point:
    // under ANSI (the Spark 4 default, on here) the sum itself raises
    // NUMERIC_VALUE_OUT_OF_RANGE; under legacy non-ANSI the sum becomes
    // a silent NULL and the checkedMoment sentinel converts it back into
    // a raise. x*x = 1e36 per row, 200 rows → sxx = 2e38 > 1e38.
    val big = 1000000000000000000L // 1e18
    val units = Seq.fill(200)((big, 1L)).toDF("x", "y")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val exAnsi = intercept[Exception] { MlEval.cuped(units).collect() }
    assert(messages(exAnsi).exists(_.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected the ANSI sum overflow raise, got: ${exAnsi.getMessage}")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val exLegacy = intercept[Exception] { MlEval.cuped(units).collect() }
      assert(messages(exLegacy).exists(_.contains("moment")),
        s"expected the checkedMoment raise, got: ${exLegacy.getMessage}")
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("fleissKappa3: perfect agreement gives kappa 1; hand case matches") {
    val perfect = Seq(("a", "a", "a"), ("b", "b", "b"))
      .toDF("r1", "r2", "r3")
    val p = MlEval.fleissKappa3(perfect).collect().head
    assert(p.getAs[Double]("pbar") == 1.0 && p.getAs[Double]("kappa") == 1.0)
    // hand case: 2 docs, raters (a,a,b) and (a,b,b)
    //   ssq per doc = 3 + 2·1 = 5 → S = 10, N = 2
    //   pbar = (10 − 6) / 12 = 1/3
    //   marginals: a×3, b×3 → C2 = 18; pe = 18 / 36 = 0.5
    //   kappa = (1/3 − 1/2) / (1 − 1/2) = −1/3
    val mixed = Seq(("a", "a", "b"), ("a", "b", "b")).toDF("r1", "r2", "r3")
    val m = MlEval.fleissKappa3(mixed).collect().head
    assert(m.getAs[Long]("s_sq") == 10L && m.getAs[Long]("c2") == 18L)
    assert(m.getAs[Double]("pbar") == 4.0 / 12.0)
    assert(m.getAs[Double]("pe") == 0.5)
    assert(m.getAs[Double]("kappa") == (4.0 / 12.0 - 0.5) / (1.0 - 0.5))
  }

  test("classificationReport: hand-counted tp/fp/fn and single-division ratios") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),   // a: tp=2, fn=1
      ("b", "a"), ("b", "b"),               // b: tp=1, fn=1; a gains fp=1
      ("c", "a")                            // c: never predicted
    ).toDF("actual", "predicted")
    val r = MlEval.classificationReport(df, "actual", "predicted")
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("tp") == 2L && a.getAs[Long]("fp") == 2L &&
      a.getAs[Long]("fn") == 1L)
    assert(a.getAs[Double]("precision") == 0.5)
    assert(a.getAs[Double]("recall") == 2.0 / 3.0)
    assert(a.getAs[Double]("f1") == 4.0 / 7.0)
    // c was never predicted: precision null, recall 0
    val c = r("c")
    assert(c.isNullAt(c.fieldIndex("precision")))
    assert(c.getAs[Double]("recall") == 0.0)
    assert(c.getAs[Double]("f1") == 0.0)
  }

  test("classificationReport: a predicted-only class appears with zero actuals") {
    val df = Seq(("a", "a"), ("a", "z")).toDF("actual", "predicted")
    val r = MlEval.classificationReport(df, "actual", "predicted")
      .collect().map(x => x.getString(0) -> x).toMap
    val z = r("z")
    assert(z.getAs[Long]("n_actual") == 0L && z.getAs[Long]("n_predicted") == 1L)
    assert(z.getAs[Double]("precision") == 0.0)
    assert(z.isNullAt(z.fieldIndex("recall")))
  }

  test("prCurve: tp/fp/fn and ratios at every distinct threshold") {
    // scored: pos at 3,5,5; neg at 1,3,4 (same hand set as AUC above).
    // Descending thresholds (centi): 500 -> tp=2 pp=2; 400 -> tp=2 pp=3;
    // 300 -> tp=3 pp=5; 100 -> tp=3 pp=6. P=3.
    val r = MlEval.prCurve(scored, col("label") === "pos", "score")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          x.getDouble(4), x.getDouble(5))).toMap
    assert(r(500L) == ((2L, 0L, 1L, 1.0, 2.0 / 3.0)))
    assert(r(400L) == ((2L, 1L, 1L, 2.0 / 3.0, 2.0 / 3.0)))
    assert(r(300L) == ((3L, 2L, 0L, 3.0 / 5.0, 1.0)))
    assert(r(100L) == ((3L, 3L, 0L, 0.5, 1.0)))
    assert(r.size == 4)
  }

  test("prCurve: no positives leaves recall null, precision 0") {
    val df = Seq(("neg", 1.0), ("neg", 2.0)).toDF("label", "score")
    val rows = MlEval.prCurve(df, col("label") === "pos", "score").collect()
    assert(rows.forall(x => x.getLong(1) == 0L && x.isNullAt(5)))
    assert(rows.forall(x => x.getDouble(4) == 0.0))
  }

  test("conformalThreshold: rank-selected median and 90% residual") {
    // scores 0.01..0.10: n=10, lower median = rank 5 -> 5 centi;
    // residuals sorted: 0,1,1,2,2,3,3,4,4,5; k = ceil(11*0.9) = 10 -> 5.
    val g = (1 to 10).map(i => ("g", i / 100.0))
    // n=3: k = ceil(4*0.9) = 4 > 3 -> qhat null (coverage unattainable)
    val h = Seq(("h", 0.01), ("h", 0.02), ("h", 0.03))
    val r = MlEval.conformalThreshold((g ++ h).toDF("grp", "score"),
        "grp", "score")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          if (x.isNullAt(4)) -1L else x.getLong(4))).toMap
    assert(r("g") == ((10L, 10L, 5L, 5L)))
    assert(r("h") == ((3L, 4L, 2L, -1L)))
  }

  test("corrMatrix: proportional series r=1, constant series r null") {
    val h1 = ts("2026-01-01 10:00:00")
    val h2 = ts("2026-01-01 11:00:00")
    val h3 = ts("2026-01-01 12:00:00")
    def rows(g: String, counts: Seq[Int]) =
      Seq(h1, h2, h3).zip(counts).flatMap { case (t, c) =>
        Seq.fill(c)((g, t))
      }
    val df = (rows("a", Seq(1, 2, 3)) ++ rows("b", Seq(2, 4, 6)) ++
      rows("c", Seq(1, 1, 1))).toDF("grp", "ts")
    val r = MlEval.corrMatrix(df, "grp")
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (if (x.isNullAt(8)) Double.NaN else x.getDouble(8))).toMap
    assert(math.abs(r(("a", "b")) - 1.0) < 1e-12)
    assert(r(("a", "c")).isNaN && r(("b", "c")).isNaN)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("categoricalConcentration: uniform mix vs single-type user") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "a"), (2L, "a")).toDF("user_id", "event_type")
    val r = MlEval.categoricalConcentration(df, "user_id", "event_type")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(1L) == ((4L, 4L, 0.25, 0.75)))  // uniform over 4 types
    assert(r(2L) == ((2L, 1L, 1.0, 0.0)))    // all one type
  }
}
