package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def embDF = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Array(0f, 1f, 0f, 0f), 1),
    (3L, Array(0f, 0.9f, 0.1f, 0f), 1),
    (4L, Array(-1f, 0f, 0f, 0f), 0),
    (5L, Array(1f, 0f, 0f, 0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val out = embDF.as("x").join(embDF.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        Similarity.cosine(col("x.embedding"), col("y.embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0L, 5L)) == 1.0)
    assert(out((0L, 2L)) == 0.0)
    assert(out((0L, 4L)) == -1.0)
  }

  test("nearDupPairs respects label buckets and threshold") {
    val pairs = Similarity.nearDupPairs(embDF, 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 5L)) && pairs.contains((1L, 5L)))
    assert(!pairs.contains((2L, 3L)) || Set((2L, 3L)).subsetOf(pairs)) // same bucket, cos≈0.99
    assert(!pairs.exists { case (a, b) => (a, b) == (0L, 2L) }) // cross-bucket never paired
  }

  test("semanticNearDupPairs at small corpus equals nearDupPairs exactly (pairs AND cos)") {
    // Below the per-cell target the adaptive bit count is 0 — every table
    // is the bare label cell — so the candidate-bounded form must emit
    // the SAME rows bit-for-bit as the all-pairs form. This is the
    // equivalence the r11 d_embed_neardup re-anchor rests on.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(Similarity.semanticNearDupPairs(embDF, 0.4)) ==
      rows(Similarity.nearDupPairs(embDF, 0.4)))
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val top = Similarity.bruteForceTopK(embDF, embDF.filter(col("vec_id") === 0), 3)
      .sort("rank").select("n_id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(5L, 1L, 2L) || top == Seq(5L, 1L, 3L),
      s"unexpected ranking $top") // rank1 = exact dup id5, rank2 = near nbr id1
  }

  test("pqTopK: duplicate-direction neighbor gets ADC exactly 1.0, rank 1") {
    // dim 4, m=2 subspaces × subDim=2, codebook = unit axes 0..3.
    // Vector 4 is a scaled copy of vector 0: its unit subvectors sit ON
    // codewords, so quantization is lossless for it and its ADC against
    // query 0 is dot(u0,u0) = 1.0 exactly. Every other candidate's ADC
    // is 0, so the rank-2 tie resolves to the lowest n_id.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f, 0f), 0),
      (2L, Array(0f, 0f, 1f, 0f), 0),
      (3L, Array(0f, 0f, 0f, 1f), 0),
      (4L, Array(2f, 0f, 0f, 0f), 0),
      (5L, Array(0f, 3f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.pqTopK(vecs, nQueries = 1, k = 2, m = 2, subDim = 2,
        nCode = 4).sort("rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == 2)
    assert(out(0) == ((0L, 4L, 1, 1.0)))
    assert(out(1) == ((0L, 1L, 2, 0.0)))
  }

  test("trained quantizer recovers planted clusters and lifts IVF recall") {
    // 8 planted unit-ish cluster directions in 16d, 40 vectors each with
    // small deterministic noise; queries = 20 of the vectors.
    val rnd = new scala.util.Random(123)
    val dims = 16
    val centers = Array.fill(8)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 20)

    val trained = Similarity.trainCentroids(emb, nList = 8, iters = 4)
    // every trained cell should be dominated by one planted cluster:
    // assignment purity over all vectors >= 90%
    val assigned = Similarity.ivfTopK(emb, q, nList = 8, nProbe = 1, k = 5,
      quantizer = Some(trained))

    def recallAt5(res: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.bruteForceTopK(emb, q, 5)
        .select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val got = res.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = brute.map { case (qid, bs) =>
        bs.intersect(got.getOrElse(qid, Set.empty)).size.toDouble / bs.size
      }
      hits.sum / hits.size
    }

    val trainedRecall = recallAt5(assigned)
    assert(trainedRecall >= 0.9,
      s"trained IVF nProbe=1 recall@5 = $trainedRecall, expected >= 0.9 on planted clusters")

    // the untrained (first-nList-vectors) quantizer cannot match a cell
    // layout aligned with the planted clusters at nProbe=1
    val untrainedRecall = recallAt5(
      Similarity.ivfTopK(emb, q, nList = 8, nProbe = 1, k = 5))
    assert(trainedRecall >= untrainedRecall,
      s"trained $trainedRecall < untrained $untrainedRecall")
  }

  test("zero-norm vector in the seed range does not collapse the quantizer") {
    // vec_id 0 is all-zero: seeding from raw first-nList ids would make a
    // NaN centroid whose NaN cosine sorts first under desc — every vector
    // would land in the degenerate cell. Seeding skips it instead.
    val dims = 8
    val vecs = (0L until 40L).map { i =>
      if (i == 0L) (i, Array.fill(dims)(0f))
      else (i, Array.tabulate(dims)(d => if (d == (i % 4).toInt) 1f else 0.01f * d))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val assigned = Similarity.trainedAssignments(emb, nList = 4, iters = 2)
      .select("vec_id", "cell").collect()
    assert(assigned.length == 39, "zero-norm vector itself is excluded")
    val cells = assigned.map(_.getLong(1)).distinct
    assert(cells.length > 1, s"quantizer collapsed to one cell: ${cells.toSeq}")
    assert(assigned.forall(r => !r.isNullAt(1)))
    // exact-fold training matches the default-avg training's cell layout
    // on this small input (same algorithm, different summation order)
    val exact = Similarity.trainCentroids(emb, nList = 4, iters = 2, exact = true)
      .select("c_id").as[Long].collect().sorted.toSeq
    val approx = Similarity.trainCentroids(emb, nList = 4, iters = 2)
      .select("c_id").as[Long].collect().sorted.toSeq
    assert(exact == approx)
  }

  test("ivf with full probe coverage matches brute force top-1") {
    // nList=6 centroids = every vector → probing 2 cells still finds the
    // nearest neighbor for each query here.
    val q = embDF.filter(col("vec_id") < 2)
    val brute = Similarity.bruteForceTopK(embDF, q, 1)
      .select("q_id", "n_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(embDF, q, nList = 6, nProbe = 6, k = 1)
      .select("q_id", "n_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf == brute)
  }

  test("labelCohesion: tight label scores 1.0, diffuse label scores lower") {
    import spark.implicits._
    val emb = Seq(
      // label 0: all the same direction (cosine to centroid = 1.0)
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(3f, 0f, 0f), 0),
      // label 1: orthogonal members
      (3L, Array(1f, 0f, 0f), 1), (4L, Array(0f, 1f, 0f), 1),
      // zero-norm vector is excluded, not NaN-poisoning
      (5L, Array(0f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCohesion(emb).orderBy("label").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n") === 2)
    assert(math.abs(out(0).getAs[Double]("mean_cos") - 1.0) < 1e-12)
    val diffuse = out(1)
    assert(diffuse.getAs[Long]("n") === 2) // zero vector dropped
    // members at 45° to the (1,1,0)/√2 centroid: cos = 1/√2
    assert(math.abs(diffuse.getAs[Double]("mean_cos") - 1.0 / math.sqrt(2)) < 1e-9)
    assert(diffuse.getAs[Double]("min_cos") <= diffuse.getAs[Double]("mean_cos"))
  }

  test("silhouetteMargin: well-separated labels positive, straddler negative") {
    import spark.implicits._
    val emb = Seq(
      // label 0 along x, label 1 along y — cleanly separated
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(1f, 0.1f, 0f), 0),
      // member 5 carries label 0 but points along y: mislabeled
      (5L, Array(0f, 1f, 0f), 0),
      (3L, Array(0f, 1f, 0f), 1), (4L, Array(0.1f, 1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val perVec = Similarity.silhouetteMargin(emb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // label 0: members 1,2 separate (+), member 5 sits on label 1's
    // centroid (−) → 2 of 3 separated, mean pulled down but positive
    assert(perVec(0)._1 == 3L && perVec(0)._3 == 2L)
    // label 1: both members closer to their own centroid
    // (margins ≈ 0.52 and 0.43 against the raw-mean centroids)
    assert(perVec(1)._1 == 2L && perVec(1)._3 == 2L && perVec(1)._2 > 0.3)
  }

  test("silhouetteMargin: single-label corpus yields no rows (no other centroid)") {
    import spark.implicits._
    val emb = Seq((1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.silhouetteMargin(emb).collect().isEmpty)
  }

  test("kCenterSelect: farthest-point sequence with min-id tie-break") {
    import spark.implicits._
    // 1-d line: 0, 10, 3, 7 — seed is lowest id (vec 0)
    //   r1: farthest from {0} is 10 (d² = 100)
    //   r2: min-dists to {0,10} are 9 (id 3) and 9 (id 4) → tie → id 3
    //   r3: id 4's min-dist stays 9 (already within 3² of the seed side)
    val pts = Seq(
      (1L, Seq(0.0)), (2L, Seq(10.0)), (3L, Seq(3.0)), (4L, Seq(7.0))
    ).toDF("vec_id", "v")
    val r = Similarity.kCenterSelect(pts, 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(r(0L) == ((1L, None)))
    assert(r(1L) == ((2L, Some(100.0))))
    assert(r(2L) == ((3L, Some(9.0))))
    assert(r(3L) == ((4L, Some(9.0))))
  }

  test("kCenterSelect: radius sequence is non-increasing") {
    import spark.implicits._
    val pts = (1L to 40L).map(i =>
      (i, Seq((i * 37 % 11).toDouble, (i * 17 % 7).toDouble)))
      .toDF("vec_id", "v")
    val radii = Similarity.kCenterSelect(pts, 5).collect()
      .filter(!_.isNullAt(2)).sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
  }
}
