package graft.functions

import graft.SparkSpec
import graft.ext.Similarity

import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator semantics: bounded, ordered, tie-broken by id") {
    val agg = new TopKAggregator(3)
    val in = Seq(ScoredId(1, 0.5), ScoredId(2, 0.9), ScoredId(3, 0.5),
      ScoredId(4, 0.1), ScoredId(5, 0.9))
    val buf = in.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 3)
    assert(agg.finish(buf) == Seq(ScoredId(2, 0.9), ScoredId(5, 0.9), ScoredId(1, 0.5)))
    // merge order must not matter
    val (l, r) = in.splitAt(2)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(merged == agg.finish(buf))
  }

  test("NaN sorts greatest and -0.0 equals 0.0, matching Spark ordering") {
    val agg = new TopKAggregator(3)
    val in = Seq(ScoredId(1, 0.5), ScoredId(2, Double.NaN), ScoredId(3, -0.0),
      ScoredId(4, 0.0), ScoredId(5, 1.0))
    val top = agg.finish(in.foldLeft(agg.zero)(agg.reduce))
    assert(top.map(_.id) == Seq(2L, 5L, 1L)) // NaN first, then 1.0, 0.5
    // -0.0 vs 0.0 tie breaks by id, not by sign bit
    val zeros = agg.finish(Seq(ScoredId(9, 0.0), ScoredId(3, -0.0), ScoredId(4, 0.0))
      .foldLeft(agg.zero)(agg.reduce))
    assert(zeros.map(_.id) == Seq(3L, 4L, 9L))
  }

  test("property: any split/merge order equals the sort reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Small score domain forces ties; ids unique per sample.
    val rowsGen = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0, 4)))
      .map(_.zipWithIndex.map { case ((_, s), i) => ScoredId(i.toLong, s / 4.0) })
    val agg = new TopKAggregator(4)
    def reference(rows: Seq[ScoredId]): Seq[ScoredId] =
      rows.sortBy(r => (-r.score, r.id)).take(4)
    (0 until 200).foreach { i =>
      val rows = rowsGen.apply(Gen.Parameters.default, Seed(7L + i)).get
      val cut = if (rows.isEmpty) 0 else (i * 13) % (rows.length + 1)
      val (l, r) = rows.splitAt(cut)
      val viaMerge = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val viaMergeFlip = agg.finish(agg.merge(
        r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce)))
      assert(viaMerge == reference(rows), s"sample $i: $rows")
      assert(viaMergeFlip == reference(rows), s"sample $i flipped: $rows")
    }
  }

  test("bit-identical to the window-sort top-k on random embeddings") {
    val rnd = new scala.util.Random(11)
    val emb = Seq.tabulate(60)(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int, Double)].collect()
        .map(t => (t._1, t._2, t._3, java.lang.Double.doubleToLongBits(t._4)))
        .sortBy(t => (t._1, t._3)).toSeq
    assert(key(Similarity.bruteForceTopKAgg(emb, q, 5)) ==
      key(Similarity.bruteForceTopK(emb, q, 5)))
  }
}
