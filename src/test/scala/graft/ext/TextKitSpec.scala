package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextKitSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("polyHash matches a hand-rolled reference fold") {
    def ref(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % TextKit.P)
    for (s <- Seq("hi", "the quick brown fox", "", "a")) {
      val got = one(s).select(TextKit.polyHash(col("text"))).head().getLong(0)
      assert(got == ref(s), s"polyHash('$s')")
    }
  }

  test("wordShingles produces distinct n-grams; short text yields empty") {
    val sh = one("a b c d").select(TextKit.wordShingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    assert(one("a b").select(TextKit.wordShingles(col("text"), 3))
      .head().getSeq[String](0).isEmpty)
    // duplicates collapse
    val dup = one("x y x y x y x y").select(TextKit.wordShingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(dup.toSet == Set("x y x", "y x y"))
  }

  test("gramHashes windows are position hashes of 5 chars") {
    def ref(s: String): Seq[Long] =
      s.sliding(5).map(_.foldLeft(0L)((a, c) => a * 31 + c.toLong)).toSeq
    val got = one("abcdefg").select(TextKit.gramHashes(col("text"), 5))
      .head().getSeq[Long](0)
    assert(got == ref("abcdefg"))
  }

  test("simhash of same multiset equals; word order does not matter") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "delta gamma beta alpha"))
      .toDF("doc_id", "text")
    val out = Dedup.simHashed(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(out(1L) == out(2L))
  }

  test("minhash signature bounds: values in [0, P]") {
    val sigs = Dedup.minHashSignatures(Seq((1L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text"))
      .select("sig").head().getSeq[Long](0)
    assert(sigs.length == 64)
    assert(sigs.forall(v => v >= 0 && v <= TextKit.P))
  }

  test("bpeTrainMerges: hand-computed merge sequence on a tiny corpus") {
    // words: aaab ×3, aab ×2.
    // Round 1: (a,a) = 2·3 + 1·2 = 8 beats (a,b) = 5 → merge a+a.
    //   Greedy leftmost: aaab → [aa, a, b] (NOT [a, aa, b]); aab → [aa, b].
    // Round 2: (aa,a) = 3, (a,b) = 3, (aa,b) = 2 — tie broken
    //   lexicographically ('a' < 'aa') → merge a+b, cnt 3.
    val docs = Seq("aaab aaab aaab aab aab").toDF("text")
    val m = TextKit.bpeTrainMerges(docs, k = 2).orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "a", "a", 8L), (2L, "a", "b", 3L)))
  }

  /** Naive driver-side SEQUENTIAL BPE (one merge per round, full count
    * recomputation between rounds) — the semantics the batched trainer
    * must reproduce exactly. */
  private def bpeSequentialRef(freqs: Map[String, Long],
      k: Int): Seq[(Long, String, String, Long)] = {
    var words = freqs.toVector.map { case (w, f) =>
      (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var rank = 1L
    while (rank <= k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) return out.toSeq
      val ((l, r), c) = counts.toSeq
        .minBy { case ((l, r), c) => (-c, l, r) }
      words = words.map { case (syms, f) =>
        val acc = scala.collection.mutable.Buffer(syms.head)
        syms.tail.foreach { x =>
          if (acc.last == l && x == r) acc(acc.length - 1) = l + r
          else acc += x
        }
        (acc.toVector, f)
      }
      out += ((rank, l, r, c))
      rank += 1
    }
    out.toSeq
  }

  test("bpeTrainMerges: batched rounds equal the sequential reference") {
    // several mutually disjoint hot pairs → a real multi-merge batch
    // forms (4 merges in round one), plus overlap/tie tails that force
    // the strict-count trim and the single-merge fallback
    val freqs = Map("abcd" -> 9L, "efgh" -> 7L, "ijkl" -> 5L,
      "abef" -> 4L, "cdgh" -> 3L, "mnop" -> 2L)
    val corpus = freqs.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val got = TextKit.bpeTrainMerges(Seq(corpus).toDF("text"), k = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == bpeSequentialRef(freqs, 8),
      s"batched ${got.toSeq} != sequential ${bpeSequentialRef(freqs, 8)}")
  }

  test("bpeEncode: doc token counts under the trained segmentation") {
    // After the two merges above: aaab → [aa, a, b] → [aa, ab] (2 tokens);
    // aab → [aa, b] (round-2 pair (a,b) can't fire: 'aa' != 'a').
    val docs = Seq((7L, "aaab aaab aaab aab aab")).toDF("doc_id", "text")
    val r = TextKit.bpeEncode(docs, k = 2).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((7L, 5L, 18L, 10L, 1.8)))
  }

  test("lmScore: hand-computed add-one bigram likelihoods") {
    // corpus: doc 1 = "a b a b a b", doc 2 = "a c b".
    // c1: a=4, b=4, c=1; V=3; c2: ab=3, ba=2, ac=1, cb=1.
    // p(ab)=4/7, p(ba)=3/7, p(ac)=2/7, p(cb)=2/4.
    val d = Seq((1L, "a b a b a b"), (2L, "a c b")).toDF("doc_id", "text")
    val out = graft.queries.Extensions.lmScoreDf(d).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val likA = 1.0 * (4.0/7.0) * (3.0/7.0) * (4.0/7.0) * (3.0/7.0) * (4.0/7.0)
    val likB = 1.0 * (2.0/7.0) * (2.0/4.0)
    assert(out(0) == ((1L, 5L, 3.0/7.0, likA)))
    assert(out(1) == ((2L, 2L, 2.0/7.0, likB)))
  }

  test("bm25: hand-computed rational scores (Robertson saturation + odds idf)") {
    // doc 1 = "a a b" (dl 3), doc 2 = "b c" (dl 2), doc 3 = "c c c c c"
    // (dl 5). N=3, avgdl=10/3. Query {a, b}: df(a)=1, df(b)=2.
    val d = Seq((1L, "a a b"), (2L, "b c"), (3L, "c c c c c"))
      .toDF("doc_id", "text")
    val out = graft.queries.Extensions.bm25Df(d, Seq("a", "b"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val avgdl = 10.0 / 3.0
    def tfPart(tf: Long, dl: Long) =
      (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
    val idfA = (3.0 - 1.0 + 0.5) / (1.0 + 0.5) // df 1 → 5/3
    val idfB = (3.0 - 2.0 + 0.5) / (2.0 + 0.5) // df 2 → 3/5
    // doc 1 matches both; fold in term order a, b from 0.0
    val s1 = 0.0 + idfA * tfPart(2, 3) + idfB * tfPart(1, 3)
    val s2 = 0.0 + idfB * tfPart(1, 2)
    assert(out.toSeq == Seq((1L, 2L, s1), (2L, 1L, s2)))
  }
}
