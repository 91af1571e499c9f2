package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tomorrow") // 1-word edit
  private val unrelated = "completely different words appear within this other sentence entirely now ok"

  private def docsDF = Seq(
    (0L, base), (1L, nearDup), (2L, unrelated), (3L, base)
  ).toDF("doc_id", "text")

  test("exactGroups finds byte-identical copies only") {
    val g = Dedup.exactGroups(docsDF).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("keep_id") == 0L && g.head.getAs[Long]("n_copies") == 2L)
  }

  test("jaccardPairs scores near-dups high and unrelated docs not at all") {
    val pairs = Dedup.jaccardPairs(docsDF, 0.5)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) == 1.0) // identical
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.5)  // near-dup
    assert(!pairs.keySet.exists { case (a, b) => a == 2L || b == 2L }) // unrelated
  }

  test("jaccardPairsPrefix equals the full postings join on the fixture") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b", "inter", "na", "nb", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getInt(4), r.getDouble(5))).toSet
    assert(canon(Dedup.jaccardPairsPrefix(docsDF, 0.5)) ==
      canon(Dedup.jaccardPairs(docsDF, 0.5)))
  }

  test("jaccardPairsPrefix: lossless across thresholds on a seeded corpus") {
    // overlapping sliding windows over a word stream: many partial
    // overlaps at every similarity level, exercising the prefix bound
    val words = (0 until 60).map(i => s"w${i % 23}")
    val corpus = (0 until 18).map { d =>
      (d.toLong, words.slice(d, d + 24).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val full = Dedup.jaccardPairs(corpus, t)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pref = Dedup.jaccardPairsPrefix(corpus, t)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pref == full, s"threshold $t: $pref vs $full")
    }
  }

  test("prefix filter: shared boilerplate creates NO candidates") {
    // every doc = unique content + the SAME boilerplate tail: the full
    // postings join pairs all docs through the boilerplate shingles
    // (k²/2 blowup); the rarest-first prefix excludes them entirely
    // 8 unique words + 8 boilerplate words → 14 trigrams, of which the
    // 8 containing a unique word have df=1 and the 6 all-boiler ones
    // df=12; at t=0.5 the prefix keeps 14−7+1 = 8 shingles — exactly
    // the rare ones, so boilerplate never reaches the join key space
    val boiler = "all rights reserved contact us terms of service"
    val corpus = (0 until 12).map { d =>
      (d.toLong, s"u$d c$d b$d t$d w$d h$d x$d y$d $boiler")
    }.toDF("doc_id", "text")
    val full = Dedup.jaccardPairs(corpus, 0.0).count() // every sharing pair
    val cand = Dedup.prefixCandidates(corpus, 0.5).count()
    assert(full == 12L * 11 / 2, s"boilerplate pairs all docs: $full")
    assert(cand == 0L, s"prefix candidates must skip boilerplate: $cand")
    // and the verified output agrees with the full join at the threshold
    assert(Dedup.jaccardPairsPrefix(corpus, 0.5).count() ==
      Dedup.jaccardPairs(corpus, 0.5).count())
  }

  test("minHashNearDups finds the same pairs as exact jaccard here") {
    val exact = Dedup.jaccardPairs(docsDF, 0.7).select("a", "b").collect().toSet
    val lsh = Dedup.minHashNearDups(docsDF, 0.7).select("a", "b").collect().toSet
    assert(lsh == exact)
  }

  test("minhash signature of identical docs is identical, near-dups mostly agree") {
    val sigs = Dedup.minHashSignatures(docsDF).select("doc_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(3L))
    val agree = sigs(0L).zip(sigs(1L)).count { case (x, y) => x == y }
    assert(agree > 32, s"near-dup minhash agreement too low: $agree/64")
    val agreeUnrelated = sigs(0L).zip(sigs(2L)).count { case (x, y) => x == y }
    assert(agreeUnrelated < 16, s"unrelated minhash agreement too high: $agreeUnrelated/64")
  }

  test("simhash: identical docs at hamming 0, near-dups close, unrelated far") {
    val sh = Dedup.simHashedBigrams(docsDF).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sh(0L), sh(3L)) == 0)
    assert(ham(sh(0L), sh(1L)) <= 8)
    assert(ham(sh(0L), sh(2L)) > 5)
  }

  test("simHashPairs band join equals brute force (pigeonhole exactness)") {
    val viaBands = Dedup.simHashPairs(docsDF, 3).select("a", "b").collect().toSet
    val sh = Dedup.simHashedBigrams(docsDF)
    val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .filter(expr("bit_count(x.simhash ^ y.simhash)") <= 3)
      .select(col("x.doc_id"), col("y.doc_id")).collect()
      .map(r => org.apache.spark.sql.Row(r.getLong(0), r.getLong(1))).toSet
    assert(viaBands.map(r => (r.getLong(0), r.getLong(1))) ==
      brute.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("shingles of a short doc are empty, not an error") {
    val short = Seq((9L, "one two")).toDF("doc_id", "text")
    assert(Dedup.shingled(short).select("nsh").head().getInt(0) == 0)
    assert(Dedup.jaccardPairs(short, 0.1).count() == 0)
  }

  test("jaccardPairsCapped: hot shingles create no candidates and carry no score") {
    // Every doc shares one boilerplate sentence (a hot shingle block); only
    // docs 0/1 genuinely overlap beyond it. Uncapped candidate generation
    // pairs ALL docs through the boilerplate; the df cap drops hot shingles
    // BEFORE the join, so boilerplate-only pairs never materialize and the
    // Jaccard is over the discriminative (rare) feature space.
    val boiler = "all rights reserved by the original copyright holder"
    val skewed = (0L to 9L).map { i =>
      val body = if (i <= 1) "identical payload text shared here" else s"unique body nr$i only"
      (i, s"$boiler $body")
    }.toDF("doc_id", "text")
    val capped = Dedup.jaccardPairsCapped(skewed, 0.3, maxDf = 5)
    val rows = capped.collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("na"), r.getAs[Double]("jaccard"))).toMap
    assert(rows.keySet == Set((0L, 1L)), s"expected only the true near-dup pair, got ${rows.keySet}")
    // docs 0/1 are byte-identical: 5 rare shingles each (2 boundary + 3
    // body), all shared → rare-space jaccard 1.0, boilerplate uncounted
    assert(rows((0L, 1L)) == ((5L, 5L, 1.0)))
    // The skew premise: uncapped, the hot shingles alone pair all 10 docs.
    val uncappedPairs = Dedup.jaccardPairs(skewed, 0.0).count()
    assert(uncappedPairs == 45L, s"skew premise broken: $uncappedPairs")
  }

  test("winnowing: shared long substring guarantees a shared fingerprint") {
    // k=5, w=8 → any shared substring of >= w+k-1 = 12 chars must yield
    // at least one common fingerprint, wherever it sits in each doc
    val shared = "zqxjkvwpbyfgm" // 13 chars, unusual alphabet
    val d = Seq(
      (0L, s"aaaa bbbb $shared cccc dddd"),
      (1L, s"totally different prefix text here $shared and other tail"),
      (2L, "no overlap with anything else at all in this one"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(0L) intersect fps(1L)).nonEmpty, "guaranteed match missed")
    assert((fps(0L) intersect fps(2L)).isEmpty, "unrelated docs share fingerprints")
  }

  test("winnowing: native SlidingMin form equals the HOF twin on varied docs") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, ('a' to 'z').mkString * 10),
      (2L, "ababababababababababab"), // heavy ties exercise deque >= rule
      (3L, "short"), (4L, "tiny"), (5L, ""))
      .toDF("doc_id", "text")
    val native = Dedup.winnowedFingerprints(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = Dedup.winnowedFingerprintsHof(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === hof)
  }

  test("winnowing: density ~2/(w+1) of grams; short docs keep one fingerprint") {
    val txt = ('a' to 'z').mkString * 40 // 1040 chars, all 5-grams distinct
    val d = Seq((0L, txt), (1L, "tiny"), (2L, "sevench")).toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val nGrams = txt.length - 4
    val density = fps(0L).size.toDouble / nGrams
    assert(density < 0.3, s"winnowed density $density not sparse")
    assert(fps(1L).isEmpty)      // < k chars → no grams
    assert(fps(2L).size == 1)    // grams but < one window → overall min
  }

  test("minHashNearDupsIncremental: batch-driven pairs only, corpus never self-pairs") {
    // corpus: 0 (base), 2 (unrelated); batch: 1 (near-dup of 0), 3 (copy of
    // 0), 4 (copy of 2). Expected pairs all end in a batch doc; the
    // corpus-internal relation (0, 2) must not appear even at threshold 0.
    val corpus = Seq((0L, base), (2L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((1L, nearDup), (3L, base), (4L, unrelated)).toDF("doc_id", "text")
    val got = Dedup.minHashNearDupsIncremental(corpus, batch, 0.7)
      .select("a", "src_a", "b").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((0L, "corpus", 1L), (0L, "corpus", 3L),
      (1L, "batch", 3L), (2L, "corpus", 4L)), s"got $got")
    // Cross-check against exact all-pairs Jaccard restricted to the same
    // incremental pair space.
    val all = corpus.withColumn("src", lit("corpus"))
      .unionByName(batch.withColumn("src", lit("batch")))
    val exact = Dedup.jaccardPairs(all.drop("src"), 0.7)
    val srcOf = all.select("doc_id", "src").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = exact.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => srcOf(b) == "batch" || srcOf(a) == "batch" }
      .map { case (a, b) => if (srcOf(a) == "batch" && srcOf(b) == "corpus") (b, srcOf(b), a) else (a, srcOf(a), b) }
      .toSet
    assert(got == expected, s"incremental $got != exact-restricted $expected")
  }

  test("incremental dedup over a persisted, appended signature index") {
    import graft.core.TableCatalog
    val cat = new TableCatalog(
      java.nio.file.Files.createTempDirectory("graft-sigidx").toString)
    val corpus = Seq((0L, base), (2L, unrelated)).toDF("doc_id", "text")
    cat.overwrite(Dedup.signatureIndex(corpus), "curation.sig_index")
    // ingest 1: batch deduped against the persisted index == inline form
    val batch1 = Seq((10L, nearDup), (11L, "novel text nobody wrote before")).toDF("doc_id", "text")
    val viaIndex = Dedup.minHashNearDupsIncrementalIndexed(
        cat.read(spark, "curation.sig_index"), batch1, 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = Dedup.minHashNearDupsIncremental(corpus, batch1, 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == inline && viaIndex == Set((0L, 10L)), s"$viaIndex vs $inline")
    // the ingest loop: append the batch's signatures (O(batch) hardlink
    // append), then a later batch near-dups against batch1's docs too
    cat.append(Dedup.signatureIndex(batch1), "curation.sig_index")
    val batch2 = Seq((20L, nearDup)).toDF("doc_id", "text") // exact dup of 10
    val got = Dedup.minHashNearDupsIncrementalIndexed(
        cat.read(spark, "curation.sig_index"), batch2, 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 20L), (10L, 20L)), s"got $got")
  }

  test("duplicateClusters: transitive closure over pairs, min-id canonical") {
    // 1-2, 2-3, 3-4 chain (diameter > 1 forces >1 propagation round);
    // 7-8 isolated pair; pair order/direction must not matter.
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (8L, 7L)).toDF("a", "b")
    val out = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }
}
