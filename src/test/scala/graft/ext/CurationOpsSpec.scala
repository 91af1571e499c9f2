package graft.ext

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Line-level dedup, token-budget mixture, and semantic-keep invariants
  * (the round-3 curation additions; driver queries `d_line_dedup`,
  * `x_token_budget_mix`, `d_semantic_keep`). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // Exactly 8 words, so it fills one chunk and stays identical across
  // docs (chunking is positional — misaligned boilerplate would differ).
  private val boiler = "all rights reserved by the site owner today"

  test("lineLevelDedup drops cross-doc boilerplate lines, keeps unique text in order") {
    // 6 docs = [boiler][unique payload][boiler] as three aligned 8-word
    // chunks (boiler df=7 > maxDf=4); one doc is ALL boilerplate.
    val docs = ((0 until 6).map { i =>
      (i.toLong, s"$boiler x$i unique payload line number $i alpha beta $boiler")
    } :+ (99L, boiler)).toDF("doc_id", "text")
    val out = Dedup.lineLevelDedup(docs, w = 8, maxDf = 4)
      .orderBy("doc_id").collect()

    assert(out.length === 7, "every doc survives, even all-boilerplate ones")
    val d0 = out.head
    assert(d0.getAs[Long]("n_lines") === 3)    // 24 words -> 3 chunks of 8
    assert(d0.getAs[Long]("n_kept") === 1)     // both boilerplate chunks dropped
    assert(d0.getAs[Long]("n_removed") === 2)
    assert(d0.getAs[String]("clean_text") === "x0 unique payload line number 0 alpha beta")
    val all = out.last
    assert(all.getAs[Long]("doc_id") === 99L)
    assert(all.getAs[Long]("n_kept") === 0)
    assert(all.getAs[String]("clean_text") === "")
  }

  test("lineLevelDedup line df counts documents, not occurrences") {
    // One doc repeats a line 10 times; only 2 docs contain it, so with
    // maxDf=2 it survives everywhere (occurrence count 11 must not trip
    // the document-frequency gate).
    val rep = Seq.fill(10)("spam spam spam spam spam spam spam spam").mkString(" ")
    val docs = Seq(
      (1L, rep),
      (2L, "spam spam spam spam spam spam spam spam other words here make one more line")
    ).toDF("doc_id", "text")
    val out = Dedup.lineLevelDedup(docs, w = 8, maxDf = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") === 0)
    assert(out(1).getAs[Long]("n_removed") === 0)
  }

  test("tokenBudgetMix keeps a priority-prefix per source within budget") {
    val docs = (0 until 40).map { i =>
      (i.toLong, s"src${i % 2}", Seq.fill(10)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Mixture.tokenBudgetMix(docs, budgetPerSource = 55L)
    val rows = out.collect()
    // 10 tokens per doc, budget 55 -> exactly 5 docs per source.
    assert(rows.length === 10)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.length === 5)
      assert(rs.map(_.getAs[Long]("cum_tokens")).max <= 55L)
    }
    // Deterministic: same input -> same selection.
    val again = Mixture.tokenBudgetMix(docs, budgetPerSource = 55L).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.sameElements(
      again.map(_.getAs[Long]("doc_id")).sorted))
    // The selection is the PREFIX of the priority order: every kept doc's
    // priority is <= every dropped doc's priority within its source.
    val all = docs.select(col("source"), col("doc_id"),
        Mixture.priority(col("doc_id")).as("p")).collect()
    val keptIds = rows.map(_.getAs[Long]("doc_id")).toSet
    all.groupBy(_.getAs[String]("source")).foreach { case (_, ds) =>
      val (kept, dropped) = ds.partition(r => keptIds(r.getAs[Long]("doc_id")))
      assert(kept.map(_.getAs[Long]("p")).max <= dropped.map(_.getAs[Long]("p")).min)
    }
  }

  test("thresholdMix (scan-only scale path) agrees with the exact window form at the cutoff") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"src${i % 3}", Seq.fill(7)("t").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val exact = Mixture.tokenBudgetMix(docs, budgetPerSource = 70L)
    // Derive the per-source cutoff FROM the exact selection (max kept
    // priority) — thresholdMix with that cutoff must reproduce it.
    val cutoffs = exact.groupBy("source").agg(max(col("priority")).as("cutoff"))
    val viaThreshold = Mixture.thresholdMix(docs, cutoffs)
    assert(viaThreshold.count() === exact.count())
    assert(viaThreshold.select("doc_id").except(exact.select("doc_id")).isEmpty)
  }

  test("temperatureMix up-samples small sources at alpha=0.5 and stays deterministic") {
    // Source token masses 640:160:40 (ratio 16:4:1). sqrt-temperature
    // shares are sqrt-proportional -> exactly 4:2:1 in the reals.
    val docs =
      ((0 until 64).map(i => (i.toLong, "src0")) ++
        (100 until 116).map(i => (i.toLong, "src1")) ++
        (200 until 204).map(i => (i.toLong, "src2")))
        .map { case (id, s) => (id, s, Seq.fill(10)("w").mkString(" ")) }
        .toDF("doc_id", "source", "text")
    val out = Mixture.temperatureMix(docs, budgetTokens = 280L)
    val bySrc = out.collect().groupBy(_.getAs[String]("source"))
    val share = bySrc.view.mapValues(_.head.getAs[Double]("share")).toMap
    assert(math.abs(share("src0") - 4.0 / 7) < 1e-9)
    assert(math.abs(share("src1") - 2.0 / 7) < 1e-9)
    assert(math.abs(share("src2") - 1.0 / 7) < 1e-9)
    // Rates: budget*share/tok = 0.25 / 0.5 / ~1.0 — monotone in favor of
    // the small source (the whole point of temperature < 1).
    val rate = bySrc.view.mapValues(_.head.getAs[Double]("rate")).toMap
    assert(math.abs(rate("src0") - 0.25) < 1e-9)
    assert(math.abs(rate("src1") - 0.5) < 1e-9)
    assert(rate("src2") > 0.999) // LEAST(1, ~1±ulp)
    // Realized keep-counts track n*rate (deterministic hash Bernoulli —
    // no distributional guarantee at n=64, just sanity bands).
    val kept = bySrc.view.mapValues(_.length).toMap
    assert(kept("src0") >= 8 && kept("src0") <= 26, s"src0 kept ${kept("src0")}")
    assert(kept("src1") >= 3 && kept("src1") <= 13, s"src1 kept ${kept("src1")}")
    assert(kept.getOrElse("src2", 0) >= 3) // rate ~1: nearly all 4 kept
    // Reproducible run-over-run.
    val again = Mixture.temperatureMix(docs, budgetTokens = 280L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(again))
  }

  test("semantic keeper selection keeps exactly one doc per near-dup cluster") {
    // Two clusters of identical vectors (cosine 1.0 within, orthogonal
    // across) plus a singleton; labels force all into one bucket.
    val rows = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(1f, 0f, 0f), 0),
      (3L, Array(2f, 0f, 0f), 0), // same direction as 1,2 -> same cluster
      (10L, Array(0f, 1f, 0f), 0), (11L, Array(0f, 1f, 0f), 0),
      (20L, Array(0f, 0f, 1f), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val pairs = Similarity.nearDupPairs(emb, 0.9).select(col("a"), col("b"))
    val clusters = Dedup.duplicateClusters(pairs)
    val keep = emb.select(col("vec_id"))
      .join(clusters, col("vec_id") === col("node"), "left")
      .select(col("vec_id"), coalesce(col("label"), col("vec_id")).as("cluster"),
        (coalesce(col("label"), col("vec_id")) === col("vec_id")).as("keep"))
      .collect()
    val kept = keep.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("vec_id")).sorted
    assert(kept.sameElements(Array(1L, 10L, 20L)))
    // Every cluster id is its own min member.
    keep.foreach { r =>
      assert(r.getAs[Long]("cluster") <= r.getAs[Long]("vec_id"))
    }
  }

  test("shardPlan two-phase prefix sum is bit-equal to the window reference") {
    // 2 sources x 40 docs, 3-9 tokens each (token count varies with id
    // so shard boundaries land mid-bucket and off-bucket alike).
    val docs = (0 until 80).map { i =>
      val src = if (i % 2 == 0) "web" else "code"
      (i.toLong, src, Seq.fill(3 + i % 7)(s"w$i").mkString(" "))
    }.toDF("doc_id", "source", "text")

    val ref = Mixture.shardPlanWindow(docs, budget = 25L)
      .select("doc_id", "start", "shard_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Mixture.shardPlan(docs.repartition(7), budget = 25L)
      .select("doc_id", "start", "shard_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === ref, "two-phase must equal the single-window form exactly")

    // Shard invariants: within a source, shard ids are dense from 0 and
    // every shard except the last is filled past the budget boundary
    // (a doc never splits, so a shard holds >= budget - (max doc) + 1
    // tokens once the next shard exists).
    val m = Mixture.shardManifest(docs, budget = 25L).collect()
    m.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("shard_id")).sorted
      assert(ids.head === 0L && ids === (0L until ids.length).toArray,
        "shard ids dense from 0")
    }
    // Determinism: same input, different physical layout, same manifest.
    val m2 = Mixture.shardManifest(docs.repartition(13), budget = 25L).collect()
    assert(m.map(_.toString).sorted.sameElements(m2.map(_.toString).sorted))
  }

  test("systematicSample: one pick per stride, tick-exact, layout-proof") {
    val docs = (0 until 80).map { i =>
      val src = if (i % 2 == 0) "web" else "code"
      (i.toLong, src, Seq.fill(3 + i % 7)(s"w$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val total = (0 until 80).map(i => 3 + i % 7).sum // 480 tokens
    val stride = 50L

    val picks = Mixture.systematicSample(docs, stride).collect()
    // Exactly one pick per crossed boundary: ticks are 1..floor(total/stride),
    // each exactly once (no doc here spans two boundaries).
    val ticks = picks.map(_.getAs[Long]("tick")).sorted.toSeq
    assert(ticks == (1L to total / stride).toSeq,
      s"ticks must enumerate every stride boundary once, got $ticks")
    // The crossed boundary really falls inside each pick's interval.
    picks.foreach { r =>
      val start = r.getAs[Long]("start_tok")
      val end = start + r.getAs[Long]("n_tokens")
      val b = r.getAs[Long]("tick") * stride
      assert(start < b && b <= end, s"boundary $b outside ($start, $end]")
    }
    // Deterministic under physical layout changes.
    val again = Mixture.systematicSample(docs.repartition(13), stride)
      .collect().map(_.toString).sorted
    assert(again.sameElements(picks.map(_.toString).sorted))
    // In the no-span corpus every pick carries multiplicity 1.
    assert(picks.forall(_.getAs[Long]("n_ticks") == 1L))
  }

  test("systematicSample: a mega-doc spanning boundaries carries its multiplicity") {
    // One doc heavier than two strides among small ones: it must emit a
    // single row whose n_ticks counts every boundary inside its interval,
    // and total multiplicity must still enumerate every corpus boundary.
    val docs = ((0 until 20).map { i =>
      (i.toLong, "web", Seq.fill(5)(s"w$i").mkString(" "))
    } :+ (99L, "web", Seq.fill(120)("big").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val stride = 50L
    val total = 20 * 5 + 120 // 220 tokens → boundaries 50,100,150,200
    val picks = Mixture.systematicSample(docs, stride).collect()
    // Multiplicity conservation: Σ n_ticks == floor(total / stride).
    assert(picks.map(_.getAs[Long]("n_ticks")).sum == total / stride)
    // The mega-doc's row counts exactly the boundaries in (start, end].
    val big = picks.find(_.getAs[Long]("doc_id") == 99L).get
    val s = big.getAs[Long]("start_tok")
    val e = s + big.getAs[Long]("n_tokens")
    val inside = (1L to total / stride).count(t => s < t * stride && t * stride <= e)
    assert(big.getAs[Long]("n_ticks") == inside && inside >= 2,
      s"mega-doc spans $inside boundaries, row says ${big.getAs[Long]("n_ticks")}")
    // tick is the FIRST crossed boundary.
    assert(big.getAs[Long]("tick") == s / stride + 1)
  }

  test("multiplicativeWeights: one hand round — cap binds, normalizer redistributes") {
    import spark.implicits._
    // lam 2.0 / 0.5, eta 0.5, clip [0.1, 0.6], start 0.5 each:
    //   raw_a = 0.5·(1 + 0.5·1.0)  = 0.75 → capped 0.6
    //   raw_b = 0.5·(1 + 0.5·(−0.5)) = 0.375
    val dom = Seq(("a", 2.0), ("b", 0.5)).toDF("domain", "lam")
    val r = Mixture.multiplicativeWeights(dom, "domain", "lam", 1, 0.5, 0.1, 0.6)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("w")).toMap
    assert(r("a") == 0.6 / (0.6 + 0.375))
    assert(r("b") == 0.375 / (0.6 + 0.375))
  }

  test("multiplicativeWeights: floor binds for a starved domain; rounds keep sum 1") {
    import spark.implicits._
    val dom = Seq(("a", 3.0), ("b", 1.0), ("c", 0.0)).toDF("domain", "lam")
    val out = Mixture.multiplicativeWeights(dom, "domain", "lam", 3, 0.5, 0.2, 0.9)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("w")).toMap
    // c's raw update is w·0.5 each round but the 0.2 floor catches it
    // before normalization, so it never collapses to 0
    assert(out("c") > 0.1)
    assert(out("a") > out("b") && out("b") > out("c"))
    assert(math.abs(out.values.sum - 1.0) < 1e-12)
  }
}
