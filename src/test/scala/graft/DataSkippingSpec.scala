package graft

import java.nio.file.{Files, Paths}

import graft.core.TableCatalog
import org.apache.spark.sql.functions._

/** File-skipping manifest: analyze() collects per-file min/max into a
  * `_stats` sidecar; scanRange() must (a) actually skip files on a
  * clustered layout, and (b) never change results — pruning is an I/O
  * optimization with a residual filter, not a semantic one. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(tag: String): TableCatalog = {
    val root = Files.createTempDirectory(Paths.get("target"), s"skip-$tag-")
    new TableCatalog(root.toString)
  }

  // 4 disjoint key ranges across 4 files via clustered repartition
  private def clustered = spark.range(0, 4000).select(col("id").as("k"),
      (col("id") % 7).as("v"))
    .repartitionByRange(4, col("k")).sortWithinPartitions("k")

  test("analyze + scanRange skips files outside the predicate range") {
    val cat = freshCat("prune")
    cat.overwrite(clustered, "t.clustered")
    cat.analyze(spark, "t.clustered", Seq("k"))
    val all = cat.prunedFiles(spark, "t.clustered", "k", 0L, 3999L)
    val some = cat.prunedFiles(spark, "t.clustered", "k", 100L, 200L)
    assert(all.size == 4, s"expected 4 data files, got ${all.size}")
    assert(some.size == 1, s"selective range should touch 1 file, got ${some.size}")
    val got = cat.scanRange(spark, "t.clustered", "k", 100L, 200L)
      .agg(count(lit(1)), sum(col("v"))).head()
    val want = cat.read(spark, "t.clustered").filter(col("k").between(100, 200))
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(got == want)
  }

  test("scanRange without a manifest reads everything; append extends the manifest") {
    val cat = freshCat("fallback")
    cat.overwrite(clustered, "t.nostats")
    // no analyze: every file survives pruning
    assert(cat.prunedFiles(spark, "t.nostats", "k", 0L, 10L).size == 4)
    cat.analyze(spark, "t.nostats", Seq("k"))
    assert(cat.prunedFiles(spark, "t.nostats", "k", 0L, 10L).size == 1)
    // append: carried files keep their manifest rows, the fresh batch's
    // files get theirs computed incrementally (O(batch)) — skipping
    // keeps working without a full re-analyze
    cat.append(Seq((5000L, 1L)).toDF("k", "v"), "t.nostats")
    val newRange = cat.prunedFiles(spark, "t.nostats", "k", 4500L, 6000L)
    assert(newRange.size == 1,
      s"appended batch should be the only file in [4500,6000], got ${newRange.size}")
    assert(cat.scanRange(spark, "t.nostats", "k", 4500L, 6000L).count() == 1L)
    // old ranges still prune to their original single file (not 5)
    assert(cat.prunedFiles(spark, "t.nostats", "k", 0L, 10L).size == 1)
    // completeness: pruned scan == full-scan filter across old + new rows
    val got = cat.scanRange(spark, "t.nostats", "k", 3500L, 6000L)
      .agg(count(lit(1)), sum(col("k"))).head()
    val want = cat.read(spark, "t.nostats").filter(col("k").between(3500, 6000))
      .agg(count(lit(1)), sum(col("k"))).head()
    assert(got == want)
    // an append WITHOUT a prior manifest still yields no manifest
    val cat2 = freshCat("nomanifest")
    cat2.overwrite(clustered, "t.raw")
    cat2.append(Seq((5000L, 1L)).toDF("k", "v"), "t.raw")
    assert(cat2.prunedFiles(spark, "t.raw", "k", 0L, 10L).size == 5)
  }

  test("z-order lets BOTH dimensions prune; linear clustering only its own key") {
    // Uniform 2-D grid: under 1-D clustering on x, file ranges are tight
    // on x but each file spans ALL of y; under z-order both dims have
    // tight per-file bounding boxes, so a selective predicate on either
    // dimension skips most files. This is the measurable payoff the
    // Morton layout exists for.
    val grid = spark.range(0, 1 << 14).select(
      (col("id") % 128).as("x"), (col("id") / 128).as("y"))
    val nf = 16
    val catL = freshCat("linear")
    catL.overwrite(graft.ops.Gold.clusterBy(grid, Seq("x"), Some(nf)), "t.lin")
    catL.analyze(spark, "t.lin", Seq("x", "y"))
    val catZ = freshCat("zorder")
    catZ.overwrite(graft.ops.Gold.zorderBy(grid, "x", "y", bits = 7,
      partitions = Some(nf)), "t.z")
    catZ.analyze(spark, "t.z", Seq("x", "y"))
    // selective slice on y (the non-leading dimension): 8 of 128 values
    val linY = catL.prunedFiles(spark, "t.lin", "y", 0L, 7L).size
    val zY = catZ.prunedFiles(spark, "t.z", "y", 0L, 7L).size
    assert(linY == nf, s"linear layout should NOT skip on y, pruned to $linY/$nf")
    assert(zY <= nf / 2, s"z-order should skip most files on y, got $zY/$nf")
    // and x stays prunable on both layouts
    assert(catL.prunedFiles(spark, "t.lin", "x", 0L, 7L).size <= nf / 2)
    assert(catZ.prunedFiles(spark, "t.z", "x", 0L, 7L).size <= nf / 2)
    // skipping never changes answers
    val a = catZ.scanRange(spark, "t.z", "y", 0L, 7L).agg(sum(col("x")), count(lit(1))).head()
    val b = grid.filter(col("y").between(0, 7)).agg(sum(col("x")), count(lit(1))).head()
    assert(a == b)
  }

  test("hilbert layout prunes both dims at least as tightly as z-order") {
    val grid = spark.range(0, 1 << 14).select(
      (col("id") % 128).as("x"), (col("id") / 128).as("y"))
    val nf = 16
    val catH = freshCat("hilbert")
    catH.overwrite(graft.ops.Gold.hilbertBy(grid, "x", "y", bits = 7,
      partitions = Some(nf)), "t.h")
    catH.analyze(spark, "t.h", Seq("x", "y"))
    val catZ = freshCat("zorder2")
    catZ.overwrite(graft.ops.Gold.zorderBy(grid, "x", "y", bits = 7,
      partitions = Some(nf)), "t.z2")
    catZ.analyze(spark, "t.z2", Seq("x", "y"))
    for (c <- Seq("x", "y")) {
      val h = catH.prunedFiles(spark, "t.h", c, 0L, 7L).size
      val z = catZ.prunedFiles(spark, "t.z2", c, 0L, 7L).size
      assert(h <= nf / 2, s"hilbert should skip most files on $c, got $h/$nf")
      // the no-jump curve can't do worse than Morton on the same data
      assert(h <= z, s"hilbert pruned $h files on $c, morton only $z")
    }
    // skipping never changes answers
    val a = catH.scanRange(spark, "t.h", "y", 0L, 7L)
      .agg(sum(col("x")), count(lit(1))).head()
    val b = grid.filter(col("y").between(0, 7))
      .agg(sum(col("x")), count(lit(1))).head()
    assert(a == b)
  }

  test("3-column hilbert layout prunes on every dimension") {
    // 32×32×16 grid: under 3-D Hilbert clustering each file's bounding
    // box is tight in all THREE dims, so a selective slice on any one
    // of them skips most files — the property 2-D curves can't give a
    // third predicate column.
    val nf = 16
    val grid = spark.range(0, 1 << 14).select(
      (col("id") % 32).as("x"), ((col("id") / 32) % 32).as("y"),
      (col("id") / 1024).as("z"))
    val cat = freshCat("h3")
    cat.overwrite(graft.ops.Gold.hilbertBy(grid, Seq("x", "y", "z"),
      bits = 5, partitions = Some(nf)), "t.h3")
    cat.analyze(spark, "t.h3", Seq("x", "y", "z"))
    for ((c, hi) <- Seq(("x", 3L), ("y", 3L), ("z", 1L))) {
      val pruned = cat.prunedFiles(spark, "t.h3", c, 0L, hi).size
      assert(pruned <= nf / 2, s"3-D hilbert should skip most files on $c, got $pruned/$nf")
    }
    // skipping never changes answers
    val a = cat.scanRange(spark, "t.h3", "z", 0L, 1L)
      .agg(sum(col("x")), count(lit(1))).head()
    val b = grid.filter(col("z").between(0, 1))
      .agg(sum(col("x")), count(lit(1))).head()
    assert(a == b)
  }

  test("string column participates in curve clustering via the prefix proxy") {
    // Delta's ZORDER takes string columns (the reference's own cluster
    // key is one); the 7-byte-prefix proxy must give the same both-dims
    // pruning a numeric column gets. Keys "k0000".."k0127" spread
    // lexicographically; stats min/max on strings compare correctly.
    val nf = 16
    val grid = spark.range(0, 1 << 14).select(
      format_string("k%04d", col("id") % 128).as("skey"),
      (col("id") / 128).as("y"))
    val cat = freshCat("strz")
    cat.overwrite(graft.ops.Gold.hilbertBy(grid, Seq("skey", "y"),
      bits = 7, partitions = Some(nf)), "t.strz")
    cat.analyze(spark, "t.strz", Seq("skey", "y"))
    val pS = cat.prunedFiles(spark, "t.strz", "skey", "k0000", "k0007").size
    val pY = cat.prunedFiles(spark, "t.strz", "y", 0L, 7L).size
    assert(pS <= nf / 2, s"string dim should prune, got $pS/$nf")
    assert(pY <= nf / 2, s"numeric dim should prune, got $pY/$nf")
    // pruning never changes answers
    val a = cat.scanRange(spark, "t.strz", "skey", "k0000", "k0007")
      .agg(count(lit(1)), sum(col("y"))).head()
    val b = grid.filter(col("skey").between("k0000", "k0007"))
      .agg(count(lit(1)), sum(col("y"))).head()
    assert(a == b)
  }

  test("incremental OPTIMIZE reclusters only appended files and restores skipping") {
    val nf = 16
    val grid = spark.range(0, 1 << 14).select(
      (col("id") % 128).as("x"), (col("id") / 128).as("y"))
    val cat = freshCat("opt")
    cat.overwrite(grid, "t.opt")
    cat.optimize(spark, "t.opt", Seq("x", "y"), curve = "hilbert", bits = 7,
      partitions = Some(nf))
    cat.analyze(spark, "t.opt", Seq("x", "y"))
    def files() = new java.io.File(cat.currentPath("t.opt")).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
    def prunedX() = cat.prunedFiles(spark, "t.opt", "x", 0L, 7L).size
    val p0 = prunedX()
    assert(p0 <= nf / 2, s"fresh hilbert layout should prune on x, got $p0/$nf")
    val clustered0 = files()
    assert(clustered0.size == nf)
    // append a 2-file batch spanning the WHOLE domain — the worst case
    // for layout quality (every appended file's bounding box covers
    // everything, so no probe can skip it)
    val batch = spark.range(0, 2048).select(
      (col("id") % 128).as("x"),
      ((col("id") * 7) % 128).cast("double").as("y")).repartition(2)
    cat.append(batch, "t.opt")
    val batchFiles = files() -- clustered0
    assert(batchFiles.size == 2)
    // carried stats make the batch files visible to pruning — and they
    // always survive it (full-domain boxes): layout quality degraded
    assert(prunedX() == p0 + 2)
    // incremental optimize rewrites EXACTLY the appended files (O(batch)
    // cost), leaving every clustered file untouched (hardlink carry)
    val rewritten = cat.optimizeIncremental(spark, "t.opt", partitions = Some(2))
    assert(rewritten == 2, s"expected the 2-file batch rewritten, got $rewritten")
    val afterOpt = files()
    assert(clustered0.subsetOf(afterOpt), "clustered files must carry by name")
    assert((afterOpt -- clustered0).size == rewritten)
    // skipping restored: the batch, re-bucketed into the ORIGINAL grid,
    // splits at the curve midpoint — for this orientation the second
    // half is entirely x >= 64, so the x<8 probe touches exactly one of
    // the two new files (what a fresh full cluster of the batch gives).
    // Margin: no x<8 cell sits past curve position 0.336, and the
    // range-sampler's boundary jitter around the 0.5 midpoint is ~3%
    // (σ ≈ N/(2·√samples)) — the second file's min_x stays ≥ 32 even
    // at a 10σ boundary slip, so the equality is ordering-robust.
    assert(prunedX() == p0 + 1, s"optimize should restore skipping, got ${prunedX()}")
    // …and lands within the structural gap of a freshly-fully-clustered
    // layout of the same total data: fresh mixes the sparse batch rows
    // INTO dense files (tight boxes everywhere), while incremental gives
    // the batch its own nBatch files whose boxes span the batch's spread
    // — the documented price of an O(batch) rewrite (Delta's incremental
    // OPTIMIZE makes the same trade). Bound: fresh's count ± the batch
    // file count + 1 sampling slack on each side, NOT exact equality —
    // range boundaries are sampled with an rdd-id-derived seed, so
    // file-for-file equality is nondeterministic across suite orderings.
    val cat2 = freshCat("optfresh")
    cat2.overwrite(grid.unionByName(
      spark.range(0, 2048).select((col("id") % 128).as("x"),
        ((col("id") * 7) % 128).cast("double").as("y"))), "t.fresh")
    cat2.optimize(spark, "t.fresh", Seq("x", "y"), curve = "hilbert",
      bits = 7, partitions = Some(nf + 2))
    cat2.analyze(spark, "t.fresh", Seq("x", "y"))
    val pF = cat2.prunedFiles(spark, "t.fresh", "x", 0L, 7L).size
    assert(prunedX() <= pF + 3 && pF <= prunedX() + 1,
      s"append+optimize pruning (${prunedX()}) should track fresh layout ($pF)")
    // idempotent — a second tick finds nothing unclustered
    assert(cat.optimizeIncremental(spark, "t.opt") == 0)
    // correctness through the whole lifecycle
    val got = cat.read(spark, "t.opt").agg(count(lit(1)), sum(col("x"))).head()
    val want = grid.unionByName(batch).agg(count(lit(1)), sum(col("x"))).head()
    assert(got == want)
  }

  test("optimize.write clusters appended batches at write time on the pinned grid") {
    val nf = 8
    val grid = spark.range(0, 1 << 14).select(
      (col("id") % 128).as("x"), (col("id") / 128).as("y"))
    val cat = freshCat("ow")
    cat.overwrite(grid, "t.ow")
    cat.optimize(spark, "t.ow", Seq("x", "y"), curve = "hilbert", bits = 7,
      partitions = Some(nf))
    cat.analyze(spark, "t.ow", Seq("x", "y"))
    cat.setProperty("t.ow", "optimize.write", "true")
    // small target so the tiny test batch still splits into several
    // grid-ordered files (at the default 128 MiB it would be one file)
    cat.setProperty("t.ow", "target.file.bytes", "1500")
    def files() = new java.io.File(cat.currentPath("t.ow")).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
    def prunedX() = cat.prunedFiles(spark, "t.ow", "x", 0L, 7L).size
    val p0 = prunedX()
    val clustered0 = files()
    // full-domain batch — worst case for layout quality if appended raw
    val batch = spark.range(0, 2048).select(
      (col("id") % 128).as("x"),
      ((col("id") * 7) % 128).cast("double").as("y")).repartition(2)
    cat.append(batch, "t.ow")
    val batchFiles = files() -- clustered0
    assert(batchFiles.size > 1, s"expected a multi-file clustered batch, got $batchFiles")
    // the batch entered the layout at write time: maintenance finds
    // nothing unclustered, and every data file is in the clustered set
    assert(cat.optimizeIncremental(spark, "t.ow") == 0)
    // write-time clustering preserves skipping: the x<8 probe must skip
    // at least one of the batch's files (a raw append's full-domain
    // files would ALL survive every probe)
    assert(prunedX() < p0 + batchFiles.size,
      s"clustered-write batch should prune: ${prunedX()} vs $p0 + ${batchFiles.size}")
    // rows survive the restage intact
    val got = cat.read(spark, "t.ow").agg(count(lit(1)), sum(col("x"))).head()
    val want = grid.unionByName(batch).agg(count(lit(1)), sum(col("x"))).head()
    assert(got == want)
  }

  test("bloom sidecar prunes point lookups min/max can't, on any layout") {
    // Layout clustered on k — but probe on v, where every file's [min,max]
    // covers the whole domain, so min/max skipping is blind. Give v few
    // distinct values per file (id/1000 → one value per range-file) so the
    // bloom has signal.
    // Build the 4-file layout with EXACT per-file v ownership: an
    // explicitly 4-way parallelized row seq splits evenly IN ORDER, so
    // partition g holds precisely k∈[1000g,1000g+1000) = v==g.
    // (repartitionByRange(k) picks SAMPLED boundaries, so a v value could
    // genuinely straddle two files and fail the ==1 assertion below even
    // though pruning was correct — zero false negatives, 2/4 files.)
    val byK = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 4000L).map(k => org.apache.spark.sql.Row(k, k / 1000L)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
    val cat = freshCat("bloom")
    cat.overwrite(byK, "t.bloom")
    cat.analyzeBloom(spark, "t.bloom", "v", expectedItemsPerFile = 1000)
    val hit = cat.bloomPrunedFiles(spark, "t.bloom", "v", Seq(2L))
    assert(hit.size == 1, s"one file holds v=2, pruned to ${hit.size}/4")
    // zero false negatives: pruned scan == full-scan filter, exactly
    val got = cat.scanPoints(spark, "t.bloom", "v", Seq(2L))
      .agg(count(lit(1)), sum(col("k"))).head()
    val want = cat.read(spark, "t.bloom").filter(col("v") === 2L)
      .agg(count(lit(1)), sum(col("k"))).head()
    assert(got == want)
    // absent value: typically zero files (fpp=3%), never wrong rows
    assert(cat.scanPoints(spark, "t.bloom", "v", Seq(99L)).count() == 0L)
    // no sidecar for this column → all files, correct result
    assert(cat.bloomPrunedFiles(spark, "t.bloom", "k", Seq(7L)).size == 4)
    assert(cat.scanPoints(spark, "t.bloom", "k", Seq(7L)).count() == 1L)
  }

  test("bloom sidecar survives appends: batch filters built with original sizing") {
    val cat = freshCat("bloomv")
    cat.overwrite(clustered, "t.bloomv")
    // tight fpp: at 0.03 a 1000-key file false-positives often enough to
    // flake an exact file-count assertion across runs
    cat.analyzeBloom(spark, "t.bloomv", "k", expectedItemsPerFile = 1000,
      fpp = 0.001)
    assert(cat.bloomPrunedFiles(spark, "t.bloomv", "k", Seq(100L)).size <= 2)
    cat.append(Seq((5000L, 1L)).toDF("k", "v"), "t.bloomv")
    // carried filters still cover old files; the batch file got its own
    // filter (same sizing), so a point probe for the appended key prunes
    // to (about) one file instead of falling back to all five
    val newFiles = cat.bloomPrunedFiles(spark, "t.bloomv", "k", Seq(5000L))
    assert(newFiles.size <= 2, s"appended key should prune, got ${newFiles.size}/5")
    assert(cat.scanPoints(spark, "t.bloomv", "k", Seq(5000L)).count() == 1L)
    // zero false negatives on carried files after the append
    assert(cat.bloomPrunedFiles(spark, "t.bloomv", "k", Seq(100L)).size <= 2)
    assert(cat.scanPoints(spark, "t.bloomv", "k", Seq(100L)).count() == 1L)
    // probing a column with no sidecar still returns every data file
    assert(cat.bloomPrunedFiles(spark, "t.bloomv", "v", Seq(1L)).size == 5)
  }

  test("deletion vectors are honored by pruned scans") {
    val cat = freshCat("dv")
    cat.overwrite(clustered, "t.dv")
    cat.analyze(spark, "t.dv", Seq("k"))
    cat.analyzeBloom(spark, "t.dv", "k", expectedItemsPerFile = 1000)
    cat.purgeKeys(spark, "t.dv", "k", Seq(150L))
    // the stats/bloom sidecars still cover the purged key's file (DV is
    // read-time), but neither pruned read path may return the row
    assert(cat.scanRange(spark, "t.dv", "k", 100L, 200L)
      .filter(col("k") === 150L).count() == 0L)
    assert(cat.scanRange(spark, "t.dv", "k", 100L, 200L).count() == 100L)
    assert(cat.scanPoints(spark, "t.dv", "k", Seq(150L)).count() == 0L)
    assert(cat.scanPoints(spark, "t.dv", "k", Seq(151L)).count() == 1L)
    // physical pass clears the DV; pruned scans unchanged for live keys
    cat.purgeRewrite(spark, "t.dv")
    assert(cat.scanPoints(spark, "t.dv", "k", Seq(151L)).count() == 1L)
    assert(cat.read(spark, "t.dv").filter(col("k") === 150L).count() == 0L)
  }

  test("empty pruning result keeps the schema and returns zero rows") {
    val cat = freshCat("empty")
    cat.overwrite(clustered, "t.empty")
    cat.analyze(spark, "t.empty", Seq("k"))
    val out = cat.scanRange(spark, "t.empty", "k", 100000L, 200000L)
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.count() == 0L)
  }

  test("exact value index: zero-false-positive point pruning") {
    val cat = freshCat("index")
    // cluster on v (0..6): each of the 4 range files holds ~2 values
    val byV = spark.range(0, 4000).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      .repartitionByRange(4, col("v")).sortWithinPartitions("v")
    cat.overwrite(byV, "t.idx")
    cat.analyzeIndex(spark, "t.idx", "v")
    // value 0 lives in exactly one range file — the index admits ONLY it
    val f0 = cat.indexedFiles(spark, "t.idx", "v", Seq(0L)).get
    assert(f0.size == 1, f0)
    // absent value → empty file list, empty scan, schema kept
    assert(cat.indexedFiles(spark, "t.idx", "v", Seq(99L)).get.isEmpty)
    val none = cat.scanPointsIndexed(spark, "t.idx", "v", Seq(99L))
    assert(none.columns.toSeq == Seq("k", "v") && none.count() == 0L)
    // results equal the full-scan filter exactly
    assert(cat.scanPointsIndexed(spark, "t.idx", "v", Seq(0L, 3L)).count() ==
      cat.read(spark, "t.idx").filter(col("v").isin(0L, 3L)).count())
    // no index on the column → graceful fallback, same rows
    assert(cat.scanPointsIndexed(spark, "t.idx", "k", Seq(42L)).count() == 1L)
  }

  test("exact value index refuses high-cardinality columns loudly") {
    val cat = freshCat("idxguard")
    cat.overwrite(clustered, "t.big")
    intercept[IllegalArgumentException](
      cat.analyzeIndex(spark, "t.big", "k", maxDistinct = 100L))
  }

  test("exact value index survives appends at O(batch)") {
    val cat = freshCat("idxcarry")
    val byV = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 5).as("v"))
      .repartitionByRange(3, col("v")).sortWithinPartitions("v")
    cat.overwrite(byV, "t.grow")
    cat.analyzeIndex(spark, "t.grow", "v")
    // append a batch introducing a NEW value 9 — postings must cover it
    import spark.implicits._
    cat.append(Seq((5000L, 9L), (5001L, 9L)).toDF("k", "v"), "t.grow")
    val f9 = cat.indexedFiles(spark, "t.grow", "v", Seq(9L)).get
    assert(f9.nonEmpty)
    assert(cat.scanPointsIndexed(spark, "t.grow", "v", Seq(9L)).count() == 2L)
    // carried postings for old values still exact after the append
    assert(cat.scanPointsIndexed(spark, "t.grow", "v", Seq(2L)).count() ==
      cat.read(spark, "t.grow").filter(col("v") === 2L).count())
    // the new-value probe touches only the batch's file(s), not the table
    val all = cat.describe("t.grow").filter(_._2).head._3
    assert(f9.size < all, s"index admitted $f9 of $all files")
  }
}
