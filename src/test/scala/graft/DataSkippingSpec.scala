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

  test("scanRange without a manifest (or after append) reads everything, correctly") {
    val cat = freshCat("fallback")
    cat.overwrite(clustered, "t.nostats")
    // no analyze: every file survives pruning
    assert(cat.prunedFiles(spark, "t.nostats", "k", 0L, 10L).size == 4)
    cat.analyze(spark, "t.nostats", Seq("k"))
    assert(cat.prunedFiles(spark, "t.nostats", "k", 0L, 10L).size == 1)
    // append: the new version carries data files but NOT the stale
    // manifest, so pruning falls back to all files instead of missing
    // the appended rows
    cat.append(Seq((5000L, 1L)).toDF("k", "v"), "t.nostats")
    val files = cat.prunedFiles(spark, "t.nostats", "k", 4500L, 6000L)
    assert(files.size >= 5, s"post-append fallback should list all files, got ${files.size}")
    val n = cat.scanRange(spark, "t.nostats", "k", 4500L, 6000L).count()
    assert(n == 1L)
  }

  test("empty pruning result keeps the schema and returns zero rows") {
    val cat = freshCat("empty")
    cat.overwrite(clustered, "t.empty")
    cat.analyze(spark, "t.empty", Seq("k"))
    val out = cat.scanRange(spark, "t.empty", "k", 100000L, 200000L)
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.count() == 0L)
  }
}
