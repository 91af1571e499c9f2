package graft

import java.nio.file.{Files, Paths}

import graft.core.TableCatalog
import graft.functions.HllSketch
import org.apache.spark.sql.functions._

/** `_ndv` statistics sidecar: per-file HLL registers written by
  * analyzeNdv must merge EXACTLY to the whole-table sketch (max-merge is
  * lossless over any file grouping), the derived estimate must track
  * exact distinct counts, nulls must not count, and the sidecar must die
  * with its version like `_stats`/`_bloom`. */
class CatalogStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(tag: String): TableCatalog = {
    val root = Files.createTempDirectory(Paths.get("target"), s"ndv-$tag-")
    new TableCatalog(root.toString)
  }

  private def fixture = (1 to 5000)
    .map(i => (i.toLong, s"k${i % 700}", if (i % 10 == 0) None else Some(s"v${i % 97}")))
    .toDF("id", "key", "sparse")

  test("per-file registers max-merge to the one-pass whole-table sketch, bit for bit") {
    val cat = freshCat("merge")
    cat.overwrite(fixture.repartition(4), "stat.t")
    cat.analyzeNdv(spark, "stat.t", Seq("key"))
    // merged sidecar registers
    val sc = spark.read.parquet(
      Paths.get(cat.currentPath("stat.t"), "_ndv").toString)
    assert(sc.count() === 4) // one row per data file
    val merged = sc.select(posexplode(col("hll_key")).as(Seq("pos", "r")))
      .groupBy("pos").agg(max(col("r")).as("r"))
      .orderBy("pos").collect().map(_.getAs[Long]("r")).toSeq
    // direct one-pass sketch with the identical hash window
    val direct = cat.read(spark, "stat.t")
      .agg(HllSketch(
        when(col("key").isNotNull, pmod(xxhash64(col("key")), lit(1L << 30))),
        10, 20).as("regs"))
      .collect().head.getSeq[Long](0)
    assert(merged == direct)
  }

  test("ndvEstimate from metadata tracks exact distincts; nulls excluded") {
    val cat = freshCat("est")
    cat.overwrite(fixture.repartition(3), "stat.t")
    cat.analyzeNdv(spark, "stat.t", Seq("id", "key", "sparse"))
    val est = cat.ndvEstimate(spark, "stat.t", Seq("id", "key", "sparse"))
    val exact = Map("id" -> 5000.0, "key" -> 700.0, "sparse" -> 97.0)
    for ((c, e) <- exact) {
      val got = est(c)
      val err = math.abs(got - e) / e
      assert(err <= 0.15, s"$c: est=$got exact=$e err=$err")
    }
    // uncovered column -> absent, not wrong
    assert(!cat.ndvEstimate(spark, "stat.t", Seq("nope")).contains("nope"))
  }

  test("sidecar dies with its version: overwrite drops stale statistics") {
    val cat = freshCat("life")
    cat.overwrite(fixture, "stat.t")
    cat.analyzeNdv(spark, "stat.t", Seq("key"))
    assert(cat.ndvEstimate(spark, "stat.t", Seq("key")).contains("key"))
    cat.overwrite(fixture.limit(10), "stat.t")
    assert(cat.ndvEstimate(spark, "stat.t", Seq("key")).isEmpty)
  }
}
