package graft.plans

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.core.TableCatalog

import org.apache.spark.sql.functions._

/** Result cache ([[ResultCache]]): fingerprint stability across
  * plan rebuilds, hits served from the cache directory, and structural
  * invalidation — any input change (new catalog version, raw file
  * mutation) must miss rather than serve stale rows. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String) = {
    val dir = Files.createTempDirectory(Paths.get("target"), s"rc-$tag-")
    (new ResultCache(dir.resolve("cache").toString),
      new TableCatalog(dir.resolve("cat").toString))
  }

  private def q(cat: TableCatalog) =
    cat.read(spark, "t.sales")
      .filter(col("region") =!= "X")
      .groupBy("region").agg(sum(col("amt")).as("total"))

  test("second call is a hit: same rows, read from the cache dir") {
    val (rc, cat) = fresh("hit")
    cat.overwrite(Seq(("eu", 10L), ("eu", 5L), ("us", 7L)).toDF("region", "amt"),
      "t.sales")
    val first = rc.cached(q(cat))
    val want = first.collect().toSet
    // rebuild the query from scratch: fresh exprIds must fingerprint
    // identically (canonicalized plan), so this is a HIT
    assert(rc.fingerprint(q(cat)) == rc.fingerprint(q(cat)))
    val second = rc.cached(q(cat))
    assert(second.inputFiles.nonEmpty &&
      second.inputFiles.forall(_.contains(rc.root)),
      s"hit must read the cache, got ${second.inputFiles.take(2).mkString(",")}")
    assert(second.collect().toSet == want)
  }

  test("a new table version invalidates; different queries never collide") {
    val (rc, cat) = fresh("inv")
    cat.overwrite(Seq(("eu", 10L), ("us", 7L)).toDF("region", "amt"), "t.sales")
    val fp1 = rc.fingerprint(q(cat))
    assert(rc.cached(q(cat)).collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap == Map("eu" -> 10L, "us" -> 7L))
    cat.append(Seq(("eu", 90L)).toDF("region", "amt"), "t.sales")
    val fp2 = rc.fingerprint(q(cat))
    assert(fp1 != fp2, "new version must change the fingerprint")
    assert(rc.cached(q(cat)).collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap == Map("eu" -> 100L, "us" -> 7L))
    // a different aggregate over the same inputs is a different entry
    val other = cat.read(spark, "t.sales").groupBy("region")
      .agg(count(lit(1)).as("n"))
    assert(rc.fingerprint(other) != fp2)
  }

  test("raw-dir file mutation (same path) misses via the length/mtime signature") {
    val (rc, _) = fresh("raw")
    val dir = Files.createTempDirectory(Paths.get("target"), "rc-rawdata-")
    Seq(1L, 2L, 3L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)
    def sumQ = spark.read.parquet(dir.toString).agg(sum(col("v")).as("s"))
    val fp1 = rc.fingerprint(sumQ)
    assert(rc.cached(sumQ).head().getLong(0) == 6L)
    Seq(10L, 20L, 30L, 40L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)
    assert(rc.fingerprint(sumQ) != fp1, "rewritten files must change the fingerprint")
    assert(rc.cached(sumQ).head().getLong(0) == 100L)
  }

  test("empty results round-trip (schema pinned in the sidecar)") {
    val (rc, cat) = fresh("empty")
    cat.overwrite(Seq(("eu", 10L)).toDF("region", "amt"), "t.sales")
    val none = cat.read(spark, "t.sales").filter(col("amt") > 1000000L)
    assert(rc.cached(none).collect().isEmpty)
    // the second call hits the cached empty result and keeps the schema
    val hit = rc.cached(none)
    assert(hit.columns.toSeq == Seq("region", "amt"))
    assert(hit.collect().isEmpty)
    assert(rc.vacuumStaging(spark) == 0)
  }
}
