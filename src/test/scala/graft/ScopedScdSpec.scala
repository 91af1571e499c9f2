package graft

import graft.core.{Clock, TableCatalog}
import graft.scd.{Scd2, ScopedScd2}

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** Partition-scoped SCD2: same result as the full merge, while untouched
  * partitions are carried by hardlink (no data rewrite). */
class ScopedScdSpec extends SparkSpec {
  import spark.implicits._

  private def fileKeys(dir: Path): Map[String, Object] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => dir.relativize(p).toString -> Files.getAttribute(p, "unix:fileKey"))
      .toMap
  }

  test("scoped merge == full merge; untouched buckets are hardlinked") {
    val root = Files.createTempDirectory("graft-scoped")
    val cat = new TableCatalog(root.toString)
    val scoped = new ScopedScd2(Seq("k"), Seq("v"),
      clock = Clock.fixed("2026-01-01"), nBuckets = 8)

    val initial = (1 to 200).map(i => (s"k$i", s"v$i")).toDF("k", "v")
    scoped(spark, cat, "t.s.scd", initial)
    val v1 = Paths.get(cat.currentPath("t.s.scd"))
    val v1Files = fileKeys(v1)

    // second batch touches a subset of keys (a few buckets)
    val batch = Seq(("k1", "CHANGED"), ("k2", "v2"), ("k999", "NEW")).toDF("k", "v")
    val scoped2 = new ScopedScd2(Seq("k"), Seq("v"),
      clock = Clock.fixed("2026-02-01"), nBuckets = 8)
    scoped2(spark, cat, "t.s.scd", batch)

    val result = cat.read(spark, "t.s.scd")

    // equivalent full merge on the same inputs
    val full = new Scd2(Seq("k"), Seq("v"), clock = Clock.fixed("2026-02-01"))
      .merge(
        new Scd2(Seq("k"), Seq("v"), clock = Clock.fixed("2026-01-01"))
          .initialize(initial.withColumn("key_bucket", scoped.bucketExpr)),
        batch.withColumn("key_bucket", scoped.bucketExpr))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "row_hash", "effective_from", "effective_to", "is_current")
        .collect().map(_.toString).sorted.toSeq
    assert(canon(result) == canon(full))

    // SCD2 semantics spot checks
    assert(result.filter(col("k") === "k1").count() == 2)
    assert(result.filter(col("k") === "k1" && col("is_current")).head()
      .getAs[String]("v") == "CHANGED")
    assert(result.filter(col("k") === "k999" && col("is_current")).count() == 1)

    // untouched bucket files in v2 are the SAME inodes as v1 (hardlinks)
    val v2 = Paths.get(cat.currentPath("t.s.scd"))
    assert(v2 != v1)
    val v2Files = fileKeys(v2)
    val touchedBuckets = Seq("k1", "k2", "k999").map(k =>
      s"key_bucket=${batch.sparkSession.range(1).select(
        pmod(hash(lit(k)), lit(8))).head().getInt(0)}")
    val carried = v1Files.keySet.filterNot(p => touchedBuckets.exists(p.startsWith))
    assert(carried.nonEmpty, "expected at least one untouched bucket")
    carried.foreach { p =>
      assert(v2Files.contains(p), s"untouched file $p missing from new version")
      assert(v2Files(p) == v1Files(p), s"untouched file $p was rewritten, not hardlinked")
    }
  }
}
