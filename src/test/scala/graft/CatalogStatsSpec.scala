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
    // the plan-time summary shares the lifecycle
    assert(!Files.isRegularFile(
      Paths.get(cat.currentPath("stat.t"), "_ndv_summary.json")))
  }

  test("NdvBroadcastRule: sidecar statistics alone flip a filtered-dim join to broadcast") {
    import graft.plans.NdvBroadcastRule
    val cat = freshCat("cbo")
    cat.overwrite(fixture.repartition(3), "stat.dim")
    cat.analyzeNdv(spark, "stat.dim", Seq("key"))
    // a fact too big for either side to look tiny by file size
    val fact = spark.range(200000)
      .select((col("id") % 5000L + 1L).as("fid"), (col("id") * 7L).as("m"))
    def plan(withRule: Boolean): String = {
      val saved = spark.experimental.extraOptimizations
      val savedThresh = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      try {
        // size-based broadcast OFF — any BroadcastHashJoin below can only
        // come from the statistics hint
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.experimental.extraOptimizations =
          if (withRule) saved :+ NdvBroadcastRule(spark) else saved
        val dim = cat.read(spark, "stat.dim").filter(col("key") === "k13")
        fact.join(dim, col("fid") === col("id"))
          .groupBy("key").agg(count(lit(1)).as("n"))
          .queryExecution.executedPlan.toString
      } finally {
        spark.experimental.extraOptimizations = saved
        savedThresh match {
          case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
          case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
      }
    }
    // without the rule: no size info admits a broadcast → shuffle join
    assert(!plan(withRule = false).contains("BroadcastHashJoin"),
      "control: with auto-broadcast off and no rule the join must shuffle")
    // with the rule: n_rows/ndv(key) ≈ 5000/700 rows → well under the
    // threshold → broadcast, from the sidecar alone
    assert(plan(withRule = true).contains("BroadcastHashJoin"),
      "sidecar statistics must flip the filtered dim to broadcast")
    // equality on an UNcovered column stays silent (no stats, no hint)
    val saved = spark.experimental.extraOptimizations
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.experimental.extraOptimizations = saved :+ NdvBroadcastRule(spark)
      val dim = cat.read(spark, "stat.dim").filter(col("sparse") === "v7")
      val p = fact.join(dim, col("fid") === col("id"))
        .groupBy("sparse").agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        "no sidecar coverage for the filter column → no hint")
    } finally {
      spark.experimental.extraOptimizations = saved
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("summary carries min/max ranges: numerics on the double scale, dates as epoch days, strings skipped") {
    val cat = freshCat("range")
    val withDate = fixture.withColumn("d",
      date_add(lit("2024-01-01").cast("date"), (col("id") % 100).cast("int")))
    cat.overwrite(withDate, "stat.t")
    cat.analyzeNdv(spark, "stat.t", Seq("id", "key", "d"))
    val raw = new String(Files.readAllBytes(
      Paths.get(cat.currentPath("stat.t"), "_ndv_summary.json")), "UTF-8")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(raw)
    assert((j \ "lo" \ "id").extract[Double] === 1.0)
    assert((j \ "hi" \ "id").extract[Double] === 5000.0)
    // dates on the epoch-day scale a Catalyst DateType literal carries:
    // 2024-01-01 = day 19723 (id%100 ∈ [0,99] → lo 19723, hi 19822)
    assert((j \ "lo" \ "d").extract[Double] === 19723.0)
    assert((j \ "hi" \ "d").extract[Double] === 19822.0)
    // string column: NDV yes, range no
    assert((j \ "ndv" \ "key").extractOpt[Double].isDefined)
    assert((j \ "lo" \ "key").extractOpt[Double].isEmpty)
  }

  test("NdvBroadcastRule: a RANGE conjunct over sidecar min/max flips the join to broadcast") {
    import graft.plans.NdvBroadcastRule
    val cat = freshCat("cbor")
    cat.overwrite(fixture.repartition(3), "stat.dim")
    cat.analyzeNdv(spark, "stat.dim", Seq("id"))
    val fact = spark.range(200000)
      .select((col("id") % 5000L + 1L).as("fid"), (col("id") * 7L).as("m"))
    def plan(withRule: Boolean): String = {
      val saved = spark.experimental.extraOptimizations
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.experimental.extraOptimizations =
          if (withRule) saved :+ NdvBroadcastRule(spark) else saved
        // id ∈ [1, 5000]; id <= 50 keeps ~1% — far under the threshold
        val dim = cat.read(spark, "stat.dim").filter(col("id") <= 50L)
        fact.join(dim, col("fid") === col("id"))
          .groupBy("key").agg(count(lit(1)).as("n"))
          .queryExecution.executedPlan.toString
      } finally {
        spark.experimental.extraOptimizations = saved
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    assert(!plan(withRule = false).contains("BroadcastHashJoin"),
      "control: with auto-broadcast off and no rule the join must shuffle")
    assert(plan(withRule = true).contains("BroadcastHashJoin"),
      "sidecar min/max must cost the range filter and flip to broadcast")
  }
}
