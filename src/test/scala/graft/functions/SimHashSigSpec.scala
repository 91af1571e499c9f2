package graft.functions

import graft.SparkSpec
import graft.ext.TextKit

import org.apache.spark.sql.functions._

class SimHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native SimHashSig equals the bits-pass HOF fold, including ties and empty") {
    val df = Seq(
      Seq(5L, 900000000L, 12345L, 7L),
      Seq(0L),                        // all bits vote -1 except vote>=0 rule on zeros
      Seq.empty[Long],                // empty -> every bit set (tie at 0)
      (1L to 300L).map(_ * 104729L % 1000000007L)
    ).toDF("wh")
    val out = df.select(
      TextKit.simHashFromHashes(col("wh"), 24).as("native"),
      TextKit.simHashFromHashesHof(col("wh"), 24).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // empty input: tie at every bit -> all 24 bits set, on both paths
    assert(out(2).getLong(0) == (1L << 24) - 1)
  }

  test("native matches HOF at the 28-bit width the simhash band join uses") {
    val texts = Seq("key agg row scan slow fast table value part hash",
      "a b", "one")
    val df = texts.toDF("text")
      .select(transform(TextKit.wordShingles(col("text"), 2),
        s => TextKit.polyHash(s)).as("wh"))
    val out = df.select(
      TextKit.simHashFromHashes(col("wh"), 28).as("native"),
      TextKit.simHashFromHashesHof(col("wh"), 28).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("graft_simhash registers as a SQL function") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_simhash(array(CAST(3 AS BIGINT)), 4) AS s").head().getLong(0)
    // single hash 0b0011: bits 0,1 vote +1 (set); bits 2,3 vote -1 (clear)
    assert(got == 3L)
  }
}
