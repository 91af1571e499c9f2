package graft.functions

import graft.SparkSpec
import graft.ext.TextKit

import org.apache.spark.sql.functions._

class GramHashesSpec extends SparkSpec {
  import spark.implicits._

  test("native rolling GramHashes equals the HOF substring fold on ASCII") {
    val samples = Seq("", "abcd", "abcde", "the quick brown fox jumps",
      "aaaaaaaaaa", "key agg row scan slow fast table value part hash")
    val df = samples.toDF("s")
    val out = df.select(
      TextKit.gramHashes(col("s"), 5).as("native"),
      TextKit.gramHashesHof(col("s"), 5).as("hof")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
    // shorter than n -> empty, not null
    assert(out(1).getSeq[Long](0).isEmpty)
    // exactly n -> one window, the direct base-31 polynomial
    val one = out(2).getSeq[Long](0)
    assert(one == Seq("abcde".foldLeft(0L)((a, c) => a * 31 + c.toLong)))
  }

  test("rolling update is exact across long inputs and repeated bytes") {
    val s = ("zyxw" * 200) + "abcab"
    val got = Seq(Tuple1(s)).toDF("s")
      .select(TextKit.gramHashes(col("s"), 5).as("g"),
        TextKit.gramHashesHof(col("s"), 5).as("h")).head()
    assert(got.getSeq[Long](0) == got.getSeq[Long](1))
  }

  test("graft_gram_hashes registers as a SQL function") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_gram_hashes('abcde', 5) AS g")
      .head().getSeq[Long](0)
    assert(got == Seq("abcde".foldLeft(0L)((a, c) => a * 31 + c.toLong)))
  }
}
