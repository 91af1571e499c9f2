package graft.functions

import graft.SparkSpec
import graft.ext.TextKit

import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native MinHashSig equals the k-pass HOF fold, including empty input") {
    val df = Seq(
      Seq(5L, 900000000L, 12345L),
      Seq(0L),
      Seq.empty[Long],
      (1L to 200L).map(_ * 104729L)
    ).toDF("hs")
    val out = df.select(
      TextKit.minHashFromHashes(col("hs"), 64).as("native"),
      TextKit.minHashFromHashesHof(col("hs"), 64).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
    // empty set -> P sentinel in every slot
    val empty = out(2)
    assert(empty.getSeq[Long](0).forall(_ == 1000000007L))
  }

  test("interpreted eval path (inside HOF lambda) matches codegen path") {
    // Wrapping in a transform lambda forces the interpreted eval().
    val df = Seq(Tuple1(Seq(7L, 42L, 999999999L))).toDF("hs")
    val viaLambda = df
      .select(element_at(transform(array(col("hs")), a =>
        TextKit.minHashFromHashes(a, 16)), 1).as("sig"))
      .head().getSeq[Long](0)
    val direct = df.select(TextKit.minHashFromHashes(col("hs"), 16))
      .head().getSeq[Long](0)
    assert(viaLambda == direct)
  }

  test("graft_minhash registers as a SQL function with literal k") {
    GraftExtensions.register(spark)
    val sig = spark.sql(
      "SELECT graft_minhash(array(CAST(5 AS BIGINT), CAST(12345 AS BIGINT)), 8) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 8)
    // slot 0: min of (h + C) % P over h in {5, 12345}
    val expect0 = Seq(5L, 12345L).map(h => (h + 2654435761L) % 1000000007L).min
    assert(sig.head == expect0)
  }
}
