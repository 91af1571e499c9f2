package graft.functions

import graft.SparkSpec
import graft.ext.TextKit

import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "",
    "one",
    "one two",
    "one two three",
    "one two three four five",
    "dup dup dup dup dup",                    // repeated windows collapse
    "a b a b a b a b",                        // period-2 repetition
    " leading space",                         // empty first token kept
    "trailing space ",                        // empty last token kept
    "double  space between",                  // empty middle token kept
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "tab\tis one token here",                 // only 0x20 splits
    "unicode λcentre token δelta here ok")    // multi-byte bytes intact

  test("native WordShingles equals the HOF chain, order and all") {
    val df = samples.toDF("s")
    for (n <- Seq(1, 2, 3, 5)) {
      val out = df.select(
        TextKit.wordShingles(col("s"), n).as("native"),
        TextKit.wordShinglesHof(col("s"), n).as("hof")).collect()
      out.zip(samples).foreach { case (r, s) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n input='$s'")
      }
    }
  }

  test("first-occurrence order and distinctness match array_distinct") {
    val got = Seq(Tuple1("a b a b a b a b")).toDF("s")
      .select(TextKit.wordShingles(col("s"), 3)).head().getSeq[String](0)
    assert(got == Seq("a b a", "b a b"))
  }

  test("null text yields an empty array through the public wrapper") {
    val got = Seq(Tuple1(null: String)).toDF("s")
      .select(TextKit.wordShingles(col("s"), 3)).head().getSeq[String](0)
    assert(got.isEmpty)
  }

  test("graft_word_shingles registers as a SQL function") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_word_shingles('x y z w', 3) AS g")
      .head().getSeq[String](0)
    assert(got == Seq("x y z", "y z w"))
  }
}
