package graft.functions

import graft.SparkSpec
import graft.ext.TextKit

import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("native codegen PolyHash equals the interpreted HOF fold on ASCII") {
    val samples = Seq("", "a", "the quick brown fox", "x" * 600,
      "key agg row scan slow fast table value part hash")
    val df = samples.toDF("s")
    val out = df.select(
      PolyHash(col("s")).as("native"),
      TextKit.polyHashHof(col("s")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("native PolyHash equals a hand fold; works inside lambda bodies") {
    def ref(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val got = Seq(Tuple1("hello world")).toDF("s")
      .select(PolyHash(col("s"))).head().getLong(0)
    assert(got == ref("hello world"))
    // usable inside a higher-order lambda (interpreted eval path)
    val words = Seq(Tuple1("ab cd ef")).toDF("s")
      .select(transform(split(col("s"), " "), w => PolyHash(w)).as("h"))
      .head().getSeq[Long](0)
    assert(words == Seq("ab", "cd", "ef").map(ref))
  }

  test("graft_polyhash registers as a SQL function via extensions") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT graft_polyhash('abc') AS h").head().getLong(0)
    assert(out == "abc".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L))
    // and over a real column
    val n = spark.sql(
      "SELECT graft_polyhash(CAST(id AS STRING)) AS h FROM range(100)")
      .distinct().count()
    assert(n == 100)
  }

  test("non-ASCII input folds UTF-8 bytes (documented divergence from HOF)") {
    val s = "héllo" // é = 2 bytes in UTF-8, 1 code point
    def bytesRef(str: String): Long =
      str.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    val got = Seq(Tuple1(s)).toDF("s").select(PolyHash(col("s"))).head().getLong(0)
    assert(got == bytesRef(s))
  }
}
