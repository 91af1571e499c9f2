package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native Jaro-Winkler comparator: hand-derived classic values, the
  * DuckDB edge conventions (empty → 0, window −1 for 1-vs-1), and the
  * exact IEEE composition order the oracle cross-validates. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic textbook pairs with the exact IEEE composition") {
    // martha/marhta: m=6, t=1, prefix=3
    val jMartha = (6.0 / 6 + 6.0 / 6 + (6.0 - 1) / 6.0) / 3.0
    assert(jw("martha", "marhta") == jMartha + 3 * 0.1 * (1.0 - jMartha))
    // dwayne/duane: m=4, t=0, prefix=1
    val jDwayne = (4.0 / 6 + 4.0 / 5 + 4.0 / 4.0) / 3.0
    assert(jw("dwayne", "duane") == jDwayne + 1 * 0.1 * (1.0 - jDwayne))
    // crate/trace: jaro 0.7333 > 0.7 but prefix 0 → no boost effect
    assert(jw("crate", "trace") == (3.0 / 5 + 3.0 / 5 + 3.0 / 3.0) / 3.0)
  }

  test("boost threshold: jaro <= 0.7 gets NO Winkler prefix bonus") {
    // abcdefgh/abzzzzzz: m=2, t=0 → jaro exactly 0.5; prefix 2 unused
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
  }

  test("edge conventions match DuckDB: empties, singles, window 0") {
    assert(jw("", "") == 0.0 && jw("abc", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("a", "a") == 1.0 && jw("a", "b") == 0.0)
    // ab/ba: window max(2,2)/2-1 = 0 → no cross-position match
    assert(jw("ab", "ba") == 0.0)
    assert(jw("abc", "abc") == 1.0)
  }

  test("prefix bonus caps at 4 shared leading bytes") {
    // abcdeX/abcdeY: m=5, t=0; prefix capped at 4, not 5
    val j = (5.0 / 6 + 5.0 / 6 + 5.0 / 5.0) / 3.0
    assert(jw("abcdeX", "abcdeY") == j + 4 * 0.1 * (1.0 - j))
  }

  test("Column API + SQL registration agree with the kernel; nulls propagate") {
    val df = Seq(("martha", "marhta"), ("crate", "trace"))
      .toDF("a", "b")
    val viaCol = df.select(JaroWinkler(col("a"), col("b"))).as[Double].collect()
    assert(viaCol.toSeq == Seq(jw("martha", "marhta"), jw("crate", "trace")))
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("jwt")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler(a, b) FROM jwt").as[Double].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    val withNull = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")))
      .collect()
    assert(withNull.head.isNullAt(0))
  }
}
