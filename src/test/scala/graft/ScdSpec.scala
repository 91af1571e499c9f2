package graft

import graft.core.Clock
import graft.scd.{Scd1, Scd2, Scd3, Scd4}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** SCD semantics (SURVEY.md §5.3): invariants over crafted and random
  * update sequences with a pinned clock. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val tracked = Seq("v")
  private def scd2(date: String) = new Scd2(keys, tracked, clock = Clock.fixed(date))

  private def tbl(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("k", "v")

  test("scd2 initialize stamps current versions") {
    val out = scd2("2026-01-01").initialize(tbl("a" -> "1", "b" -> "2"))
    assert(out.count() == 2)
    assert(out.filter(col("is_current") === true).count() == 2)
    assert(out.filter(col("effective_from") === lit("2026-01-01").cast("date")).count() == 2)
    assert(out.filter(col("effective_to").isNull).count() == 2)
  }

  test("scd2 merge expires changed, keeps unchanged, inserts new") {
    val init = scd2("2026-01-01").initialize(tbl("a" -> "1", "b" -> "2"))
    val out = scd2("2026-02-01").merge(init, tbl("a" -> "1", "b" -> "99", "c" -> "3"))

    // unchanged key: single untouched current row
    val a = out.filter(col("k") === "a").collect()
    assert(a.length == 1 && a.head.getAs[Boolean]("is_current"))

    // changed key: expired old + fresh current
    val b = out.filter(col("k") === "b").sort("effective_from").collect()
    assert(b.length == 2)
    assert(!b.head.getAs[Boolean]("is_current")
      && b.head.getAs[java.sql.Date]("effective_to").toString == "2026-02-01")
    assert(b.last.getAs[Boolean]("is_current") && b.last.getAs[String]("v") == "99")

    // new key inserts
    val c = out.filter(col("k") === "c").collect()
    assert(c.length == 1 && c.head.getAs[Boolean]("is_current"))
  }

  test("scd2 dedupes a source batch carrying the same key twice") {
    // Raw-zone re-delivery: key 'a' arrives twice in one batch. The merge
    // must keep at most one current row per key, picking the winner
    // deterministically (greatest sourceOrder column = latest delivery).
    val init = scd2("2026-01-01").initialize(tbl("a" -> "1"))
    val src = Seq(("a", "2", 1L), ("a", "3", 2L), ("a", "2", 0L))
      .toDF("k", "v", "seq")
    val scd = new Scd2(keys, tracked, clock = Clock.fixed("2026-02-01"),
      sourceOrder = Seq("seq"))
    val out = scd.merge(init.withColumn("seq", lit(0L)), src)
    val cur = out.filter(col("is_current") === true).collect()
    assert(cur.length == 1 && cur.head.getAs[String]("v") == "3")
    assert(out.count() == 2) // expired original + one new version

    // initialize() holds the invariant from the very first batch too.
    val first = scd.initialize(src)
    assert(first.count() == 1 && first.head.getAs[String]("v") == "3")
  }

  test("scd2 merge is a no-op for identical source (idempotent replay)") {
    val init = scd2("2026-01-01").initialize(tbl("a" -> "1", "b" -> "2"))
    val out = scd2("2026-02-01").merge(init, tbl("a" -> "1", "b" -> "2"))
    assert(out.count() == 2)
    assert(out.filter(col("is_current") === true).count() == 2)
  }

  test("scd2 invariants hold over random update sequences") {
    val rnd = new Random(42)
    val allKeys = (1 to 20).map(i => s"k$i")
    var state = scd2("2026-01-01").initialize(
      allKeys.map(k => k -> rnd.nextInt(3).toString).toDF("k", "v"))
    for (day <- 2 to 6) {
      val batch = allKeys.filter(_ => rnd.nextBoolean())
        .map(k => k -> rnd.nextInt(3).toString).toDF("k", "v")
      state = scd2(f"2026-01-$day%02d").merge(state, batch)
    }
    val cur = state.filter(col("is_current") === true)
      .groupBy("k").agg(count(lit(1)).as("n"))
    // exactly one current row per key ever seen
    assert(cur.filter(col("n") =!= 1).count() == 0)
    assert(cur.count() == 20)
    // expired rows all carry an effective_to
    assert(state.filter(col("is_current") === false && col("effective_to").isNull).count() == 0)
    // version intervals are ordered
    assert(state.filter(col("effective_to").isNotNull &&
      col("effective_to") < col("effective_from")).count() == 0)
  }

  test("scd1 overwrites matched (even with null), keeps unmatched, inserts") {
    val target = Seq(("a", "1", "x"), ("b", "2", "y")).toDF("k", "v", "other")
    val src = Seq(("a", null.asInstanceOf[String]), ("c", "3")).toDF("k", "v")
    val out = new Scd1(keys, tracked).merge(target, src).sort("k").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("v") == null) // null overwrite, Delta semantics
    assert(out(1).getAs[String]("v") == "2")
    assert(out(2).getAs[String]("v") == "3" && out(2).getAs[String]("other") == null)
  }

  test("scd3 shifts current to previous only on change") {
    val target = Seq(("a", "old", null.asInstanceOf[String], "z"),
      ("b", "same", null.asInstanceOf[String], "z")).toDF("k", "cur", "prev", "other")
    val src = Seq(("a", "new"), ("b", "same"), ("c", "first")).toDF("k", "cur")
    val out = new Scd3(keys, "cur", "prev").merge(target, src).sort("k").collect()
    assert(out(0).getAs[String]("cur") == "new" && out(0).getAs[String]("prev") == "old")
    assert(out(1).getAs[String]("cur") == "same" && out(1).getAs[String]("prev") == null)
    assert(out(2).getAs[String]("cur") == "first" && out(2).getAs[String]("prev") == null)
  }

  test("scd4 keeps one current row per key and archives superseded versions") {
    def scd4(date: String) = new Scd4(keys, tracked, clock = Clock.fixed(date))
    val init = scd4("2026-01-01").initialize(tbl("a" -> "1", "b" -> "2"))
    val (cur, arch) = scd4("2026-02-01").merge(init, tbl("a" -> "1", "b" -> "99", "c" -> "3"))
    // current: exactly one row per key, unchanged rows keep their stamp
    val c = cur.sort("k").collect()
    assert(c.map(_.getAs[String]("k")).toSeq == Seq("a", "b", "c"))
    assert(c(0).getAs[java.sql.Date]("effective_from").toString == "2026-01-01")
    assert(c(1).getAs[String]("v") == "99" &&
      c(1).getAs[java.sql.Date]("effective_from").toString == "2026-02-01")
    assert(c(2).getAs[java.sql.Date]("effective_from").toString == "2026-02-01")
    // history: only b's superseded version, with its validity interval
    val h = arch.collect()
    assert(h.length == 1 && h.head.getAs[String]("k") == "b" &&
      h.head.getAs[String]("v") == "2" &&
      h.head.getAs[java.sql.Date]("effective_to").toString == "2026-02-01")
    // replaying the same source archives nothing and leaves current fixed
    val (cur2, arch2) = scd4("2026-03-01").merge(cur, tbl("a" -> "1", "b" -> "99", "c" -> "3"))
    assert(arch2.isEmpty)
    assert(cur2.sort("k").collect().toSeq == cur.sort("k").collect().toSeq)
  }
}
