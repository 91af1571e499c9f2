package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Backward as-of join semantics: inclusive match, per-key isolation,
  * null payload before the first right row, deterministic tie winners. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(Int, Long)], right: Seq[(Int, Long, String, Long)]) =
    AsOf.joinBackward(
        left.toDF("k", "ts"),
        right.toDF("k", "ts", "v", "ord"),
        keys = Seq("k"), leftTs = "ts", rightTs = "ts",
        payload = Seq("v"), tiebreak = "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])]
      .collect().toSet

  test("picks the most recent right row at or before each left ts") {
    val out = run(
      left = Seq((1, 5L), (1, 10L), (1, 99L)),
      right = Seq((1, 3L, "a", 0L), (1, 10L, "b", 0L), (1, 12L, "c", 0L)))
    assert(out == Set((1, 5L, Some("a")), (1, 10L, Some("b")), (1, 99L, Some("c"))))
  }

  test("left rows before any right row get a null payload") {
    val out = run(left = Seq((1, 1L)), right = Seq((1, 5L, "late", 0L)))
    assert(out == Set((1, 1L, None)))
  }

  test("keys do not leak into each other") {
    val out = run(
      left = Seq((1, 10L), (2, 10L)),
      right = Seq((1, 4L, "one", 0L), (2, 6L, "two", 0L)))
    assert(out == Set((1, 10L, Some("one")), (2, 10L, Some("two"))))
  }

  test("ties on (key, ts) resolve to the greatest tiebreak value") {
    val out = run(
      left = Seq((1, 7L)),
      right = Seq((1, 7L, "lo", 1L), (1, 7L, "hi", 2L)))
    assert(out == Set((1, 7L, Some("hi"))))
  }

  test("rejects payload names colliding with left columns") {
    val l = Seq((1, 2L)).toDF("k", "ts").withColumn("v", lit("x"))
    val r = Seq((1, 1L, "y", 0L)).toDF("k", "ts", "v", "ord")
    intercept[IllegalArgumentException] {
      AsOf.joinBackward(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord")
    }
  }

  test("forward join picks the first right row at or after each left ts") {
    val out = AsOf.joinForward(
        Seq((1, 5L), (1, 12L), (1, 99L)).toDF("k", "ts"),
        Seq((1, 5L, "a", 0L), (1, 10L, "b", 0L), (1, 12L, "c", 0L)).toDF("k", "ts", "v", "ord"),
        Seq("k"), "ts", "ts", Seq("v"), "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])].collect().toSet
    assert(out == Set((1, 5L, Some("a")), (1, 12L, Some("c")), (1, 99L, None)))
  }

  test("forward ties on (key, ts) resolve to the smallest tiebreak value") {
    val out = AsOf.joinForward(
        Seq((1, 7L)).toDF("k", "ts"),
        Seq((1, 7L, "lo", 1L), (1, 7L, "hi", 2L)).toDF("k", "ts", "v", "ord"),
        Seq("k"), "ts", "ts", Seq("v"), "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])].collect().toSet
    assert(out == Set((1, 7L, Some("lo"))))
  }

  // ------------------------------------------------------- native exec

  private def runNative(left: Seq[(Int, Long)], right: Seq[(Int, Long, String, Long)]) =
    AsOf.joinBackwardNative(
        left.toDF("k", "ts"),
        right.toDF("k", "ts", "v", "ord"),
        keys = Seq("k"), leftTs = "ts", rightTs = "ts",
        payload = Seq("v"), tiebreak = "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])]
      .collect().toSet

  test("native exec matches the composed form on randomized inputs") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(400)((rnd.nextInt(12), rnd.nextInt(1000).toLong))
    val right = Seq.fill(300)(
      (rnd.nextInt(12), rnd.nextInt(1000).toLong,
        rnd.alphanumeric.take(3).mkString, rnd.nextInt(5).toLong))
    // Reduce right to one row per (k, ts): the composed form's last() and
    // the sweep's tiebreak agree on the winner, but left duplicates make
    // set comparison blind to multiplicity — use multiset via sorted seq.
    val a = runNative(left, right)
    val b = run(left, right)
    assert(a == b)
    val aSeq = AsOf.joinBackwardNative(left.toDF("k", "ts"), right.toDF("k", "ts", "v", "ord"),
        Seq("k"), "ts", "ts", Seq("v"), "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])].collect().toSeq.sorted
    val bSeq = AsOf.joinBackward(left.toDF("k", "ts"), right.toDF("k", "ts", "v", "ord"),
        Seq("k"), "ts", "ts", Seq("v"), "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])].collect().toSeq.sorted
    assert(aSeq == bSeq)
  }

  test("broadcast form matches the composed form on randomized inputs") {
    val rnd = new scala.util.Random(11)
    val left = Seq.fill(300)((rnd.nextInt(10), rnd.nextInt(500).toLong))
    val right = Seq.fill(200)(
      (rnd.nextInt(10), rnd.nextInt(500).toLong,
        rnd.alphanumeric.take(3).mkString, rnd.nextInt(5).toLong))
    def shaped(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        Seq[String], String, String, Seq[String], String) => org.apache.spark.sql.DataFrame) =
      f(left.toDF("k", "ts"), right.toDF("k", "ts", "v", "ord"),
          Seq("k"), "ts", "ts", Seq("v"), "ord")
        .select("k", "ts", "v").as[(Int, Long, Option[String])].collect().toSeq.sorted
    assert(shaped(AsOf.joinBackwardBroadcast) == shaped(AsOf.joinBackward))
  }

  test("broadcast form: no-match and empty-right rows keep null payload") {
    val out = AsOf.joinBackwardBroadcast(
        Seq((1, 1L), (2, 9L)).toDF("k", "ts"),
        Seq((1, 5L, "late", 0L)).toDF("k", "ts", "v", "ord"),
        Seq("k"), "ts", "ts", Seq("v"), "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])].collect().toSet
    assert(out == Set((1, 1L, None), (2, 9L, None)))
  }

  test("native exec: empty right side yields all-null payload") {
    val out = AsOf.joinBackwardNative(
        Seq((1, 5L), (2, 6L)).toDF("k", "ts"),
        Seq.empty[(Int, Long, String, Long)].toDF("k", "ts", "v", "ord"),
        Seq("k"), "ts", "ts", Seq("v"), "ord")
      .select("k", "ts", "v").as[(Int, Long, Option[String])].collect().toSet
    assert(out == Set((1, 5L, None), (2, 6L, None)))
  }

  test("all four forms share the null-ts contract") {
    // Right row with null ts is ignored (not "known since forever");
    // left row with null ts keeps a null payload.
    val l = Seq((1, Some(5L)), (1, None)).toDF("k", "ts")
    val r = Seq((1, None, "ghost", 0L), (1, Some(3L), "real", 0L))
      .toDF("k", "ts", "v", "ord")
    val expected = Set((1, Some(5L), Some("real")), (1, None, None))
    def got(f: => org.apache.spark.sql.DataFrame) =
      f.select("k", "ts", "v").as[(Int, Option[Long], Option[String])].collect().toSet
    assert(got(AsOf.joinBackward(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord")) == expected, "composed")
    assert(got(AsOf.joinBackwardBroadcast(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord")) == expected, "broadcast")
    assert(got(AsOf.joinBackwardNative(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord")) == expected, "native")
    // Forward: the null-ts left row must not grab the first right row.
    val fwd = got(AsOf.joinForward(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord"))
    assert(fwd == Set((1, Some(5L), None), (1, None, None)), s"forward: $fwd")
  }

  test("string tiebreak orders natively, matching the native exec") {
    // "10" < "9" lexicographically — a cast-to-long ordering would pick
    // the numerically larger one and a failed cast would null the order.
    val l = Seq((1, 7L)).toDF("k", "ts")
    val r = Seq((1, 7L, "a", "10"), (1, 7L, "b", "9")).toDF("k", "ts", "v", "ord")
    def got(f: => org.apache.spark.sql.DataFrame) =
      f.select("v").as[String].collect().toSeq
    val composed = got(AsOf.joinBackward(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord"))
    val native = got(AsOf.joinBackwardNative(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord"))
    val bcast = got(AsOf.joinBackwardBroadcast(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord"))
    assert(composed == Seq("b") && native == Seq("b") && bcast == Seq("b"),
      s"composed=$composed native=$native broadcast=$bcast")
  }

  test("native plan: one exchange per side, partitioning reused downstream") {
    val l = Seq((1, 5L), (2, 6L)).toDF("k", "ts")
    val r = Seq((1, 1L, "y", 0L)).toDF("k", "ts", "v", "ord")
    val joined = AsOf.joinBackwardNative(l, r, Seq("k"), "ts", "ts", Seq("v"), "ord")
    val agg = joined.groupBy("k").agg(count(lit(1)).as("n"))
    agg.collect()
    // AQE's toString prints the final plan first, then the initial plan —
    // count exchanges in the final section only.
    val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin"), plan)
    // 2 shuffles total (one per join input); the groupBy above the join
    // must NOT add a third — outputPartitioning passes through.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges\n$plan")
  }
}
