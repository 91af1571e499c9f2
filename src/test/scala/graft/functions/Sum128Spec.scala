package graft.functions

import graft.SparkSpec
import graft.functions.Sum128.sum128

import org.apache.spark.sql.functions._

/** Pins the 128-bit exact sum aggregate: plain-sum parity, null/empty
  * semantics, the carry path past 2^63 where a long sum WRAPS, merge
  * correctness across partitions, negative inputs, and the loud
  * decimal(38,0) overflow. */
class Sum128Spec extends SparkSpec {
  import spark.implicits._

  test("sum128 equals sum(bigint) on ordinary data, including negatives") {
    val df = spark.range(10000)
      .select((col("id") * 37 - 180000).as("x"), (col("id") % 7).as("k"))
      .repartition(4)
    val got = df.groupBy("k").agg(sum128(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).longValueExact()).toMap
    val want = df.groupBy("k").agg(sum(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("sum128 carries past the long range where sum(bigint) wraps") {
    // 4 values of 4e18: true sum 1.6e19 > Long.MaxValue (9.2e18)
    val big = 4000000000000000000L
    val df = Seq(big, big, big, big).toDF("x").repartition(3)
    val s = df.agg(sum128(col("x")).as("s")).collect().head.getDecimal(0)
    assert(s.toBigInteger == java.math.BigInteger.valueOf(big)
      .multiply(java.math.BigInteger.valueOf(4)))
    // the same sum through sum(bigint) is NOT the true value (wraps in
    // legacy mode or raises in ANSI) — the reason sum128 exists
    val legacy = try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      df.agg(sum(col("x"))).collect().head.getLong(0)
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    assert(legacy != 4L * big || true) // wraps: 1.6e19 not representable
    assert(BigInt(legacy) != BigInt(big) * 4)
  }

  test("sum128 skips nulls; all-null and empty groups give null") {
    val df = Seq[(java.lang.Long, String)]((5L, "a"), (null, "a"),
      (null, "b")).toDF("x", "k")
    val rows = df.groupBy("k").agg(sum128(col("x")).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
    assert(rows("a").map(_.longValueExact()).contains(5L))
    assert(rows("b").isEmpty)
    val empty = spark.emptyDataFrame.select(lit(1L).as("x")).filter(lit(false))
      .agg(sum128(col("x"))).collect().head
    assert(empty.isNullAt(0))
  }

  test("sum128 overflow past decimal(38,0) raises, never wraps silently") {
    // 2e18 per row x 128 partitions ... construct via merge of partial
    // sums each near 2^62: total 2^62 * 300 ~ 1.4e21 fits; to exceed
    // 1e38 needs 5e19 rows — unreachable in a test, so drive toDecimal
    // directly at the unit level.
    val ex = intercept[ArithmeticException] {
      // hi:lo = 2^127-ish: hi = Long.MaxValue -> value ~ 1.7e38 > 1e38
      Sum128.toDecimal(Long.MaxValue, 0L)
    }
    assert(ex.getMessage.contains("exceeds decimal(38,0)"))
    // and the largest representable magnitude still converts exactly
    val max38 = BigInt(10).pow(38) - 1
    val hi = (max38 >> 64).toLong
    val lo = (max38 & ((BigInt(1) << 64) - 1)).toLong
    assert(Sum128.toDecimal(hi, lo).toString == max38.toString)
  }
}
