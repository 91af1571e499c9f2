package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the q1 sf10 gap (BASELINE.md: 14.4× vs DuckDB at 100×
  * rows, the one anchor moving the wrong way): break the scan-aggregate
  * into cost layers and time candidate rewrites, so the fix (or the
  * "decimal agg cost, by design" verdict) is measured, not guessed.
  *
  * Layers timed (min of SPARK_GRAFT_PASSES passes, noop sink):
  *   count      — parquet scan + filter only (the floor)
  *   dbl        — double sums (no decimals anywhere; NOT hash-safe)
  *   dec        — the contract form: decimal(18,x) per-row casts,
  *                widened decimal multiplies, decimal sum buffers
  *   cents      — per-row cast to decimal stays (it DEFINES rounding),
  *                but products/sums run on the unscaled LONGs
  *                (UnscaledValue), readout re-scales through exact
  *                decimal division; hash-identical to `dec`
  * Usage: runMain graft.tools.Q1Probe <sfDir>
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf10")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00"))
    li.write.mode("overwrite").format("noop").save() // page-cache warm

    def time(name: String)(df: => DataFrame): Unit = {
      val t = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q1probe] $name%-8s $t%8.2f s")
    }

    def dec(c: Column, s: Int = 2) = c.cast(s"decimal(18,$s)")
    def one = lit(1).cast("decimal(18,2)")

    time("count")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("count_order")))

    time("dbl")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("sum_charge"),
        sum(col("l_discount")).as("sum_disc"),
        count(lit(1)).as("count_order")))

    val discPrice = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast("decimal(18,4)")
    val charge = (discPrice * (one + dec(col("l_tax")))).cast("decimal(18,6)")
    time("dec")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order")))

    // long-cents: unscaled(decimal(18,2) cast) is an exact long; the
    // per-row widened-decimal multiplies become long multiplies and the
    // sum buffers become decimal(38,0) over longs (scale-safe: a LONG
    // sum would wrap past ~9.2e18, reachable at 1000x).
    def u(c: Column) = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.UnscaledValue(
        org.apache.spark.sql.graft.Bridge.expression(dec(c))))
    def d38(c: Column) = c.cast("decimal(38,0)")
    def rescale(sumU: Column, pow: Int, scale: Int) =
      (sumU / lit(math.pow(10, pow).toLong).cast("decimal(19,0)"))
        .cast(s"decimal(38,$scale)")
    val qtyU = u(col("l_quantity"))
    val priceU = u(col("l_extendedprice"))
    val discU = u(col("l_discount"))
    val discPriceU = priceU * (lit(100L) - discU)
    val chargeU = discPriceU * (lit(100L) + u(col("l_tax")))
    time("cents")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        rescale(sum(d38(qtyU)), 2, 2).cast("double").as("sum_qty"),
        rescale(sum(d38(priceU)), 2, 2).cast("double").as("sum_base_price"),
        rescale(sum(d38(discPriceU)), 4, 4).cast("double").as("sum_disc_price"),
        rescale(sum(d38(chargeU)), 6, 6).cast("double").as("sum_charge"),
        (rescale(sum(d38(qtyU)), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (rescale(sum(d38(priceU)), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        (rescale(sum(d38(discU)), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order")))

    // isolate: decimal CAST cost (long sums over unscaled-of-cast)
    time("ulong")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(qtyU).as("sq"), sum(priceU).as("sp"),
        sum(discPriceU).as("sd"), sum(chargeU).as("sc"),
        sum(discU).as("su"), count(lit(1)).as("n")))
    // isolate: no decimals anywhere (round(x*100) longs; NOT the
    // contract rounding — timing only)
    def r100(c: Column) = round(c * 100).cast("long")
    val qR = r100(col("l_quantity")); val pR = r100(col("l_extendedprice"))
    val dR = r100(col("l_discount")); val tR = r100(col("l_tax"))
    time("rlong")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(qR).as("sq"), sum(pR).as("sp"),
        sum(pR * (lit(100L) - dR)).as("sd"),
        sum(pR * (lit(100L) - dR) * (lit(100L) + tR)).as("sc"),
        sum(dR).as("su"), count(lit(1)).as("n")))
    // isolate: ONE decimal cast + long sum
    time("cast1")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(priceU).as("sp"), count(lit(1)).as("n")))
    // isolate: ONE decimal cast + decimal sum
    time("dsum1")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(dec(col("l_extendedprice"))).as("sp"), count(lit(1)).as("n")))

    // candidate fix: graft_sum128 — 128-bit limb accumulation in
    // codegen (long adds + carry), decimal materialized once per group
    import graft.functions.Sum128.sum128
    time("s128")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        rescale(sum128(qtyU), 2, 2).cast("double").as("sum_qty"),
        rescale(sum128(priceU), 2, 2).cast("double").as("sum_base_price"),
        rescale(sum128(discPriceU), 4, 4).cast("double").as("sum_disc_price"),
        rescale(sum128(chargeU), 6, 6).cast("double").as("sum_charge"),
        (rescale(sum128(qtyU), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (rescale(sum128(priceU), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        (rescale(sum128(discU), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order")))
    // same, but the unscaled longs PRE-PROJECTED so the aggregate child
    // is a bare attribute (one evaluation per row, not one per buffer
    // expression occurrence)
    val liU = li.select(col("l_returnflag"), col("l_linestatus"),
      qtyU.as("qty_u"), priceU.as("price_u"), discU.as("disc_u"),
      discPriceU.as("dp_u"), chargeU.as("ch_u"))
    time("s128p")(liU.groupBy("l_returnflag", "l_linestatus")
      .agg(
        rescale(sum128(col("qty_u")), 2, 2).cast("double").as("sum_qty"),
        rescale(sum128(col("price_u")), 2, 2).cast("double").as("sum_base_price"),
        rescale(sum128(col("dp_u")), 4, 4).cast("double").as("sum_disc_price"),
        rescale(sum128(col("ch_u")), 6, 6).cast("double").as("sum_charge"),
        (rescale(sum128(col("qty_u")), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (rescale(sum128(col("price_u")), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        (rescale(sum128(col("disc_u")), 2, 2).cast("double") /
          count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order")))
    val s128check = li.groupBy("l_returnflag", "l_linestatus")
      .agg(rescale(sum128(discPriceU), 4, 4).cast("double").as("v"),
        rescale(sum128(chargeU), 6, 6).cast("double").as("w"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq

    // value check: cents must reproduce dec exactly
    val a = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(discPrice).cast("double").as("v"), sum(charge).cast("double").as("w"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val b = li.groupBy("l_returnflag", "l_linestatus")
      .agg(rescale(sum(d38(discPriceU)), 4, 4).cast("double").as("v"),
        rescale(sum(d38(chargeU)), 6, 6).cast("double").as("w"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    println(s"[q1probe] value match: ${a == b}")
    if (a != b) println(s"  dec:   $a\n  cents: $b")
    println(s"[q1probe] s128 match: ${a == s128check}")
    if (a != s128check) println(s"  dec:  $a\n  s128: $s128check")
    spark.stop()
  }
}
