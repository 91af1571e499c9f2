package graft.core

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Pins the cluster shuffle-sizing posture ([[Sessions.clusterConf]]):
  * under it, post-shuffle reducer counts are governed by the AQE
  * initial-partition CEILING and the advisory BYTE size — not by the
  * `spark.sql.shuffle.partitions` constant — so a scaled-up input plans
  * more reducers without anyone re-tuning a global knob. Verified on
  * the shared local session by applying the conf block at runtime
  * (every key is runtime-settable, which the test also proves). */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](conf: Map[String, String])(body: => T): T = {
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def reducerCount(rows: Int): Int = {
    // high-cardinality keys + a ~100-byte payload: partial aggregation
    // must NOT collapse the shuffle (the point is to measure how AQE
    // splits real shuffle bytes), and per-group rows stay > the 1 MB
    // minPartitionSize floor in aggregate
    // md5 payloads: shuffle files are lz4-compressed, so the payload
    // must be incompressible for byte-based coalescing to see it
    val df = spark.range(rows.toLong)
      .select((col("id") % (rows / 4)).as("k"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") + 2).cast("string"))).as("v"))
      .groupBy("k").agg(max("v"))
    df.write.mode("overwrite").format("noop").save()
    // AQE final plan: partition count after runtime coalescing
    df.rdd.getNumPartitions
  }

  test("clusterConf: the AQE ceiling, not shuffle.partitions, bounds reducers") {
    // A 1 MB advisory size over a ~10 MB shuffle: reducer count must
    // EXCEED the shuffle.partitions constant (2*cores = 8 for
    // totalCores=4), proving initialPartitionNum is the governing
    // ceiling — on a non-AQE session the count could never exceed it.
    val conf = Sessions.clusterConf(totalCores = 4,
      advisoryPartitionBytes = 1L << 20, oversubscription = 16)
    assert(conf("spark.sql.adaptive.coalescePartitions.initialPartitionNum") == "64")
    assert(conf("spark.sql.shuffle.partitions") == "8")
    withConf(conf) {
      val n = reducerCount(400000)
      assert(n > 8, s"expected > shuffle.partitions=8 reducers, got $n")
      assert(n <= 64, s"ceiling is initialPartitionNum=64, got $n")
    }
  }

  test("clusterConf: bigger inputs plan more reducers under the same conf") {
    val conf = Sessions.clusterConf(totalCores = 4,
      advisoryPartitionBytes = 1L << 20, oversubscription = 16)
    withConf(conf) {
      val small = reducerCount(40000)
      val big = reducerCount(400000)
      assert(big > small,
        s"10x the rows should coalesce to more advisory-sized reducers " +
          s"(small=$small, big=$big)")
    }
  }

  test("clusterConf: small shuffles coalesce below the constant with a real advisory size") {
    // The flip side: with the production 128 MB advisory target, a tiny
    // shuffle collapses to ~1 reducer instead of paying 8 scheduled
    // tasks — empty buckets are free to oversubscribe.
    withConf(Sessions.clusterConf(totalCores = 4)) {
      val n = reducerCount(20000)
      assert(n < 8, s"tiny shuffle should coalesce below shuffle.partitions, got $n")
    }
  }
}
