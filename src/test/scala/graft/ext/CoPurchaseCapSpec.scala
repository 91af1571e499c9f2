package graft.ext

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** The degree-capped co-purchase edge derivation (r11): a hot PURCHASER
  * (> 1024 distinct keys) and a hot PRODUCT KEY (> 256 users) both
  * truncate deterministically to their smallest ids before the pair
  * join, so neither can hub-explode the shared edge table the whole
  * graph family runs on. The caps never bind on the uniform fixtures;
  * this spec builds a skewed corpus where they MUST. */
class CoPurchaseCapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("copurchase-cap").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
    var eid = 0L
    def buy(user: Long, key: Long): Unit = {
      rows += ((eid, ts, user, "purchase", 1.0, s"""{"k": $key}"""))
      eid += 1
    }
    // Hot purchaser: user 0 buys keys 1..1100 (> the 1024 keys/user cap;
    // the cap keeps keys 1..1024).
    (1L to 1100L).foreach(k => buy(0L, k))
    // User 900001 shares keys 1..5 with user 0 — all inside user 0's
    // kept set, so the (0, 900001) edge must survive.
    (1L to 5L).foreach(k => buy(900001L, k))
    // User 900002 shares keys 1090..1094 — all truncated OFF user 0's
    // set, so no (0, 900002) edge can form.
    (1090L to 1094L).foreach(k => buy(900002L, k))
    // Hot keys: keys 2001..2005 each bought by users 10001..10300
    // (> the 256 users/key cap; each key keeps users 10001..10256).
    for (k <- 2001L to 2005L; u <- 10001L to 10300L) buy(u, k)
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val edges =
    graft.queries.Extensions.coPurchaseEdges(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hot purchaser keeps edges through its 1024 smallest keys only") {
    assert(edges.contains((0L, 900001L)),
      "shared keys inside the kept set must still form an edge")
    assert(!edges.exists { case (a, b) => a == 0L && b == 900002L },
      "keys truncated off the hot purchaser must not form edges")
  }

  test("hot key pairs only its 256 smallest users; no hub beyond the cap") {
    assert(edges.contains((10001L, 10002L)),
      "kept users of a hot key still pair (shared = 5 >= threshold)")
    val beyondCap = edges.filter { case (a, b) => a > 10256L || b > 10256L }
      .filter { case (a, b) => a >= 10001L && b <= 10300L }
    assert(beyondCap.isEmpty,
      s"users beyond the 256/key cap must carry no edges, got $beyondCap")
    // And the hub bound is structural: no vertex degree anywhere near the
    // uncapped 299.
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map(_._2.size)
    assert(deg.max <= 256, s"max degree ${deg.max} exceeds the cap bound")
  }
}
