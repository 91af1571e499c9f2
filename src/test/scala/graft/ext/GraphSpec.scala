package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  private def counts(pairs: (Long, Long)*): Map[Long, Long] =
    Graph.triangleCounts(edges(pairs: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every vertex sits in 3 of the 4 triangles") {
    val c = counts((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(c === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(c.values.sum === 4L * 3) // 4 triangles x 3 vertices
  }

  test("triangle-free graphs produce no rows (path, star, square)") {
    assert(counts((1L, 2L), (2L, 3L), (3L, 4L)).isEmpty) // path
    assert(counts((9L, 1L), (1L, 2L), (1L, 3L), (1L, 4L)).isEmpty) // star hub
    assert(counts((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).isEmpty) // 4-cycle
  }

  test("square with one diagonal: two triangles sharing the diagonal") {
    // 1-2-3-4-1 plus diagonal 1-3 → triangles (1,2,3) and (1,3,4)
    val c = counts((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    assert(c === Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("matches brute-force enumeration on a fixed pseudo-random graph") {
    // deterministic edge set: hash-select from all pairs over 24 vertices
    val all = for {
      i <- 1L to 24L; j <- (i + 1) to 24L
      if ((i * 31 + j * 17) % 5) < 2
    } yield (i, j)
    val e = all.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(x, y, z) <- (1L to 24L).combinations(3)
      if e((x, y)) && e((y, z)) && e((x, z))
      v <- Seq(x, y, z)
    } brute(v) += 1
    assert(counts(all: _*) === brute.toMap)
  }

  test("fixed-point pageRank matches a sequential reference bit-for-bit") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L), (4L, 5L))
    val scale = 1000000000000L
    // sequential reference: same integer arithmetic, same iteration count
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = deg.keys.map(_ -> scale).toMap
    for (_ <- 1 to 3) {
      val s = und.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / deg(u) }.sum).toMap
      pr = s.map { case (v, sv) => v -> (15L * scale / 100 + 85L * sv / 100) }
    }
    val got = Graph.pageRank(edges(pairs: _*), iters = 3, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === pr)
    // the 3-edge vertex 1 outranks the 1-edge leaf 5
    assert(got(1L) > got(5L))
  }

  test("pageRank on a symmetric cycle gives every vertex the same rank") {
    val c = Graph.pageRank(edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
      .collect().map(_.getLong(1)).toSet
    assert(c.size === 1) // symmetry → identical fixed-point values
  }

  test("pointer doubling resolves chain roots and depths in log rounds") {
    // chain 1-2-3-4-5-6-7-8-9: parent(k)=k-1, depth(k)=k-1, all root 1.
    // depth 8 > 2^3 requires >3 rounds — exercises the doubling.
    val chain = (1L to 8L).map(i => (i, i + 1))
    val got = Graph.rootsAndDepths(Graph.parentPointers(edges(chain: _*)), rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === (1L to 9L).map(k => (k, 1L, k - 1)).toSet)
  }

  test("local-minimum vertices become roots of their own trees") {
    // component {2,8,9}: parent(9)=2, but 8's only neighbor (9) is larger
    // so 8 roots its own (singleton) tree
    val got = Graph.rootsAndDepths(Graph.parentPointers(edges((2L, 9L), (8L, 9L))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((2L, 2L, 0L), (8L, 8L, 0L), (9L, 2L, 1L)))
  }

  test("high-degree hub does not explode the wedge join result") {
    // hub 100 connected to 50 leaves + one triangle off to the side:
    // only the triangle is counted, hub contributes nothing
    val hub = (1L to 50L).map(i => (i, 100L))
    val c = counts(hub ++ Seq((200L, 201L), (201L, 202L), (200L, 202L)): _*)
    assert(c === Map(200L -> 1L, 201L -> 1L, 202L -> 1L))
  }

  private def bfs(seedIds: Seq[Long], rounds: Int, pairs: (Long, Long)*) = {
    import spark.implicits._
    Graph.bfsDistances(edges(pairs: _*), seedIds.toDF("v"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("BFS hop distances: chain from one end, bounded by rounds") {
    // chain 1-2-3-4-5-6, seed 1, 3 rounds → 4,5 at their true distance? no:
    // only vertices within 3 hops appear; 5 and 6 are absent
    val got = bfs(Seq(1L), rounds = 3, (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("BFS multi-source: nearest seed wins; unreachable component absent") {
    // two components: path 1-2-3 (seed 1) and square 10-11-12-13 (seed 12)
    val got = bfs(Seq(1L, 12L), rounds = 4,
      (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L))
    assert(got === Map(
      1L -> 0L, 2L -> 1L, 3L -> 2L,
      12L -> 0L, 11L -> 1L, 13L -> 1L, 10L -> 2L))
  }

  test("BFS: a shorter path found in a later round overrides the longer one") {
    // ring 1-2-3-4-5-1 with seed 1: vertex 3 reachable as 1→2→3 (2 hops)
    // and 1→5→4→3 (3 hops); min must win
    val got = bfs(Seq(1L), rounds = 4,
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  private def kcore(k: Int, rounds: Int, pairs: (Long, Long)*): Map[Long, Option[Long]] =
    Graph.kCorePeel(edges(pairs: _*), k, rounds)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("kCorePeel: K4 with a pendant fan peels the periphery in layers") {
    // K4 {1,2,3,4} + vertex 5 on {4,6,7} (deg 3 initially) + leaves 6,7:
    // round 1 peels the leaves (deg 1), which drops 5 to remaining-deg 1
    // → round 2; the K4 survives as the 3-core.
    val got = kcore(3, 4, (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (5L, 7L))
    assert(got === Map(
      1L -> None, 2L -> None, 3L -> None, 4L -> None,
      5L -> Some(2L), 6L -> Some(1L), 7L -> Some(1L)))
  }

  test("kCorePeel: cascade — removing one shell collapses the next") {
    // chain 1-2-3-4-5 with k=2: ends peel round 1, next pair round 2,
    // middle round 3 — the whole chain unravels.
    val got = kcore(2, 4, (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(got === Map(1L -> Some(1L), 5L -> Some(1L),
      2L -> Some(2L), 4L -> Some(2L), 3L -> Some(3L)))
  }

  test("kCorePeel: a cycle is its own 2-core (nothing peels)") {
    val got = kcore(2, 4, (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(got === Map(1L -> None, 2L -> None, 3L -> None, 4L -> None))
  }

  private def wedges(triples: (Long, Long, Long)*) = {
    import spark.implicits._
    triples.toDF("a", "b", "w")
  }

  private def sssp(seedIds: Seq[Long], rounds: Int, triples: (Long, Long, Long)*) = {
    import spark.implicits._
    Graph.ssspDistances(wedges(triples: _*), seedIds.toDF("v"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("SSSP: cheapest path wins over fewest hops") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5. With 2 rounds the
    // two-edge path must win.
    val got = sssp(Seq(1L), rounds = 2, (1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("SSSP: round bound limits path LENGTH, not cost") {
    // chain 1-2-3-4 (unit costs) with 2 rounds: 4 is 3 edges away → absent
    val got = sssp(Seq(1L), rounds = 2, (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("SSSP: a cheaper longer path discovered in a later round overrides") {
    // 1→4 direct costs 100; 1→2→3→4 costs 3. Round 1 sets 4 to 100,
    // round 3 relaxes it down to 3.
    val got = sssp(Seq(1L), rounds = 3,
      (1L, 4L, 100L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("labelPropagation: a bridge edge does not merge two dense triangles") {
    // barbell {1,2,3}–{4,5,6} with bridge 3-4. Hand-replayed 3 rounds of
    // plurality + min-tiebreak: left triangle → community 1, right → 3
    // (CC would merge everything into one component — the LPA point).
    val got = Graph.labelPropagation(
        edges((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)),
        rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("SSSP multi-seed: each vertex takes its cheapest seed") {
    val got = sssp(Seq(1L, 5L), rounds = 2,
      (1L, 2L, 4L), (2L, 3L, 4L), (5L, 4L, 1L), (4L, 3L, 1L))
    // 3 reachable from seed 1 at 8 and from seed 5 at 2 — min wins
    assert(got === Map(1L -> 0L, 5L -> 0L, 2L -> 4L, 4L -> 1L, 3L -> 2L))
  }

  test("modularity: hand case — two pairs with one bridge") {
    import spark.implicits._
    // edges 1-2, 3-4, bridge 1-3; communities {1,2}=0, {3,4}=1
    // m=3; e_00=e_11=1; d_0=d_1=3 → Q_i = 1/3 − (3/6)² each, Q = 2·that
    val e = edges((1L, 2L), (3L, 4L), (1L, 3L))
    val asg = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("v", "community")
    val r = Graph.modularity(e, asg).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    val qi = 1.0 / 3.0 - 0.25
    assert(r(0L) == ((2L, 1L, 3L, qi)))
    assert(r(1L) == ((2L, 1L, 3L, qi)))
  }

  test("modularity: perfect split of two cliques beats a random split") {
    import spark.implicits._
    // two triangles, no bridge
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val good = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("v", "community")
    val bad = Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 0L), (6L, 1L))
      .toDF("v", "community")
    def q(asg: org.apache.spark.sql.DataFrame) =
      Graph.modularity(e, asg).collect().head.getAs[Double]("q_total")
    assert(q(good) == 0.5)  // disconnected cliques: max modularity 1/2
    assert(q(bad) < q(good))
  }

  test("modularity: a community with zero internal edges still appears") {
    import spark.implicits._
    val e = edges((1L, 2L))
    val asg = Seq((1L, 0L), (2L, 1L)).toDF("v", "community")
    val r = Graph.modularity(e, asg).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r == Map(0L -> 0L, 1L -> 0L))
  }

  test("linkPredict: path endpoints predicted, existing edges excluded") {
    // path 1-2-3 plus 3-4: pairs at distance 2 are (1,3) via 2, (2,4)
    // via 3; with minCommon=1 both appear with common=1; edge pairs
    // never appear. deg: 1->1, 2->2, 3->2, 4->1.
    val r = Graph.linkPredict(
        edges((1L, 2L), (2L, 3L), (3L, 4L)), minCommon = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r === Map(
      (1L, 3L) -> (1L, 2L, 2L),   // common=1, 1*2, 1+2-1
      (2L, 4L) -> (1L, 2L, 2L)))  // common=1, 2*1, 2+1-1
  }

  test("linkPredict: common count and Jaccard denominator on K4 minus an edge") {
    // K4 without edge (1,4): 1 and 4 share neighbors {2,3} → common=2;
    // deg(1)=deg(4)=2, deg(2)=deg(3)=3 → pref=4, jacc_den=2+2-2=2.
    val r = Graph.linkPredict(
        edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1)) === (1L, 4L))
    assert(row.getLong(2) === 2L && row.getLong(3) === 4L &&
      row.getLong(4) === 2L)
  }

  test("linkPredict: middle-degree cap drops hub-mediated pairs") {
    // star hub 9 with leaves 1..4: every leaf pair shares only the hub.
    val star = edges((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L))
    assert(Graph.linkPredict(star, minCommon = 1).count() === 6L)
    assert(Graph.linkPredict(star, maxMiddleDeg = 3, minCommon = 1)
      .count() === 0L)
  }
}
