package graft.functions

import graft.SparkSpec
import graft.ops.Gold

import org.apache.spark.sql.functions._

class HilbertIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Curve index of every point of the 2^k × 2^k CORNER subgrid,
    * evaluated through the expression (codegen path). The subgrid is a
    * dyadic cell of the order-31 curve, and a Hilbert curve traverses
    * every dyadic cell as one contiguous interval starting at its entry
    * corner — the cell containing (0,0) is traversed first, so the
    * subgrid's indices must be exactly 0..4^k-1. */
  private def gridIndex(k: Int): Map[(Int, Int), Long] = {
    val n = 1 << k
    (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
      .select(col("x"), col("y"), HilbertIndex(col("x"), col("y")).as("h"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  test("bijective and unit-step adjacent on full grids — the Hilbert invariants") {
    for (k <- Seq(3, 5)) {
      val n = 1 << k
      val idx = gridIndex(k)
      val sorted = idx.toSeq.sortBy(_._2)
      // contiguous bijection onto 0..4^k-1 (dyadic-cell interval property)
      assert(sorted.map(_._2) == (0L until n.toLong * n),
        s"order-$k: indices not the contiguous range 0..${n * n - 1}")
      // consecutive curve positions are GRID NEIGHBORS (Manhattan step 1)
      // — the locality property Morton lacks; InterleaveBits jumps at
      // every power-of-two seam
      sorted.sliding(2).foreach { case Seq(((x1, y1), _), ((x2, y2), _)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"order-$k: jump from ($x1,$y1) to ($x2,$y2)")
      }
    }
  }

  test("interpreted eval matches codegen and the SQL registration") {
    GraftExtensions.register(spark)
    val pts = Seq((0, 0), (5, 3), (3, 5), (Int.MaxValue, Int.MaxValue),
      (12345, 67890))
    val viaExpr = pts.toDF("x", "y")
      .select(HilbertIndex(col("x"), col("y"))).as[Long].collect().toSeq
    val viaSql = pts.map { case (x, y) =>
      spark.sql(s"SELECT graft_hvalue($x, $y)").head().getLong(0) }
    assert(viaExpr == viaSql)
    assert(spark.sql("SELECT graft_hvalue(CAST(NULL AS INT), 3)").head().isNullAt(0))
  }

  /** 3-D curve index of the 2^k cube via the expression (Skilling
    * kernel, codegen path). */
  private def cubeIndex(k: Int): Map[(Int, Int, Int), Long] = {
    val n = 1 << k
    (for (x <- 0 until n; y <- 0 until n; z <- 0 until n) yield (x, y, z))
      .toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        HilbertIndex(Seq(col("x"), col("y"), col("z"))).as("h"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
  }

  test("3-D: bijective and unit-step adjacent — the Hilbert invariants in n dims") {
    for (k <- Seq(2, 3)) {
      val n = 1 << k
      val idx = cubeIndex(k)
      val sorted = idx.toSeq.sortBy(_._2)
      // NOTE: the full 2^k cube is NOT a dyadic subcell of the order-20
      // frame the expression quantizes into, so indices are a strictly
      // increasing walk, not necessarily 0..8^k-1 — bijectivity plus
      // unit-step adjacency are the invariants that characterize a
      // Hilbert traversal of the cube.
      assert(sorted.map(_._2).distinct.size == n * n * n, s"order-$k: collision")
      sorted.sliding(2).foreach { case Seq(((x1, y1, z1), _), ((x2, y2, z2), _)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
          s"order-$k: jump from ($x1,$y1,$z1) to ($x2,$y2,$z2)")
      }
    }
  }

  test("3-ary SQL registration matches the Column API; nulls propagate") {
    GraftExtensions.register(spark)
    val pts = Seq((0, 0, 0), (5, 3, 7), (1023, 0, 511))
    val viaExpr = pts.toDF("x", "y", "z")
      .select(HilbertIndex(Seq(col("x"), col("y"), col("z")))).as[Long].collect().toSeq
    val viaSql = pts.map { case (x, y, z) =>
      spark.sql(s"SELECT graft_hvalue($x, $y, $z)").head().getLong(0) }
    assert(viaExpr == viaSql)
    assert(spark.sql("SELECT graft_hvalue(1, CAST(NULL AS INT), 3)").head().isNullAt(0))
  }

  test("hilbertBy clusters both dims; no jump-straddled partitions vs Morton") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
    def extents(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
        .as[(Int, Long, Long)].collect().map(r => (r._2, r._3)).toSeq
    val h = extents(Gold.hilbertBy(grid, "x", "y", bits = 6, partitions = Some(16)))
    assert(h.nonEmpty && h.forall { case (ex, ey) => ex <= 32 && ey <= 32 }, h.toString)
    // content preserved
    assert(Gold.hilbertBy(grid, "x", "y", bits = 6).count() == n.toLong * n)
    // aggregate locality: total bounding-box AREA under Hilbert must not
    // exceed Morton's on the same grid/partitioning (the curve's whole
    // point); equality allowed — both are perfect on aligned powers of 2
    val z = extents(Gold.zorderBy(grid, "x", "y", bits = 6, partitions = Some(16)))
    val area = (e: Seq[(Long, Long)]) => e.map { case (ex, ey) => (ex + 1) * (ey + 1) }.sum
    assert(area(h) <= area(z), s"hilbert area ${area(h)} > morton ${area(z)}")
  }
}
