package graft.functions

import graft.SparkSpec
import graft.ops.Gold

import org.apache.spark.sql.functions._

class InterleaveBitsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton encode, written independently of the expression. */
  private def morton(x: Int, y: Int): Long = {
    var z = 0L
    for (b <- 0 to 30)
      z |= (((x.toLong >> b) & 1L) << (2 * b + 1)) | (((y.toLong >> b) & 1L) << (2 * b))
    z
  }

  test("matches the reference Morton encode on known and random points") {
    val pts = Seq((0, 0), (5, 3), (3, 5), (1, 0), (0, 1),
      (Int.MaxValue, Int.MaxValue), (12345, 67890)) ++
      Seq.fill(50)((scala.util.Random.nextInt(1 << 20), scala.util.Random.nextInt(1 << 20)))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"), InterleaveBits(col("x"), col("y")).as("z"))
      .collect()
    out.foreach(r => assert(r.getLong(2) == morton(r.getInt(0), r.getInt(1)), r.toString))
    assert(morton(5, 3) == 39L) // sanity-pin the reference itself
  }

  test("SQL registration and null propagation") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_zvalue(5, 3) AS z, graft_zvalue(CAST(NULL AS INT), 3) AS zn").head()
    assert(r.getLong(0) == 39L && r.isNullAt(1))
  }

  test("zorderBy keeps per-partition bounding boxes tight on BOTH dims") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
    def extents(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
        .as[(Int, Long, Long)].collect().map(r => (r._2, r._3)).toSeq
    val zed = extents(Gold.zorderBy(grid, "x", "y", bits = 6, partitions = Some(16)))
    // 64x64 grid into 16 partitions along the Z-curve → ~16x16 blocks;
    // allow slack for range-boundary straddling.
    assert(zed.nonEmpty && zed.forall { case (ex, ey) => ex <= 32 && ey <= 32 }, zed.toString)
    // single-column clustering leaves the trailing dim unclustered —
    // the full 0..63 range in every partition.
    val ranged = extents(Gold.clusterBy(grid, Seq("x"), Some(16)))
    assert(ranged.forall { case (_, ey) => ey == 63 }, ranged.toString)
    // content preserved
    assert(Gold.zorderBy(grid, "x", "y", bits = 6).count() == n.toLong * n)
  }

  /** Reference 3-D Morton encode at 20 bits/dim, independent of the
    * expression: MSB-first interleave, dim 0 on the top bit of each
    * 3-bit group. */
  private def morton3(x: Int, y: Int, z: Int): Long = {
    var d = 0L
    for (b <- 19 to 0 by -1)
      d = (d << 3) | (((x.toLong >> b) & 1L) << 2) |
        (((y.toLong >> b) & 1L) << 1) | ((z.toLong >> b) & 1L)
    d
  }

  test("3-ary interleave matches the reference and registers in SQL") {
    GraftExtensions.register(spark)
    val pts = Seq((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (5, 3, 7),
      ((1 << 20) - 1, (1 << 20) - 1, (1 << 20) - 1)) ++
      Seq.fill(30)((scala.util.Random.nextInt(1 << 20),
        scala.util.Random.nextInt(1 << 20), scala.util.Random.nextInt(1 << 20)))
    val out = pts.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        InterleaveBits(Seq(col("x"), col("y"), col("z"))).as("d"))
      .collect()
    out.foreach(r => assert(r.getLong(3) == morton3(r.getInt(0), r.getInt(1), r.getInt(2)),
      r.toString))
    // dim 0 carries the highest bit: (1,0,0) > (0,1,0) > (0,0,1)
    assert(morton3(1, 0, 0) == 4L && morton3(0, 1, 0) == 2L && morton3(0, 0, 1) == 1L)
    val viaSql = spark.sql("SELECT graft_zvalue(5, 3, 7), graft_zvalue(5, 3, CAST(NULL AS INT))").head()
    assert(viaSql.getLong(0) == morton3(5, 3, 7) && viaSql.isNullAt(1))
  }

  test("zorderBy survives NaN and null cells under ANSI mode") {
    val df = Seq((1.0, 2.0), (Double.NaN, 3.0), (4.0, Double.NaN), (5.0, 6.0))
      .toDF("x", "y")
      .withColumn("y", when(col("x") === 5.0, lit(null).cast("double")).otherwise(col("y")))
    assert(Gold.zorderBy(df, "x", "y", bits = 4, partitions = Some(2)).count() == 4)
  }
}
