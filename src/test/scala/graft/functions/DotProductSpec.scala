package graft.functions

import graft.SparkSpec
import graft.ext.Similarity

import org.apache.spark.sql.functions._

/** The native codegen dot product must be BIT-identical to the HOF fold
  * it replaces (same serial order, same null semantics) — the oracle
  * contract depends on it. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def vec(d: Int): Seq[Float] = Seq.fill(d)(rnd.nextFloat() * 2 - 1)

  test("bit-identical to the higher-order fold on random float vectors") {
    val rows = Seq.tabulate(50)(i => (vec(64), vec(64)))
    val out = rows.toDF("a", "b").select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("null semantics mirror the HOF chain") {
    val df = Seq(
      (Seq(1f, 2f), Seq(3f, 4f)),          // plain
      (Seq(1f, 2f), Seq(3f))               // length mismatch → null
    ).toDF("a", "b")
      .union(Seq((null.asInstanceOf[Seq[Float]], Seq(1f))).toDF("a", "b"))
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    got.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1), r.toString))
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))

    // null *element* poisons the fold on both paths
    val e = spark.sql("SELECT array(CAST(1.0 AS DOUBLE), NULL) AS a, array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)) AS b")
      .select(Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof")).head()
    assert(e.isNullAt(0) && e.isNullAt(1))
  }

  test("registered as graft_dot in SQL") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT)))").head().getDouble(0)
    assert(v == 23.0)
  }
}
