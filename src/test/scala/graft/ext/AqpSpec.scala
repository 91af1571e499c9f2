package graft.ext

import graft.SparkSpec
import graft.queries.{Extensions, Parity}
import org.apache.spark.sql.functions._

/** The oracle proves x_aqp_sample's arithmetic is reproduced bit-for-bit;
  * this spec proves the arithmetic is a CORRECT estimator — each group's
  * Horvitz–Thompson estimate must bracket the exact full-scan answer
  * within 3 standard errors (a deterministic check: the sample is a pure
  * hash, so the z-scores are fixed properties of the testdata). */
class AqpSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("1% HT estimate brackets the exact sum within 3 se per group") {
    val est = Extensions.aqpSample(spark, sf)
      .select("o_orderpriority", "est_count", "est_sum", "se_sum")
    val exact = Parity.table(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("exact_count"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("exact_sum"))
    val rows = est.join(exact, Seq("o_orderpriority")).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (estSum, se, exactSum) = (r.getAs[Double]("est_sum"),
        r.getAs[Double]("se_sum"), r.getAs[Double]("exact_sum"))
      val z = math.abs(estSum - exactSum) / se
      assert(z <= 3.0, s"${r.getString(0)}: |z| = $z > 3")
      // count estimate within 30% (coarse: 1% of ~3000 rows per group)
      val cr = r.getAs[Long]("est_count").toDouble / r.getAs[Long]("exact_count")
      assert(cr > 0.7 && cr < 1.3, s"${r.getString(0)}: count ratio $cr")
    }
  }
}
