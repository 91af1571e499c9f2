package graft.tools

import graft.ext.{Dedup, Par}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing decomposition of a hot query. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs: DataFrame =
      Par.spread(spark.read.parquet(s"$sfDir/documents.parquet"), col("doc_id"))
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warmup")(spark.range(10000).toDF())
    time("simHashedBigrams-1")(Dedup.simHashedBigrams(docs))
    time("simHashedBigrams-2")(Dedup.simHashedBigrams(docs))
    val sim = Dedup.simHashedBigrams(docs)
    val banded = sim.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 7) % (1L << 7)): _*)).as(Seq("band", "bval")))
    time("banded")(banded)
    val cand = banded.as("x").join(banded.as("y"),
      col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
    time("join-no-distinct")(cand)
    time("join+distinct")(cand.distinct())
    time("simHashPairs-full")(Dedup.simHashPairs(docs, 3))
    time("simHashPairs-full-2")(Dedup.simHashPairs(docs, 3))
    // cached-sim variant
    val simC = Dedup.simHashedBigrams(docs).cache()
    simC.count()
    val bandedC = simC.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 7) % (1L << 7)): _*)).as(Seq("band", "bval")))
    val candC = bandedC.as("x").join(bandedC.as("y"),
      col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming")
    time("pairs-via-cache")(candC)
    time("pairs-via-cache-2")(candC)
    spark.stop()
  }
}
