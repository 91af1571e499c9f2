package graft.tools

import graft.ext.{Dedup, Par, TextKit}
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
    def count(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup")(spark.range(10000).toDF())

    // Decompose minHashNearDups with current parameters.
    def stages(k: Int, bands: Int): Unit = {
      val rows = k / bands
      println(s"== k=$k bands=$bands rows=$rows ==")
      val base = Dedup.shingled(docs)
        .withColumn("hs", transform(col("shingles"), s => TextKit.polyHash(s)))
        .transform(Par.spread(_, col("doc_id")))
        .select(col("doc_id"), col("shingles"), col("nsh"),
          TextKit.minHashFromHashes(col("hs"), k).as("sig"))
        .transform(Par.spread(_, col("doc_id")))
      time("base-signatures")(base)
      val buckets = Dedup.lshBuckets(base.select(col("doc_id"), col("sig")), bands, rows)
      count("candidates")(
        buckets.as("x").join(buckets.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct())
      time("full")(Dedup.minHashNearDups(docs, 0.8, k, bands))
    }
    stages(66, 22)
    stages(64, 16)
    spark.stop()
  }
}
