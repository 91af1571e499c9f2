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
    time("warmup")(spark.range(10000).toDF())

    // Current capped-pairs formulation: nR aggregate + join.
    def viaJoin: DataFrame = Dedup.jaccardPairsCapped(docs, 0.5, maxDf = 100)

    // Window-count variant: per-doc rare count via count() over doc_id.
    def viaWindow: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val sh = Dedup.shingled(docs, 3).transform(Par.spread(_, col("doc_id")))
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      val hot = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select("shingle")
      val exR = ex.join(hot, Seq("shingle"), "left_anti")
      val exN = exR.withColumn("nsh",
        count(lit(1)).over(Window.partitionBy("doc_id")))
      exN.as("x").join(exN.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.nsh").as("na"), col("y.nsh").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.5)
    }

    // Pairs-first variant: aggregate pairs WITHOUT nsh riding the join,
    // then broadcast the tiny per-doc rare-count table onto the pair
    // results (map-side combine shrinks the doc_id shuffle to |docs|
    // rows; the pair join carries 2 narrow cols instead of 4).
    def viaBroadcastNr: DataFrame = {
      val sh = Dedup.shingled(docs, 3).transform(Par.spread(_, col("doc_id")))
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      val hot = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select("shingle")
      val exR = ex.join(hot, Seq("shingle"), "left_anti")
      val nr = exR.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val pairs = exR.as("x").join(exR.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(broadcast(nr.select(col("doc_id").as("a"), col("nsh").as("na"))), Seq("a"))
        .join(broadcast(nr.select(col("doc_id").as("b"), col("nsh").as("nb"))), Seq("b"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.5)
    }

    // MinHash signature stage: native single-pass Expression vs the
    // k-pass HOF chain (same values, different constant factor).
    def sigNative: DataFrame = Dedup.shingled(docs, 3)
      .withColumn("hs", transform(col("shingles"), s => TextKit.polyHash(s)))
      .transform(Par.spread(_, col("doc_id")))
      .select(col("doc_id"), TextKit.minHashFromHashes(col("hs"), 64).as("sig"))
    def sigHof: DataFrame = Dedup.shingled(docs, 3)
      .withColumn("hs", transform(col("shingles"), s => TextKit.polyHash(s)))
      .transform(Par.spread(_, col("doc_id")))
      .select(col("doc_id"), TextKit.minHashFromHashesHof(col("hs"), 64).as("sig"))

    for (i <- 1 to 2) {
      time(s"capped viaJoin #$i")(viaJoin)
      time(s"capped viaWindow #$i")(viaWindow)
      time(s"capped viaBroadcastNr #$i")(viaBroadcastNr)
      time(s"minhash sig native #$i")(sigNative)
      time(s"minhash sig HOF #$i")(sigHof)
    }
    spark.stop()
  }
}
