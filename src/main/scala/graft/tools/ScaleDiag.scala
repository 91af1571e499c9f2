package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: per-STAGE weak-scaling diagnosis for the three queries the
  * round-6 sf1 probe put near the 10× bar (`d_span_coverage` 6.1×,
  * `d_incremental` 5.5×, `x_hierarchy` 5.5×) — answers WHICH stage
  * grows super-linearly, instead of guessing from end-to-end wall.
  *
  * Each stage is forced through the noop sink, min-of-`SPARK_GRAFT_PASSES`
  * (default 2) like Bench; stages nest (stage N includes N−1's work) so
  * the interesting number is the INCREMENT between stages at each SF and
  * how that increment scales between the two dirs.
  *
  * For `d_incremental` the probe also times the PRODUCTION form
  * ([[graft.ext.Dedup.minHashNearDupsIncrementalIndexed]]): the corpus
  * signature index is built once and persisted (parquet, like a
  * TableCatalog table), and the per-ingest cost is signature work on the
  * BATCH plus the bucket probe — the contract query derives the corpus
  * signatures inline every run, so its wall necessarily carries an
  * O(corpus) term that the persisted-index deployment does not pay.
  *
  * Usage: `sbt "runMain graft.tools.ScaleDiag [sfSmall] [sfBig]"`
  * (defaults /root/testdata/sf0.1 and /root/repo/target/sf1).
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = if (args.length > 1) args(1) else "/root/repo/target/sf1"
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()

    def time(mk: => DataFrame): Double =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }.min

    // optional 3rd arg: comma-separated query-name filter (run only those)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def probe(query: String, stage: String, sf: String)(mk: => DataFrame): Unit = {
      if (!only.forall(_.contains(query))) return
      val t = time(mk)
      val line = f"""{"query":"$query","stage":"$stage","sf":"$sf","sec":$t%.2f}"""
      System.err.println(s"[diag] $line")
      results += line
    }

    for ((sf, dir) <- Seq("small" -> small, "big" -> big)) {
      import graft.ext.Dedup
      val docs = graft.queries.Extensions.docs(spark, dir)
      // warm the page cache so stage deltas are compute, not cold I/O
      docs.write.mode("overwrite").format("noop").save()

      // ---- d_span_coverage: gram gen → shared-mark agg → join+rollup
      val k = 40; val stride = 10
      def grams = docs.filter(length(col("text")) >= k)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, cast((length(text) - $k) div $stride as int))," +
            s" i -> substring(text, i * $stride + 1, $k))")).as("gram"))
      probe("d_span_coverage", "1_gram_gen", sf)(grams)
      probe("d_span_coverage", "2_mark_agg", sf)(
        grams.groupBy("gram")
          .agg((count_distinct(col("doc_id")) >= 2).as("is_shared")))
      probe("d_span_coverage", "3_full", sf)(Dedup.spanCoverage(docs))

      // ---- d_incremental: corpus-inline (contract) vs persisted index
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + 200000))
      probe("d_incremental", "1_corpus_signatures", sf)(
        Dedup.signatureIndex(corpus))
      probe("d_incremental", "2_batch_signatures", sf)(
        Dedup.signatureIndex(batch))
      probe("d_incremental", "3_full_inline", sf)(
        Dedup.minHashNearDupsIncremental(corpus, batch, 0.8))
      // production loop: index persisted once per ingest, probed per batch
      val idxPath = s"target/diag_sigidx_$sf"
      Dedup.signatureIndex(corpus).write.mode("overwrite").parquet(idxPath)
      probe("d_incremental", "4_indexed_probe", sf)(
        Dedup.minHashNearDupsIncrementalIndexed(
          spark.read.parquet(idxPath), batch, 0.8))

      // ---- x_hierarchy: parent forest → pointer doubling
      import graft.ext.Graph
      def edges = graft.queries.Extensions.coPurchaseEdges(spark, dir)
      probe("x_hierarchy", "1_edges", sf)(edges)
      probe("x_hierarchy", "2_parent_forest", sf)(Graph.parentPointers(edges))
      probe("x_hierarchy", "3_full_doubling", sf)(
        Graph.rootsAndDepths(Graph.parentPointers(edges)))

      // ---- round-7 sf1 tail: x_ann_pq / d_edit_distance / m_image_neardup
      // (x_ann_recall inherits pq). Stages replicate the query internals.
      import graft.ext.Similarity
      val emb = graft.queries.Extensions.emb(spark, dir)
      probe("x_ann_pq", "1_norm", sf)(Similarity.withNorm(emb))
      probe("x_ann_pq", "2_encode", sf)(Similarity.pqCodes(emb))
      probe("x_ann_pq", "3_full", sf)(Similarity.pqTopK(emb, 20, 5))

      val dEd = docs.select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 64).as("prefix"),
        expr("n_chars div 40").as("blk"))
      probe("d_edit_distance", "1_block_prep", sf)(dEd)
      probe("d_edit_distance", "2_pair_count", sf)(
        dEd.as("x").join(dEd.as("y"),
          col("x.lang") === col("y.lang") && col("x.blk") === col("y.blk") &&
            col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.lang")).agg(count(lit(1))))
      probe("d_edit_distance", "3_full", sf)(Dedup.editDistancePairs(docs))

      {
        implicit val s: SparkSession = spark
        import spark.implicits._
        import graft.ext.Multimodal
        def media = docs.select(col("doc_id")).as[Long].map { id =>
          val pert = (id % 5).toInt
          graft.ext.MediaRow(id, "png", Multimodal.synthesizePngFull(
            id / 5, if (pert == 0) -1 else ((pert * 11) % 64), 96))
        }
        def hashes = Multimodal.imageHashes(media).toDF()
          .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"))
        probe("m_image_neardup", "1_hashes", sf)(hashes)
        def bands = hashes.select(col("doc_id"),
          posexplode(array(
            col("ahash_lo") % 65536,
            expr("shiftright(ahash_lo, 16) % 65536"),
            col("ahash_hi") % 65536,
            expr("shiftright(ahash_hi, 16) % 65536"))))
          .toDF("doc_id", "band_idx", "band_val")
        probe("m_image_neardup", "2_band_cands", sf)(
          bands.as("x").join(bands.as("y"),
            col("x.band_idx") === col("y.band_idx") &&
              col("x.band_val") === col("y.band_val") &&
              col("x.doc_id") < col("y.doc_id"))
            .groupBy(col("x.band_idx")).agg(count(lit(1))))
        probe("m_image_neardup", "3_full", sf)(
          graft.queries.Extensions.imageNearDup(spark, dir))
      }

      // ---- round-10 verdict item 7: tpch_q3 (3.65× at 10×) and
      // x_rolling_actives (3.25×) — which stage carries the growth?
      {
        import org.apache.spark.sql.types.DateType
        val cust = graft.queries.Parity.table(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        def ord = graft.queries.Parity.table(spark, dir, "orders")
          .filter(col("o_orderdate").cast(DateType) <
            lit("1997-01-01").cast(DateType))
          .select(col("o_orderkey"), col("o_custkey"))
        def li = graft.queries.Parity.table(spark, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1997-01-01 00:00:00"))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        probe("tpch_q3", "1_lineitem_scan", sf)(li)
        probe("tpch_q3", "2_li_ord_join", sf)(
          li.join(ord, col("l_orderkey") === col("o_orderkey")))
        probe("tpch_q3", "3_plus_cust", sf)(
          li.join(ord, col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(cust), col("o_custkey") === col("c_custkey")))
        probe("tpch_q3", "4_full", sf)(
          graft.queries.Parity.tpchQ3(spark, dir))

        val ud = graft.queries.Parity.events(spark, dir)
          .select(col("user_id"),
            date_trunc("day", col("ts")).cast(DateType).as("day"))
          .distinct()
        probe("x_rolling_actives", "1_user_days", sf)(ud)
        probe("x_rolling_actives", "2_explode7_distinct", sf)(
          ud.select(col("user_id"),
              explode(sequence(lit(0), lit(6))).as("off"), col("day"))
            .select(col("user_id"), date_add(col("day"), col("off")).as("wday"))
            .distinct())
        probe("x_rolling_actives", "3_full", sf)(
          graft.queries.Extensions.rollingActives(spark, dir))
      }
    }

    println(results.mkString("[", ",\n", "]"))
    spark.stop()
  }
}
