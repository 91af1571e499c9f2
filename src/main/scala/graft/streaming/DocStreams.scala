package graft.streaming

import graft.ext.{Dedup, TextKit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document curation: the near-dup gate applied at ingest time,
  * so duplicates are caught as they arrive instead of by periodic batch
  * sweeps over the whole corpus — the streaming twin of
  * [[graft.ext.Dedup.minHashNearDupsIncremental]].
  */
object DocStreams {

  /** Near-dup matches of a document STREAM against a static corpus
    * signature index ([[graft.ext.Dedup.signatureIndex]]: doc_id,
    * shingles, nsh, sig — at scale persisted via
    * [[graft.core.TableCatalog]] and appended per ingest).
    *
    * Every stage is a stateless projection or stream-static equi-join,
    * so the stream holds NO join state: per micro-batch, signatures are
    * codegen'd column expressions, the LSH bucket join touches only the
    * corpus buckets matching the batch's bands, and the exact-Jaccard
    * verify joins candidates back to the index. The one stateful
    * operator is the final within-watermark dedup (a pair is born once
    * per shared band): all duplicates of a pair arise in the SAME
    * micro-batch, so the processing-time horizon only needs to span one
    * batch and state stays bounded.
    *
    * Emits (doc_id, dup_of, jaccard): the arriving doc, the corpus doc
    * it duplicates, and the exact shingle-set Jaccard. Doc ids must be
    * unique across stream ∪ corpus. Works unchanged on a batch frame
    * (watermark no-ops). */
  def nearDupMatches(docStream: DataFrame, corpusIndex: DataFrame,
      threshold: Double = 0.8, k: Int = 64, bands: Int = 16,
      horizon: String = "10 minutes"): DataFrame = {
    val rows = k / bands
    val s = docStream
      .select(col("doc_id"), TextKit.wordShingles(col("text"), 3).as("shingles"))
      .withColumn("nsh", size(col("shingles")))
      .withColumn("hs", transform(col("shingles"), sh => TextKit.polyHash(sh)))
      .select(col("doc_id"), col("shingles"), col("nsh"),
        TextKit.minHashFromHashes(col("hs"), k).as("sig"),
        current_timestamp().as("ingest_ts"))
    // Stream-side bucket rows carry the verify payload (the batch is
    // small); corpus bucket rows stay narrow — doc_id only — and the
    // payload joins back from the index on the few candidates.
    val sb = Dedup.lshBuckets(s, bands, rows,
      keep = Seq("shingles", "nsh", "sig", "ingest_ts"))
    val cb = Dedup.lshBuckets(corpusIndex, bands, rows)
    val minAgree = math.ceil(math.max(0.0, threshold - 0.3) * k).toInt
    val cand = sb.as("x").join(cb.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("doc_id"), col("x.shingles").as("sh_s"),
        col("x.nsh").as("nsh_s"), col("x.sig").as("sig_s"),
        col("x.ingest_ts").as("ingest_ts"), col("y.doc_id").as("dup_of"))
    cand
      .join(corpusIndex.select(col("doc_id").as("dup_of"),
        col("shingles").as("sh_c"), col("nsh").as("nsh_c"),
        col("sig").as("sig_c")), Seq("dup_of"))
      .withColumn("agree", aggregate(
        zip_with(col("sig_s"), col("sig_c"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v))
      .filter(col("agree") >= minAgree)
      .withColumn("inter", size(array_intersect(col("sh_s"), col("sh_c"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("nsh_s") + col("nsh_c") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark(Seq("doc_id", "dup_of"))
      .select("doc_id", "dup_of", "jaccard")
  }
}
