package graft.streaming

import graft.ext.{Dedup, TextKit}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Self-maintaining streaming dedup ingest — the full production loop
    * [[graft.ext.Dedup.minHashNearDupsIncrementalIndexed]]'s doc
    * describes, closed over a [[graft.core.TableCatalog]]: per
    * micro-batch, (1) the batch dedups against the PERSISTED signature
    * index (corpus×batch ∪ batch×batch candidates — never corpus×corpus),
    * (2) novel docs append to `docsTable`, (3) exactly their signatures
    * append to `indexTable` — so batch N+1 automatically dedups against
    * batch N without any re-shingling of the standing corpus. Intra-batch
    * duplicate chains keep the min-id member (the CC-canonical choice).
    *
    * Exactly-once: both appends are [[graft.core.TableCatalog.appendTxn]]
    * with the stream's `appId` and the batch epoch, so a foreachBatch
    * replay after a crash re-applies NEITHER table. A crash BETWEEN the
    * two appends converges on replay: the docs append skips as a
    * duplicate transaction, the index append applies — the index is
    * always ≤ one batch behind its docs table mid-recovery and equal
    * after it. (A multi-table [[graft.core.TableCatalog.publishAtomic]]
    * would close even that window, but it carries overwrite semantics —
    * O(corpus) per batch where this loop is O(batch).)
    *
    * Per-batch cost: signature work on the batch + an LSH bucket probe
    * of the index restricted to the batch's bands — the O(batch ×
    * index-probe) ingest shape a 100 TB corpus needs. */
  def dedupIngestSink(docStream: DataFrame, catalog: graft.core.TableCatalog,
      docsTable: String, indexTable: String, appId: String,
      threshold: Double = 0.8, k: Int = 64, bands: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF()
        val idx =
          if (catalog.exists(indexTable)) catalog.read(spark, indexTable)
          else Dedup.signatureIndex(b.limit(0), k)
        val dups = Dedup.minHashNearDupsIncrementalIndexed(
          idx, b, threshold, k, bands)
        // Every dup pair's `b` side is a batch doc and (for intra-batch
        // pairs) the larger id — dropping all `b`s keeps exactly the
        // min-id representative of each within-batch duplicate chain.
        val novel = b.join(dups.select(col("b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        catalog.appendTxn(novel, docsTable, appId, epoch)
        // Align the computed signature schema to the stored one: parquet
        // round-trips arrays as containsNull=true, while the freshly
        // computed arrays are containsNull=false — a no-op cast, but the
        // transactional append's schema-stability gate compares shapes
        // exactly (loosening it would mask real drift).
        val sigs = Dedup.signatureIndex(novel, k)
        val aligned =
          if (catalog.exists(indexTable)) {
            val want = catalog.read(spark, indexTable).schema
            sigs.select(want.fields.toSeq.map(f => col(f.name).cast(f.dataType)): _*)
          } else sigs
        catalog.appendTxn(aligned, indexTable, appId, epoch)
        ()
      }
      .start()

  /** A doc admitted by [[budgetAdmission]], with its selection
    * bookkeeping (cum_tokens = the source's running admitted total AFTER
    * this doc). */
  case class AdmittedDoc(doc_id: Long, source: String, n_tokens: Long,
      cum_tokens: Long)

  /** Streaming token-budget admission: the online twin of
    * [[graft.ext.Mixture.tokenBudgetMix]]. Documents arrive as a stream;
    * each source admits docs until its cumulative admitted token count
    * would exceed `budgetPerSource`, then drops the rest — quota
    * enforcement at ingest time, so a runaway source can't flood the
    * corpus between batch sweeps.
    *
    * Semantics differ from the batch mixture deliberately: the batch form
    * selects the global hash-priority prefix (a reproducible recipe over
    * a COMPLETE corpus); admission control is first-come-first-served
    * across micro-batches (the future is unknown), with the same hash
    * priority as the deterministic intra-batch order. A doc too large
    * for the remaining quota is skipped but does NOT close the source —
    * a later smaller doc may still fit (best-effort packing, not
    * strict-prefix).
    *
    * State is ONE long per source (`flatMapGroupsWithState`): bounded by
    * source cardinality, not corpus size — nothing about the docs
    * themselves is retained. The shuffle is keyed by source; heavily
    * skewed arrival (one hot source) bounds per-batch group size, which
    * is the general stateful-streaming tradeoff, and the sort inside a
    * group is per-batch-per-source, never corpus-wide. */
  def budgetAdmission(docStream: DataFrame, budgetPerSource: Long): Dataset[AdmittedDoc] = {
    val spark = docStream.sparkSession
    import spark.implicits._
    docStream
      .select(col("doc_id").cast("long"), col("source"),
        size(TextKit.words(col("text"))).cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(Long, String, Long)], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val admitted = rows.toSeq
            .sortBy { case (id, _, _) => (id % TextKit.P * 2654435761L % TextKit.P, id) }
            .flatMap { case (id, _, n) =>
              if (used + n <= budgetPerSource) {
                used += n
                Some(AdmittedDoc(id, source, n, used))
              } else None
            }
          state.update(used)
          admitted.iterator
      }
  }
}
