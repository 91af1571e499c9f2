package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus mixture construction: deterministic sampling of documents per
  * source up to a token budget — how a training run draws "x% web, y%
  * code, z% papers" from a curated lake without materializing a shuffle
  * of the whole corpus.
  *
  * Selection is by deterministic pseudo-random priority (a multiplicative
  * hash of doc_id), so the sample is reproducible run-over-run and
  * engine-independent — no `rand()`, which would break both the oracle
  * and any resumable-ingest story.
  *
  * Scale design (100 TB): the exact form below runs one window sort per
  * source shard (sources partition the sort — no global ordering). At
  * real corpus scale you run the same selection as a two-pass threshold:
  * (1) approximate the per-source priority cutoff from a sample
  * (`percentile_approx` of priority weighted by tokens), (2) filter
  * `priority <= cutoff` — a scan-only plan with no window at all; the
  * exact window form remains the per-shard tiebreak inside the cutoff
  * bucket. [[MixtureSpec]] asserts the two agree within sampling error.
  */
object Mixture {

  /** Knuth's multiplicative-hash constant mod the TextKit prime — cheap,
    * order-destroying, and identical arithmetic in DuckDB. */
  def priority(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (id * lit(2654435761L)) % lit(TextKit.P)

  /** Per-source token-budget sample: walk each source's docs in
    * (priority, doc_id) order, keep docs while the running token total
    * stays within `budgetPerSource`. Emits the kept docs with their
    * selection bookkeeping (n_tokens, priority, cum_tokens). */
  def tokenBudgetMix(docs: DataFrame, budgetPerSource: Long): DataFrame = {
    val w = Window.partitionBy("source").orderBy("priority", "doc_id")
    docs
      .select(col("doc_id"), col("source"),
        size(TextKit.words(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("priority", priority(col("doc_id")))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerSource)
      .select("doc_id", "source", "n_tokens", "priority", "cum_tokens")
  }

  /** The scan-only scale path: selection by a precomputed per-source
    * priority cutoff (no window). Used with a cutoff estimated from a
    * sample; exactness at the boundary is traded for a plan that is pure
    * filter-after-scan. */
  def thresholdMix(docs: DataFrame, cutoffs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        size(TextKit.words(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("priority", priority(col("doc_id")))
      .join(broadcast(cutoffs), Seq("source"))
      .filter(col("priority") <= col("cutoff"))
      .select("doc_id", "source", "n_tokens", "priority")
}
