package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate for top-k selection. */
case class ScoredId(id: Long, score: Double)

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`, SURVEY.md §2.9's "genuine
  * custom aggregator" surface): bounded top-k by (score DESC, id ASC).
  *
  * Scale rationale vs the window formulation
  * ([[graft.ext.Similarity.bruteForceTopK]] uses
  * `row_number() OVER (PARTITION BY q ORDER BY score)`): the window sorts
  * the FULL candidate set per group after shuffling all of it; this
  * aggregator is a partial aggregate — every map task reduces its slice
  * of a group to ≤ k pairs before the exchange, so the shuffle carries
  * O(k × groups × partitions) rows instead of O(candidates), and merge
  * is O(k). At 100 TB of scored pairs that is the difference between a
  * bounded shuffle and a full-data sort.
  *
  * Selection only — no float arithmetic — so results are bit-identical
  * to the sort-based form (ties broken by id), merge order irrelevant.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  // Spark's SQL double ordering: NaN sorts greatest, -0.0 equals 0.0 —
  // `>` alone would disagree on both and break bit-identity with the
  // window-sort formulation.
  private def sqlNorm(s: Double): Double = if (s == 0.0) 0.0 else s
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(sqlNorm(a.score), sqlNorm(b.score))
    c > 0 || (c == 0 && a.id < b.id)
  }
  private def trim(s: Seq[ScoredId]): Seq[ScoredId] =
    if (s.length <= k) s else s.sortWith(better).take(k)

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    if (buf.length < k) buf :+ in
    else {
      // buf is full: replace the current worst only if `in` beats it.
      val worst = buf.reduceLeft((a, b) => if (better(a, b)) b else a)
      if (better(in, worst)) trim(buf :+ in) else buf
    }
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = trim(a ++ b)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf.sortWith(better)

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
