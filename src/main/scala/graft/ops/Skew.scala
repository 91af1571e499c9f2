package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE (enabled in the session factory) re-splits skewed *join*
  * partitions at runtime, but it does not salt skewed *aggregations* —
  * one hot group key still lands every row on one reducer. These are the
  * manual patterns for that case, deterministic (salt = hash of
  * non-key columns, not rand()) so results are reproducible and
  * oracle-checkable.
  */
object Skew {

  /** One aggregate spec: input column, op in {sum, count, min, max}. */
  case class AggSpec(column: String, op: String, as: String)

  private def saltFor(df: DataFrame, keys: Seq[String], buckets: Int): Column = {
    val others = df.columns.filterNot(keys.contains)
    val basis = if (others.nonEmpty) others.toSeq else keys
    pmod(hash(basis.map(col): _*), lit(buckets))
  }

  /** Two-phase salted aggregation over algebraic aggregates: a hot key's
    * rows split across `buckets` partial groups (map-side + salted
    * shuffle), then partials combine in a second, tiny aggregation.
    * Decimal sums keep exactness through both phases. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      specs: Seq[AggSpec], buckets: Int = 16): DataFrame = {
    require(specs.nonEmpty, "need at least one aggregate")
    val partials = specs.map {
      case AggSpec(c, "sum", as)   => sum(col(c)).as(as)
      case AggSpec(c, "count", as) => count(if (c == "*") lit(1) else col(c)).as(as)
      case AggSpec(c, "min", as)   => min(col(c)).as(as)
      case AggSpec(c, "max", as)   => max(col(c)).as(as)
      case AggSpec(_, op, _)       => throw new IllegalArgumentException(s"op $op")
    }
    val combines = specs.map {
      case AggSpec(_, "sum", as)   => sum(col(as)).as(as)
      case AggSpec(_, "count", as) => sum(col(as)).as(as)
      case AggSpec(_, "min", as)   => min(col(as)).as(as)
      case AggSpec(_, "max", as)   => max(col(as)).as(as)
      case AggSpec(_, op, _)       => throw new IllegalArgumentException(s"op $op")
    }
    df.withColumn("__salt", saltFor(df, keys, buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combines.head, combines.tail: _*)
  }

  /** Salted replicate join for a skewed large ⋈ medium equi-join where
    * the medium side is too big to broadcast: the large side salts each
    * row into one of `buckets`; the medium side replicates ×buckets, one
    * copy per salt value; the join keys become (keys…, salt), so a hot
    * key's rows spread over `buckets` reducers. */
  def saltedJoin(large: DataFrame, medium: DataFrame, keys: Seq[String],
      joinType: String = "inner", buckets: Int = 16): DataFrame = {
    val l = large.withColumn("__salt", saltFor(large, keys, buckets))
    val m = medium.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(m, keys :+ "__salt", joinType).drop("__salt")
  }
}
