package graft.scd

import graft.core.TableCatalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped SCD2 through the catalog — the 100 TB shape of the
  * merge (SURVEY.md §7.4 names full-target rewrite as the scale risk).
  *
  * The target is partitioned by a stable hash bucket of the business key
  * (`pmod(hash(keys…), nBuckets)`), so every version of a key lives in
  * one partition. A merge then:
  *
  *  1. derives the touched bucket set from the source (tiny driver list,
  *     ≤ nBuckets values — NOT a data collect);
  *  2. reads ONLY those partitions of the target (partition pruning does
  *     the skipping — `explain` shows `PartitionFilters`);
  *  3. runs the ordinary in-memory [[Scd2.merge]] on that slice;
  *  4. writes just the merged partitions; untouched partitions carry over
  *     into the new table version as hardlinks
  *     ([[TableCatalog.overwritePartitions]]).
  *
  * Cost scales with touched keys (≈ source batch size), not table size —
  * a daily batch touching 0.1% of keys rewrites ~0.1% of the data.
  */
class ScopedScd2(
    keys: Seq[String],
    tracked: Seq[String],
    cols: ScdColumns = ScdColumns(),
    clock: graft.core.Clock = graft.core.Clock.Wall,
    nBuckets: Int = 256,
    bucketCol: String = "key_bucket") extends Serializable {

  private val scd2 = new Scd2(keys, tracked, cols, clock)

  def bucketExpr: Column = pmod(hash(keys.map(col): _*), lit(nBuckets))

  /** Initialize-or-merge `name` through the catalog, partition-scoped. */
  def apply(spark: SparkSession, cat: TableCatalog, name: String,
      source: DataFrame): Unit = {
    val src = source.withColumn(bucketCol, bucketExpr)
    if (!cat.exists(name)) {
      cat.overwrite(scd2.initialize(src), name, partitionBy = Seq(bucketCol))
    } else {
      val touched = src.select(bucketCol).distinct()
        .collect().map(_.get(0)).toSeq // bounded by nBuckets, not data size
      val targetSlice = cat.read(spark, name)
        .filter(col(bucketCol).isin(touched: _*)) // partition-pruned scan
      val merged = scd2.merge(targetSlice, src)
      cat.overwritePartitions(merged, name, bucketCol, touched)
    }
  }
}
