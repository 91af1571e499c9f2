package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-quality gates (SURVEY.md §2.2 P5-P6).
  *
  * These are *filters*, not assertions: invalid rows are dropped, matching
  * the reference's operational posture (`README.md:148-155`). All gates are
  * single predicates pushed into the scan by Catalyst — at 100 TB they cost
  * one pass and prune with Parquet min/max stats where possible.
  */
object Quality {

  /** P5 — structural rule: business keys must be non-null.
    * Reference: `medallion/silver/b2s_yfinance.py:80-81`. */
  def requireKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) => d.filter(col(k).isNotNull))

  /** P6 — business rule: every numeric column is null or non-negative,
    * via `try_cast` so uncastable junk fails the gate rather than erroring
    * (`b2s_yfinance.py:86-98`). Detection is on the field's `DataType`
    * itself, not a `simpleString` substring match — `array<int>` /
    * `struct<x:int>` columns must not be swept into a scalar cast. */
  def nonNegativeNumerics(df: DataFrame): DataFrame = {
    val numericCols = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType])
      .map(_.name)
    numericCols.foldLeft(df) { (d, c) =>
      d.filter(col(c).isNull || expr(s"try_cast(`$c` as double)") >= 0)
    }
  }

  /** Column profile: one row per column with row/null/distinct counts and
    * type-appropriate min/max — the "what landed in this table" report a
    * quality dashboard runs after every load. Numerics and timestamps
    * report (min_num, max_num) as doubles (timestamps as floored epoch
    * seconds); strings report (min_str, max_str); each family leaves the
    * other's columns null.
    *
    * Execution: two aggregation passes, both hash-friendly. Pass 1 is a
    * keys-free single-row aggregate (counts + min/max — no grouping
    * keys, so the string min/max buffers never force a sort). Pass 2
    * computes ALL per-column distinct counts from one tall
    * (column, value) projection: explode → distinct → count per column,
    * which hash-aggregates with map-side partial dedup. The naive
    * alternative — one agg with N countDistincts — plans as a
    * multi-distinct Expand whose string-buffered aggregate degrades to
    * SortAggregate and sorts N× the input on a wide key (measured 4.5 s
    * vs 1 s at sf0.1). At 100 TB the exact distinct counts are still
    * the expensive part; production swaps `approx_count_distinct` (HLL)
    * into the same plan — exact is kept here for oracle parity. */
  def profile(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{StringType, TimestampNTZType, TimestampType}
    val numish: PartialFunction[org.apache.spark.sql.types.DataType, String => org.apache.spark.sql.Column] = {
      case _: NumericType => c => col(c).cast("double")
      // NTZ first casts to the session-zone (UTC) timestamp, so both
      // flavors report the same floored epoch seconds.
      case TimestampType | TimestampNTZType =>
        c => col(c).cast("timestamp").cast("long").cast("double")
    }
    val aggs = df.schema.fields.flatMap { f =>
      val c = f.name
      Seq(count(col(c)).as(s"${c}__notnull")) ++
        (f.dataType match {
          case t if numish.isDefinedAt(t) =>
            val e = numish(t)(c)
            Seq(min(e).as(s"${c}__min_num"), max(e).as(s"${c}__max_num"))
          case StringType =>
            Seq(min(col(c)).as(s"${c}__min_str"), max(col(c)).as(s"${c}__max_str"))
          case _ => Seq.empty
        })
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    // Tall (column, value-as-string) pairs: the string form is injective
    // per type (Spark's canonical repr), so distinct-on-repr ==
    // distinct-on-value, and one shuffle serves every column.
    val kvs = df.schema.fields.map { f =>
      struct(lit(f.name).as("c"), col(f.name).cast("string").as("v"))
    }
    val dist = df.select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.c").as("c"), col("kv.v").as("v"))
      .where(col("v").isNotNull)
      .distinct()
      .groupBy("c").agg(count(lit(1)).as("n_distinct"))
    val rows = df.schema.fields.map { f =>
      val c = f.name
      def opt(suffix: String, tpe: String) =
        if (one.columns.contains(s"${c}__$suffix")) col(s"${c}__$suffix")
        else lit(null).cast(tpe)
      struct(
        lit(c).as("column"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"${c}__notnull")).as("n_nulls"),
        opt("min_num", "double").as("min_num"),
        opt("max_num", "double").as("max_num"),
        opt("min_str", "string").as("min_str"),
        opt("max_str", "string").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .join(dist, col("column") === col("c"))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"))
  }

  /** Zero-extra-pass pipeline observability (`Dataset.observe` /
    * `CollectMetricsExec`): attach named aggregate metrics to a
    * dataframe so they are computed AS THE JOB RUNS — row counts, null
    * counts, value sums ride the existing scan instead of a second
    * `count()` pass over 100 TB (the way a naive post-write audit would
    * do it). Returns the instrumented frame and the [[Observation]]
    * handle; read `obs.get` after any action on the frame completes.
    *
    * The metric set is the write-audit trio every layer transition
    * wants: volume (n_rows), key completeness (null count per key
    * column), and a drift-sensitive checksum (sum of a numeric col). */
  def observed(df: DataFrame, name: String, keyCols: Seq[String],
      sumCol: Option[String] = None)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics =
      count(lit(1)).as("n_rows") +:
        (keyCols.map(k => count(when(col(k).isNull, 1)).as(s"n_null_$k")) ++
          sumCol.map(c => sum(col(c).cast("decimal(28,6)")).as(s"sum_$c")))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
