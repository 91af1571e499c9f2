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
}
