package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * via `try_cast` so uncastable junk fails the gate rather than erroring.
    * Numeric columns are discovered from the schema exactly as the
    * reference does from `field.dataType.simpleString()`
    * (`b2s_yfinance.py:86-98`). */
  def nonNegativeNumerics(df: DataFrame): DataFrame = {
    val numericTypes = Seq("int", "bigint", "double", "float", "decimal")
    val numericCols = df.schema.fields
      .filter(f => numericTypes.exists(f.dataType.simpleString.contains))
      .map(_.name)
    numericCols.foldLeft(df) { (d, c) =>
      d.filter(col(c).isNull || expr(s"try_cast(`$c` as double)") >= 0)
    }
  }
}
