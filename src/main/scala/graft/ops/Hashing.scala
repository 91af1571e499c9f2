package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-hash change detection (SURVEY.md §2.7 sha2 row).
  *
  * Reference semantics (`medallion/silver/b2s_yfinance.py:103-112`):
  * `sha2(concat_ws("||", tracked.cast(string)), 256)`. Note `concat_ws`
  * *skips* nulls, so ("x", null) and (null, "x") collide across adjacent
  * tracked columns — kept for parity; `strict = true` substitutes a
  * per-column null sentinel to restore injectivity (SURVEY.md §7.4).
  */
object Hashing {

  def rowHashCol(tracked: Seq[String], strict: Boolean = false): Column = {
    val parts: Seq[Column] =
      if (strict) tracked.map(c => coalesce(col(c).cast("string"), lit("\u0000" + c + "\u0000")))
      else tracked.map(col(_).cast("string"))
    sha2(concat_ws("||", parts: _*), 256)
  }

  def withRowHash(df: DataFrame, tracked: Seq[String],
      as: String = "row_hash", strict: Boolean = false): DataFrame =
    df.withColumn(as, rowHashCol(tracked, strict))
}
