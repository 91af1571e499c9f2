package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism-pinning repartition.
  *
  * A bare `repartition(col)` is REPARTITION_BY_COL, which AQE's
  * partition coalescing is free to merge back to ONE partition when the
  * shuffled bytes are small — exactly what happens to the barrier
  * shuffles in the expression-heavy dedup/similarity stages (the rows are
  * kilobytes; the *work per row* is what needs spreading). An explicit
  * partition count (REPARTITION_BY_NUM) is exempt from coalescing, so the
  * downstream interpreted-expression stage actually fans out across
  * cores. At real cluster scale the byte sizes are large enough that this
  * distinction vanishes, but pinning is still correct: the cost model
  * here is CPU per row, not bytes.
  */
object Par {
  def spread(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, cols: _*)
}
