package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions injector: registers the engine's native SQL
  * functions. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (done by `core.Sessions`, `Verify` and `Bench`), or at runtime via
  * [[GraftExtensions.register]] for an externally-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(PolyHash.registration)
  }
}

object GraftExtensions {
  /** Post-hoc registration on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      PolyHash.registration._1, PolyHash.registration._2, PolyHash.registration._3)
}
