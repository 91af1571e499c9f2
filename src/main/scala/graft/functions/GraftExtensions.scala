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
    ext.injectFunction(DotProduct.registration)
    ext.injectFunction(InterleaveBits.registration)
    ext.injectFunction(HilbertIndex.registration)
    ext.injectFunction(MinHashSig.registration)
    ext.injectFunction(SimHashSig.registration)
    ext.injectFunction(GramHashes.registration)
    ext.injectFunction(WordShingles.registration)
    ext.injectFunction(LshBucket.registration)
    ext.injectFunction(AdcScore.registration)
    ext.injectFunction(SlidingMin.registration)
    ext.injectFunction(KmvSketch.registration)
    ext.injectFunction(CmsSketch.registration)
    ext.injectFunction(HllSketch.registration)
    ext.injectFunction(JaroWinkler.registration)
    ext.injectTableFunction(DateSpine.registration)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(graft.plans.MvRewriteRule)
    // Order matters: the reorder rule matches hint-free joins, so it
    // must see the plan before NdvBroadcastRule decorates it — in one
    // fixed-point pass the swap happens first, then the hint lands on
    // the (possibly reordered) shape, and both rules are stable from
    // iteration two on.
    ext.injectOptimizerRule(graft.plans.NdvJoinOrderRule)
    ext.injectOptimizerRule(graft.plans.NdvBroadcastRule)
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  /** Post-hoc registration on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(PolyHash.registration, DotProduct.registration,
        InterleaveBits.registration, HilbertIndex.registration,
        MinHashSig.registration, SimHashSig.registration,
        GramHashes.registration, WordShingles.registration,
        LshBucket.registration, AdcScore.registration,
        SlidingMin.registration,
        KmvSketch.registration, CmsSketch.registration,
        HllSketch.registration, JaroWinkler.registration).foreach { r =>
      reg.registerFunction(r._1, r._2, r._3)
    }
    val treg = spark.sessionState.tableFunctionRegistry
    val t = DateSpine.registration
    treg.registerFunction(t._1, t._2, t._3)
  }
}
