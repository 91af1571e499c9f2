package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev diagnosis for d_semantic_keep at scale: stage walls through the
  * semanticNearDupPairs pipeline (candidate gen+verify vs the CC loop),
  * calling the production operators. Round-10 artifact: this probe
  * found both the stats-compounding driver burn (fixed in
  * Bridge.capCheckpointStats) and the 30-round convergence-cap trip on
  * the 100x near-forest (fixed by pointer jumping + cap 100). */
object SemKeepDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Similarity, Dedup}
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val res = f
      println(f"[stage] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      res
    }
    val e = graft.queries.Extensions.emb(spark, dir)
    val pairs = t("pairs") {
      val p = Similarity.semanticNearDupPairs(e, 0.4).localCheckpoint()
      println("[n] pairs=" + p.count()); p
    }
    t("cc")(println("[n] labeled=" + Dedup.duplicateClusters(pairs).count()))
    t("full_query")(
      graft.queries.Extensions.semanticKeep(spark, dir)
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
