package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Statistics-driven broadcast planning from the catalog's `_ndv`
  * sidecar ([[graft.core.TableCatalog.analyzeNdv]]) — the missing half
  * of a cost-based optimizer that size-only planning cannot express:
  *
  * Spark's own broadcast decision uses `sizeInBytes`, and a `Filter`
  * does not shrink it (non-CBO `SizeInBytesOnlyStatsPlanVisitor` passes
  * the child size through). So `fact ⋈ dim.filter(status = 'F')` keeps
  * the dim's FULL file size in the estimate, and a dim bigger than the
  * broadcast threshold shuffle-joins even when the filter keeps 1/NDV
  * of it. ANALYZE-style statistics fix exactly this: with the sidecar's
  * exact row count and merged-HLL distinct counts, an equality
  * conjunct's selectivity is 1/ndv(col), the filtered size is
  * sizeInBytes × Π selectivities, and a side that fits under the
  * threshold gets a BROADCAST join hint — at 100 TB the difference
  * between shuffling the fact and not moving it at all.
  *
  * Scope and safety: fires only on [Project*] → Filter → parquet
  * relation chains whose scan root carries `_ndv_summary.json` (written
  * by `analyzeNdv`, version-scoped — a stale layout simply has no file
  * and the rule stays silent), only for `col = literal` conjuncts over
  * sidecar-covered columns, and never overrides an existing user hint.
  * The estimate errs conservative: non-equality conjuncts contribute no
  * selectivity. The summary is parsed driver-side (tiny JSON, cached by
  * (path, mtime)) — zero Spark jobs at plan time. Join-side legality
  * stays the planner's call: a BROADCAST hint on an ineligible side is
  * ignored by JoinSelection, never forced.
  *
  * Threshold: `spark.graft.ndv.broadcastThreshold` bytes (default 10 MB;
  * ≤ 0 disables) — deliberately independent of
  * `spark.sql.autoBroadcastJoinThreshold`, so statistics-driven
  * broadcast still works when size-based auto-broadcast is off.
  */
case class NdvBroadcastRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val thresholdKey = "spark.graft.ndv.broadcastThreshold"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold =
      try spark.conf.get(thresholdKey, (10L * 1024 * 1024).toString).toLong
      catch { case _: NumberFormatException => return plan }
    if (threshold <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, _, _, hint) =>
        val lh = hint.leftHint.orElse(
          if (fitsBroadcast(l, threshold)) Some(HintInfo(Some(BROADCAST)))
          else None)
        val rh = hint.rightHint.orElse(
          if (fitsBroadcast(r, threshold)) Some(HintInfo(Some(BROADCAST)))
          else None)
        if ((lh ne hint.leftHint) && lh.isDefined ||
            (rh ne hint.rightHint) && rh.isDefined)
          j.copy(hint = JoinHint(lh.orElse(hint.leftHint),
            rh.orElse(hint.rightHint)))
        else j
    }
  }

  /** Post-filter size estimate from the sidecar, when the side is a
    * filtered scan of an analyzed table and at least one equality
    * conjunct is sidecar-covered. */
  private def fitsBroadcast(side: LogicalPlan, threshold: Long): Boolean = {
    val (rel, conjuncts) = collect(side, Nil) match {
      case (Some(lr), cs) if cs.nonEmpty => (lr, cs)
      case _ => return false
    }
    val root = rel.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.headOption match {
        case Some(p) => p
        case None => return false
      }
      case _ => return false
    }
    val summary = NdvBroadcastRule.summaryFor(root, spark) match {
      case Some(s) => s
      case None => return false
    }
    val sels = conjuncts.flatMap {
      case EqualTo(a: AttributeReference, _: Literal) => summary.ndv.get(a.name)
      case EqualTo(_: Literal, a: AttributeReference) => summary.ndv.get(a.name)
      case _ => None
    }.filter(_ > 1.0)
    if (sels.isEmpty || summary.nRows <= 0) return false
    val sel = sels.map(1.0 / _).product
    val estBytes = rel.stats.sizeInBytes.toDouble * sel
    estBytes <= threshold
  }

  /** Strip column-pruning projects, gather filter conjuncts, land on the
    * relation. Any other node means the side is not a plain filtered
    * scan — stay silent. */
  @scala.annotation.tailrec
  private def collect(p: LogicalPlan,
      acc: Seq[Expression]): (Option[LogicalRelation], Seq[Expression]) =
    p match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        collect(child, acc)
      case Filter(cond, child) =>
        collect(child, acc ++ splitConjuncts(cond))
      case lr: LogicalRelation => (Some(lr), acc)
      case _ => (None, acc)
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}

object NdvBroadcastRule {
  private case class Summary(nRows: Long, ndv: Map[String, Double])

  // (summary path, mtime) → parsed summary; mtime keying makes a new
  // version's sidecar take effect without session restart.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Summary]()

  private def summaryFor(root: org.apache.hadoop.fs.Path,
      spark: SparkSession): Option[Summary] = {
    // Local-path fast check first (the engine's catalog is path-based);
    // fall back through the Hadoop FS API for non-local roots.
    val f = new java.io.File(root.toUri.getPath, "_ndv_summary.json")
    if (!f.isFile) return None
    val key = (f.getAbsolutePath, f.lastModified())
    Option(cache.get(key)).orElse {
      val parsed = parse(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      parsed.foreach(cache.put(key, _))
      parsed
    }
  }

  /** Parse {"n_rows": N, "ndv": {"col": x, ...}} — json4s ships with
    * Spark, no extra dependency. */
  private def parse(s: String): Option[Summary] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmt: Formats = DefaultFormats
      val j = JsonMethods.parse(s)
      val n = (j \ "n_rows").extract[Long]
      val ndv = (j \ "ndv") match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
          case (k, JDecimal(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty[String, Double]
      }
      Some(Summary(n, ndv))
    } catch { case scala.util.control.NonFatal(_) => None }
}
