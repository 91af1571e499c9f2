package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Plan-time reader of the catalog's `_ndv_summary.json` sidecar — the
  * shared estimation substrate for the statistics-driven rules
  * ([[NdvBroadcastRule]], [[NdvJoinOrderRule]]). Everything here is
  * driver-side metadata work: the summary is one tiny JSON per table
  * version (written by [[graft.core.TableCatalog.analyzeNdv]]), parsed
  * once and cached by (path, mtime) — zero Spark jobs at plan time.
  *
  * Estimators (textbook System-R assumptions, stated so the margins the
  * consuming rules apply are legible):
  *  - equality conjunct `col = lit`      → selectivity 1/ndv(col)
  *  - range conjunct over a covered col  → interval fraction of
  *    [lo, hi] under a uniform-value assumption (dates compare as
  *    epoch days — the same scale `analyzeNdv` wrote)
  *  - conjuncts the sidecar cannot see   → selectivity 1 (conservative:
  *    estimates only ever err toward "bigger than reality")
  */
private[plans] object NdvStats {

  case class Summary(nRows: Long, ndv: Map[String, Double],
      lo: Map[String, Double], hi: Map[String, Double])

  /** Strip column-pruning projects, gather filter conjuncts, land on
    * the relation. Any other node means the side is not a plain
    * filtered scan — callers stay silent. */
  @scala.annotation.tailrec
  def collect(p: LogicalPlan,
      acc: Seq[Expression] = Nil): (Option[LogicalRelation], Seq[Expression]) =
    p match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        collect(child, acc)
      case Filter(cond, child) =>
        collect(child, acc ++ splitConjuncts(cond))
      case lr: LogicalRelation => (Some(lr), acc)
      case _ => (None, acc)
    }

  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The summary for a relation's scan root, when one exists. */
  def summaryFor(rel: LogicalRelation): Option[Summary] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.flatMap(summaryAt)
      case _ => None
    }

  /** Combined selectivity of `conjuncts` against `s` — the product over
    * sidecar-covered equality and range conjuncts; everything else
    * contributes 1. Returns (selectivity, how many conjuncts were
    * actually covered) so callers can demand evidence before acting. */
  def selectivity(conjuncts: Seq[Expression], s: Summary): (Double, Int) = {
    var sel = 1.0
    var covered = 0
    conjuncts.foreach { c =>
      conjunctSelectivity(c, s).foreach { f => sel *= f; covered += 1 }
    }
    (sel, covered)
  }

  private def conjunctSelectivity(c: Expression, s: Summary): Option[Double] =
    c match {
      case EqualTo(a: AttributeReference, _: Literal) => eqSel(a.name, s)
      case EqualTo(_: Literal, a: AttributeReference) => eqSel(a.name, s)
      case GreaterThan(a: AttributeReference, l: Literal) => rangeAbove(a.name, l, s)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => rangeAbove(a.name, l, s)
      case LessThan(a: AttributeReference, l: Literal) => rangeBelow(a.name, l, s)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => rangeBelow(a.name, l, s)
      case GreaterThan(l: Literal, a: AttributeReference) => rangeBelow(a.name, l, s)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => rangeBelow(a.name, l, s)
      case LessThan(l: Literal, a: AttributeReference) => rangeAbove(a.name, l, s)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => rangeAbove(a.name, l, s)
      case _ => None
    }

  private def eqSel(col: String, s: Summary): Option[Double] =
    s.ndv.get(col).filter(_ > 1.0).map(1.0 / _)

  /** Fraction of [lo, hi] above `l` (open/closed collapsed — the
    * continuous approximation a width estimate warrants). */
  private def rangeAbove(col: String, l: Literal, s: Summary): Option[Double] =
    for {
      lo <- s.lo.get(col); hi <- s.hi.get(col) if hi > lo
      v <- litToDouble(l)
    } yield clamp((hi - v) / (hi - lo))

  private def rangeBelow(col: String, l: Literal, s: Summary): Option[Double] =
    for {
      lo <- s.lo.get(col); hi <- s.hi.get(col) if hi > lo
      v <- litToDouble(l)
    } yield clamp((v - lo) / (hi - lo))

  private def clamp(x: Double): Double = math.max(0.0, math.min(1.0, x))

  /** Literal → the numeric scale the summary's lo/hi use. DateType
    * literals carry epoch days internally — exactly what `analyzeNdv`
    * wrote via unix_date. Strings and other types: not estimable. */
  def litToDouble(l: Literal): Option[Double] = (l.value, l.dataType) match {
    case (null, _) => None
    case (v: Byte, _) => Some(v.toDouble)
    case (v: Short, _) => Some(v.toDouble)
    case (v: Int, _) => Some(v.toDouble)         // covers DateType (epoch days)
    case (v: Long, _) => Some(v.toDouble)
    case (v: Float, _) => Some(v.toDouble)
    case (v: Double, _) => Some(v)
    case (v: org.apache.spark.sql.types.Decimal, _) => Some(v.toDouble)
    case _ => None
  }

  // (summary path, mtime) → parsed summary; mtime keying makes a new
  // version's sidecar take effect without session restart.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Summary]()

  private def summaryAt(root: org.apache.hadoop.fs.Path): Option[Summary] = {
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

  /** Parse {"n_rows": N, "ndv": {...}, "lo": {...}, "hi": {...}} —
    * lo/hi are optional (pre-range-stats summaries parse fine). json4s
    * ships with Spark, no extra dependency. */
  private def parse(s: String): Option[Summary] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val j = JsonMethods.parse(s)
      val n = j \ "n_rows" match {
        case JInt(v) => v.toLong
        case JLong(v) => v
        case _ => return None
      }
      def numMap(field: String): Map[String, Double] = j \ field match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
          case (k, JLong(v)) => k -> v.toDouble
          case (k, JDecimal(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
      Some(Summary(n, numMap("ndv"), numMap("lo"), numMap("hi")))
    } catch { case scala.util.control.NonFatal(_) => None }
}
