package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized-view rollup rewrite — summary-table redirection as a
  * Catalyst optimizer rule (`injectOptimizerRule` via
  * [[graft.functions.GraftExtensions]]; the last SparkSessionExtensions
  * injection point the engine had not exercised).
  *
  * The reference pipeline materializes its gold marts by hand and points
  * consumers at them (gold notebooks write `gold_*` tables; dashboards
  * read those, never the silver base — e.g.
  * `databricks/s2g_company_house.py`). The engine form of that contract
  * is transparent: consumers keep querying the BASE table, and the
  * optimizer redirects any aggregate derivable from a registered summary
  * to the (orders-of-magnitude smaller) summary scan. At 100 TB this is
  * the difference between re-scanning the fact for every dashboard
  * rollup and reading a few thousand pre-aggregated rows: the rewrite
  * turns an O(fact) scan + shuffle into an O(summary) scan + rollup,
  * and the partial-aggregate algebra (below) is exactly the map-side
  * combine the engine already trusts.
  *
  * Soundness: a grouped aggregate is derivable from a summary grouped on
  * a SUPERSET of its keys when every measure re-aggregates from partial
  * state — SUM(x) = SUM(sum_x), COUNT(*) = SUM(cnt), MIN(x) =
  * MIN(min_x), MAX(x) = MAX(max_x) (sum/count/min/max are the reference
  * pipeline's whole aggregate vocabulary, SURVEY §2.4). The rule
  * rewrites ONLY when: the aggregate's child scans the registered base
  * path (bare or under a column-pruning Project), every grouping key is
  * a plain column of the summary's grouping set, every aggregate is a
  * non-distinct, unfiltered sum/count/min/max whose input expression is
  * canonically identical to a registered measure, and no filter sits
  * between scan and aggregate (a WHERE would need containment reasoning
  * the v1 rule does not claim). Anything else leaves the plan untouched
  * — MvRewriteSpec pins both the hit and every miss class.
  *
  * Output identity: the rewritten Aggregate re-aliases its outputs under
  * the ORIGINAL expression ids, so parents resolve unchanged; result
  * types are cast back to the original aggregate's type (re-aggregated
  * decimal sums widen by Spark's sum-typing rules; the cast restores the
  * declared schema — values are exact either way). Matching happens on
  * `Expression.sql` canonical text, which is stable across sessions for
  * column refs and casts and never captures expression ids.
  */
object MaterializedViews {

  /** How one summary column re-aggregates. `inputSql` is the canonical
    * SQL of the base-side aggregate input it pre-aggregates. */
  final case class Measure(kind: String, inputSql: String, mvCol: String)

  /** A registered summary: scans of `basePath` may rewrite to `mvPath`. */
  final case class MvDef(basePath: String, mvPath: String,
                         groupCols: Seq[String], measures: Seq[Measure])

  private val defs = new java.util.concurrent.CopyOnWriteArrayList[MvDef]()

  def register(d: MvDef): Unit = if (!defs.contains(d)) defs.add(d)
  def clear(): Unit = defs.clear()
  def registered: Seq[MvDef] = defs.asScala.toSeq

  /** Base paths whose rebuild is in flight. A rebuild's own aggregate
    * over the base MUST NOT be redirected to the (stale) summary it is
    * replacing — create() re-creating a registered def would otherwise
    * read the old summary and write it straight back, and refresh()
    * would double-count a batch that happens to scan the base path. */
  private val rebuilding = new java.util.concurrent.CopyOnWriteArraySet[String]()

  private[plans] def isRebuilding(basePath: String): Boolean =
    rebuilding.asScala.exists(p => pathsMatch(p, basePath))

  private def withRebuildGuard[T](basePath: String)(f: => T): T = {
    rebuilding.add(basePath)
    try f finally rebuilding.remove(basePath)
  }

  /** Compare ignoring scheme prefixes (file: vs plain local paths). */
  private[plans] def pathsMatch(a: String, b: String): Boolean = {
    def norm(s: String) = s.stripPrefix("file:").replaceAll("/+", "/")
    norm(a) == norm(b)
  }

  /** Build + persist the summary table for `basePath` grouped by
    * `groupCols`, then register it for rewriting. `sums`/`mins`/`maxs`
    * list base-side input expressions; a row count is always included.
    * Returns the MvDef. Deterministic for a fixed base (exact-decimal or
    * order-insensitive partials only). */
  def create(spark: SparkSession, basePath: String, mvPath: String,
             groupCols: Seq[String], sums: Seq[Column] = Nil,
             mins: Seq[Column] = Nil, maxs: Seq[Column] = Nil): MvDef = {
    val base = spark.read.parquet(basePath)
    def sqlOf(c: Column): String =
      base.select(c).queryExecution.analyzed.asInstanceOf[Project]
        .projectList.head match {
          case Alias(child, _) => child.sql
          case e => e.sql
        }
    val sumMs = sums.zipWithIndex.map { case (c, i) => Measure("sum", sqlOf(c), s"mv_sum_$i") }
    val minMs = mins.zipWithIndex.map { case (c, i) => Measure("min", sqlOf(c), s"mv_min_$i") }
    val maxMs = maxs.zipWithIndex.map { case (c, i) => Measure("max", sqlOf(c), s"mv_max_$i") }
    val cnt = Measure("count", "", "mv_cnt")
    val aggs =
      sums.zip(sumMs).map { case (c, m) => sum(c).as(m.mvCol) } ++
      mins.zip(minMs).map { case (c, m) => min(c).as(m.mvCol) } ++
      maxs.zip(maxMs).map { case (c, m) => max(c).as(m.mvCol) } :+
      count(lit(1)).as(cnt.mvCol)
    withRebuildGuard(basePath) {
      base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(mvPath)
    }
    val d = MvDef(basePath, mvPath, groupCols, sumMs ++ minMs ++ maxMs :+ cnt)
    register(d)
    d
  }

  /** Incremental maintenance: fold a new base batch into the summary
    * without re-scanning the base — union the batch's partial aggregate
    * with the current summary and re-combine with the same partial
    * algebra the rewrite uses (sum+sum, min of mins, max of maxs,
    * cnt+cnt). O(|batch| + |summary|), never O(|base|). */
  def refresh(spark: SparkSession, d: MvDef, batch: DataFrame): Unit = {
    val cur = spark.read.parquet(d.mvPath)
    val base = spark.read.parquet(d.basePath)
    // Rebuild the batch's partial aggregate with the registered measure
    // expressions, re-resolved against the batch (same schema as base).
    def inputCol(m: Measure): Column = expr(m.inputSql)
    // name+type equality; nullability may differ between a parquet-backed
    // base and an in-flight batch (e.g. a streaming source's non-null cols)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(batch.schema) == shape(base.schema),
      s"refresh batch schema must match base: ${batch.schema} vs ${base.schema}")
    val aggs = d.measures.map {
      case m if m.kind == "sum" => sum(inputCol(m)).as(m.mvCol)
      case m if m.kind == "min" => min(inputCol(m)).as(m.mvCol)
      case m if m.kind == "max" => max(inputCol(m)).as(m.mvCol)
      case m => count(lit(1)).as(m.mvCol)
    }
    val part = batch.groupBy(d.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      // align partial types with the persisted summary (decimal sum
      // widening differs between one- and two-level aggregation)
      .select(cur.schema.fieldNames.map { f =>
        col(f).cast(cur.schema(f).dataType).as(f) }.toSeq: _*)
    val combine = d.measures.map {
      case m if m.kind == "sum" => sum(col(m.mvCol)).cast(cur.schema(m.mvCol).dataType).as(m.mvCol)
      case m if m.kind == "min" => min(col(m.mvCol)).as(m.mvCol)
      case m if m.kind == "max" => max(col(m.mvCol)).as(m.mvCol)
      case m => sum(col(m.mvCol)).cast("long").as(m.mvCol)
    }
    val next = cur.unionByName(part)
      .groupBy(d.groupCols.map(col): _*).agg(combine.head, combine.tail: _*)
    // Stage the new summary, then swap via the Hadoop FS API (works on
    // any supported filesystem, not just local) with every rename
    // checked: the current summary is only deleted AFTER the staged one
    // has successfully taken its place, so no failure mode destroys it.
    val tmpPath = new org.apache.hadoop.fs.Path(d.mvPath + ".next")
    val mvP = new org.apache.hadoop.fs.Path(d.mvPath)
    val stale = new org.apache.hadoop.fs.Path(d.mvPath + ".stale")
    withRebuildGuard(d.basePath) {
      next.write.mode("overwrite").parquet(tmpPath.toString)
    }
    val hfs = mvP.getFileSystem(spark.sessionState.newHadoopConf())
    if (hfs.exists(stale)) hfs.delete(stale, true)
    require(hfs.rename(mvP, stale), s"refresh: could not stage out $mvP")
    if (!hfs.rename(tmpPath, mvP)) {
      hfs.rename(stale, mvP) // restore; summary is intact either way
      sys.error(s"refresh: could not swap $tmpPath into place at $mvP")
    }
    hfs.delete(stale, true)
  }
}

/** The rewrite rule. Injected per session; consults the global registry
  * so registration can happen after session construction (the driver's
  * Verify/Bench sessions are built once, queries register later). */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import MaterializedViews._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registered.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** The scanned root path when the plan is a bare parquet relation or a
    * column-pruning Project over one. */
  private def scanPath(p: LogicalPlan): Option[String] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(child)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val path = scanPath(agg.child).getOrElse(return None)
    val d = registered.find(d => MaterializedViews.pathsMatch(path, d.basePath))
      .getOrElse(return None)
    // Never rewrite the rebuild's own base aggregate to the summary it
    // is replacing (create()/refresh() in flight for this base).
    if (MaterializedViews.isRebuilding(d.basePath)) return None
    // every grouping expression must be a plain summary grouping column
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) => a.name
      case _ => return None
    }
    val mv = spark.read.parquet(d.mvPath)
    val mvPlan = mv.queryExecution.analyzed
    val mvAttr: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap

    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val partial: Option[(String, Expression)] = ae.aggregateFunction match {
        case Sum(e, mode) =>
          d.measures.find(m => m.kind == "sum" && m.inputSql == e.sql)
            .map(m => "sum" -> Sum(mvAttr(m.mvCol), mode).toAggregateExpression())
        case Count(Seq(Literal(_, _))) | Count(Nil) =>
          // COUNT over zero rows is 0, but SUM(mv_cnt) over an empty
          // summary is NULL — coalesce restores count semantics for the
          // global-aggregate (no GROUP BY) case; grouped rewrites never
          // see an empty group so the coalesce is inert there.
          d.measures.find(_.kind == "count")
            .map(m => "count" -> Coalesce(Seq(
              Sum(mvAttr(m.mvCol)).toAggregateExpression(), Literal(0L))))
        case Min(e) =>
          d.measures.find(m => m.kind == "min" && m.inputSql == e.sql)
            .map(m => "min" -> Min(mvAttr(m.mvCol)).toAggregateExpression())
        case Max(e) =>
          d.measures.find(m => m.kind == "max" && m.inputSql == e.sql)
            .map(m => "max" -> Max(mvAttr(m.mvCol)).toAggregateExpression())
        case _ => None
      }
      partial.map { case (_, rewritten) =>
        if (rewritten.dataType == ae.dataType) rewritten
        else Cast(rewritten, ae.dataType)
      }
    }

    // Rewrite a full output expression: aggregate leaves go through the
    // partial-state mapping, surviving column refs must be grouping keys
    // (mapped to the summary's attributes), and any deterministic scalar
    // wrapper (casts, arithmetic over the aggregates) is preserved as-is.
    def rw(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAgg(ae)
      case a: AttributeReference =>
        if (groupNames.contains(a.name)) Some(mvAttr(a.name)) else None
      case other =>
        val kids = other.children.map(rw)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(childE, name) =>
        Alias(rw(childE).getOrElse(return None), name)(exprId = al.exprId)
      case _ => return None
    }
    val newGrouping: Seq[Expression] = groupNames.map(mvAttr(_))
    logInfo(s"graft MV rewrite: aggregate over $path -> summary ${d.mvPath}")
    Some(Aggregate(newGrouping, newResult, mvPlan))
  }
}
