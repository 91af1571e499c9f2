package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column-level lineage: for every output column of a frame, the set of
  * `(source, column)` leaves it derives from, computed by folding the
  * ANALYZED logical plan's attribute graph — the engine-side half of
  * what a lakehouse governance catalog surfaces as column lineage.
  *
  * Derivation is value-flow, not provenance-of-presence: columns that
  * only steer the computation (join keys, filter predicates, grouping
  * keys that are not projected) do not taint unrelated outputs — an
  * output depends on exactly the leaf columns its expression tree
  * reads, resolved through aliases, aggregates, windows, generators,
  * and unions. Works on the analyzed plan (before optimization) so
  * lineage reflects the query as WRITTEN, not the rewritten plan the
  * optimizer chose (an MV rewrite must not change reported lineage).
  *
  * Sources are named by catalog table when the scan has one, else the
  * file path's last segment (`lineitem.parquet`), else the DSv2 table
  * name, else `inline` for local relations.
  */
object Lineage {

  /** Output column name → set of (source, column) leaves. Output names
    * repeat only if the frame has duplicate column names (possible
    * post-join); in that case later duplicates win — select/alias first
    * for per-occurrence lineage. */
  def columnLineage(df: DataFrame): Map[String, Set[(String, String)]] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan, Map.empty)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty)).toMap
  }

  /** Positional lineage of each CTE definition's output, keyed by cte id. */
  private type CteEnv = Map[Long, Seq[Set[(String, String)]]]

  private def sourceName(l: LeafNode): String = l match {
    case r: LogicalRelation =>
      r.catalogTable.map(_.identifier.unquotedString).getOrElse {
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(_.getName).getOrElse("file")
          case other => other.getClass.getSimpleName
        }
      }
    case r: DataSourceV2Relation => r.table.name()
    case _: LocalRelation => "inline"
    case _: Range => "range"
    case other => other.nodeName
  }

  /** Fold the plan bottom-up into exprId → leaf set. The map carries
    * EVERY attribute seen anywhere in the subtree (not just the root's
    * output), so references resolve across joins and nesting. */
  private def build(plan: LogicalPlan, ctes: CteEnv)
      : Map[ExprId, Set[(String, String)]] =
    plan match {
      case w: WithCTE =>
        // resolve defs first (later defs may reference earlier ones),
        // then fold the main plan with the env; a CTE's body exprIds are
        // NOT shared with its refs, so positional mapping is required
        val env = w.cteDefs.foldLeft(ctes) { (acc, d) =>
          val m = build(d.child, acc)
          acc + (d.id ->
            d.child.output.map(a => m.getOrElse(a.exprId, Set.empty)))
        }
        build(w.plan, env)

      case r: CTERelationRef =>
        ctes.get(r.cteId) match {
          case Some(sets) =>
            r.output.zip(sets).map { case (a, s) => a.exprId -> s }.toMap
          case None => // recursive self-reference or unresolved: opaque
            r.output.map(a => a.exprId -> Set("cte" -> a.name)).toMap
        }

      case l: LeafNode =>
        val src = sourceName(l)
        l.output.map(a => a.exprId -> Set(src -> a.name)).toMap

      case u: Union =>
        val childMaps = u.children.map(build(_, ctes))
        val merged = childMaps.reduce(_ ++ _)
        // each union output column derives from that position in EVERY
        // branch
        merged ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty)
          }.toSet
        }.toMap

      case p =>
        val childMap =
          p.children.map(build(_, ctes)).foldLeft(
            Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
        def refs(e: org.apache.spark.sql.catalyst.expressions.Expression)
            : Set[(String, String)] =
          e.references.iterator.flatMap(a => childMap.get(a.exprId))
            .flatten.toSet
        val fresh: Map[ExprId, Set[(String, String)]] = p match {
          case g: Generate =>
            // generator outputs (explode/posexplode/stack cols) derive
            // from the generator expression's inputs
            g.generatorOutput.map(a => a.exprId -> refs(g.generator)).toMap
          case _ =>
            // any Alias introduced at this node (Project, Aggregate,
            // Window expressions) binds a new exprId to its tree's refs
            p.expressions.flatMap(_.collect {
              case al: Alias => al.exprId -> refs(al.child)
            }).toMap
        }
        childMap ++ fresh
    }
}
