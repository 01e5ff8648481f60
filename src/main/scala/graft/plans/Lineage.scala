package graft.plans

import org.apache.spark.sql.{Dataset, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{AttributeSet, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{CTERelationRef, Expand, Filter, Generate, Join, LeafNode, LogicalPlan, Union, WithCTE}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage: which SOURCE columns feed each output column of
  * a query — the impact-analysis / governance primitive ("if I change
  * lineitem.l_discount, which downstream outputs move?"), derived
  * directly from the analyzed logical plan so it is correct by
  * construction for whatever Catalyst resolved, not a re-parse.
  *
  * Mechanics: every output attribute's transitive input set is computed
  * by walking the plan top-down, expanding each attribute through the
  * node that defines it until only leaf-relation attributes remain:
  * Project/Aggregate/Window aliases via their NamedExpressions, Generate
  * (explode/posexplode) outputs via the generator's inputs, Expand
  * (grouping sets / rollup / cube) outputs via the union of that slot's
  * projections, Union positionally into every branch, and WITH-clause
  * plans through their CTERelationRef indirection (the analyzed-SQL
  * path: `spark.sql("WITH ... ")` keeps refs unresolved-by-reference).
  * An attribute no rule can expand is surfaced as `?.name` rather than
  * silently resolving to an empty set — an impact-analysis primitive
  * must never answer "no inputs" when it means "don't know".
  *
  * Filters and join conditions CONSTRAIN rows rather than feed values,
  * so they are reported separately by [[filterInputs]] — both matter for
  * impact analysis, but conflating them (as naive referenced-column
  * scans do) makes every output appear derived from every predicate
  * column.
  */
object Lineage {

  /** @return output column name → set of "table.column" leaf inputs. */
  def columnLineage(df: Dataset[_]): Map[String, Set[String]] = {
    val plan = GraftBridge.analyzedPlan(df)
    val ctes = cteMap(plan)
    plan.output.map(a =>
      a.name -> leafInputs(plan, AttributeSet(Seq(a)), ctes).map(format)).toMap
  }

  /** Source columns referenced by filters / join conditions anywhere in
    * the plan (the row-constraining inputs). Each predicate resolves
    * from its OWN node, so predicates inside CTE definitions and
    * subqueries trace correctly. */
  def filterInputs(df: Dataset[_]): Set[String] = {
    val plan = GraftBridge.analyzedPlan(df)
    val ctes = cteMap(plan)
    val sites = plan.collect {
      case f: Filter => (f.child, f.condition.references)
      case j: Join =>
        (j: LogicalPlan, j.condition.map(_.references).getOrElse(AttributeSet.empty))
    }
    sites.foldLeft(Set.empty[(String, String)]) { case (acc, (node, rs)) =>
      acc ++ leafInputs(node, rs, ctes)
    }.map(format)
  }

  private def cteMap(plan: LogicalPlan): Map[Long, LogicalPlan] =
    plan.collect { case w: WithCTE =>
      w.cteDefs.map(d => d.id -> d.child)
    }.flatten.toMap

  private def format(a: (String, String)): String =
    if (a._1.isEmpty) a._2 else s"${a._1}.${a._2}"

  private def tableOf(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).orElse(lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption.map(p =>
            p.getName.stripSuffix(".parquet"))
        case _ => None
      }).getOrElse("")
    case other => other.nodeName
  }

  /** Walk down, expanding wanted attributes through their defining
    * expressions until only leaf outputs remain. */
  private def leafInputs(plan: LogicalPlan, want: AttributeSet,
      ctes: Map[Long, LogicalPlan]): Set[(String, String)] = {
    if (want.isEmpty) return Set.empty
    plan match {
      case leaf: CTERelationRef =>
        // ref output maps positionally onto the definition's output
        // (analysis assigns the ref fresh exprIds)
        ctes.get(leaf.cteId) match {
          case Some(defPlan) =>
            val idx = leaf.output.zipWithIndex
              .filter { case (a, _) => want.contains(a) }.map(_._2)
            leafInputs(defPlan, AttributeSet(idx.map(defPlan.output(_))), ctes)
          case None =>
            want.map(a => ("?", a.name)).toSet
        }
      case leaf: LeafNode =>
        val t = tableOf(leaf)
        leaf.output.filter(want.contains).map(a => (t, a.name)).toSet
      case w: WithCTE =>
        leafInputs(w.plan, want, ctes)
      case g: Generate =>
        // explode/posexplode/inline outputs derive from the generator's
        // inputs; everything else passes through to the child
        val genIds = AttributeSet(g.generatorOutput)
        val (fromGen, rest) = want.toSeq.partition(genIds.contains)
        val expanded = AttributeSet(
          rest ++ (if (fromGen.nonEmpty) g.generator.references.toSeq else Nil))
        leafInputs(g.child, expanded.intersect(g.child.outputSet), ctes)
      case e: Expand =>
        // grouping sets: output slot i is fed by slot i of EVERY
        // projection (grouping-id slots project literals → no inputs,
        // correctly)
        val idx = e.output.zipWithIndex
          .filter { case (a, _) => want.contains(a) }.map(_._2)
        val refs = AttributeSet(
          idx.flatMap(i => e.projections.flatMap(p => p(i).references.toSeq)))
        leafInputs(e.child, refs.intersect(e.child.outputSet), ctes)
      case u: Union =>
        // output attr i corresponds to attr i of EVERY branch
        val idx = u.output.zipWithIndex.filter { case (a, _) => want.contains(a) }
          .map(_._2)
        u.children.flatMap { c =>
          leafInputs(c, AttributeSet(idx.map(c.output(_))), ctes)
        }.toSet
      case node =>
        // keyed by ExprId, NOT Attribute: attribute equality includes the
        // qualifier, and the same column crosses a SubqueryAlias/CTE
        // boundary requalified — an Attribute-keyed map silently misses
        // the defining Alias there
        val defs: Map[ExprId, Expression] = node.expressions.collect {
          case ne: NamedExpression => ne.exprId -> (ne: Expression)
        }.toMap
        val expanded = AttributeSet(want.toSeq.flatMap { a =>
          defs.get(a.exprId) match {
            case Some(e) => e.references.toSeq
            case None => Seq(a)
          }
        })
        val resolved = node.children
          .map(c => leafInputs(c, expanded.intersect(c.outputSet), ctes))
          .foldLeft(Set.empty[(String, String)])(_ ++ _)
        // attrs no child can produce and no rule expanded: say "don't
        // know", never "no inputs"
        val known = node.children
          .foldLeft(AttributeSet.empty)(_ ++ _.outputSet)
        val unknown = (expanded -- known).map(a => ("?", a.name)).toSet
        resolved ++ unknown
    }
  }
}
