package graft.plans

import org.apache.spark.sql.{Dataset, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LeafNode, LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage: which SOURCE columns feed each output column of
  * a query — the impact-analysis / governance primitive ("if I change
  * lineitem.l_discount, which downstream outputs move?"), derived
  * directly from the analyzed logical plan so it is correct by
  * construction for whatever Catalyst resolved, not a re-parse.
  *
  * Mechanics: every output attribute's transitive input set is computed
  * by walking the plan top-down, expanding each attribute through the
  * NamedExpression that defines it (Project/Aggregate/Window aliases)
  * until only leaf-relation attributes remain; Union maps positionally
  * into every branch. Filters and join conditions CONSTRAIN rows rather
  * than feed values, so they are reported separately by
  * [[filterInputs]] — both matter for impact analysis, but conflating
  * them (as naive referenced-column scans do) makes every output appear
  * derived from every predicate column.
  */
object Lineage {

  /** @return output column name → set of "table.column" leaf inputs. */
  def columnLineage(df: Dataset[_]): Map[String, Set[String]] = {
    val plan = GraftBridge.analyzedPlan(df)
    plan.output.map(a =>
      a.name -> leafInputs(plan, AttributeSet(Seq(a))).map(format)).toMap
  }

  /** Source columns referenced by filters / join conditions anywhere in
    * the plan (the row-constraining inputs). */
  def filterInputs(df: Dataset[_]): Set[String] = {
    val plan = GraftBridge.analyzedPlan(df)
    val refs = plan.collect {
      case f: Filter => f.condition.references
      case j: Join => j.condition.map(_.references).getOrElse(AttributeSet.empty)
    }
    refs.foldLeft(Set.empty[(String, String)]) { (acc, rs) =>
      acc ++ leafInputs(plan, rs)
    }.map(format)
  }

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
  private def leafInputs(plan: LogicalPlan, want: AttributeSet): Set[(String, String)] = {
    if (want.isEmpty) return Set.empty
    plan match {
      case leaf: LeafNode =>
        val t = tableOf(leaf)
        leaf.output.filter(want.contains).map(a => (t, a.name)).toSet
      case u: Union =>
        // output attr i corresponds to attr i of EVERY branch
        val idx = u.output.zipWithIndex.filter { case (a, _) => want.contains(a) }
          .map(_._2)
        u.children.flatMap { c =>
          leafInputs(c, AttributeSet(idx.map(c.output(_))))
        }.toSet
      case node =>
        val defs: Map[Attribute, Expression] = node.expressions.collect {
          case ne: NamedExpression => ne.toAttribute -> (ne: Expression)
        }.toMap
        val expanded = AttributeSet(want.toSeq.flatMap { a =>
          defs.get(a) match {
            case Some(e) => e.references.toSeq
            case None => Seq(a)
          }
        })
        node.children.map(c => leafInputs(c, expanded.intersect(c.outputSet)))
          .foldLeft(Set.empty[(String, String)])(_ ++ _)
    }
  }
}
