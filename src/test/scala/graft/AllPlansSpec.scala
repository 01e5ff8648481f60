package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Blanket physical-plan invariant over EVERY registered query: nothing
  * may plan a CartesianProduct of data-sized inputs. Family-level
  * PlanSpec tests pin richer per-query shapes; this one stops a new
  * query (or a refactor of a shared helper) from ever shipping an
  * all-pairs join unnoticed — the single worst scale failure mode.
  *
  * Queries that deliberately cross-join ONE-ROW summary frames are
  * allowed if the product's inputs are both known single-row aggregates
  * (a 1×1 cartesian is a constant, not a blow-up); today every such join
  * broadcasts and plans as BroadcastNestedLoopJoin anyway, so the
  * allowlist is empty — keep it that way.
  */
class AllPlansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val allowCartesian: Set[String] = Set.empty

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if allowCartesian(name) => None
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct: ${offenders.mkString(", ")}")
  }
}
