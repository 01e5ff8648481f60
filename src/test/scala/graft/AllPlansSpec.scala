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

  /** A frame consumed N times re-executes N times (no cross-branch CSE),
    * so runaway scan counts are the recompute-explosion smell. Current
    * legitimate maximum is sq02's 12 LSH hash tables; anything above
    * needs a cache or a rethink. dq09 is exempt: its iterative fixpoint
    * stacks each ROUND's lineage into the final plan TEXT, but every
    * round is cached and materialized during the loop, so the printed
    * scans never re-execute. */
  private val maxScans = 13
  private val allowManyScans: Set[String] = Set("dq09_dup_clusters")

  test("no registered query plans a CartesianProduct or a scan explosion") {
    val scanNode = "\\(\\d+\\) Scan parquet".r
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val cartesian = !allowCartesian(name) && plan.contains("CartesianProduct")
        val scans = scanNode.findAllIn(plan).size
        val explosion = !allowManyScans(name) && scans > maxScans
        if (cartesian) Some(s"$name (CartesianProduct)")
        else if (explosion) Some(s"$name ($scans scans)")
        else None
    }
    assert(offenders.isEmpty,
      s"queries with degenerate plans: ${offenders.mkString(", ")}")
  }
}
