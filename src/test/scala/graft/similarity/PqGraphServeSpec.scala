package graft.similarity

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** sq24's PQ-guided beam serving — the oracle hash-checks every value;
  * this spec pins the structural theorem the hash can't express: at
  * every beam depth the exact re-rank DOMINATES raw ADC ordering
  * (recall_at_k ≥ recall_adc), because the ADC-top-k is a subset of
  * the re-ranked shortlist and exact cosine keeps every true-top-k
  * member the shortlist holds — the invariant that makes the
  * DiskANN-style "quantized walk, exact finish" split safe. */
class PqGraphServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact re-rank dominates ADC-only ordering at every beam depth") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("sq24_graph_pq_serve")(
        spark, "/root/testdata/sf0.001")
      .select($"round", $"pool_nodes", $"recall_adc", $"recall_at_k")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 5, "one row per beam round 0..4")
    rows.foreach { case (r, pool, adc, reranked) =>
      assert(reranked >= adc - 1e-12,
        s"round $r: re-ranked recall $reranked below ADC recall $adc")
      assert(pool <= 16L * (1 + 8 * r) + 16,
        s"round $r pool $pool exceeds the beam bound")
    }
    // the walk must actually go somewhere
    assert(rows.last._4 > 0.2, "final re-ranked recall implausibly low")
  }
}
