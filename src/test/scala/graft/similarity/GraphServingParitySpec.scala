package graft.similarity

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** sq22b's timed serving path must be the CORRECT one: its final ring
  * recall equals sq22's hash-green round-4 recall_at_k exactly (sq18b's
  * matches_batch discipline, graph edition), and the warm entry must
  * never be slower to the recall@8 ≥ 0.5 threshold than the ring. */
class GraphServingParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("sq22b's ring recall equals sq22's final recall; warm entry is never slower to 0.5") {
    import spark.implicits._
    val sq22 = graft.queries.SimilarityQueries.sq22GraphAnnServe
      .fn(spark, dir)
      .select($"round", $"recall_at_k").as[(Long, Double)].collect().toMap
    val row = graft.queries.SimilarityQueries.sq22bGraphServingLatency
      .fn(spark, dir).collect().head
    val ringFinal = row.getAs[Double]("recall_ring_final")
    assert(ringFinal == sq22(4L),
      s"timed stored-serving recall $ringFinal != sq22's hash-green ${sq22(4L)}")
    val toHalfRing = row.getAs[Long]("rounds_to_half_ring")
    val toHalfWarm = row.getAs[Long]("rounds_to_half_warm")
    assert(toHalfWarm != -1L, "warm entry never reached recall@8 >= 0.5")
    assert(toHalfRing == -1L || toHalfWarm <= toHalfRing,
      s"warm entry ($toHalfWarm rounds) slower than ring ($toHalfRing)")
    // the latency split is populated and sane
    assert(row.getAs[Double]("build_s") > 0 &&
      row.getAs[Double]("serve_ms_per_query") > 0)
    assert(row.getAs[Long]("rows_served") > 0)
  }
}
