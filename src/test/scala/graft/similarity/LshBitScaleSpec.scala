package graft.similarity

import graft.TestSpark
import graft.queries.SimilarityQueries
import org.scalatest.funsuite.AnyFunSuite

/** sq02c's scaling claim as an executable property: widening the LSH
  * bucket code (with tables raised to compensate) must shrink the
  * candidate fraction MONOTONICALLY while recall stays usable — the
  * measured form of "bits per table scales with corpus size in
  * production" (per-table collisions fall geometrically in bits;
  * tables only rise linearly). */
class LshBitScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("candidate fraction drops monotonically with bits; recall holds the floor") {
    val rows = SimilarityQueries.sq02cLshBitScaling
      .fn(spark, "/root/testdata/sf0.001")
      .orderBy("bits_per_table").collect()
    assert(rows.length == 3)
    val fracs = rows.map(_.getAs[Double]("cand_fraction")).toSeq
    val recalls = rows.map(_.getAs[Double]("recall_at_5")).toSeq
    assert(fracs == fracs.sorted.reverse && fracs.distinct == fracs,
      s"candidate fraction must strictly decrease with bits: $fracs")
    assert(fracs.head / fracs.last >= 1.5,
      s"8-bit codes should cut candidates materially vs 4-bit: $fracs")
    assert(recalls.forall(_ >= 0.6),
      s"recall must stay usable at every setting: $recalls")
    info(f"fractions ${fracs.map(f => f"$f%.3f").mkString(" → ")}, " +
      f"recalls ${recalls.map(r => f"$r%.2f").mkString(" → ")}")
  }
}
