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

  test("adaptive sizing rule: integer-exact, monotone, ~32-row buckets at any n") {
    import SimilarityQueries.adaptiveLshSetting
    // fixture scales
    assert(adaptiveLshSetting(500L) == (4, 8))
    assert(adaptiveLshSetting(50000L) == (11, 99))
    // exact boundary: 2^4·32 = 512 still fits 4 bits; 513 needs 5
    assert(adaptiveLshSetting(512L)._1 == 4)
    assert(adaptiveLshSetting(513L)._1 == 5)
    // monotone in n, clamped at the ladder top
    val bs = Seq(1L, 100L, 10000L, 1000000L, 100000000L, Long.MaxValue)
      .map(adaptiveLshSetting(_)._1)
    assert(bs == bs.sorted, s"bits must be monotone in n: $bs")
    assert(adaptiveLshSetting(Long.MaxValue) == (14, 168))
    // the invariant the rule exists for: expected rows per bucket
    // n / 2^b stays ≤ 32 whenever the ladder hasn't clamped
    for (n <- Seq(100L, 1000L, 12345L, 400000L)) {
      val (b, _) = adaptiveLshSetting(n)
      assert(n.toDouble / (1L << b) <= 32.0,
        s"n=$n b=$b leaves ${n.toDouble / (1L << b)} rows per bucket")
    }
  }

  test("sq02d runs the derived setting end to end on the fixture") {
    val row = SimilarityQueries.sq02dAnnLshAdaptive
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("bits_per_table") == 4L)
    assert(row.getAs[Long]("n_tables") == 8L)
    assert(row.getAs[Long]("n_queries") == 16L)
    assert(row.getAs[Double]("recall_at_5") >= 0.5,
      s"adaptive arm recall ${row.getAs[Double]("recall_at_5")} unusable")
    assert(row.getAs[Double]("cand_fraction") <= 0.8)
  }
}
