package graft.similarity

import graft.TestSpark
import graft.queries.SimilarityQueries
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN: the shortlist+rerank pipeline must clear a
  * recall floor against exact brute force, and the summary must report
  * the configured compression geometry. */
class PqRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PQ shortlist+rerank recall@5 clears 0.6 on the fixture corpus") {
    val row = SimilarityQueries.sq09AnnPqRecall
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_queries") == 20L)
    assert(row.getAs[Int]("m_subspaces") == 8)
    assert(row.getAs[Int]("bits_per_vec") == 32, "4 bytes per encoded vector")
    val recall = row.getAs[Double]("recall_at_5")
    // unstructured synthetic vectors are PQ's worst case; raw ADC ordering
    // measured 0.32 — the 50-deep shortlist + exact rerank is what makes
    // the path usable (0.79 measured at sf0.01, seeds fixed)
    assert(recall >= 0.6, s"recall_at_5 $recall below floor")
  }

  test("portable integer-Lloyd IVF (sq04b) clears 0.6 recall and scans a bounded fraction") {
    val row = SimilarityQueries.sq04bAnnIvfRecallPortable
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_queries") == 20L)
    assert(row.getAs[Long]("n_probes") == 6L)
    val recall = row.getAs[Double]("recall_at_5")
    // md5-seeded integer Lloyd (the oracle-replayable build) measured 0.76
    // at sf0.01 probing 6/16 lists (~38% candidate fraction, reported
    // honestly in avg_candidates — sq04's spark.ml number omits it)
    assert(recall >= 0.6, s"recall_at_5 $recall below floor")
    val nLists = row.getAs[Long]("n_lists")
    assert(nLists >= 8L && nLists <= 16L, s"degenerate clustering: $nLists lists")
  }

  test("IVF-PQ residual shortlist+rerank recall@5 clears 0.65 at nprobe 10/32") {
    val row = SimilarityQueries.sq10AnnIvfPqRecall
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_queries") == 20L)
    assert(row.getAs[Int]("n_lists") == 32)
    assert(row.getAs[Int]("n_probes") == 10)
    assert(row.getAs[Int]("bits_per_vec") == 32, "4 bytes per encoded vector")
    assert(row.getAs[Double]("scan_fraction") == 0.3125,
      "over 2/3 of the corpus codes must never be scanned")
    val recall = row.getAs[Double]("recall_at_5")
    val unrotated = row.getAs[Double]("recall_at_5_unrotated")
    // probing 10/32 lists caps attainable recall below flat PQ (routing
    // misses are unrecoverable; sq09's 100%-scan recall is the ceiling);
    // finer cells beat the old 4/16 setting at comparable scan fraction
    // because residual-PQ budget goes further on lower within-cell
    // variance (measured: 0.53 at 4/16, 0.65 at 8/32). The shipped path
    // now rotates residuals per OPQ: 0.65 → 0.71 at sf0.01, 0.67 → 0.68
    // here at sf0.001, scan fraction identical — the rotated arm must
    // never fall below the unrotated one on the deterministic fixture
    assert(recall >= 0.65, s"recall_at_5 $recall below floor")
    assert(recall >= unrotated,
      s"OPQ arm $recall fell below unrotated $unrotated at equal scan")
    info(f"IVF-PQ recall: OPQ $recall%.2f vs unrotated $unrotated%.2f at scan 0.3125")
  }
}
