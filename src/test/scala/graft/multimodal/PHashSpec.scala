package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** DCT pHash: the Hamming-metric properties the band join relies on,
  * invariance under the transforms the detector must see through
  * (resize, lossy re-encode), separation for distinct content, and the
  * planted end-to-end proof through the registered query. */
class PHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hamming is a metric on fingerprints; bands are pigeonhole-complete for d <= 7") {
    val rnd = new java.util.Random(7)
    val hs = Array.fill(50)(rnd.nextLong())
    for (a <- hs; b <- hs) {
      assert(PHash.hamming(a, b) == PHash.hamming(b, a))
      assert(PHash.hamming(a, a) == 0)
      for (c <- hs.take(10))
        assert(PHash.hamming(a, b) <= PHash.hamming(a, c) + PHash.hamming(c, b))
    }
    // pigeonhole: flip ANY <= 7 bits — at least one of the 8 bands is
    // untouched, so the band equi-join must produce the pair
    for (h <- hs; k <- 1 to PHash.MaxHamming) {
      val flipped = (0 until k).foldLeft(h)((acc, _) =>
        acc ^ (1L << rnd.nextInt(64)))
      assert(PHash.bands(h).toSet.intersect(PHash.bands(flipped).toSet).nonEmpty,
        s"pair at hamming ${PHash.hamming(h, flipped)} shares no band")
    }
  }

  test("pHash survives resize and JPEG re-encode; distinct content separates") {
    val hashes = (0L until 30L).map { seed =>
      val orig = PHash.encodePattern(64, 48, seed)
      val h = PHash.phash(orig).get
      val resized = Decode.resizeImage(orig, 44, 34).get
      val jpg = PHash.encodePattern(64, 48, seed, "jpg")
      assert(PHash.hamming(h, PHash.phash(resized).get) <= PHash.MaxHamming,
        s"seed $seed: resize moved pHash past the band guarantee")
      assert(PHash.hamming(h, PHash.phash(jpg).get) <= PHash.MaxHamming,
        s"seed $seed: JPEG re-encode moved pHash past the band guarantee")
      h
    }
    val cross = for {
      i <- hashes.indices; j <- hashes.indices if i < j
    } yield PHash.hamming(hashes(i), hashes(j))
    assert(cross.min > PHash.MaxHamming,
      s"distinct smooth fields collided at hamming ${cross.min}")
    // random 64-bit fingerprints center at 32; smooth fields share DCT
    // structure so they sit lower, but must stay decisively separated
    assert(cross.sum.toDouble / cross.size > 16,
      s"mean cross distance ${cross.sum.toDouble / cross.size} suspiciously low")
  }

  test("undecodable payloads yield None, not an exception") {
    assert(PHash.phash(Array[Byte](1, 2, 3)).isEmpty)
    assert(PHash.phash(Array.emptyByteArray).isEmpty)
  }

  test("tq43 planted proof: every same-content pair found by the band join, zero false positives") {
    val row = graft.queries.TextQueries.tq43ImagePhashNearDup
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_dup_pairs_expected") > 50)
    assert(row.getAs[Long]("n_true_found") == row.getAs[Long]("n_dup_pairs_expected"),
      "a planted near-duplicate image escaped the band join / verify")
    assert(row.getAs[Long]("n_false_positives") == 0L)
    assert(row.getAs[Int]("max_true_hamming") <= PHash.MaxHamming)
    // bucketed candidate generation, not all-pairs
    val n = row.getAs[Long]("n_assets")
    assert(row.getAs[Long]("n_candidate_pairs") < n * (n - 1) / 2 / 4,
      "candidate join degenerated toward all-pairs")
  }
}
