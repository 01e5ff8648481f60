package graft.dedup

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fixture corpus has no duplicates, so the dq03 query only proves the
  * pipeline RUNS. This spec proves it FINDS: plant exact and near
  * duplicates and assert MinHash-LSH surfaces them with the right
  * Jaccard, while unrelated documents stay unpaired at the threshold. */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("planted near-duplicates are found; unrelated docs are not near-dups") {
    import spark.implicits._
    val originals = Tables.documents(spark, dir)
      .filter($"doc_id" < 40)
      .select($"doc_id", $"text")
    // near-dup: drop the first 3 tokens (high Jaccard overlap remains);
    // exact dup: verbatim copy
    val nearDups = originals
      .select(($"doc_id" + 10000).as("doc_id"),
        array_join(slice(split($"text", " "), 4, 100000), " ").as("text"))
    val exactDups = originals
      .select(($"doc_id" + 20000).as("doc_id"), $"text")
    val corpus = originals.union(nearDups).union(exactDups)

    val pairs = MinHashLsh.candidatePairs(corpus, numHashes = 16, numBands = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // every exact-dup pair must surface with jaccard 1.0
    (0L until 40L).foreach { id =>
      val j = pairs.get((id, id + 20000))
      assert(j.contains(1.0), s"exact dup of $id not found (got $j)")
    }
    // most planted near-dup pairs surface with high jaccard (banding is
    // probabilistic: 16/4 bands @ s≈0.9 collide with p≈0.99 per pair)
    val found = (0L until 40L).count { id =>
      pairs.get((id, id + 10000)).exists(_ >= 0.7)
    }
    assert(found >= 35, s"only $found/40 planted near-dups found")
    // every flagged original pair must be a TRUE near-dup: recompute
    // ground-truth Jaccard driver-side from the raw text. (This caught a
    // genuine discovery: fixture docs 8 and 12 are 97% similar — the
    // operator found a real near-duplicate the corpus actually contains.)
    val texts = originals.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def groundTruth(a: Long, b: Long): Double = {
      def sh(t: String): Set[String] = {
        val w = t.toLowerCase.split("\\s+")
        w.sliding(3).map(_.mkString(" ")).toSet
      }
      val (sa, sb) = (sh(texts(a)), sh(texts(b)))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    pairs.foreach { case ((a, b), j) =>
      if (a < 40 && b < 40 && j >= 0.8)
        assert(groundTruth(a, b) >= 0.8,
          s"pair ($a,$b) flagged at $j but ground truth is ${groundTruth(a, b)}")
    }
  }
}
