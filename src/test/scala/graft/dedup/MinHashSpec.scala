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

  /** Aggregate candidatePairs the way dq03 historically did — the ground
    * truth pairStats' adaptive collapse must reproduce exactly. */
  private def plainStats(corpus: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
    import spark.implicits._
    val r = MinHashLsh.candidatePairs(corpus, numHashes = 16, numBands = 4)
      .agg(
        count(lit(1)).as("n_candidate_pairs"),
        count(when($"jaccard" >= 0.8, 1)).as("n_near_dups"),
        max($"jaccard").as("max_jaccard"))
      .head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  private def adaptiveStats(corpus: org.apache.spark.sql.DataFrame,
      threshold: Double): (Long, Long, Double, Double) = {
    val r = MinHashLsh.pairStats(corpus, numHashes = 16, numBands = 4,
      collapseThreshold = threshold).head()
    (r.getAs[Long]("n_candidate_pairs"), r.getAs[Long]("n_near_dups"),
      r.getAs[Double]("max_jaccard"), r.getAs[Double]("dup_factor"))
  }

  test("adaptive collapse reproduces plain pair stats on a clone-heavy corpus") {
    import spark.implicits._
    val originals = Tables.documents(spark, dir)
      .filter($"doc_id" < 30)
      .select($"doc_id", $"text")
    // 3 extra exact copies of every doc (dup factor 4) + the near-dups
    val clones = (1 to 3).map(k =>
      originals.select(($"doc_id" + k * 10000).as("doc_id"), $"text"))
    val nearDups = originals
      .select(($"doc_id" + 90000).as("doc_id"),
        array_join(slice(split($"text", " "), 4, 100000), " ").as("text"))
    val corpus = clones.foldLeft(originals)(_ union _).union(nearDups)
    val (np, nd, mj) = plainStats(corpus)
    val (anp, and_, amj, df) = adaptiveStats(corpus, threshold = 1.5)
    // 150 docs in 60 set-classes (30 cloned 4x + 30 singleton near-dups)
    // = 2.5, up to the approx-distinct gate's ~2% HLL error
    assert(df > 2.3 && df < 2.7, s"dup factor $df should reflect the 4x cloning")
    assert((anp, and_, amj) == ((np, nd, mj)),
      s"collapsed stats ($anp,${and_},$amj) != plain ($np,$nd,$mj)")
  }

  test("dup-free corpus stays on the plain path and stats agree") {
    import spark.implicits._
    val corpus = Tables.documents(spark, dir)
      .filter($"doc_id" < 60)
      .select($"doc_id", $"text")
    val (np, nd, mj) = plainStats(corpus)
    val (anp, and_, amj, df) = adaptiveStats(corpus, threshold = 1.5)
    assert(df < 1.5, s"fixture corpus should be (nearly) dup-free, got $df")
    assert((anp, and_, amj) == ((np, nd, mj)))
  }

  test("forced collapse on a dup-free corpus still reproduces plain stats") {
    import spark.implicits._
    // threshold 0 forces the collapsed path with all-singleton classes —
    // the arithmetic expansion must degenerate to the identity
    val corpus = Tables.documents(spark, dir)
      .filter($"doc_id" < 60)
      .select($"doc_id", $"text")
    val (np, nd, mj) = plainStats(corpus)
    val (anp, and_, amj, _) = adaptiveStats(corpus, threshold = 0.0)
    assert((anp, and_, amj) == ((np, nd, mj)))
  }

  test("bandKeys (streaming-shape, per-row signature) yields the batch candidate pairs") {
    import spark.implicits._
    // the per-row array_min(transform(...)) signature must be the SAME
    // arithmetic as the batch explode+min-agg path: docs sharing any
    // band key == candidatePairs' candidate set on the same corpus
    val corpus = Tables.documents(spark, dir).select($"doc_id", $"text")
    val keys = MinHashLsh.bandKeys(corpus)
    val fromKeys = keys.as("a").join(keys.as("b"),
        $"a.band_key" === $"b.band_key" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct().as[(Long, Long)].collect().toSet
    val fromBatch = MinHashLsh.candidatePairs(corpus)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(fromKeys == fromBatch,
      s"streaming band keys diverge from batch candidates: " +
        s"only-keys=${(fromKeys -- fromBatch).take(3)} only-batch=${(fromBatch -- fromKeys).take(3)}")
    // every shingleable doc emits exactly numBands keys; short docs one
    val perDoc = keys.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .select($"n").distinct().as[Long].collect().toSet
    assert(perDoc.subsetOf(Set(1L, 4L)), s"unexpected per-doc key counts $perDoc")
  }
}
