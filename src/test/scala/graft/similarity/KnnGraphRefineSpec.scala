package graft.similarity

import graft.TestSpark
import graft.similarity.VectorOps.cosine
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[KnnGraph.refineDurable]] — the maintenance middle rung (one
  * NN-Descent tightening round seeded from an existing graph). The two
  * properties that make refine safe to run at any time, plus the
  * durable-resume contract it shares with the build:
  *
  *  - the EXACT k-NN graph is a fixpoint: tighten's candidate set
  *    contains the current edges, and nothing beats the true top-k, so
  *    refining a perfect graph returns it bit-identically;
  *  - per-node neighbor quality is monotone: the kept list's cosines
  *    dominate the seed list's elementwise (candidates ⊇ seed edges).
  */
class KnnGraphRefineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 8

  private def corpus() = {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select($"src", $"nbr").as[(Long, Long)].collect().toSet
  }

  test("the exact k-NN graph is a fixpoint of refine") {
    import spark.implicits._
    val vecs = corpus()
    // brute-force truth with refine's own total order (cos DESC, nbr)
    val exact = vecs.select($"vec_id".as("src"), $"v".as("vs"))
      .crossJoin(broadcast(vecs.select($"vec_id".as("nbr"), $"v".as("vn"))))
      .filter($"src" =!= $"nbr")
      .withColumn("cos", cosine($"vs", $"vn"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"cos".desc, $"nbr")))
      .filter($"rn" <= K).select($"src", $"nbr")
      .cache()
    val work = java.nio.file.Files.createTempDirectory("graft-refine-fix").toString
    val refined = KnnGraph.refineDurable(vecs, exact, K, rounds = 1, work)
    assert(edgeSet(refined) == edgeSet(exact),
      "refining a perfect graph must be the identity")
    exact.unpersist(); vecs.unpersist()
  }

  test("refine dominates the seed elementwise: every node's kept cosines ≥ its seed cosines") {
    import spark.implicits._
    val vecs = corpus()
    // the maximally-stale seed: the ring-init round-0 graph
    val seedDir = java.nio.file.Files.createTempDirectory("graft-refine-seed").toString
    val seed = KnnGraph.buildDurable(vecs, K, rounds = 0, seedDir).head
    val work = java.nio.file.Files.createTempDirectory("graft-refine-mono").toString
    val refined = KnnGraph.refineDurable(
      vecs, seed.select($"src", $"nbr"), K, rounds = 1, work)
    def perNode(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      df.select($"src", $"nbr", $"cos").as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (s, rows) =>
          s -> rows.map(_._3).sorted(Ordering[Double].reverse).toSeq }
    val before = perNode(seed)
    val after = perNode(refined)
    assert(after.keySet == before.keySet, "refine must keep every node")
    before.foreach { case (node, b) =>
      val a = after(node)
      assert(a.size <= K)
      // sorted-descending dominance: the i-th best kept ≥ i-th best seed
      b.take(a.size).zip(a).zipWithIndex.foreach { case ((sb, sa), i) =>
        assert(sa >= sb - 1e-12,
          s"node $node rank $i regressed: seed $sb, refined $sa")
      }
    }
    vecs.unpersist()
  }

  test("refine is durable: resume reloads persisted rounds and a parameter mismatch fails loudly") {
    import spark.implicits._
    val vecs = corpus()
    val seedDir = java.nio.file.Files.createTempDirectory("graft-refine-s2").toString
    val seed = KnnGraph.buildDurable(vecs, K, rounds = 0, seedDir).head
      .select($"src", $"nbr")
    val work = java.nio.file.Files.createTempDirectory("graft-refine-res").toString
    val once = KnnGraph.refineDurable(vecs, seed, K, rounds = 1, work)
    val r1Success = java.nio.file.Paths.get(work, "r_1", "_SUCCESS")
    assert(java.nio.file.Files.exists(r1Success), "round 1 must be durable")
    val mtime = java.nio.file.Files.getLastModifiedTime(r1Success)
    val again = KnnGraph.refineDurable(vecs, seed, K, rounds = 1, work)
    assert(java.nio.file.Files.getLastModifiedTime(r1Success) == mtime,
      "resume must reload, not recompute, a persisted round")
    assert(edgeSet(once) == edgeSet(again))
    val e = intercept[IllegalArgumentException](
      KnnGraph.refineDurable(vecs, seed, K + 4, rounds = 1, work))
    assert(e.getMessage.contains("refusing to resume"))
    // unlike the build, the SEED is a varying input: resuming the same
    // workDir with a different same-size seed graph must fail loudly
    // (the fingerprint digests the seed's edge set) — otherwise the
    // old seed's refined rounds would reload silently, e.g. after an
    // erasure changed the store the refine was seeded from
    val otherSeed = seed.filter($"src" =!= 0L)
    assert(otherSeed.count() < seed.count(), "mutation must change the seed")
    val e2 = intercept[IllegalArgumentException](
      KnnGraph.refineDurable(vecs, otherSeed, K, rounds = 1, work))
    assert(e2.getMessage.contains("refusing to resume"),
      "a changed seed graph must not resume against stale rounds")
    vecs.unpersist()
  }
}
