package graft.similarity

import graft.TestSpark
import graft.similarity.VectorOps._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding-cosine near-dup (the sq05 pipeline) must FIND planted
  * near-identical vectors: copies with one slightly perturbed dimension
  * land in the same sign-LSH bucket and rerank above the threshold. */
class EmbeddingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted near-identical embeddings surface with cosine ≥ 0.99") {
    import spark.implicits._
    val originals = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter($"vec_id" < 30)
      .select($"vec_id", toDouble($"embedding").as("v"))
    // planted near-dup: nudge dimension 0 by +0.05 → cosine stays ≈ 0.99+
    val planted = originals.select(($"vec_id" + 10000).as("vec_id"),
      concat(array($"v".getItem(0) + 0.05), slice($"v", 2, 63)).as("v"))
    val corpus = originals.union(planted)

    val rng = new scala.util.Random(7)
    val planes = Seq.fill(8)(Array.fill(64)(rng.nextGaussian()))
    val withBucket = corpus.withColumn("bucket", lshBucket($"v", planes))
    val pairs = withBucket.as("a")
      .join(withBucket.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
        cosine($"a.v", $"b.v").as("cos"))
      .filter($"cos" >= 0.99)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val found = (0L until 30L).count(id => pairs.contains((id, id + 10000)))
    assert(found >= 21, s"only $found/30 planted near-dup embeddings found")
    // flagged pairs are true near-dups (threshold is part of the filter;
    // sanity-check the scores are not degenerate 1.0 from self-joins)
    pairs.foreach { case ((a, b), c) =>
      assert(a != b && c >= 0.99 && c <= 1.0 + 1e-9)
    }
  }
}
