package graft.similarity

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** repruneStored — the α-pruned serving store's maintenance rung:
  * search candidates over the CURRENT store, re-α-pruned, published as
  * a new clustered version (the r14 counterpart of refineDurable,
  * which maintains the exact graph and measurably damages a pruned
  * serving store). */
class RepruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 8

  test("reprune publishes a servable v2; erased nodes appear in no v2 edge; lifecycle + determinism") {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    val vecs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .filter($"vec_id" < 256).cache()
    val graph = KnnGraph.build(vecs, K, rounds = 2).last
    val pruned = KnnGraph.robustPrune(vecs,
        KnnGraph.searchCandidates(vecs, graph, K, beamRounds = 3),
        r = K, alpha = 1.25)
      .select($"src", $"nbr")
    val sample = vecs.select($"v").as[Seq[Double]].collect()
      .map(_.toArray).toIndexedSeq
    val cents = Pq.trainCodebook(sample, 16).map(_.toSeq).toSeq
    val root = java.nio.file.Files.createTempDirectory("graft-reprune").toString
    KnnGraph.writeStoreClustered(pruned, vecs, s"$root/g", cents)
    KnnGraph.writeEntries(vecs, s"$root/g")
    KnnGraph.writeVectors(vecs, s"$root/vec")
    // erase two served nodes — the maintenance pass must not resurrect
    // them in ANY form (their vectors are gone, so no pool can score
    // them and no v2 edge may name them)
    val victims = Seq(50L, 99L)
    KnnGraph.eraseStoredClustered(spark, s"$root/g", victims,
      vecPath = s"$root/vec", eraseVectors = true)
    KnnGraph.repruneStored(spark, s"$root/g", s"$root/vec", s"$root/g2",
      degree = K, alpha = 1.25, k = K, beamRounds = 3)
    val v2 = spark.read.parquet(s"$root/g2")
    assert(v2.filter($"src".isin(victims: _*) || $"nbr".isin(victims: _*))
      .isEmpty, "an erased node survived into the repruned version")
    // v2 serves full answers through the warm clustered head, never a victim
    val queries = vecs.filter($"vec_id" < 8).select($"vec_id".as("qid"), $"v")
    val served = KnnGraph.serveFromStoresClusteredWarm(
      spark, s"$root/g2", s"$root/vec", queries, K, beamRounds = 4)
      .as[(Long, Long)].collect()
    assert(served.length == 8 * K, s"expected ${8 * K} answers, got ${served.length}")
    assert(served.forall { case (_, node) => !victims.contains(node) })
    // the same lifecycle control plane as every rebuild
    import graft.ml.IndexLifecycle
    val reg = s"$root/registry"
    IndexLifecycle.register(spark, reg, "g", "knn_graph_composed", s"$root/g", 1)
    IndexLifecycle.promote(spark, reg, "g", 1)
    IndexLifecycle.register(spark, reg, "g", "knn_graph_composed", s"$root/g2", 2)
    IndexLifecycle.promote(spark, reg, "g", 2)
    assert(IndexLifecycle.pinnedPath(spark, reg, "g").contains(s"$root/g2"))
    assert(IndexLifecycle.rollback(spark, reg, "g").isDefined)
    assert(IndexLifecycle.pinnedPath(spark, reg, "g").contains(s"$root/g"))
    // deterministic: a second reprune of the same store publishes the
    // identical edge set
    KnnGraph.repruneStored(spark, s"$root/g", s"$root/vec", s"$root/g3",
      degree = K, alpha = 1.25, k = K, beamRounds = 3)
    val v3 = spark.read.parquet(s"$root/g3")
    assert(v2.select($"src", $"nbr").except(v3.select($"src", $"nbr")).isEmpty &&
      v3.select($"src", $"nbr").except(v2.select($"src", $"nbr")).isEmpty)
    vecs.unpersist()
  }
}
