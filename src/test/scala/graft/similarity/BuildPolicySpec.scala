package graft.similarity

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The served-recall stop policy (r14 verdict #1): build depth is an
  * n-dependent knob ([[KnnGraph.buildConverged]]'s caveat — the δ-stop
  * targets the EXACT graph's fixpoint, the wrong objective for the
  * α-pruned serving artifact), so [[KnnGraph.buildToServedRecall]]
  * stops on the quantity a deployment ships: recall of a held-out
  * probe set served over the PRUNED edges. These tests pin the
  * policy's contract — what it returns, that it is deterministic and
  * resumable (a restarted index build re-reads the same recalls and
  * stops at the SAME depth), and that the returned artifact IS the
  * chosen depth's prune (the caller pays no second prune). */
class BuildPolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 8
  private val Degree = 8
  private val Alpha = 1.25

  private def corpus() = {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
  }

  private def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select(df("src"), df("nbr")).as[(Long, Long)].collect().toSet
  }

  test("returns the chosen depth's pruned artifact and a cost-optimal choice") {
    val vecs = corpus()
    val wd = java.nio.file.Files.createTempDirectory("graft-policy").toString
    val (rounds, chosen, pruned, trace) = KnnGraph.buildToServedRecall(
      vecs, K, maxRounds = 4, wd, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 8, eps = 0.02, step = 2)
    // the trace is the policy's evidence: depths ascend by `step` and
    // the chosen depth is ON the measured curve
    assert(trace.nonEmpty)
    assert(trace.map(_._1) == trace.map(_._1).sorted)
    assert(trace.exists(_._1 == chosen))
    // cost-optimal pick: the SMALLEST evaluated depth within eps of the
    // best recall seen — never a deeper depth that buys nothing
    val best = trace.map(_._2).max
    val expected = trace.find(_._2 >= best - 0.02).get._1
    assert(chosen == expected)
    // the returned artifact is a real α-pruned adjacency: non-empty,
    // within the degree budget per node
    import spark.implicits._
    val e = edges(pruned)
    assert(e.nonEmpty)
    val maxDeg = pruned.groupBy($"src").count()
      .agg(org.apache.spark.sql.functions.max($"count")).as[Long].head()
    assert(maxDeg <= Degree, s"degree budget violated: $maxDeg > $Degree")
    // the build rounds returned are the deepest built (depth = rounds-1
    // entries beyond e_0), enough to re-derive any evaluated depth
    assert(rounds.length - 1 >= chosen)
    vecs.unpersist()
  }

  test("resumed run re-reads the same recalls and stops at the SAME depth") {
    val vecs = corpus()
    val wd = java.nio.file.Files.createTempDirectory("graft-policy-resume").toString
    val (_, chosen1, pruned1, trace1) = KnnGraph.buildToServedRecall(
      vecs, K, maxRounds = 4, wd, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 8, eps = 0.02, step = 2)
    // second run over the SAME workDir: builds resume via _SUCCESS,
    // prunes resume via the fingerprint guard — every stage is
    // deterministic, so the trace, the stop, and the artifact are
    // bit-identical (the restarted-index-build contract)
    val (_, chosen2, pruned2, trace2) = KnnGraph.buildToServedRecall(
      vecs, K, maxRounds = 4, wd, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 8, eps = 0.02, step = 2)
    assert(chosen1 == chosen2)
    assert(trace1 == trace2)
    assert(edges(pruned1) == edges(pruned2))
    vecs.unpersist()
  }

  test("the returned artifact equals a direct prune at the chosen depth") {
    val vecs = corpus()
    val wd = java.nio.file.Files.createTempDirectory("graft-policy-direct").toString
    val (_, chosen, pruned, _) = KnnGraph.buildToServedRecall(
      vecs, K, maxRounds = 4, wd, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 8, eps = 0.02, step = 2)
    // re-derive by hand: build to `chosen` (resumes the policy's own
    // persisted rounds), regenerate the search pool, prune fresh —
    // the policy's artifact must be exactly this, not a neighboring
    // depth's or a differently-pooled prune
    val es = KnnGraph.buildDurable(vecs, K, rounds = chosen, wd)
    val direct = KnnGraph.robustPrune(vecs,
      KnnGraph.searchCandidates(vecs, es.last, K, beamRounds = 2),
      Degree, Alpha,
      Some(java.nio.file.Files.createTempDirectory("graft-policy-chk").toString))
    assert(edges(pruned) == edges(direct))
    vecs.unpersist()
  }

  test("plannedEntries answers exactly what the stored sidecar will answer") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vecs = corpus()
    val cells = 8
    val sample = vecs.select($"vec_id", $"v").orderBy($"vec_id").limit(20000)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val cents = Pq.trainCodebook(sample, cells).map(_.toSeq).toSeq
    // write a real clustered store with those centroids + the sidecar
    val path = java.nio.file.Files.createTempDirectory("graft-planned").toString
    val graph = KnnGraph.buildDurable(vecs, K, rounds = 1,
      java.nio.file.Files.createTempDirectory("graft-planned-b").toString).last
    KnnGraph.writeStoreClustered(graph.select($"src", $"nbr"), vecs,
      s"$path/g", cents)
    KnnGraph.writeEntries(vecs, s"$path/g")
    // the entry-consistency contract: what the policy evaluated with
    // (plannedEntries over the SAME centroids, before any store
    // existed) IS what the serving head resolves from the sidecar
    val queries = vecs.select($"vec_id".as("qid"), $"v")
    val planned = KnnGraph.plannedEntries(vecs, cents)(queries)
      .select(col("qid"), col("node")).as[(Long, Long)].collect().toSet
    val stored = KnnGraph.storedEntries(spark, s"$path/g", queries)
      .select(col("qid"), col("node")).as[(Long, Long)].collect().toSet
    assert(planned == stored)
    assert(planned.nonEmpty)
    vecs.unpersist()
  }

  test("a flat recall curve stops after two stale evaluations, not at maxRounds") {
    val vecs = corpus()
    val wd = java.nio.file.Files.createTempDirectory("graft-policy-flat").toString
    // eps = 0.99: no real improvement can reset the stale counter, so
    // the policy must evaluate exactly 3 depths (first sets best, two
    // stale stops) and pick the FIRST — the cheap-stop behavior that
    // makes the policy affordable when shallow already serves
    val (_, chosen, _, trace) = KnnGraph.buildToServedRecall(
      vecs, K, maxRounds = 12, wd, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 8, eps = 0.99, step = 2)
    assert(trace.length == 3, s"expected 3 evaluations, got ${trace.length}")
    assert(chosen == trace.head._1)
    vecs.unpersist()
  }

  test("buildPolicyCached persists the decision and replays it without re-laddering") {
    import spark.implicits._
    val vecs = corpus()
    // unique corpusKey so the process-shared map can't hand this test
    // another test's dir; the digest-named sharedDir is deterministic
    // AND durable across JVMs, so actually wipe it first — otherwise a
    // decision file from a previous suite run makes the FIRST call
    // replay and the persist-then-replay path goes untested (r16
    // advice; pre-r17 the comment claimed a wipe that never happened)
    val ck = s"policy-decision-spec"
    val wd = KnnGraph.sharedWorkDir(vecs, (ck, K))
    val hfs = new org.apache.hadoop.fs.Path(wd).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(wd), true)
    def dirSnapshot(): Set[String] =
      if (!hfs.exists(new org.apache.hadoop.fs.Path(wd))) Set.empty
      else hfs.listStatus(new org.apache.hadoop.fs.Path(wd))
        .map(_.getPath.getName).toSet
    assert(dirSnapshot().isEmpty, s"wipe of $wd failed")
    val (_, d1, p1, t1) = KnnGraph.buildPolicyCached(
      vecs, ck, K, maxRounds = 4, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 8)
    // the ladder must have persisted a decision file for this budget
    val afterLadder = dirSnapshot()
    assert(afterLadder.exists(_.startsWith("_graft_policy_")),
      s"ladder did not persist a decision file; dir holds $afterLadder")
    // the decision replay path must return the same depth, the same
    // artifact, and the same trace (read back from the decision file)
    val (_, d2, p2, t2) = KnnGraph.buildPolicyCached(
      vecs, ck, K, maxRounds = 4, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 8)
    assert(d2 == d1, s"replayed depth $d2 != decided depth $d1")
    assert(t2 == t1, s"replayed trace $t2 != recorded trace $t1")
    assert(edges(p2) == edges(p1), "replayed artifact diverged")
    // replay must be observable as a NO-OP on the workDir — identical
    // results would also pass if the second call silently re-laddered,
    // so assert no new policy_prune_* sibling dirs (and no new files at
    // all) appeared (r16 advice)
    assert(dirSnapshot() == afterLadder,
      s"second call changed the workDir — it re-laddered instead of " +
        s"replaying: ${dirSnapshot().diff(afterLadder)}")
    // a DIFFERENT budget on the same corpus must not hit the decision
    // (the file is budget-keyed): it re-ladders and records its own
    val (_, _, _, t3) = KnnGraph.buildPolicyCached(
      vecs, ck, K, maxRounds = 4, Degree, Alpha, candBeamRounds = 2,
      serveK = K, serveBeamRounds = 3, nProbes = 4)
    assert(t3.nonEmpty, "different-budget call did not evaluate a ladder")
    vecs.unpersist()
  }
}
