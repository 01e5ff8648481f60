package graft

import org.apache.spark.sql.functions._

/** Serving-head crossover probe: [[graft.similarity.KnnGraph
  * .serveCoordinated]]'s scaladoc claims the coordinated head wins for
  * request-batch-sized |Q| and the distributed loop
  * ([[graft.similarity.KnnGraph.serveFromStores]]) for |Q| in the
  * thousands — this measures the crossover instead of arguing it.
  * Both heads serve the SAME stored graph + vector store with ring
  * entries at |Q| ∈ {16, 128, 1024}; answers are equality-proven in
  * StoredGraphSpec, so only wall differs. Three sizing arms per corpus
  * — `fixed` 32 buckets, `scaled` ([[graft.similarity.KnnGraph
  * .scaledBuckets]], the rows policy), and `bytes`
  * ([[graft.similarity.KnnGraph.autoBuckets]], the writers' default)
  * — measure what the bucket-count policy costs or buys at serve
  * time. One JSON line per cell.
  *
  * Run after ScaleProbe has materialized /tmp/graft_scale100 (the x1
  * and x100 embeddings replicas are the corpora). */
object GraphServeProbe {

  def main(args: Array[String]): Unit = {
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-graph-serve-probe", cpus)
    import spark.implicits._
    import graft.similarity.{KnnGraph, VectorOps}

    for ((label, dir) <- Seq("x1" -> s"$scaleDir/x1", "x100" -> s"$scaleDir/x100")) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", VectorOps.toDouble($"embedding").as("v")).cache()
      val n = vecs.count()
      val work = graft.util.Scratch.tempDir(s"graft-gsp-$label")
      val target = sys.env.getOrElse("SPARK_GRAFT_SCALED_TARGET", "64").toLong
      val workRoot = sys.env.getOrElse("SPARK_GRAFT_PROBE_WORK", "/tmp/graft_gep")
      // ONE durable build per corpus (shared with GraphEraseProbe's
      // stable root — both probes serve the same final round); the
      // layout arms re-partition it, so serving differs only in bucket
      // count. SPARK_GRAFT_SCALED_TARGET sweeps the scaled arm's
      // rows-per-bucket (see GraphEraseProbe on the tradeoff).
      val built = KnnGraph.buildDurable(vecs, 8, rounds = 2,
        s"$workRoot/$label/b").last
      // SPARK_GRAFT_SERVE_QS trims the |Q| series: the scaled arm at
      // |Q|=1024 multiplies per-round listings by candidate-set isin
      // width — pathological at fixture scale (the erase probe's
      // metadata-floor finding), and not what the arm measures
      val qs = sys.env.getOrElse("SPARK_GRAFT_SERVE_QS", "16,128,1024")
        .split(",").map(_.trim.toInt).toSeq
      for ((mode, nb) <- Seq(
          "fixed" -> KnnGraph.NumBuckets,
          "scaled" -> KnnGraph.scaledBuckets(n, targetRowsPerBucket = target),
          // the writers' bytes-driven default: graph and vector stores
          // each size by their own sampled row width
          "bytes" -> KnnGraph.AutoBuckets)) {
        KnnGraph.writeStore(built, s"$work/g_$mode", nb)
        KnnGraph.writeVectors(vecs, s"$work/vec_$mode", nb)
        val nbG = KnnGraph.bucketsOf(spark, s"$work/g_$mode")
        val nbV = KnnGraph.bucketsOf(spark, s"$work/vec_$mode")
        for (q <- qs) {
          val queries = vecs.filter($"vec_id" < q)
            .select($"vec_id".as("qid"), $"v").cache()
          queries.count()
          // warm both paths once (codegen + listings), then time. The
          // explicit ring map mirrors serveFromStores' ringEntries
          // default (dense replica ids), so both heads walk the SAME
          // beams and the cell isolates the coordination cost
          val qLocal = queries.as[(Long, Seq[Double])].collect()
            .map { case (id, v) => id -> v.toArray }.toSeq
          val ringMap = qLocal.map { case (id, _) =>
            id -> Math.floorMod(id * 37 + 1, n) }.toMap
          KnnGraph.serveCoordinated(spark, s"$work/g_$mode", s"$work/vec_$mode",
            qLocal, 8, beamRounds = 3, entries = Some(ringMap)): Unit
          val tC = System.nanoTime()
          val nC = KnnGraph.serveCoordinated(spark, s"$work/g_$mode",
            s"$work/vec_$mode", qLocal, 8, beamRounds = 3,
            entries = Some(ringMap)).size
          val cMs = (System.nanoTime() - tC) / 1e6 / q
          KnnGraph.serveFromStores(spark, s"$work/g_$mode", s"$work/vec_$mode",
            queries, 8, beamRounds = 3).count(): Unit
          val tD = System.nanoTime()
          val nD = KnnGraph.serveFromStores(spark, s"$work/g_$mode",
            s"$work/vec_$mode", queries, 8, beamRounds = 3).count()
          val dMs = (System.nanoTime() - tD) / 1e6 / q
          require(nC.toLong == nD, s"answer count mismatch $nC vs $nD")
          println(f"""{"probe":"graph_serve","corpus":"$label","mode":"$mode","n_buckets_graph":$nbG,"n_buckets_vec":$nbV,"n_q":$q,"coordinated_ms_per_q":$cMs%.1f,"distributed_ms_per_q":$dMs%.1f}""")
          queries.unpersist()
        }
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
