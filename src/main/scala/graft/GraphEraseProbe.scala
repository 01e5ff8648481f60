package graft

import org.apache.spark.sql.functions._

/** Graph-erasure scaling probe: the claim under
  * [[graft.similarity.KnnGraph.eraseStored]] is that erase cost is
  * ERASURE-REQUEST-sized — bounded by the victim ∪ neighbor buckets
  * (≤ 1 + k per victim), independent of corpus size. Measured two
  * ways: victim-count series at fixed corpus (wall should grow with
  * touched buckets and saturate at the bucket count), and corpus-size
  * series at fixed victims (wall should stay ~flat from 2 k to 200 k
  * nodes — the 100× replica — because only touched buckets rewrite).
  *
  * Each corpus runs THREE sizing arms over the SAME three stores
  * (graph adjacency + wide d=64 vector rows + narrow flat-PQ code
  * rows): `fixed` (the legacy 32-bucket constant), `scaled`
  * ([[graft.similarity.KnnGraph.scaledBuckets]] at a rows target —
  * the r12 policy whose metadata-floor pathology the r13 sweep
  * measured: 3125 KB-sized buckets cost 6× the fixed layout), and
  * `bytes` ([[graft.similarity.KnnGraph.autoBuckets]], the writers'
  * default — each store sizes by its OWN sampled row width, so the
  * wide and narrow stores get different counts at the same byte
  * budget). Per-store bucket counts ride in-row. One JSON line per
  * measurement.
  *
  * Run after ScaleProbe has materialized /tmp/graft_scale100 (the x1
  * and x100 embeddings replicas are reused as the corpora). */
object GraphEraseProbe {

  def main(args: Array[String]): Unit = {
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-graph-erase-probe", cpus)
    import spark.implicits._
    import graft.similarity.{KnnGraph, Pq, VectorOps}

    def corpus(dir: String) = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v")).cache()

    // rows-per-bucket target for the scaled arm (SPARK_GRAFT_SCALED_TARGET,
    // default 64): sweeping it maps the rows policy's tradeoff — too
    // small a target explodes bucket/file counts until listing swamps
    // the saved rewrite bytes (measured r13: 3125 buckets at target 64
    // on the x100 corpus cost 6× the fixed layout), too large
    // reproduces the fixed layout's grows-with-n residual. The bytes
    // arm should sit at or under the best hand-picked point on BOTH
    // the wide and narrow stores — that is the r14 acceptance bar.
    val target = sys.env.getOrElse("SPARK_GRAFT_SCALED_TARGET", "64").toLong
    // stable per-corpus build root: re-runs (e.g. a target sweep) resume
    // the durable build instead of paying NN-Descent again
    val workRoot = sys.env.getOrElse("SPARK_GRAFT_PROBE_WORK", "/tmp/graft_gep")
    for ((label, dir) <- Seq("x1" -> s"$scaleDir/x1", "x100" -> s"$scaleDir/x100")) {
      val vecs = corpus(dir)
      val n = vecs.count()
      val work = graft.util.Scratch.tempDir(s"graft-gep-$label")
      // ONE durable build per corpus; all sizing arms re-partition the
      // same final round, so the arms differ only in bucket counts
      val built = KnnGraph.buildDurable(vecs, 8, rounds = 2,
        s"$workRoot/$label/b").last
      // one frozen codebook per corpus: the codes sidecar is the NARROW
      // store (M=8 small ints/row vs 64 doubles) the bytes policy must
      // size differently from the vectors at the same byte budget
      val sample = vecs.select($"vec_id", $"v").orderBy($"vec_id").limit(20000)
        .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
      val cb = Pq.trainSubspaces(sample, 8, 8, 16)
      val codes = Pq.pqEncode(vecs, cb, 8).localCheckpoint(true)
      for ((mode, nb) <- Seq(
          "fixed" -> KnnGraph.NumBuckets,
          "scaled" -> KnnGraph.scaledBuckets(n, targetRowsPerBucket = target),
          "bytes" -> KnnGraph.AutoBuckets)) {
        KnnGraph.writeStore(built, s"$work/g_$mode", nb)
        KnnGraph.writeVectors(vecs, s"$work/vec_$mode", nb)
        KnnGraph.writeCodes(codes, s"$work/codes_$mode", nb)
        val nbG = KnnGraph.bucketsOf(spark, s"$work/g_$mode")
        val nbV = KnnGraph.bucketsOf(spark, s"$work/vec_$mode")
        val nbC = KnnGraph.bucketsOf(spark, s"$work/codes_$mode")
        val erased = scala.collection.mutable.Set.empty[Long]
        for (nv <- Seq(1, 8, 32)) {
          // fresh victim ids per series step (erase is destructive, so a
          // re-erased id would be a cheap no-op that skews the series);
          // a prime stride spreads them across buckets, and the used-set
          // guarantees disjointness between steps
          val victims = Iterator.from(0).map(i => (101L + i * 61L) % n)
            .filterNot(erased).distinct.take(nv).toSeq
          erased ++= victims
          val t0 = System.nanoTime()
          KnnGraph.eraseStored(spark, s"$work/g_$mode", victims,
            vecPath = Some(s"$work/vec_$mode"),
            codesPath = Some(s"$work/codes_$mode"))
          val s = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"graph_erase","corpus":"$label","mode":"$mode","n_buckets_graph":$nbG,"n_buckets_vec":$nbV,"n_buckets_codes":$nbC,"n_nodes":$n,"n_victims":${victims.size},"erase_s":$s%.2f}""")
        }
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
