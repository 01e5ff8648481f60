package graft

import org.apache.spark.sql.functions._

/** Graph-erasure scaling probe: the claim under
  * [[graft.similarity.KnnGraph.eraseStored]] is that erase cost is
  * ERASURE-REQUEST-sized — bounded by the victim ∪ neighbor buckets
  * (≤ 1 + k per victim), independent of corpus size. Measured two
  * ways: victim-count series at fixed corpus (wall should grow with
  * touched buckets and saturate at the bucket count), and corpus-size
  * series at fixed victims (wall should stay ~flat from 2 k to 200 k
  * nodes — the 100× replica — because only touched buckets rewrite,
  * though bucket FILES grow with n/buckets at a fixed bucket count;
  * n-scaled bucket counts, which the store property supports, keep
  * even that flat). One JSON line per measurement.
  *
  * Run after ScaleProbe has materialized /tmp/graft_scale100 (the x1
  * and x100 embeddings replicas are reused as the corpora). */
object GraphEraseProbe {

  def main(args: Array[String]): Unit = {
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-graph-erase-probe", cpus)
    import spark.implicits._
    import graft.similarity.{KnnGraph, VectorOps}

    def corpus(dir: String) = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v")).cache()

    for ((label, dir) <- Seq("x1" -> s"$scaleDir/x1", "x100" -> s"$scaleDir/x100")) {
      val vecs = corpus(dir)
      val n = vecs.count()
      val work = graft.util.Scratch.tempDir(s"graft-gep-$label")
      KnnGraph.writeStore(
        KnnGraph.buildDurable(vecs, 8, rounds = 2, s"$work/b").last,
        s"$work/g")
      KnnGraph.writeVectors(vecs, s"$work/vec")
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
        KnnGraph.eraseStored(spark, s"$work/g", victims,
          vecPath = Some(s"$work/vec"))
        val s = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"graph_erase","corpus":"$label","n_nodes":$n,"n_victims":${victims.size},"erase_s":$s%.2f}""")
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
