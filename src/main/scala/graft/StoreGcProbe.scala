package graft

import org.apache.spark.sql.functions._

/** Store-version retention probe (r16 verdict #6): drive N
  * insert→erase→incremental-reprune maintenance cycles, each published
  * copy-on-write as a new registered+promoted version, and measure the
  * version DAG's disk footprint per cycle — APPARENT bytes (every
  * version dir summed as `du` would without link awareness) vs
  * PHYSICAL bytes (each inode counted once — what the disk actually
  * holds) vs the REAPED arm (IndexLifecycle.reap after every promote,
  * retention = pinned + rollback target + latest). The cycles are
  * deterministic, so the two arms' stores are identical and the tables
  * compare like-for-like.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StoreGcProbe"
  * Knobs: SPARK_GRAFT_GC_DIR (corpus parquet dir; default the x10
  *        fresh corpus), SPARK_GRAFT_GC_CYCLES (default 10),
  *        SPARK_GRAFT_GC_REAP (1 = reap after each promote). */
object StoreGcProbe {

  /** (apparent, physical) bytes across the given directories: apparent
    * sums every regular file; physical counts each (dev, inode) once —
    * the hard-link-aware disk truth. Local-filesystem walker (the
    * probe's realization; an object store has no links to dedup). */
  def footprint(dirs: Seq[String]): (Long, Long) = {
    import java.nio.file.{Files, Path, Paths}
    var apparent = 0L
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    var physical = 0L
    def walk(p: Path): Unit = {
      if (!Files.exists(p)) return
      val s = Files.walk(p)
      try {
        s.forEach { f =>
          if (Files.isRegularFile(f)) {
            val size = Files.size(f)
            apparent += size
            val dev = Files.getAttribute(f, "unix:dev")
              .asInstanceOf[Long]
            val ino = Files.getAttribute(f, "unix:ino")
              .asInstanceOf[Long]
            if (seen.add((dev, ino))) physical += size
          }
        }
      } finally s.close()
    }
    dirs.foreach(d => walk(Paths.get(d)))
    (apparent, physical)
  }

  def main(args: Array[String]): Unit = {
    val corpus = sys.env.getOrElse("SPARK_GRAFT_GC_DIR",
      "/tmp/graft_scale100f/x10")
    val cycles = sys.env.getOrElse("SPARK_GRAFT_GC_CYCLES", "10").toInt
    val doReap = sys.env.get("SPARK_GRAFT_GC_REAP").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-store-gc-probe", cpus)
    import spark.implicits._
    import graft.similarity.{KnnGraph, Pq, VectorOps}

    val k = 8; val degree = 8; val alpha = 1.25
    val vecs = spark.read.parquet(s"$corpus/embeddings.parquet")
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v")).cache()
    val n = vecs.count()
    val cells = KnnGraph.scaledCells(n)
    val sample = vecs.select($"vec_id", $"v").orderBy($"vec_id")
      .limit(20000).collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val cents = Pq.trainCodebook(sample, cells).map(_.toSeq).toSeq
    val root = graft.util.Scratch.tempDir(
      s"graft-gc-probe-${if (doReap) "reap" else "keep"}")
    val graph = KnnGraph.buildDurable(vecs, k, 2, s"$root/build").last
    val pruned = KnnGraph.robustPrune(vecs,
        KnnGraph.searchCandidates(vecs, graph, k, beamRounds = 3),
        degree, alpha).select($"src", $"nbr")
    KnnGraph.writeStoreClustered(pruned, vecs, s"$root/v1", cents)
    KnnGraph.writeEntries(vecs, s"$root/v1")
    KnnGraph.writeVectors(vecs, s"$root/vec")
    val reg = s"$root/registry"
    graft.ml.IndexLifecycle.register(spark, reg, "g",
      "knn_graph_composed", s"$root/v1", 1)
    graft.ml.IndexLifecycle.promote(spark, reg, "g", 1)
    var live = Seq(s"$root/v1")
    def emit(cycle: Int, scope: Long, wall: Double, reapedN: Int): Unit = {
      val (app, phys) = footprint(live)
      println(f"""{"probe":"store_gc","reap":$doReap,"cycle":$cycle,"versions_live":${live.size},"apparent_mb":${app / 1e6}%.1f,"physical_mb":${phys / 1e6}%.1f,"scope":$scope,"wall_s":$wall%.1f,"reaped":$reapedN}""")
    }
    emit(0, 0L, 0.0, 0)
    for (c <- 1 to cycles) {
      val t0 = System.nanoTime()
      val cur = graft.ml.IndexLifecycle.pinnedPath(spark, reg, "g").get
      // churn: 4 perturbed arrivals (coordinate c mod dim, additive),
      // then erase 2 of them — the insert→erase mix consolidation absorbs
      val arrivals = vecs.filter($"vec_id" < 4)
        .select(($"vec_id" + 1000000L + c * 10L).as("vec_id"),
          transform($"v", (x, i) => when(i === c % 64,
            x + lit(0.01) * (abs(x) + lit(1.0))).otherwise(x)).as("v"))
        .localCheckpoint(true)
      graft.streaming.StreamingGraphIngest.insertClusteredBatch(
        arrivals, cur, s"$root/vec", k, beamRounds = 3)
      val victims = Seq(1000000L + c * 10L, 1000001L + c * 10L)
      val vicCells = arrivals.filter($"vec_id".isin(victims: _*))
        .select(KnnGraph.clusterOf($"v", cents).as("cc"))
        .as[Int].collect().toSeq.distinct
      KnnGraph.eraseStoredClustered(spark, cur, victims,
        vecPath = s"$root/vec", eraseVectors = true)
      val next = s"$root/v${c + 1}"
      val churn = arrivals.select($"vec_id")
      val scope = KnnGraph.repruneStoredIncremental(spark, cur,
        s"$root/vec", next, degree, alpha, k, beamRounds = 3,
        churn = churn, extraCells = vicCells)
      graft.ml.IndexLifecycle.register(spark, reg, "g",
        "knn_graph_composed", next, c + 1)
      graft.ml.IndexLifecycle.promote(spark, reg, "g", c + 1)
      live = live :+ next
      val reaped = if (doReap) {
        val r = graft.ml.IndexLifecycle.reap(spark, reg, "g")
        live = live.filterNot(r.contains)
        r.size
      } else 0
      emit(c, scope, (System.nanoTime() - t0) / 1e9, reaped)
    }
    spark.stop()
  }
}
