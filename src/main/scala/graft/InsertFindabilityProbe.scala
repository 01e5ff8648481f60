package graft

import org.apache.spark.sql.functions._

/** Insert-findability diagnostic (r15): builds a small composed store
  * (cells and corpus are arguments), inserts 4 PERTURBED clones, and
  * prints every link of the findability chain — sidecar append, entry
  * resolution, exact-head serve, quantized-head serve.
  *
  * This probe exists because the r14 "3/4 insert findability" scare
  * unravelled into two separate instrument errors it now guards
  * against (COVERAGE r15): (1) EXACT-clone arrivals on the key-shifted
  * replica are correctly excluded from their own probe's top-k by the
  * corpus's 100 pre-existing duplicates — low-recall stores "found"
  * them only because their walks missed the real answers; (2) even a
  * unique arrival can lose the QUANTIZED head's ADC-shortlist id
  * tie-break when its PQ code doesn't flip against the duplicates — a
  * quantization-resolution property, not an insert defect. The
  * exact-head line is the wiring guarantee (entry-published arrival →
  * pool → exact re-rank top-1, by construction).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.InsertFindabilityProbe
  * [cells] [corpus]" after ScaleProbe materialized the replicas. */
object InsertFindabilityProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-insert-findability", 16)
    import spark.implicits._
    import graft.similarity.{KnnGraph, Pq, VectorOps}
    val cells = if (args.nonEmpty) args(0).toInt else 256
    val corpus = if (args.length > 1) args(1) else "x1"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_scale100") + s"/$corpus"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v")).cache()
    val n = vecs.count()
    println(s"FIND corpus=$corpus n=$n cells=$cells")
    val sample = vecs.select($"vec_id", $"v").orderBy($"vec_id").limit(20000)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val cents = Pq.trainCodebook(sample, cells).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, 8, 8, 16)
    val root = graft.util.Scratch.tempDir("graft-findprobe")
    val g = KnnGraph.buildDurable(vecs, 8, rounds = 1, s"$root/b").last
    val pruned = KnnGraph.robustPrune(vecs,
      KnnGraph.searchCandidates(vecs, g, 8, beamRounds = 2,
        entries = Some(KnnGraph.plannedEntries(vecs, cents)(
          vecs.select($"vec_id".as("qid"), $"v")))),
      8, 1.25).select($"src", $"nbr").localCheckpoint(true)
    KnnGraph.writeStoreClustered(pruned, vecs, s"$root/g", cents)
    KnnGraph.writeEntries(vecs, s"$root/g")
    KnnGraph.writeVectors(vecs, s"$root/vec")
    KnnGraph.writeCodes(Pq.pqEncode(vecs, cb, 8), s"$root/codes")
    val pre = spark.read.parquet(s"$root/g/_graft_entries").count()
    // additive epsilon (r15 advice): ×1.01 on a zero first coordinate
    // would degenerate the arrival back to an exact clone
    val arr = vecs.filter($"vec_id" < 4)
      .select(($"vec_id" + 10000000L).as("vec_id"),
        transform($"v", (x, i) => when(i === 0,
          x + lit(0.01) * (abs(x) + lit(1.0))).otherwise(x))
          .as("v"))
      .localCheckpoint(true)
    graft.streaming.StreamingGraphIngest.insertClusteredBatch(
      arr, s"$root/g", s"$root/vec", 8, 8, codes = Some((s"$root/codes", cb)))
    println("FIND sidecar rows pre/post: " + pre + "/" +
      spark.read.parquet(s"$root/g/_graft_entries").count())
    val probes = arr.select(($"vec_id" + 10000000L).as("qid"), $"v")
      .localCheckpoint(true)
    val ents = KnnGraph.storedEntries(spark, s"$root/g", probes)
    println("FIND entry resolution includes arrival: " +
      ents.filter($"node" >= 10000000L).count() + " of 4")
    val foundExact = KnnGraph.serveFromStoresClusteredWarm(spark,
        s"$root/g", s"$root/vec", probes, 8, 8)
      .filter($"node" === $"qid" - 10000000L).count()
    println("FIND exact head found: " + foundExact + " of 4")
    val foundPq = KnnGraph.serveFromStoresClusteredPqWarm(spark, s"$root/g",
        s"$root/codes", s"$root/vec", probes, cb, 8, 8)
      .filter($"node" === $"qid" - 10000000L).count()
    println("FIND quantized head found: " + foundPq + " of 4")
    spark.stop()
  }
}
