package graft

/** Adaptive-LSH scaling probe: sq02d's claim is that deriving the
  * signature width from the corpus count keeps per-table buckets at a
  * constant ~32 rows, so the candidate fraction is flat-to-FALLING as
  * the corpus grows — unlike any fixed-width setting, whose fraction
  * is corpus-size-invariant (sq02c's 4-bit arm, the r12 audit's
  * flagged weak spot: ~0.5 of the corpus as candidates at ANY n).
  * Runs sq02d on the layout-matched 1× and 100× embeddings replicas
  * and prints each result row — derived (bits, tables), candidate
  * fraction, recall — as one JSON line, plus wall time.
  *
  * Run after ScaleProbe has materialized /tmp/graft_scale100
  * (SPARK_GRAFT_SCALE_FACTOR=100, SPARK_GRAFT_SCALE_TABLES=embeddings). */
object LshAdaptiveProbe {

  def main(args: Array[String]): Unit = {
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-lsh-adaptive-probe", cpus)

    for ((label, dir) <- Seq("x1" -> s"$scaleDir/x1", "x100" -> s"$scaleDir/x100")) {
      // warm untimed run first (codegen + listings), then time — the
      // ScaleProbe discipline
      queries.SimilarityQueries.sq02dAnnLshAdaptive.fn(spark, dir).collect()
      val t0 = System.nanoTime()
      val row = queries.SimilarityQueries.sq02dAnnLshAdaptive
        .fn(spark, dir).head()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"lsh_adaptive","corpus":"$label","n_vectors":${row.getAs[Long]("n_vectors")},"bits":${row.getAs[Long]("bits_per_table")},"tables":${row.getAs[Long]("n_tables")},"cand_fraction":${row.getAs[Double]("cand_fraction")}%.6f,"recall_at_5":${row.getAs[Double]("recall_at_5")}%.3f,"sec":$s%.2f}""")
    }
    spark.stop()
  }
}
