package graft

import org.apache.spark.sql.functions._

/** Deep-history erase probe (r11 verdict ask #7): the claim under
  * [[graft.sources.Snapshots.erase]] is that cost is proportional to
  * CONTAMINATED BYTES, not to the number of retained versions — the
  * contamination scan is one pushed-filter pass over the distinct file
  * set, each contaminated file is rewritten once no matter how many
  * manifests reference it, and the per-version work is only a tiny
  * manifest republish. The r11 probe scaled DATA (1.2 at 10×); this one
  * scales HISTORY: tables with 5 / 25 / 50 retained versions built by
  * staged commits that all SHARE the same base files (the append
  * shape), where one victim key contaminates a single base file.
  *
  * Expected: erase wall ~flat in version count (the file-rewrite term
  * is constant; only the manifest republish grows, and it is
  * metadata-sized), and a second series at depth 50 with predicates
  * touching 1 → half → all base files shows the wall tracking
  * contaminated bytes. One JSON line per measurement.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.EraseDepthProbe"
  * (or plain java with the Spark jars on the classpath). */
object EraseDepthProbe {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-erase-depth-probe", cpus)
    import spark.implicits._
    import graft.sources.{Snapshots, Tables}

    val docs = Tables.documents(spark, base)
      .select($"doc_id", $"lang", $"n_chars", $"text")
      .repartition(16).cache()
    docs.count()

    /** A table whose history is `depth` versions: v1 = the full base in
      * 16 files; each later version re-stages every prior file plus one
      * tiny fresh append — the shape a daily-append table grows. */
    def buildTable(depth: Int): String = {
      val path = graft.util.Scratch.tempDir(s"graft-erase-depth$depth") + "/t"
      val v1 = Snapshots.commit(spark, path, docs)
      var prev = v1
      for (i <- 2 to depth) {
        val extraId = 10000000L + i
        val extra = Snapshots.commit(spark, path,
          Seq((extraId, "xx", 1L, s"appended-$i"))
            .toDF("doc_id", "lang", "n_chars", "text"))
        prev = Snapshots.commitStaged(spark, path,
          Snapshots.manifest(spark, path, prev) ++
            Snapshots.manifest(spark, path, extra))
      }
      path
    }

    def timeErase(path: String, pred: org.apache.spark.sql.Column): (Double, Int) = {
      val t0 = System.nanoTime()
      val report = Snapshots.erase(spark, path, pred)
      ((System.nanoTime() - t0) / 1e9, report.deletedFiles.size)
    }
    // each loop iteration of buildTable makes TWO commits (the tiny
    // append's own version plus the staged combination), so report the
    // table's ACTUAL retained-version count, not the loop depth
    def nVersions(path: String): Int = Snapshots.versions(spark, path).size

    // series 1: fixed contamination (one key -> ~1 base file), growing
    // version depth — wall must stay ~flat
    for (depth <- Seq(5, 25, 50)) {
      val path = buildTable(depth)
      val nv = nVersions(path)
      val (s, files) = timeErase(path, $"doc_id" === 1234)
      println(f"""{"probe":"erase_depth","versions":$nv,"contaminated_files":$files,"erase_s":$s%.2f}""")
    }
    // series 2: fixed depth, growing contaminated FILE SET — wall must
    // track contaminated files/bytes. The base's 16 files are
    // hash-distributed, so the mod predicates touch all of them; the
    // file-count axis comes from the per-version appended files
    // (one_key: 1 base file; mod3: +every third append; mod2: +every
    // second append) plus the rewrite output volume.
    for ((label, pred) <- Seq(
        "one_key" -> ($"doc_id" === 1234),
        "mod3_rows" -> ($"doc_id" % 3 === 0),
        "mod2_rows" -> ($"doc_id" % 2 === 0))) {
      val path = buildTable(50)
      val nv = nVersions(path)
      val (s, files) = timeErase(path, pred)
      println(f"""{"probe":"erase_bytes","pred":"$label","versions":$nv,"contaminated_files":$files,"erase_s":$s%.2f}""")
    }
    spark.stop()
  }
}
