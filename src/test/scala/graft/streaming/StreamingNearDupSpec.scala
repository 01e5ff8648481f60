package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** MinHash-LSH dedup at ingest: the band index lives in transformWithState
  * (RocksDB provider, conf set per-test and restored), docs are admitted
  * or flagged the moment they arrive, and claims persist across
  * micro-batches. Keep-first semantics must match dq02's rule; band
  * arithmetic is shared with batch dq03 via MinHashLsh.bandKeys.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("clones are flagged against claims from EARLIER micro-batches; uniques admitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val textA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val textB = "distributed query engines shuffle partitioned data across executor nodes constantly"
    val textC = "streaming state stores persist band claims between micro batches durably here"
    val tiny = "no"

    val out = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val stream = MemoryStream[(Long, String)]
    val query = withRocksDb {
      StreamingNearDup.start(
        stream.toDF().toDF("doc_id", "text"), s"$out/flags", s"$out/ckpt")
    }
    try {
      // batch 1: three shingleable originals + one sub-shingle doc
      stream.addData((1L, textA), (2L, textB), (3L, textC), (4L, tiny))
      query.processAllAvailable()
      // batch 2: exact clone of 1 (all bands collide), clone of the tiny
      // doc (fallback exact band), in-batch clone pair (7 claims, 8 dups),
      // and a genuinely new doc
      stream.addData((6L, textA), (5L, tiny),
        (7L, textB + " with novel suffix tokens appended"),
        (8L, textB + " with novel suffix tokens appended"),
        (9L, "completely fresh content about container image layer caching semantics"))
      query.processAllAvailable()

      val flags = spark.read.parquet(s"$out/flags")
        .select($"doc_id", $"is_dup", $"dup_of", $"batch_id")
        .as[(Long, Boolean, Option[Long], Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(flags.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L),
        "every doc gets exactly one verdict row")
      // batch-1 originals all admitted
      Seq(1L, 2L, 3L, 4L).foreach { id =>
        assert(flags(id) == ((false, None, 0L)), s"doc $id: ${flags(id)}") }
      // cross-batch exact clone: every band owned by doc 1
      assert(flags(6L) == ((true, Some(1L), 1L)))
      // cross-batch short-doc clone via the exact-content fallback band
      assert(flags(5L) == ((true, Some(4L), 1L)))
      // in-batch pair: lowest doc_id claims, the other is its dup
      assert(flags(7L)._1 == false)
      assert(flags(8L) == ((true, Some(7L), 1L)))
      assert(flags(9L) == ((false, None, 1L)))
    } finally query.stop()
  }

  test("restart from checkpoint keeps band claims: a clone after restart is still flagged") {
    import spark.implicits._
    val text = "checkpointed state must survive a full query restart for exactly once ingest"
    val base = java.nio.file.Files.createTempDirectory("graft-neardup2").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def docsStream = spark.readStream.schema(schema).json(in)
    def run(): Unit = withRocksDb {
      StreamingNearDup.start(docsStream, s"$base/flags", s"$base/ckpt",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
        .awaitTermination()
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      s"""{"doc_id": 1, "text": "$text"}""")
    run()
    // full query restart, same checkpoint, clone arrives: the RocksDB
    // band claims must be restored for the clone to be flagged
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b2.json"),
      s"""{"doc_id": 2, "text": "$text"}""")
    run()

    val flags = spark.read.parquet(s"$base/flags")
      .select($"doc_id", $"is_dup", $"dup_of")
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(flags(1L) == ((false, None)))
    assert(flags(2L) == ((true, Some(1L))), "claim must survive the restart")
  }

  test("verified filter admits a band-colliding but low-Jaccard pair the candidate filter drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // moderate-overlap corpus: shared 8-token prefix, unique 16-token
    // tails → pairwise Jaccard ~0.2, far below tau=0.8. With 16 bands of
    // ONE hash each, a J=0.2 pair still collides in >=1 band with
    // p ~ 1-(0.8)^16 ~ 0.97 — exactly the false-drop regime the verified
    // filter exists for. The colliding pair is found through the BATCH
    // pipeline (same hash family), so the test is deterministic without
    // hand-tuning texts.
    val prefix = "shared corpus header tokens appear in every document body"
    def doc(i: Int) = prefix + " " +
      (0 until 16).map(j => s"tail${i}x$j").mkString(" ")
    val docsDf = (0 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val pair = graft.dedup.MinHashLsh.candidatePairs(docsDf, 16, 16)
      .filter($"jaccard" < 0.6)
      .orderBy($"doc_a", $"doc_b")
      .as[(Long, Long, Double)].head()
    val (a, b, j) = pair
    info(f"colliding low-Jaccard pair: ($a, $b) at J=$j%.3f")

    val out = java.nio.file.Files.createTempDirectory("graft-ndverify").toString
    def runBoth(streamDocs: Seq[Seq[(Long, String)]]): (Map[Long, Boolean], Map[Long, (Boolean, Boolean)]) =
      withRocksDb {
        val cand = MemoryStream[(Long, String)]
        val verf = MemoryStream[(Long, String)]
        val qc = StreamingNearDup.start(
          cand.toDF().toDF("doc_id", "text"), s"$out/cand", s"$out/candCkpt",
          numHashes = 16, numBands = 16)
        val qv = StreamingNearDup.startVerified(
          verf.toDF().toDF("doc_id", "text"), s"$out/verf", s"$out/verfCkpt",
          numHashes = 16, numBands = 16, tau = 0.8)
        try {
          streamDocs.foreach { batch =>
            cand.addData(batch); verf.addData(batch)
            qc.processAllAvailable(); qv.processAllAvailable()
          }
          val cFlags = spark.read.parquet(s"$out/cand")
            .select($"doc_id", $"is_dup").as[(Long, Boolean)]
            .collect().toMap
          val vFlags = spark.read.parquet(s"$out/verf")
            .select($"doc_id", $"is_candidate", $"is_dup")
            .as[(Long, Boolean, Boolean)].collect()
            .map(r => r._1 -> ((r._2, r._3))).toMap
          (cFlags, vFlags)
        } finally { qc.stop(); qv.stop() }
      }
    val (cFlags, vFlags) = runBoth(Seq(Seq((a, doc(a.toInt))), Seq((b, doc(b.toInt)))))
    // candidate criterion: the band collision alone drops doc b
    assert(cFlags(a) == false && cFlags(b) == true,
      s"candidate filter should drop $b on collision: $cFlags")
    // verified criterion: the same collision is seen (is_candidate) but
    // exact Jaccard vs the owner is < tau, so the doc is ADMITTED
    assert(vFlags(a) == ((false, false)))
    assert(vFlags(b) == ((true, false)),
      s"verified filter must admit the low-Jaccard collision: ${vFlags(b)}")
  }

  test("verified filter still drops true clones; null-text docs get verdicts and dedup exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "genuine duplicate documents must still be dropped by the verified ingest filter"
    val out = java.nio.file.Files.createTempDirectory("graft-ndnull").toString
    val stream = MemoryStream[(Long, String)]
    val query = withRocksDb {
      StreamingNearDup.startVerified(
        stream.toDF().toDF("doc_id", "text"), s"$out/flags", s"$out/ckpt")
    }
    try {
      // batch 1: an original + a NULL-text doc (r8 ADVICE: these used to
      // vanish from the filter entirely)
      stream.addData((1L, text), (2L, null))
      query.processAllAvailable()
      // batch 2: exact clone (J=1 vs owner) + a second null-text doc
      // (exact-content fallback family → J=1 by construction)
      stream.addData((3L, text), (4L, null))
      query.processAllAvailable()
      val flags = spark.read.parquet(s"$out/flags")
        .select($"doc_id", $"is_dup", $"dup_of", $"max_jaccard")
        .as[(Long, Boolean, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(flags.keySet == Set(1L, 2L, 3L, 4L),
        "every doc — null text included — gets exactly one verdict row")
      assert(flags(1L) == ((false, None, None)))
      assert(flags(2L) == ((false, None, None)), "first null doc is admitted")
      assert(flags(3L) == ((true, Some(1L), Some(1.0))), "true clone dropped at J=1")
      assert(flags(4L) == ((true, Some(2L), Some(1.0))),
        "second null doc dups the first via the exact-content family")
    } finally query.stop()
  }
}
