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
}
