package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact-dedup — the streaming half of the LLM-pipeline dedup
  * story (batch half: dq01/dq02).
  *
  * Two distinct semantics, both pinned here:
  *   - `dropDuplicates("fp")`: exact forever-dedup. The watermark does
  *     NOT evict this state (eviction only happens when the event-time
  *     column is part of the dedup key) — state grows with the stream's
  *     full fingerprint history. Correct semantics, unbounded state.
  *   - `dropDuplicatesWithinWatermark("fp")`: dedup on fp alone with
  *     state EVICTED once the watermark passes a row's event time — the
  *     bounded-state form an infinite 100 TB/day stream must run. The
  *     price: a duplicate arriving after eviction is emitted again, and
  *     the second test proves exactly that trade.
  */
case class StreamDoc(doc_id: Long, text: String, event_ts: java.sql.Timestamp)

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decontamination at ingest: broadcast Bloom probe flags eval overlap on the stream") {
    // the streaming half of dq07b: the eval-set Bloom filter is built
    // ONCE in batch (driver-side, broadcast), then applied to arriving
    // docs as the same codegen'd BloomProbe expression — stateless, so
    // it composes with checkpointing like any projection. No false
    // negatives: every doc sharing an 8-shingle with the eval set MUST
    // be flagged; clean docs may only false-positive at the configured
    // fpp (none here, asserted exactly against the batch join).
    import spark.implicits._
    import graft.dedup.Shingles
    implicit val sqlCtx = spark.sqlContext

    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
      .withColumn("toks", Shingles.tokens($"text")).filter(size($"toks") >= 8)
    val evalSet = docs.filter($"doc_id" % 7 === 3)
      .select(explode(Shingles.shinglesN($"toks", 8)).as("sh")).distinct().cache()
    val bloom = evalSet.stat.bloomFilter("sh", math.max(evalSet.count(), 1L), 0.01)
    val bloomB = spark.sparkContext.broadcast(bloom)

    // ground truth from the exact batch join
    val corpus = docs.filter($"doc_id" % 7 =!= 3).limit(60)
      .select($"doc_id", $"text").cache()
    val truth = corpus
      .withColumn("toks", Shingles.tokens($"text"))
      .select($"doc_id", explode(Shingles.shinglesN($"toks", 8)).as("sh"))
      .join(broadcast(evalSet), Seq("sh"))
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(truth.nonEmpty, "fixture must contain planted contamination")

    // production shape (dq07b on the stream): Bloom DECIMATES the
    // exploded shingles map-side (fpp is per PROBE — a doc with 100
    // shingles would false-positive at ~1-(0.99^100)≈63% doc-level, so
    // the Bloom alone is never the verdict), then the exact broadcast
    // confirm join inside foreachBatch yields exact flags
    val out = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    val stream = MemoryStream[(Long, String)]
    val query = stream.toDF().toDF("doc_id", "text")
      .withColumn("toks", Shingles.tokens($"text"))
      .select($"doc_id", explode(Shingles.shinglesN($"toks", 8)).as("sh"))
      .filter(graft.functions.BloomProbe.mightContain(bloomB, $"sh"))
      .writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batch.join(broadcast(evalSet), Seq("sh"))
            .select($"doc_id").distinct()
            .write.mode("append").parquet(s"$out/flags")
          ()
      }
      .start()
    try {
      val rows = corpus.as[(Long, String)].collect()
      stream.addData(rows.take(30).toSeq)
      query.processAllAvailable()
      stream.addData(rows.drop(30).toSeq)
      query.processAllAvailable()
      val streamFlagged = spark.read.parquet(s"$out/flags")
        .as[Long].collect().toSet
      assert(streamFlagged == truth,
        s"streaming decontam must equal the exact batch join: " +
          s"missed=${truth -- streamFlagged} extra=${streamFlagged -- truth}")
    } finally {
      query.stop()
      corpus.unpersist(); evalSet.unpersist()
    }
  }

  test("duplicate payloads are dropped across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamDoc]
    val deduped = stream.toDS()
      .withColumn("fp", sha2(lower(regexp_replace(trim($"text"), "\\s+", " ")), 256))
      .withWatermark("event_ts", "1 hour")
      .dropDuplicates("fp")
    val query = deduped.writeStream
      .format("memory")
      .queryName("dedup_sink")
      .outputMode("append")
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
      def ts(mins: Int) = new java.sql.Timestamp(t0.getTime + mins * 60000L)
      stream.addData(
        StreamDoc(1, "the quick brown fox", ts(0)),
        StreamDoc(2, "  THE  QUICK   BROWN FOX ", ts(1)), // same canonical form as 1
        StreamDoc(3, "a different document", ts(2)))
      query.processAllAvailable()
      stream.addData(
        StreamDoc(4, "the quick brown fox", ts(3)), // dup of 1 across batches
        StreamDoc(5, "yet another document", ts(4)))
      query.processAllAvailable()
      val kept = spark.table("dedup_sink").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 5L), s"kept $kept")
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark bounds state: dups die in-window, evicted keys re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamDoc]
    val deduped = stream.toDS()
      .withColumn("fp", sha2(lower(regexp_replace(trim($"text"), "\\s+", " ")), 256))
      .withWatermark("event_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
    val query = deduped.writeStream
      .format("memory")
      .queryName("dedup_wm_sink")
      .outputMode("append")
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
      def ts(mins: Int) = new java.sql.Timestamp(t0.getTime + mins * 60000L)
      stream.addData(
        StreamDoc(1, "the quick brown fox", ts(0)),
        StreamDoc(2, "the quick brown fox", ts(1))) // in-window dup: dropped
      query.processAllAvailable()
      // advance the watermark to 50 min — past doc 1's event time, so its
      // fingerprint state is eligible for eviction after this batch
      stream.addData(StreamDoc(3, "watermark mover", ts(60)))
      query.processAllAvailable()
      // same payload again, AFTER its state was evicted: emitted anew —
      // the documented trade for bounded state
      stream.addData(StreamDoc(4, "the quick brown fox", ts(61)))
      query.processAllAvailable()
      val kept = spark.table("dedup_wm_sink").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 4L),
        s"kept $kept — expected in-window dup 2 dropped, evicted-key re-arrival 4 emitted")
    } finally query.stop()
  }
}
