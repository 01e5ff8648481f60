package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ETL throughput floor: the reference's pipeline was
  * producer-bound at 1 msg/s (real_time_data_simulation.py:22); the
  * engine's micro-batch ETL must sustain orders of magnitude more. This
  * asserts a conservative floor (>2,000 rows/s through the full regex
  * cascade on the test box) and prints the measured figure for the
  * bench record.
  */
class ThroughputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming ETL sustains >2k rows/s through the full cascade") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val etl = StreamingEtl.transform(stream.toDF())
    val query = etl.writeStream
      .format("noop")
      .outputMode("append")
      .start()
    try {
      val n = 40000
      val lines = (0 until n).map { i =>
        s"""{"job_title": "Job $i", "city": "Hà Nội", "salary": "${10 + i % 30} - ${20 + i % 30} triệu",
           |"experience": "${i % 10} - ${i % 10 + 3} năm", "skills": "Python, SQL",
           |"job_fields": "IT", "position_level": "Senior", "job_type": "FT",
           |"unit": "trieu", "event_time": "2024-03-01 10:00:00", "event_type": "c"}"""
          .stripMargin.replaceAll("\n", " ")
      }
      // warm the stream machinery outside the timed window
      stream.addData(lines.take(100))
      query.processAllAvailable()
      val t0 = System.nanoTime()
      stream.addData(lines)
      query.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = n / secs
      info(f"streaming ETL throughput: $rate%.0f rows/s over $n rows in $secs%.2f s")
      assert(rate > 2000, f"throughput $rate%.0f rows/s below floor")
    } finally query.stop()
  }

  private def measure[A](n: Int, warm: Seq[A], timedRows: Seq[A],
      mk: MemoryStream[A] => org.apache.spark.sql.streaming.DataStreamWriter[_])
      (implicit enc: org.apache.spark.sql.Encoder[A]): Double = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[A]
    val query = mk(stream).start()
    try {
      stream.addData(warm: _*)
      query.processAllAvailable()
      val t0 = System.nanoTime()
      stream.addData(timedRows: _*)
      query.processAllAvailable()
      n / ((System.nanoTime() - t0) / 1e9)
    } finally query.stop()
  }

  test("stateful throughput: mapGroupsWithState and flatMapGroupsWithState paths") {
    import spark.implicits._
    val n = 40000
    // 500 hot keys — state ops dominate, not key-space growth
    val postings = (0 until n).map(i => (s"city${i % 500}", 10.0 + i % 30))
    val profileRate = measure[(String, Double)](n,
      postings.take(100), postings,
      s => Sessionize.cityProfiles(s.toDF().toDF("city", "salary_avg"))
        .writeStream.format("noop").outputMode(Sessionize.outputMode.toString))
    info(f"mapGroupsWithState (cityProfiles): $profileRate%.0f rows/s over $n rows")
    assert(profileRate > 2000, f"$profileRate%.0f rows/s below floor")

    val base = java.sql.Timestamp.valueOf("2024-03-01 09:00:00").getTime
    val events = (0 until n).map(i =>
      Sessionize.SessionEvent(i % 500L, new java.sql.Timestamp(base + (i / 500) * 1000L)))
    val sessionRate = measure[Sessionize.SessionEvent](n,
      events.take(100), events,
      s => Sessionize.closedSessions(s.toDS())
        .writeStream.format("noop").outputMode("append"))
    info(f"flatMapGroupsWithState (closedSessions): $sessionRate%.0f rows/s over $n rows")
    assert(sessionRate > 2000, f"$sessionRate%.0f rows/s below floor")
  }

  test("ingest near-dup filter throughput: shingle+minhash+band claims at >1k docs/s") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val n = 10000
      // ~30-token docs, 20% exact clones — per-doc work is the real cost
      // (16 hashes × shingles + 4 band claims), so the floor is docs/s
      val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
        "value", "part", "hash", "merge", "batch", "spark", "window", "sort")
      def docText(i: Int) = {
        val seed = if (i % 5 == 0) i - (i % 5) else i // every 5th is a clone
        (0 until 30).map(j => vocab((seed * 31 + j * 7) % vocab.length)).mkString(" ")
      }
      val docs = (0 until n).map(i => (i.toLong, docText(i)))
      val rate = measure[(Long, String)](n,
        docs.take(100), docs,
        s => StreamingNearDup.verdicts(s.toDF().toDF("doc_id", "text"))
          .writeStream.format("noop").outputMode("append"))
      info(f"StreamingNearDup (16 hashes, 4 bands): $rate%.0f docs/s over $n docs")
      assert(rate > 1000, f"$rate%.0f docs/s below floor")
      // verified mode on the SAME corpus: shingle sets ride the band
      // exchange and state, exact Jaccard per collision — measure the
      // price of rerank semantics at ingest next to the candidate number
      val vRate = measure[(Long, String)](n,
        docs.take(100), docs,
        s => StreamingNearDup.verdictsVerified(s.toDF().toDF("doc_id", "text"))
          .writeStream.format("noop").outputMode("append"))
      info(f"StreamingNearDup VERIFIED: $vRate%.0f docs/s (${rate / vRate}%.2fx slower than candidate)")
      assert(vRate > 1000, f"verified $vRate%.0f docs/s below floor")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("incremental index maintenance throughput: IVF-PQ encode at >2k vectors/s") {
    import spark.implicits._
    import graft.similarity.Pq
    // frozen quantizers (bounded sample, the batch recipe), then a pure
    // codegen projection per arriving vector — no state store, so the
    // floor is the encode arithmetic itself
    val dim = 16; val L = 8; val M = 4; val sub = 4; val K = 16
    def vec(i: Int) = (0 until dim).map(j => ((i * 31 + j * 7) % 97) / 97.0)
    val sample = (0 until 500).map(i => vec(i).toArray).toIndexedSeq
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)
    val n = 20000
    val vecs = (0 until n).map(i => (i.toLong, vec(i)))
    val rate = measure[(Long, Seq[Double])](n,
      vecs.take(100), vecs,
      s => Pq.ivfPqEncode(s.toDF().toDF("vec_id", "v"), coarse, cb, sub)
        .writeStream.format("noop").outputMode("append"))
    info(f"StreamingIndexIngest encode (L=$L%d, M=$M%d): $rate%.0f vectors/s over $n vectors")
    assert(rate > 2000, f"$rate%.0f vectors/s below floor")
  }

  test("ingest decontamination throughput: Bloom probe + confirm at >1k docs/s") {
    import spark.implicits._
    import org.apache.spark.sql.{Dataset, Row}
    // per-doc cost is shingling (≈23 8-grams on a 30-token doc) + Bloom
    // probe; ~10% of docs are planted eval clones so the confirm join
    // genuinely fires inside the timed window
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "window", "sort")
    def docText(seed: Int) =
      (0 until 30).map(j => vocab((seed * 31 + j * 7) % vocab.length)).mkString(" ")
    val evalDocs = (100000 until 100200).map(i => (i.toLong, docText(i)))
      .toDF("doc_id", "text")
    val idx = StreamingDecontam.buildIndex(spark, evalDocs)
    val n = 10000
    val docs = (0 until n).map(i =>
      (i.toLong, docText(if (i % 10 == 0) 100000 + i % 200 else i)))
    val rate = measure[(Long, String)](n,
      docs.take(100), docs,
      s => s.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          StreamingDecontam.transform(idx, b.toDF())
            .write.mode("overwrite").format("noop").save()
          ()
        })
    info(f"StreamingDecontam (8-gram Bloom + confirm): $rate%.0f docs/s over $n docs")
    assert(rate > 1000, f"$rate%.0f docs/s below floor")
  }

  test("stateful throughput: transformWithState (RocksDB provider) path") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val n = 40000
      val base = java.sql.Timestamp.valueOf("2024-03-01 09:00:00").getTime
      val events = (0 until n).map(i =>
        Sessionize.SessionEvent(i % 500L, new java.sql.Timestamp(base + (i / 500) * 1000L)))
      val rate = measure[Sessionize.SessionEvent](n,
        events.take(100), events,
        s => TwsSessionize.closedSessions(s.toDS())
          .writeStream.format("noop").outputMode("append"))
      info(f"transformWithState (TwsSessionize): $rate%.0f rows/s over $n rows")
      assert(rate > 2000, f"$rate%.0f rows/s below floor")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
