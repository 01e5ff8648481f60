package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Incremental BM25 maintenance: a corpus streamed in through several
  * micro-batches must yield EXACTLY the scores the one-shot batch
  * computation produces (the monoid-merge algebra end to end through
  * idf), and serving must stay bucket-pruned like sq18. */
class StreamingBm25IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ingest throughput: full index maintenance sustains > 300 docs/s") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sbm25-tput").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val query = StreamingBm25Ingest.start(docs, root, root + "/ckpt")
    try {
      def mk(i: Long) = (i,
        s"spark window agg doc $i customer query join fast scan stream " +
          s"batch sort merge table token$i alpha beta gamma delta epsilon")
      // warm the stream machinery + rollup store outside the timed window
      stream.addData((0L until 200L).map(mk))
      query.processAllAvailable()
      val n = 3000
      val t0 = System.nanoTime()
      stream.addData((1000L until (1000L + n)).map(mk))
      query.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = n / secs
      info(f"BM25 index maintenance: $rate%.0f docs/s over $n docs in $secs%.2f s " +
        "(postings append + df/stats rollup merges per batch)")
      assert(rate > 300, f"$rate%.0f docs/s below floor")
    } finally query.stop()
  }

  test("zero-token docs count in corpus stats (n_docs, sum_dl) like the batch build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sbm25-zero").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val query = StreamingBm25Ingest.start(docs, root, root + "/ckpt")
    try {
      // 2 normal docs + 1 empty + 1 punctuation-only: the batch build
      // (sq07/sq18) counts all 4 in n_docs and their dl=0 in sum_dl
      stream.addData(Seq((1L, "spark window agg"), (2L, "spark join"),
        (3L, ""), (4L, "!!! ... ???")))
      query.processAllAvailable()
      val st = graft.sources.IncrementalAgg.read(spark, root + "/stats", "corpus")
        .select($"sum", $"cnt").as[(Long, Long)].head()
      assert(st == ((5L, 4L)), s"expected (sum_dl=5, n_docs=4), got $st")
    } finally query.stop()
  }

  test("replayed micro-batch append is invisible to serve (dedupe-on-read)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sbm25-replay").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val query = StreamingBm25Ingest.start(docs, root, root + "/ckpt")
    try {
      stream.addData(Seq((1L, "spark window agg spark"), (2L, "spark join fast")))
      query.processAllAvailable()
    } finally query.stop()
    val queries = Seq((1L, "spark"), (1L, "join")).toDF("qid", "term")
    val before = StreamingBm25Ingest.serve(spark, root, queries).collect().toSeq
    // simulate a foreachBatch retry: re-append batch 0's postings verbatim
    val replay = spark.read.parquet(root + "/postings")
      .filter($"batch_id" === 0L)
    replay.write.mode("append").partitionBy("bkt").parquet(root + "/postings")
    val after = StreamingBm25Ingest.serve(spark, root, queries).collect().toSeq
    assert(after == before,
      "serve double-counted tf from a replayed postings append")
  }

  test("erasing a doc leaves the index EXACTLY a fresh build without it (postings + retracted rollups)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val victim = docs.orderBy($"doc_id").limit(1)
      .as[(Long, String)].head()
    def ingestAll(frame: org.apache.spark.sql.DataFrame): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-sbm25-gdpr").toString
      frame.repartition(2).write.parquet(root + "/in")
      StreamingBm25Ingest.start(
          spark.readStream.schema(spark.read.parquet(root + "/in").schema)
            .option("maxFilesPerTrigger", 1).parquet(root + "/in"),
          root, root + "/ckpt",
          Some(Trigger.AvailableNow()))
        .awaitTermination()
      root
    }
    val full = ingestAll(docs)
    StreamingBm25Ingest.erase(spark, full, victim._1, victim._2)
    val fresh = ingestAll(docs.filter($"doc_id" =!= victim._1))
    val queries = Seq(
      (1L, "spark"), (1L, "window"), (2L, "customer"), (2L, "join"),
      (3L, "fast"), (3L, "scan")).toDF("qid", "term")
    val erased = StreamingBm25Ingest.serve(spark, full, queries).collect().toSeq
    val rebuilt = StreamingBm25Ingest.serve(spark, fresh, queries).collect().toSeq
    assert(erased == rebuilt,
      "post-erasure serving diverged from a from-scratch build without the doc")
    // the erased doc must be unfindable even by its own terms
    val ownTerms = StreamingBm25Ingest.tokenize(
        Seq((victim._1, victim._2)).toDF("doc_id", "text"))
      .select(explode($"toks").as("term")).distinct()
      .limit(3).as[String].collect().zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("qid", "term")
    val hits = StreamingBm25Ingest.serve(spark, full, ownTerms)
      .filter($"doc_id" === victim._1).count()
    assert(hits == 0, "the erased doc still serves")
  }

  test("multi-batch ingest serves sq07's exact top-5; scan pruned to query buckets") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft-sbm25").toString
    // spread the corpus over several files; maxFilesPerTrigger=1 forces
    // one micro-batch per file, so df/stats merge across >= 3 batches
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    docs.repartition(3).write.parquet(root + "/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(root + "/in").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/in")
    StreamingBm25Ingest.start(stream, root, root + "/ckpt",
        Some(Trigger.AvailableNow()))
      .awaitTermination()
    val nBatches = new java.io.File(root + "/postings").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .map(_.getName).count(_.endsWith(".parquet"))
    assert(nBatches > 3, s"expected multiple micro-batch files, saw $nBatches")

    val queries = Seq(
      (1L, "spark"), (1L, "window"), (1L, "agg"),
      (2L, "customer"), (2L, "query"), (2L, "join"),
      (3L, "fast"), (3L, "scan"),
      (4L, "stream"), (4L, "batch"),
      (5L, "sort"), (5L, "merge"), (5L, "table")).toDF("qid", "term")
    val served = StreamingBm25Ingest.serve(spark, root, queries)

    // pruning: ≤ 13 of the 64 bucket dirs open
    val selected = served.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("postings")) => f.selectedPartitions.partitionCount
    }
    assert(selected.nonEmpty && selected.forall(_ <= 13),
      s"postings scan selected $selected bucket dirs")

    // the streamed index reproduces the one-shot computation exactly —
    // same scores, ranks, rounding (df merged across batches ≡ frozen df)
    val direct = graft.queries.RetrievalQueries.sq07Bm25TopK.fn(spark, sf)
    assert(served.collect().toSeq == direct.collect().toSeq,
      "streamed-index serving diverged from the one-shot BM25")
  }
}
