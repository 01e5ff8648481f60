package graft.queries

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** sq18's stored-inverted-index claims as measured plan properties:
  * serving must read ≤ |query buckets| of the 64 stored posting
  * directories, and the served top-k must equal sq07's direct in-query
  * computation row for row. */
class StoredBm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stored-index BM25 serving prunes to the query's buckets and equals sq07") {
    val sf = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft-sq18-spec").toString
    val served = RetrievalQueries.buildAndServeBm25(spark, sf, Some(root))
    // the 13 query terms hash into at most 13 of the 64 bucket dirs —
    // the literal IN must reach the scan as a partition filter and the
    // scan must select only those directories
    val selected = served.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("postings")) => f.selectedPartitions.partitionCount
    }
    assert(selected.nonEmpty, "no file scan over the postings table found")
    assert(selected.forall(_ <= 13), s"scan selected $selected of the bucket dirs")
    val occupied = new java.io.File(root + "/postings").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bkt="))
    assert(occupied > 13,
      s"fixture must occupy more buckets than the query touches, got $occupied")
    // the round trip through the stored layout reproduces the direct
    // computation exactly (same scores, same ranks, same rounding)
    val direct = RetrievalQueries.sq07Bm25TopK.fn(spark, sf)
    assert(served.collect().toSeq == direct.collect().toSeq,
      "stored-index serving diverged from the direct BM25 computation")
  }

  test("BM25 index lifecycle: pinned build serves; unpromoted rebuild invisible; rollback restores") {
    import spark.implicits._
    import graft.ml.IndexLifecycle
    val sf = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft-bm25-pin").toString
    val registry = s"$root/registry"
    val queries = Seq((1L, "spark"), (1L, "window"), (2L, "customer")).toDF("qid", "term")
    // v1: full corpus, promoted
    RetrievalQueries.buildBm25(spark, sf, s"$root/v1")
    IndexLifecycle.register(spark, registry, "bm25_main", "bm25_index", s"$root/v1", 1)
    IndexLifecycle.promote(spark, registry, "bm25_main", 1)
    def servedNow() = RetrievalQueries
      .serveBm25Pinned(spark, registry, "bm25_main", queries).collect().toSeq
    val v1Result = servedNow()
    assert(v1Result.nonEmpty)
    // v2: rebuilt over a STALE subset (as a rebuild-gone-wrong stand-in),
    // registered but unpinned — serving must not move
    val subsetDir = java.nio.file.Files.createTempDirectory("graft-bm25-sub").toString
    graft.sources.Tables.documents(spark, sf).filter($"doc_id" < 50)
      .write.parquet(s"$subsetDir/documents.parquet")
    RetrievalQueries.buildBm25(spark, subsetDir, s"$root/v2")
    IndexLifecycle.register(spark, registry, "bm25_main", "bm25_index", s"$root/v2", 2)
    assert(servedNow() == v1Result, "unpromoted BM25 rebuild changed serving")
    // promote v2 → scores move (different corpus stats); rollback → restored
    IndexLifecycle.promote(spark, registry, "bm25_main", 2)
    assert(servedNow() != v1Result, "promoting the rebuild changed nothing")
    assert(IndexLifecycle.rollback(spark, registry, "bm25_main")
      .contains("bm25_main-v1"))
    assert(servedNow() == v1Result, "rollback did not restore BM25 serving")
  }

  test("sq18b splits build from serve and the timed serve path is the correct one") {
    val row = RetrievalQueries.sq18bBm25ServingLatency
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_requests") == 5L)
    assert(row.getAs[Long]("rows_served") == 25L)
    assert(row.getAs[Long]("matches_batch") == 25L,
      "per-request serving diverged from the batch computation")
    val buildS = row.getAs[Double]("build_s")
    val serveMs = row.getAs[Double]("serve_ms_per_query")
    assert(buildS > 0 && serveMs > 0)
    info(f"BM25 stored index: build $buildS%.2f s once, serve $serveMs%.0f ms/request")
  }
}
