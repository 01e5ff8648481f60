package graft.similarity

import graft.TestSpark
import graft.queries.SimilarityQueries
import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The stored-index search loop: StreamingIndexIngest writes IVF-PQ
  * codes partitioned by list_id SO THAT serving becomes a
  * partition-pruned scan. These specs turn that claim into measured
  * plan properties: `selectedPartitions ≤ nprobe` on the exact serving
  * plan, and end-to-end recall through the stored table at sq10's
  * floor. */
class StoredIndexSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("serving scan is partition-pruned to <= nprobe of the stored list dirs") {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
    val sample = emb.orderBy($"vec_id").limit(500)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val L = 8; val M = 4; val sub = 16; val K = 16; val NPROBE = 2
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)

    // stored table built through the streaming maintenance path
    val root = java.nio.file.Files.createTempDirectory("graft-sidx").toString
    emb.write.parquet(s"$root/vecs")
    val schema = spark.read.parquet(s"$root/vecs").schema
    StreamingIndexIngestSpecHelpers.runAvailableNow(
      spark, schema, s"$root/vecs", coarse, cb, sub, s"$root/codes", s"$root/ckpt")

    val occupied = new java.io.File(s"$root/codes").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("list_id="))
    assert(occupied > NPROBE, s"fixture must occupy more lists than nprobe ($occupied)")

    val qv = sample.head
    val shortlist = StoredIndex.serve(
      spark, s"$root/codes", qid = -1L, qv, coarse, cb, sub, NPROBE, depth = 10)

    // the literal IN over the partition column must reach the scan as a
    // PartitionFilter...
    val plan = shortlist.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("list_id")),
      "list_id IN did not become a partition filter:\n" + plan)
    // ...and the scan must SELECT at most nprobe of the stored
    // directories — the 100 TB property itself, not a proxy for it
    val selected = shortlist.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("codes")) => f.selectedPartitions.partitionCount
    }
    assert(selected.nonEmpty, "no file scan over the codes table found")
    assert(selected.forall(_ <= NPROBE),
      s"scan selected $selected partitions, nprobe=$NPROBE of $occupied occupied")

    // and the pruned search still returns a full shortlist
    assert(shortlist.count() == 10)
    emb.unpersist()
  }

  test("batched serving equals per-request serving exactly, in one pruned scan") {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
    val sample = emb.orderBy($"vec_id").limit(500)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val L = 8; val M = 4; val sub = 16; val K = 16; val NPROBE = 2
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)
    val root = java.nio.file.Files.createTempDirectory("graft-sidx-batch").toString
    Pq.ivfPqEncode(emb, coarse, cb, sub).drop("v")
      .write.partitionBy("list_id").parquet(s"$root/codes")
    val reqs = (0 until 6).map(i => (i.toLong, sample(i)))
    val single = reqs.map { case (qid, qv) =>
      StoredIndex.serve(spark, s"$root/codes", qid, qv, coarse, cb, sub,
        NPROBE, depth = 10).collect().toSet
    }.reduce(_ ++ _)
    val batched = StoredIndex.serveBatch(spark, s"$root/codes", reqs,
      coarse, cb, sub, NPROBE, depth = 10)
    assert(batched.collect().toSet == single,
      "batched serving diverged from the per-request path")
    // one scan, pruned to the UNION of probed lists (≤ reqs × nprobe)
    val scans = batched.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("codes")) => f.selectedPartitions.partitionCount
    }
    assert(scans.length == 1, s"batched serve must be one codes scan, saw $scans")
    assert(scans.head <= reqs.length * NPROBE)
    emb.unpersist()
  }

  test("index lifecycle: serving reads the PINNED build; a newer unpromoted build is invisible; rollback restores") {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    import graft.ml.IndexLifecycle
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
    val sample = emb.orderBy($"vec_id").limit(500)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val L = 8; val M = 4; val sub = 16; val K = 16; val NPROBE = 2
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)
    val root = java.nio.file.Files.createTempDirectory("graft-sidx-pin").toString
    val registry = s"$root/registry"
    def build(version: Int, frame: org.apache.spark.sql.DataFrame): Unit = {
      Pq.ivfPqEncode(frame, coarse, cb, sub).drop("v")
        .write.partitionBy("list_id").parquet(s"$root/v$version")
      IndexLifecycle.register(spark, registry, "ann_main", "ann_ivfpq_index",
        s"$root/v$version", version)
    }
    // v1: full corpus — registered AND promoted
    build(1, emb)
    IndexLifecycle.promote(spark, registry, "ann_main", 1)
    val qv = sample.head
    def servedNow() = StoredIndex.servePinned(
      spark, registry, "ann_main", -1L, qv, coarse, cb, sub, NPROBE, depth = 10)
    val v1Result = servedNow().collect().toSeq
    // v2: a DIFFERENT index (half the corpus) lands registered but UNPINNED
    build(2, emb.filter($"vec_id" % 2 === 0))
    val afterRebuild = servedNow()
    assert(afterRebuild.collect().toSeq == v1Result,
      "an unpromoted rebuild changed serving results")
    // the serving scan must physically read v1's directories, not v2's
    val roots = afterRebuild.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(roots.exists(_.contains("/v1")) && !roots.exists(_.contains("/v2")),
      s"pinned serving read the wrong build: $roots")
    // promote v2 → serving switches; the half-corpus index must differ
    IndexLifecycle.promote(spark, registry, "ann_main", 2)
    val v2Result = servedNow().collect().toSeq
    assert(v2Result != v1Result, "promoting the rebuilt index changed nothing")
    // rollback → v1 serves again, byte for byte
    assert(IndexLifecycle.rollback(spark, registry, "ann_main")
      .contains("ann_main-v1"))
    assert(servedNow().collect().toSeq == v1Result,
      "rollback did not restore the previous build")
    emb.unpersist()
  }

  test("STREAMING rebuild under a lifecycle pin: micro-batches land invisible, promote flips serving, rollback restores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.similarity.VectorOps.toDouble
    import graft.ml.IndexLifecycle
    import graft.streaming.StreamingIndexIngest
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
    val sample = emb.orderBy($"vec_id").limit(500)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val L = 8; val M = 4; val sub = 16; val K = 16; val NPROBE = 2
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)
    val root = java.nio.file.Files.createTempDirectory("graft-sidx-stream-pin").toString
    val registry = s"$root/registry"
    // v1: batch build of the full corpus — registered and promoted
    Pq.ivfPqEncode(emb, coarse, cb, sub).drop("v")
      .write.partitionBy("list_id").parquet(s"$root/v1")
    IndexLifecycle.register(spark, registry, "ann_live", "ann_ivfpq_index",
      s"$root/v1", 1)
    IndexLifecycle.promote(spark, registry, "ann_live", 1)
    val qv = sample.head
    def servedNow() = StoredIndex.servePinned(
      spark, registry, "ann_live", -1L, qv, coarse, cb, sub, NPROBE, depth = 10)
    val v1Result = servedNow().collect().toSeq
    // v2 REBUILDS VIA THE STREAM (half the corpus) while v1 is pinned:
    // every micro-batch must stay invisible to serving until promote
    val stream = MemoryStream[(Long, Seq[Double])]
    val query = StreamingIndexIngest.start(
      stream.toDF().toDF("vec_id", "v"), coarse, cb, sub,
      s"$root/v2", s"$root/ckpt")
    try {
      val rows = emb.filter($"vec_id" % 2 === 0).as[(Long, Seq[Double])].collect()
      rows.grouped(math.max(1, rows.length / 2)).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
        assert(servedNow().collect().toSeq == v1Result,
          "a mid-rebuild micro-batch leaked into pinned serving")
      }
    } finally query.stop()
    // registered but UNPROMOTED: still invisible, and the serving scan
    // must physically read only v1's directories
    IndexLifecycle.register(spark, registry, "ann_live", "ann_ivfpq_index",
      s"$root/v2", 2)
    val afterRegister = servedNow()
    assert(afterRegister.collect().toSeq == v1Result)
    val roots = afterRegister.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(roots.exists(_.contains("/v1")) && !roots.exists(_.contains("/v2")),
      s"pinned serving read the wrong build: $roots")
    // promote → the STREAMED build serves (half corpus ⇒ different top-k)
    IndexLifecycle.promote(spark, registry, "ann_live", 2)
    val v2Result = servedNow().collect().toSeq
    assert(v2Result != v1Result, "promoting the streamed rebuild changed nothing")
    v2Result.foreach(r => assert(r.getLong(r.fieldIndex("cid")) % 2 == 0,
      "the streamed build must only contain the streamed vectors"))
    // rollback → v1 serves again
    assert(IndexLifecycle.rollback(spark, registry, "ann_live")
      .contains("ann_live-v1"))
    assert(servedNow().collect().toSeq == v1Result)
    emb.unpersist()
  }

  test("codes-table compaction: micro-batch fragments collapse, serving is byte-identical and still pruned") {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
    val sample = emb.orderBy($"vec_id").limit(500)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val L = 8; val M = 4; val sub = 16; val K = 16; val NPROBE = 2
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)
    val root = java.nio.file.Files.createTempDirectory("graft-sidx-compact").toString
    // 4 input files + maxFilesPerTrigger=1 → 4 micro-batches → up to 4
    // fragment files per list directory (the streaming-ingest tax)
    emb.repartition(4).write.parquet(s"$root/vecs")
    val schema = spark.read.parquet(s"$root/vecs").schema
    graft.streaming.StreamingIndexIngest.start(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$root/vecs"),
        coarse, cb, sub, s"$root/codes", s"$root/ckpt",
        Some(Trigger.AvailableNow()))
      .awaitTermination()
    def parquetFiles() = new java.io.File(s"$root/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val before = parquetFiles()
    assert(before > L, s"ingest should fragment ($before files over $L dirs)")
    val qv = sample.head
    def serveNow() = StoredIndex.serve(
      spark, s"$root/codes", -1L, qv, coarse, cb, sub, NPROBE, depth = 10)
    val resultBefore = serveNow().collect().toSeq
    // compact the stored index exactly like any partitioned table —
    // wq02's machinery applied to the index layout
    val rewritten = graft.sources.PartitionedLayout.compact(
      spark, s"$root/codes", "list_id")
    assert(rewritten.nonEmpty, "fragmented list dirs must be selected")
    val after = parquetFiles()
    assert(after < before, s"compaction did not shrink files: $before -> $after")
    val served = serveNow()
    assert(served.collect().toSeq == resultBefore,
      "compaction changed serving results")
    val selected = served.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("codes")) => f.selectedPartitions.partitionCount
    }
    assert(selected.nonEmpty && selected.forall(_ <= NPROBE),
      "compacted index lost partition pruning")
    emb.unpersist()
  }

  test("erasing a vector from the codes table: pruned rewrite, never served again") {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
    val sample = emb.orderBy($"vec_id").limit(500)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val L = 8; val M = 4; val sub = 16; val K = 16
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)
    val root = java.nio.file.Files.createTempDirectory("graft-sidx-gdpr").toString
    Pq.ivfPqEncode(emb, coarse, cb, sub).drop("v")
      .write.partitionBy("list_id").parquet(s"$root/codes")
    // pick a victim guaranteed servable: query with its own vector, full probe
    val victim = 7L
    val qv = sample(victim.toInt)
    def served() = StoredIndex.serve(spark, s"$root/codes", -1L, qv,
      coarse, cb, sub, nprobe = L, depth = 50).collect().map(_.getLong(1)).toSet
    assert(served().contains(victim), "victim must be servable before erasure")
    def files(l: String) = new java.io.File(s"$root/codes/$l").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val victimList = spark.read.parquet(s"$root/codes")
      .filter($"vec_id" === victim).select($"list_id").as[Int].head()
    val otherDirs = new java.io.File(s"$root/codes").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("list_id=") &&
        d.getName != s"list_id=$victimList").map(_.getName)
    val beforeFiles = otherDirs.map(d => d -> files(d)).toMap
    // the SAME delete primitive the base tables use — derived artifacts
    // honor erasure through one code path
    graft.sources.PartitionedLayout.delete(spark, s"$root/codes",
      Seq(victim).toDF("vec_id"), "vec_id", "list_id")
    assert(!served().contains(victim), "erased vector still serves")
    assert(spark.read.parquet(s"$root/codes")
      .filter($"vec_id" === victim).count() == 0)
    otherDirs.foreach(d => assert(files(d) == beforeFiles(d),
      s"erasure rewrote unaffected list dir $d"))
    emb.unpersist()
  }

  test("sq14: end-to-end search through the STORED table clears sq10's recall floor") {
    val row = SimilarityQueries.sq14AnnStoredIndexSearch
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_queries") == 8L)
    assert(row.getAs[Int]("n_lists") == 32)
    assert(row.getAs[Int]("n_probes") == 10)
    assert(row.getAs[Double]("scan_fraction") == 0.3125,
      "over 2/3 of the stored index must never be opened per request")
    val recall = row.getAs[Double]("recall_at_5")
    // same quantizers, seeds, and encode arithmetic as sq10: the stored
    // round trip must not cost recall (floor matches PqRecallSpec's)
    assert(recall >= 0.65, s"recall_at_5 $recall below floor")
  }
}

/** Shared with the pruning spec: run the maintenance stream to
  * completion over a file source. */
object StreamingIndexIngestSpecHelpers {
  def runAvailableNow(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType, vecsPath: String,
      coarse: Seq[Seq[Double]], cb: Seq[Seq[Seq[Double]]], sub: Int,
      outDir: String, ckptDir: String): Unit =
    graft.streaming.StreamingIndexIngest.start(
        spark.readStream.schema(schema).parquet(vecsPath),
        coarse, cb, sub, outDir, ckptDir, Some(Trigger.AvailableNow()))
      .awaitTermination()
}
