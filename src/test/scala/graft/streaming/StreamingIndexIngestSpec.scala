package graft.streaming

import graft.TestSpark
import graft.similarity.Pq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF-PQ maintenance: vectors arriving on a stream must
  * land with EXACTLY the codes the batch index build assigns (shared
  * projection, so this is an identity the spec can demand), partitioned
  * by list_id for search-side pruning.
  */
class StreamingIndexIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed vectors get identical list/codes to the batch build; sink partitions by list") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.similarity.VectorOps.toDouble

    // frozen quantizers trained once on the fixture corpus (sq10's recipe)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", toDouble($"embedding").as("v")).cache()
    val sample = emb.orderBy($"vec_id").limit(500)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val L = 8; val M = 4; val sub = 16; val K = 16
    val coarse = Pq.trainCodebook(sample, L, seed = 101L).map(_.toSeq).toSeq
    val cb = Pq.trainSubspaces(sample, M, sub, K)

    // ground truth: the batch build over 40 "arriving" vectors
    val arriving = emb.filter($"vec_id" >= 100 && $"vec_id" < 140).cache()
    val batchCodes = Pq.ivfPqEncode(arriving, coarse, cb, sub)
      .select($"vec_id", $"list_id", $"c0", $"c1", $"c2", $"c3")
      .as[(Long, Int, Int, Int, Int, Int)].collect().toSet

    val out = java.nio.file.Files.createTempDirectory("graft-ividx").toString
    val stream = MemoryStream[(Long, Seq[Double])]
    val query = StreamingIndexIngest.start(
      stream.toDF().toDF("vec_id", "v"), coarse, cb, sub,
      s"$out/codes", s"$out/ckpt")
    try {
      val rows = arriving.as[(Long, Seq[Double])].collect()
      stream.addData(rows.take(20).toSeq)
      query.processAllAvailable()
      stream.addData(rows.drop(20).toSeq)
      query.processAllAvailable()

      val streamed = spark.read.parquet(s"$out/codes")
        .select($"vec_id", $"list_id", $"c0", $"c1", $"c2", $"c3")
        .as[(Long, Int, Int, Int, Int, Int)].collect().toSet
      assert(streamed == batchCodes,
        "streaming maintenance must produce the batch build's exact codes")

      // the sink layout IS the search-pruning structure
      val listDirs = new java.io.File(s"$out/codes").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("list_id=")).map(_.getName).toSet
      val expectedDirs = batchCodes.map(t => s"list_id=${t._2}")
      assert(listDirs == expectedDirs,
        s"one partition dir per occupied list: $listDirs vs $expectedDirs")
    } finally {
      query.stop()
      arriving.unpersist(); emb.unpersist()
    }
  }
}
