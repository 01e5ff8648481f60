package graft.multimodal

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing contract: schema in/out, per-partition batch
  * processing, determinism, and partition-count independence. */
class DecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(
      $"doc_id".as("asset_id"),
      $"text".cast("binary").as("payload"),
      when($"lang" === "en", "image").otherwise("video").as("modality"))

  test("batched mapPartitions decode produces one typed feature row per asset") {
    val out = Decode.decodeFrame(assets, batchSize = 16)
    assert(out.count() == assets.count())
    val row = out.filter($"asset_id" === 0).head()
    assert(row.n_bytes > 0 && row.width >= 1 && row.width <= 1920)
    assert(row.height >= 1 && row.height <= 1080)
    // video modality fans frames, image is a single frame
    assert(out.filter($"modality" === "image" && $"n_frames" =!= 1).count() == 0)
  }

  test("decode is deterministic and partition-count independent") {
    val a = Decode.decodeFrame(assets.repartition(2), batchSize = 7)
      .collect().map(f => f.asset_id -> f).toMap
    val b = Decode.decodeFrame(assets.repartition(13), batchSize = 64)
      .collect().map(f => f.asset_id -> f).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, f) => assert(f == b(id), s"asset $id differs") }
  }
}
