package graft.streaming

import graft.TestSpark
import graft.ml.{ModelRegistry, Pipelines}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online model inference inside a streaming query — the serving shape of
  * mq10's quality filter: a model trained and persisted in batch is
  * loaded once and applied per micro-batch (a stateless map-side
  * transform, so it composes with checkpointing and re-plans per batch
  * like any projection). This is how a curation pipeline scores documents
  * AS THEY ARRIVE instead of re-running batch scoring over the corpus.
  */
class StreamingInferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("persisted quality-filter model scores streaming micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch: train on the fixture corpus and persist
    val docs = graft.sources.Tables.documents(spark, dir)
      .withColumn("is_quality", ($"n_chars" >= 200).cast("double"))
      .select($"text", $"is_quality")
      .coalesce(4).cache()
    val model = Pipelines.qualityFilterLr("is_quality").fit(docs)
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    org.apache.spark.ml.GraftMlBridge.dropTrainingSummary(lr)
    val path = java.nio.file.Files.createTempDirectory("graft-qlr").toString + "/m"
    Pipelines.save(model, path)
    val served = Pipelines.load(path)

    // stream: score arriving documents with the loaded model
    val stream = MemoryStream[String]
    val scored = served.transform(stream.toDF().withColumnRenamed("value", "text"))
      .select($"text",
        element_at(org.apache.spark.ml.functions.vector_to_array($"probability"), 2)
          .as("p_quality"))
    val query = scored.writeStream
      .format("memory").queryName("quality_scores").outputMode("append").start()
    try {
      val longDoc = ("table scan row value part " * 60).trim // ≫ 200 chars
      val shortDoc = "tiny doc"
      stream.addData(longDoc, shortDoc)
      query.processAllAvailable()
      stream.addData(longDoc + " more tokens appended")
      query.processAllAvailable()

      val out = spark.table("quality_scores")
        .select($"text", $"p_quality").as[(String, Double)].collect()
      assert(out.length == 3, "every micro-batch row must be scored")
      val byText = out.toMap
      assert(byText(longDoc) > 0.5, s"long doc scored ${byText(longDoc)}")
      assert(byText(shortDoc) < 0.5, s"short doc scored ${byText(shortDoc)}")
    } finally {
      query.stop()
      docs.unpersist()
    }
  }

  test("ingest pipeline: filter -> BPE tokenize -> count inside foreachBatch matches batch encoder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.sources.Tables.documents(spark, dir)
      .withColumn("is_quality", ($"n_chars" >= 200).cast("double"))
      .select($"text", $"is_quality")
      .coalesce(4).cache()
    val model = Pipelines.qualityFilterLr("is_quality").fit(docs)
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    org.apache.spark.ml.GraftMlBridge.dropTrainingSummary(lr)
    val regBase = java.nio.file.Files.createTempDirectory("graft-qlr2").toString
    val path = s"$regBase/m"
    Pipelines.save(model, path)
    // the ingest node resolves its scorer through the registry PIN —
    // register, promote, loadPinned — never a hard-coded model path
    ModelRegistry.append(spark, s"$regBase/registry", ModelRegistry.Entry(
      "q-1", "quality_lr", "classification",
      new java.sql.Timestamp(System.currentTimeMillis()),
      None, None, Seq("text"), path, 1))
    ModelRegistry.promote(spark, s"$regBase/registry", "quality_lr", "q-1")
    val served = ModelRegistry.loadPinned(spark, s"$regBase/registry", "quality_lr").get._2

    val base = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val stream = MemoryStream[(Long, String)]
    val query = IngestTokenize.start(
      served, stream.toDF().toDF("doc_id", "text"),
      s"$base/out", s"$base/ckpt")
    try {
      // long docs over fixture-corpus vocabulary (out-of-vocab tokens
      // give the TF featurizer an all-zero vector, which the model
      // rightly scores as junk — the first spec proves this phrase
      // scores > 0.5 at this length)
      val keepA = ("table scan row value part " * 60).trim
      val keepB = ("value part table scan row " * 50).trim
      val drop = "tiny"
      stream.addData((11L, keepA), (12L, drop))
      query.processAllAvailable()
      stream.addData((13L, keepB))
      query.processAllAvailable()

      val out = spark.read.parquet(s"$base/out")
        .select($"text", $"n_tokens", $"batch_id")
        .as[(String, Long, Long)].collect().sortBy(_._3)
      assert(out.map(_._1).toSet == Set(keepA, keepB),
        "sub-threshold doc must be filtered at ingest; both quality docs kept")
      assert(out.map(_._3).distinct.length == 2, "one parquet append per micro-batch")
      // the caller's id column must survive to the sink (r8 ADVICE: the
      // replay-dedup key is (batch_id, doc_id), not batch_id alone)
      val ids = spark.read.parquet(s"$base/out")
        .select($"doc_id", $"batch_id").as[(Long, Long)].collect().toSet
      assert(ids == Set((11L, 0L), (13L, 1L)),
        s"doc ids must ride through the ingest transform: $ids")

      // the streaming path's counts must equal the batch encoder run directly
      val batchCounts = {
        val norm = graft.tokenizer.Bpe.normText($"text")
        Seq(keepA, keepB).toDF("text")
          .withColumn("n_tokens", graft.tokenizer.Bpe.subwordCount(
            norm, graft.tokenizer.Bpe.encode(norm, graft.tokenizer.Bpe.FixedMerges)))
          .as[(String, Long)].collect().toMap
      }
      out.foreach { case (text, n, _) =>
        assert(n == batchCounts(text), s"streaming count $n != batch ${batchCounts(text)}")
        assert(n > 0)
      }
    } finally {
      query.stop()
      docs.unpersist()
    }
  }
}
