package graft.streaming

import graft.TestSpark
import graft.ml.{ModelRegistry, Pipelines}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The WHOLE ingest battery wired as one bronze→silver pipeline — the
  * architecture a production corpus actually runs, built only from the
  * engine's own streaming modules:
  *
  *   raw stream ──┬─► bronze append (bodies land once)
  *                └─► StreamingNearDup claims ─► dup flags   (stateful)
  *   bronze file-stream ─► join flags ─► StreamingDecontam ─► quarantine
  *                └─► IngestTokenize (registry-PINNED scorer) ─► silver
  *
  * The dedup exchange carries band keys, never bodies (its 100 TB
  * contract), so text rides ONLY the bronze landing and the stateless
  * silver lane rejoins it by doc_id. Every plant must land in exactly
  * one stage's output, and the pipeline must account for every input
  * document exactly once. */
class IngestPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bronze -> dedup flags -> decontam -> quality tokenize: every doc accounted once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = java.nio.file.Files.createTempDirectory("graft-pipeline").toString

    // frozen artifacts, stream-start time: the eval index and the
    // registry-pinned quality scorer
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").cache()
    val idx = StreamingDecontam.buildIndex(spark, docs.filter($"doc_id" % 7 === 3))
    val train = graft.sources.Tables.documents(spark, dir)
      .withColumn("is_quality", ($"n_chars" >= 200).cast("double"))
      .select($"text", $"is_quality").coalesce(4)
    val model = Pipelines.qualityFilterLr("is_quality").fit(train)
    org.apache.spark.ml.GraftMlBridge.dropTrainingSummary(model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel])
    Pipelines.save(model, s"$root/m")
    ModelRegistry.append(spark, s"$root/registry", ModelRegistry.Entry(
      "q-1", "quality_lr", "classification",
      new java.sql.Timestamp(System.currentTimeMillis()),
      None, None, Seq("text"), s"$root/m", 1))
    ModelRegistry.promote(spark, s"$root/registry", "quality_lr", "q-1")
    val served = ModelRegistry.loadPinned(spark, s"$root/registry", "quality_lr").get._2

    // input: a corpus slice + four plants with known fates
    val corpus = docs.filter($"doc_id" % 7 =!= 3 && $"doc_id" < 30)
      .as[(Long, String)].collect().toSeq
    val evalText = docs.filter($"doc_id" % 7 === 3)
      .orderBy($"doc_id").select($"text").head().getString(0)
    val keepText = ("table scan row value part " * 60).trim
    val plants = Seq(
      90001L -> keepText,            // survives every gate → silver
      90002L -> evalText,            // decontam quarantine
      90003L -> corpus.head._2,      // exact clone → dup flag
      90004L -> "tiny")              // passes dedup+decontam, quality-dropped
    val all = corpus ++ plants

    val stream = MemoryStream[(Long, String)]
    val raw = stream.toDF().toDF("doc_id", "text")
    val bronzeQ = raw.writeStream
      .option("checkpointLocation", s"$root/bronze_ckpt")
      .format("parquet").option("path", s"$root/bronze").start()
    val dedupQ = StreamingNearDup.start(raw, s"$root/flags", s"$root/dedup_ckpt")
    try {
      val (b1, b2) = all.splitAt(all.size / 2)
      stream.addData(b1); bronzeQ.processAllAvailable(); dedupQ.processAllAvailable()
      stream.addData(b2); bronzeQ.processAllAvailable(); dedupQ.processAllAvailable()

      // silver lane: drain bronze as a file stream, join the dup flags,
      // then the two stateless gates back to back in one foreachBatch
      val bronzeSchema = spark.read.parquet(s"$root/bronze").schema
      val silverQ = spark.readStream.schema(bronzeSchema)
        .parquet(s"$root/bronze")
        .writeStream
        .option("checkpointLocation", s"$root/silver_ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val flags = batch.sparkSession.read.parquet(s"$root/flags")
            .select(col("doc_id"), col("is_dup"))
          val live = batch.toDF().join(broadcast(flags), Seq("doc_id"))
            .filter(!col("is_dup")).drop("is_dup")
          val v = StreamingDecontam.transform(idx, live).cache()
          try {
            v.filter(col("contaminated"))
              .write.mode("append").parquet(s"$root/quarantine")
            IngestTokenize.transform(served,
                v.filter(!col("contaminated")).drop("contaminated", "n_eval_hits"))
              .withColumn("batch_id", lit(id))
              .write.mode("append").parquet(s"$root/silver")
          } finally v.unpersist()
          ()
        }
        .start()
      silverQ.awaitTermination()

      val silver = spark.read.parquet(s"$root/silver")
        .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
      val quarantined = spark.read.parquet(s"$root/quarantine")
        .select($"doc_id").as[Long].collect().toSet
      val dups = spark.read.parquet(s"$root/flags")
        .filter($"is_dup").select($"doc_id").as[Long].collect().toSet

      // plant fates
      assert(silver.contains(90001L), "quality doc must reach silver")
      assert(quarantined.contains(90002L), "eval clone must be quarantined")
      assert(dups.contains(90003L), "exact clone must be dup-flagged")
      assert(!silver.contains(90004L) && !quarantined.contains(90004L) &&
        !dups.contains(90004L), "junk doc is quality-dropped, silently by design")
      // the surviving doc's count equals the batch encoder's
      val norm = graft.tokenizer.Bpe.normText($"text")
      val expected = Seq(keepText).toDF("text")
        .select(graft.tokenizer.Bpe.subwordCount(
          norm, graft.tokenizer.Bpe.encode(norm, graft.tokenizer.Bpe.FixedMerges))
          .cast("long"))
        .head().getLong(0)
      assert(silver(90001L) == expected)

      // accounting identity: the three recorded outcomes are disjoint,
      // and everything else was quality-dropped AFTER passing both
      // recorded gates (never lost before them)
      val inputs = all.map(_._1).toSet
      assert(dups.intersect(quarantined).isEmpty)
      assert(dups.intersect(silver.keySet).isEmpty)
      assert(quarantined.intersect(silver.keySet).isEmpty)
      assert((dups ++ quarantined ++ silver.keySet).subsetOf(inputs))
      val qualityDropped = inputs -- dups -- quarantined -- silver.keySet
      // every quality-dropped doc scores below threshold under the model
      val droppedDf = all.filter(d => qualityDropped.contains(d._1))
        .toDF("doc_id", "text")
      assert(IngestTokenize.transform(served, droppedDf).count() == 0,
        "docs missing from every sink must be exactly the sub-threshold ones")
    } finally {
      bronzeQ.stop(); dedupQ.stop()
      docs.unpersist()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
