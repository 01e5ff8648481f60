package graft.streaming

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The eval-leakage gate at ingest: a frozen Bloom-backed eval index
  * probes each micro-batch, admits clean docs, quarantines contaminated
  * ones — and must agree doc for doc with the batch transform (the Bloom
  * pre-filter has no false negatives; the exact confirm join removes
  * false positives, so streaming ≡ batch is exact, not approximate). */
class StreamingDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming verdicts ≡ batch transform; plants quarantined, clean docs admitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val idx = StreamingDecontam.buildIndex(spark,
      docs.filter($"doc_id" % 7 === 3))

    // corpus side + plants: an exact copy of an eval doc (must hit every
    // shingle) and a clean doc sharing no 8-gram with anything
    val evalText = docs.filter($"doc_id" % 7 === 3)
      .orderBy($"doc_id").select($"text").head().getString(0)
    val cleanText = "entirely novel sentence about rocksdb compaction layers and arrow buffers"
    val corpus = docs.filter($"doc_id" % 7 =!= 3)
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = corpus.splitAt(corpus.size / 2)

    val out = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    val stream = MemoryStream[(Long, String)]
    val query = StreamingDecontam.start(idx,
      stream.toDF().toDF("doc_id", "text"),
      s"$out/admit", s"$out/quarantine", s"$out/ckpt")
    try {
      stream.addData(b1 :+ (90001L, evalText))
      query.processAllAvailable()
      stream.addData(b2 :+ (90002L, cleanText))
      query.processAllAvailable()

      val admitted = spark.read.parquet(s"$out/admit")
        .select($"doc_id", $"n_eval_hits").as[(Long, Long)].collect().toMap
      val quarantined = spark.read.parquet(s"$out/quarantine")
        .select($"doc_id", $"n_eval_hits").as[(Long, Long)].collect().toMap

      // every doc got exactly one verdict
      assert(admitted.keySet.intersect(quarantined.keySet).isEmpty)
      assert(admitted.keySet ++ quarantined.keySet ==
        corpus.map(_._1).toSet + 90001L + 90002L)
      // the eval clone is quarantined with every one of its shingles hit
      assert(quarantined.contains(90001L))
      assert(quarantined(90001L) > 0)
      // the novel doc is admitted with zero hits
      assert(admitted(90002L) == 0L)
      assert(admitted.values.forall(_ == 0L))
      assert(quarantined.values.forall(_ > 0L))

      // streaming ≡ batch: the same docs through the batch transform
      // produce the identical per-doc hit counts
      val allDocs = (corpus :+ (90001L, evalText) :+ (90002L, cleanText))
        .toDF("doc_id", "text")
      val batch = StreamingDecontam.transform(idx, allDocs)
        .select($"doc_id", $"n_eval_hits").as[(Long, Long)].collect().toMap
      assert(batch == admitted ++ quarantined)
    } finally query.stop()
  }

  test("fixture eval split genuinely contaminates: at least one real corpus doc quarantined") {
    import spark.implicits._
    // sf0.01: the split dq07 proves contaminated in batch (11 docs)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select($"doc_id", $"text")
    val idx = StreamingDecontam.buildIndex(spark, docs.filter($"doc_id" % 7 === 3))
    val verdicts = StreamingDecontam.transform(idx, docs.filter($"doc_id" % 7 =!= 3))
    // the synthetic corpus carries real near-dup contamination across the
    // eval cut (dq07 finds it in batch); the ingest gate must see it too
    assert(verdicts.filter($"contaminated").count() > 0)
  }
}
