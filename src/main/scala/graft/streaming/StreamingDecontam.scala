package graft.streaming

import graft.dedup.Shingles
import graft.functions.BloomProbe
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination AT INGEST — the streaming sibling of batch
  * dq07/dq07b, completing the ingest battery (IngestTokenize quality gate,
  * StreamingNearDup dedup, StreamingIndexIngest index maintenance, and now
  * the eval-leakage gate). Each arriving document's distinct 8-gram
  * shingles are probed against a FROZEN eval-suite Bloom filter map-side
  * (the codegen'd BloomProbe expression — no ScalaUDF in the scan path),
  * survivors are confirmed exactly against the broadcast eval shingle
  * set, and every doc receives a verdict the moment it arrives:
  * admitted, or quarantined with its confirmed-hit count — instead of
  * re-scanning 100 TB for leakage after the corpus has landed.
  *
  * Stateless by design: the eval suite is frozen at stream start (eval
  * sets version rarely; a new suite is a new stream), so there is no
  * state store, no watermark, and the per-batch plan is the batch
  * dq07b plan verbatim — Bloom decimation before the confirm join's
  * exchange, doc bodies never shuffled (only candidate (doc_id, shingle)
  * pairs reach the join, and the Bloom filter has already dropped
  * ~(1 - hit_rate - fpp) of them). Quarantine is a second sink, not a
  * silent drop — contamination review needs the evidence.
  */
object StreamingDecontam {

  /** Frozen eval-suite index: the distinct shingle set (confirm side)
    * and its Bloom filter (probe side). */
  final case class EvalIndex(shingles: DataFrame, bloom: Broadcast[BloomFilter])

  /** Build the index once, stream-start time, from the eval corpus.
    * The filter build is distributed (partial filters OR-merge inside
    * `stat.bloomFilter`); only the bitset reaches the driver. */
  def buildIndex(spark: SparkSession, evalDocs: DataFrame): EvalIndex = {
    val sh = evalDocs
      .withColumn("toks", Shingles.tokens(col("text")))
      .filter(size(col("toks")) >= 8)
      .select(explode(Shingles.shinglesN(col("toks"), 8)).as("sh"))
      .distinct()
      .cache() // consumed twice: filter build + confirm join build side
    val expected = math.max(sh.count(), 1L)
    EvalIndex(sh, spark.sparkContext.broadcast(
      sh.stat.bloomFilter("sh", expected, 0.01)))
  }

  /** Batch-or-micro-batch transform: every input doc comes back with
    * `n_eval_hits` (confirmed distinct contaminated shingles) and
    * `contaminated`. All caller columns ride through; docs too short to
    * shingle are clean by definition. Identical semantics in batch and
    * inside foreachBatch — the spec asserts the equivalence. */
  def transform(idx: EvalIndex, docs: DataFrame): DataFrame = {
    val cand = docs
      .withColumn("toks", Shingles.tokens(col("text")))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(Shingles.shinglesN(col("toks"), 8)).as("sh"))
      .filter(BloomProbe.mightContain(idx.bloom, col("sh")))
    val hits = cand
      .join(broadcast(idx.shingles), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))
    docs.join(hits, Seq("doc_id"), "left")
      .withColumn("n_eval_hits", coalesce(col("hits"), lit(0L)))
      .drop("hits")
      .withColumn("contaminated", col("n_eval_hits") > 0)
  }

  /** Start the ingest gate: per micro-batch, clean docs append to
    * `admitDir`, contaminated docs (with their hit counts) to
    * `quarantineDir`, both stamped with the replay key batch_id. */
  def start(idx: EvalIndex, stream: DataFrame, admitDir: String,
      quarantineDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val verdicts = transform(idx, batch.toDF())
          .withColumn("batch_id", lit(batchId))
          .cache() // two sinks, one evaluation of the confirm join
        try {
          verdicts.filter(!col("contaminated"))
            .write.mode("append").parquet(admitDir)
          verdicts.filter(col("contaminated"))
            .write.mode("append").parquet(quarantineDir)
        } finally verdicts.unpersist()
        ()
      }
      .start()
}
