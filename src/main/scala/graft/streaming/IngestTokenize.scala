package graft.streaming

import graft.tokenizer.Bpe
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The production ingest ETL shape: filter → tokenize → count AT INGEST
  * (SURVEY §2.12 + the tq31 frozen-vocab encode chain on the streaming
  * path). Documents are scored by the frozen quality model as they
  * arrive, sub-threshold docs are dropped, and survivors get their
  * frozen-vocab BPE subword count — so the corpus lands already filtered
  * and token-accounted, instead of re-running batch scoring over 100 TB
  * after the fact.
  *
  * Everything here is a stateless map-side transform (model.transform is
  * a projection; the encode chain is 20 codegen'd `replace` calls), so
  * the per-batch plan composes with checkpointing, carries no state
  * store, and scales with input partitions like any batch projection.
  * foreachBatch (vs a direct sink) is deliberate: real ingest writes to
  * a table AND bumps token-accounting counters in the same transaction.
  * The batchId column is the replay key — a transactional sink upserts
  * on it for exactly-once; the parquet append here demonstrates the
  * shape (a replayed batch would re-append and dedupe on read by
  * batch_id).
  */
object IngestTokenize {

  /** Batch-or-micro-batch transform: score `text`, keep docs at or above
    * `threshold`, append the frozen-vocab subword token count. Identical
    * semantics on a batch frame and inside foreachBatch — the spec
    * asserts the streaming path reproduces this function run in batch.
    * Every caller column rides through untouched (r8 ADVICE: replay
    * dedup needs a stable (batch_id, doc_id) key and downstream joins
    * back to the raw corpus need the id — only the scorer's scratch
    * columns are dropped). */
  def transform(served: PipelineModel, docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val carried = docs.columns.map(col).toSeq
    val scored = served.transform(docs)
      .withColumn("p_quality", element_at(vector_to_array(col("probability")), 2))
      .filter(col("p_quality") >= threshold)
      .select(carried :+ col("p_quality"): _*)
    val norm = Bpe.normText(col("text"))
    scored.withColumn("n_tokens",
      Bpe.subwordCount(norm, Bpe.encode(norm, Bpe.FixedMerges)))
  }

  /** Start the ingest stream: each micro-batch is filtered + tokenized and
    * appended to `outDir` as parquet with its batchId (idempotent replay
    * key), checkpointed at `checkpointDir`. */
  def start(served: PipelineModel, stream: DataFrame, outDir: String,
      checkpointDir: String, threshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        transform(served, batch.toDF(), threshold)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
