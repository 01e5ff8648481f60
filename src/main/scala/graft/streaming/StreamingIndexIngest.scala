package graft.streaming

import graft.similarity.Pq
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental ANN index maintenance — the production lifecycle of an
  * IVF-PQ index over a growing corpus: quantizers (coarse centroids +
  * PQ codebooks) are TRAINED ONCE in batch on a bounded sample and then
  * FROZEN (the FAISS operational recipe — retraining means rebuilding
  * the whole index, so production systems freeze and periodically
  * re-train offline); every vector that arrives afterwards is routed
  * and residual-encoded map-side with the exact arithmetic of the batch
  * index build ([[Pq.ivfPqEncode]] — shared with sq10), and appended to
  * the codes table PARTITIONED BY list_id.
  *
  * Why this shape survives 100 TB: the encode is a stateless codegen
  * projection (no state store, no shuffle), so index maintenance scales
  * with arrival rate like any map-only stream; partitioning the sink by
  * list_id is what makes search-side nprobe pruning a PARTITION-PRUNED
  * scan — queries touch nprobe/L of the files, and newly ingested
  * vectors are searchable as soon as their micro-batch commits.
  */
object StreamingIndexIngest {

  /** Start the maintenance stream: (vec_id, v: array<double>) →
    * (vec_id, list_id, c0..c{M-1}) appended under `outDir`,
    * one directory per list_id. */
  def start(vecs: DataFrame, coarse: Seq[Seq[Double]], cb: Seq[Seq[Seq[Double]]],
      sub: Int, outDir: String, checkpointDir: String,
      trigger: Option[Trigger] = None,
      rot: Option[Seq[Seq[Double]]] = None): StreamingQuery = {
    val writer = Pq.ivfPqEncode(vecs, coarse, cb, sub, rot).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.drop("v").withColumn("batch_id", lit(batchId))
          .write.mode("append").partitionBy("list_id").parquet(outDir)
        ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
