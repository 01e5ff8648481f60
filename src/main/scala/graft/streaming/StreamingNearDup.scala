package graft.streaming

import graft.dedup.MinHashLsh
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Near-duplicate FILTERING AT INGEST — the production shape of MinHash
  * LSH dedup for a corpus that grows continuously. Re-running batch LSH
  * over 100 TB for every arriving hour is a non-starter; instead the
  * band index itself becomes STREAMING STATE, and each arriving document
  * is admitted or dropped the moment it lands:
  *
  *   1. stateless: each doc → its `numBands` LSH band keys (the same
  *      signature/banding arithmetic as batch dq03, shared via
  *      [[MinHashLsh.bandKeys]]; sub-shingle docs get one exact-content
  *      fallback key so nothing bypasses the filter);
  *   2. stateful (transformWithState, keyed by band key): the first
  *      document to present a band key CLAIMS it — one ValueState[Long]
  *      per key, each key its own RocksDB row, so live state scales with
  *      DISTINCT bands on SSD, not with heap. Every presented band emits
  *      a (doc, band, owner) verdict;
  *   3. per-micro-batch fold: a doc's bands all land in the same batch,
  *      so `foreachBatch` + [[dupFlags]] reduces verdicts to one row per
  *      doc — `is_dup` iff ANY of its bands was already owned by an
  *      earlier document (batch LSH's candidate criterion, applied
  *      online), with the owning doc as `dup_of` (keep-first semantics,
  *      dq02's rule on the streaming path).
  *
  * Batch/stream equivalence caveat (same trade every production ingest
  * dedup makes): batch LSH reranks candidates by exact Jaccard before
  * collapsing; the ingest filter drops on band collision alone — i.e.
  * it enforces the CANDIDATE criterion. False-positive collisions at
  * 64-bit band hashes are ~0; near-dup recall equals the batch
  * candidate stage by construction (identical arithmetic).
  *
  * State at 100 TB: one long per distinct band key. Bound it in
  * deployment with a TTL (claims expire after the dedup horizon) — the
  * TTLConfig seam is first-class in the v2 state API.
  */
object StreamingNearDup {

  final case class BandRow(doc_id: Long, band_key: String)
  final case class BandVerdict(doc_id: Long, band_key: String, owner: Long)

  /** First-writer-wins claim per band key. Within a micro-batch the
    * claimant is the LOWEST doc_id presenting the key (sorted — group
    * iterator order is not contractual), so replays are deterministic. */
  class BandClaim(ttl: TTLConfig)
      extends StatefulProcessor[String, BandRow, BandVerdict] {

    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong, ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[BandRow],
        timers: TimerValues): Iterator[BandVerdict] = {
      val sorted = rows.toArray.sortBy(_.doc_id)
      val own =
        if (owner.exists()) owner.get()
        else { owner.update(sorted.head.doc_id); sorted.head.doc_id }
      sorted.iterator.map(r => BandVerdict(r.doc_id, key, own))
    }
  }

  /** (doc_id, text) stream → per-band ownership verdicts. */
  def verdicts(docs: DataFrame, numHashes: Int = 16, numBands: Int = 4,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MinHashLsh.bandKeys(docs, numHashes, numBands)
      .as[BandRow]
      .groupByKey(_.band_key)
      .transformWithState(new BandClaim(ttl), TimeMode.None(), OutputMode.Append())
  }

  /** Fold one micro-batch of verdicts to one row per document:
    * (doc_id, is_dup, dup_of) — dup_of is the smallest prior owner among
    * colliding bands, null for admitted docs. Run inside foreachBatch. */
  def dupFlags(verdictBatch: DataFrame): DataFrame =
    verdictBatch
      .groupBy(col("doc_id"))
      .agg(
        (sum(when(col("owner") =!= col("doc_id"), 1).otherwise(0)) > 0).as("is_dup"),
        min(when(col("owner") =!= col("doc_id"), col("owner"))).as("dup_of"))

  /** Start the ingest filter end to end: admitted docs (and a dup audit
    * trail) appended to `outDir` per micro-batch, stamped with batchId —
    * the replay key a transactional sink would upsert on for
    * exactly-once (plain parquet append re-appends on replay; dedupe on
    * read by batch_id). Default trigger is the continuous micro-batch
    * loop (the ingest shape); pass `Trigger.AvailableNow()` for
    * drain-and-stop runs. */
  def start(docs: DataFrame, outDir: String, checkpointDir: String,
      numHashes: Int = 16, numBands: Int = 4,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = verdicts(docs, numHashes, numBands).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[BandVerdict], batchId: Long) =>
        dupFlags(batch.toDF()).withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
