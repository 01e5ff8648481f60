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
  * Two drop criteria, pick per deployment:
  *
  *   - CANDIDATE filter ([[start]]/[[verdicts]]): drop on band collision
  *     alone. False-positive collisions at 64-bit band HASHES are ~0,
  *     but two docs with true Jaccard well below the dedup threshold can
  *     legitimately agree on one band's minima — batch dq03 reranks
  *     those away by exact Jaccard; this filter does not.
  *   - VERIFIED filter ([[startVerified]]/[[verdictsVerified]]): batch
  *     dq03's rerank semantics on the ingest path. The band owner's
  *     shingle-hash SET rides in the claim state; a colliding doc
  *     computes exact Jaccard against the owner inside the stateful
  *     processor and is dropped only at `jaccard ≥ tau`. No extra
  *     shuffle — the same band-key exchange carries the shingle hashes
  *     (8 B/shingle), and the verify is per-collision driver-free
  *     arithmetic. Jaccard over 64-bit shingle hashes equals Jaccard
  *     over shingles up to ~0 collision probability.
  *
  * State at 100 TB: candidate mode keeps one long per distinct band
  * key; verified mode keeps the owner's shingle-hash set per band key
  * (~8 B × shingle count, a few hundred bytes for web-scale docs) —
  * the price of rerank semantics, still bounded per key. Bound both in
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

  // ---------------------------------------------------------------- verified

  final case class VerifiedBandRow(doc_id: Long, band_key: String, sh: Seq[Long])
  final case class VerifiedBandVerdict(
      doc_id: Long, band_key: String, owner: Long, jaccard: Double)
  final case class OwnerClaim(doc_id: Long, sh: Seq[Long])

  /** First-writer-wins claim per band key, WITH the owner's shingle-hash
    * set in state so collisions are reranked by exact Jaccard in place —
    * the candidate criterion admits/claims exactly as [[BandClaim]]
    * does; only the emitted verdict gains the jaccard column the fold
    * thresholds on. Short-family keys (empty shingle sets) are
    * exact-content hashes, so a collision there is Jaccard 1. */
  class VerifiedBandClaim(ttl: TTLConfig)
      extends StatefulProcessor[String, VerifiedBandRow, VerifiedBandVerdict] {

    @transient private var owner: ValueState[OwnerClaim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[OwnerClaim](
        "owner", Encoders.product[OwnerClaim], ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[VerifiedBandRow],
        timers: TimerValues): Iterator[VerifiedBandVerdict] = {
      val sorted = rows.toArray.sortBy(_.doc_id)
      val own =
        if (owner.exists()) owner.get()
        else {
          val o = OwnerClaim(sorted.head.doc_id, sorted.head.sh)
          owner.update(o); o
        }
      val ownSet = own.sh.toSet
      sorted.iterator.map { r =>
        val j =
          if (r.doc_id == own.doc_id) 1.0
          else if (ownSet.isEmpty && r.sh.isEmpty) 1.0 // exact-content family
          else {
            val rSet = r.sh.toSet
            val inter = rSet.count(ownSet.contains)
            val union = ownSet.size + rSet.size - inter
            if (union == 0) 1.0 else inter.toDouble / union
          }
        VerifiedBandVerdict(r.doc_id, key, own.doc_id, j)
      }
    }
  }

  /** (doc_id, text) stream → per-band ownership verdicts with exact
    * Jaccard vs the band owner. */
  def verdictsVerified(docs: DataFrame, numHashes: Int = 16, numBands: Int = 4,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[VerifiedBandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MinHashLsh.bandKeysWithShingles(docs, numHashes, numBands)
      .as[VerifiedBandRow]
      .groupByKey(_.band_key)
      .transformWithState(new VerifiedBandClaim(ttl), TimeMode.None(), OutputMode.Append())
  }

  /** Fold one micro-batch of verified verdicts to one row per document:
    * is_candidate keeps the band-collision signal (what [[dupFlags]]
    * would have dropped on), is_dup applies the exact-Jaccard threshold,
    * dup_of is the smallest VERIFIED owner, max_jaccard the strongest
    * collision evidence (audit trail). Run inside foreachBatch. */
  def dupFlagsVerified(verdictBatch: DataFrame, tau: Double): DataFrame = {
    val collides = col("owner") =!= col("doc_id")
    verdictBatch
      .groupBy(col("doc_id"))
      .agg(
        (sum(when(collides, 1).otherwise(0)) > 0).as("is_candidate"),
        (sum(when(collides && col("jaccard") >= tau, 1).otherwise(0)) > 0).as("is_dup"),
        min(when(collides && col("jaccard") >= tau, col("owner"))).as("dup_of"),
        max(when(collides, col("jaccard"))).as("max_jaccard"))
  }

  /** [[start]] with the verified drop criterion: flags appended per
    * micro-batch carry both the candidate signal and the Jaccard-verified
    * verdict, thresholded at `tau` (batch dq03's 0.8 default). */
  def startVerified(docs: DataFrame, outDir: String, checkpointDir: String,
      numHashes: Int = 16, numBands: Int = 4, tau: Double = 0.8,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = verdictsVerified(docs, numHashes, numBands).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[VerifiedBandVerdict], batchId: Long) =>
        dupFlagsVerified(batch.toDF(), tau).withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
