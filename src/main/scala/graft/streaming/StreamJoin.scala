package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join (§2.12 breadth): purchase→click
  * attribution — each purchase joins the same user's clicks from the
  * preceding 10 minutes. The streaming counterpart of the batch range
  * join eq02 (oracle-checked), so the two execution modes share
  * semantics the same way StreamingEtl shares the batch ETL.
  *
  * Scale/state story: BOTH sides carry watermarks and the join condition
  * bounds click_ts to [purchase_ts − 10 min, purchase_ts), so Spark's
  * state store evicts click rows once the purchase watermark passes
  * click_ts + 10 min and purchase rows as soon as their watermark
  * passes — state is O(events within the lateness+range window), never
  * the full history. An unbounded-state stream-stream join (no
  * watermark, no time bound) would OOM any cluster eventually; this
  * shape is the one that survives.
  */
object StreamJoin {

  /** @param clicks    streaming frame: user_id, click_id, click_ts
    * @param purchases streaming frame: user_id, purchase_id, purchase_ts, amount
    * @return append-mode-safe inner join: one row per (purchase, click
    *         within its 10-minute lookback) */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("click_ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("click_id"), col("click_ts"))
    val p = purchases
      .withWatermark("purchase_ts", "10 minutes")
    p.join(c,
        p("user_id") === col("c_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
          col("click_ts") < col("purchase_ts"))
      .select(col("purchase_id"), p("user_id"), col("purchase_ts"),
        col("amount"), col("click_id"), col("click_ts"))
  }

  /** Stream-static dimension enrichment — the other join a streaming
    * pipeline needs constantly: each micro-batch joins against a batch
    * dimension table. Stateless (nothing buffered across batches), and
    * the static side is re-planned per batch, so a dimension refreshed
    * in place is picked up without restarting the query. Broadcast keeps
    * it a map-side hash join: the stream side never shuffles, which at
    * cluster scale means enrichment adds no exchange to the hot path. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
