package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters as a mergeable typed Aggregator — the
  * frequent-items member of the sketch family (kq01-kq04 cover distinct /
  * quantiles / set algebra; this covers "which items dominate").
  *
  * State is AT MOST k counters regardless of stream length or cardinality.
  * Per-partition summaries merge associatively (Agarwal et al., "Mergeable
  * Summaries", PODS'12: add counters, then subtract the (k+1)-st largest
  * and drop non-positives), so the plan is a map-side partial per
  * partition + one tiny merge — the ONLY viable shape for "top tokens
  * over 100 TB" when the exact groupBy's key space is itself huge.
  *
  * Guarantee (what the spec asserts): for a stream of n items, every item
  * with true count > n/(k+1) SURVIVES (no false negatives above the
  * threshold), and every reported count underestimates by at most
  * n/(k+1). Counter VALUES may vary with partitioning — the guarantee
  * does not; consumers that need reproducible output re-count the
  * surviving candidates exactly (one cheap semi-join pass, kq05 does
  * this in-query).
  */
object MisraGries {

  final class Summary(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k >= 1, "need at least one counter")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      if (m.contains(x)) m.updated(x, m(x) + 1L)
      else if (m.size < k) m.updated(x, 1L)
      else m.collect { case (t, c) if c > 1L => t -> (c - 1L) } // decrement-all step

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = (a.keySet ++ b.keySet).iterator
        .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-st largest counter from everything; at most k
        // strictly-positive counters survive
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        combined.collect { case (t, c) if c - cut > 0L => t -> (c - cut) }
      }
    }

    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  }

  def summary(k: Int): Summary = new Summary(k)
}
