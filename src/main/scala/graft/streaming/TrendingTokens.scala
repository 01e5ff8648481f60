package graft.streaming

import graft.operators.MisraGries
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming frequent items: a Misra–Gries summary AS the per-key state
  * of mapGroupsWithState — "trending tokens per language" with state that
  * is ≤ k counters per key FOREVER, however long the stream runs. This is
  * the composition the two pieces were built for: the sketch's merge
  * operator (operators/MisraGries.scala) folds each micro-batch's
  * summary into the persisted one, so per-trigger work is O(batch) and
  * the guarantee (no item with frequency > n/(k+1) is ever lost) extends
  * across the whole stream prefix. An exact streaming top-k would need
  * unbounded per-key maps — precisely what watermark-less aggregation
  * forbids at 100 TB.
  */
object TrendingTokens {

  case class TokenEvent(lang: String, tok: String)
  case class Trending(lang: String, n_seen: Long, top: Seq[(String, Long)])

  /** (state size k, report size t): keep k counters, emit top t. */
  def update(k: Int, t: Int)(
      lang: String,
      events: Iterator[TokenEvent],
      state: GroupState[(Long, Map[String, Long])]): Trending = {
    val mg = MisraGries.summary(k)
    // fold the batch into a local summary first, merge once into state —
    // identical guarantee, one merge instead of one per event
    var batchN = 0L
    val batchSummary = events.foldLeft(mg.zero) { (m, e) =>
      batchN += 1; mg.reduce(m, e.tok)
    }
    val (n0, s0) = state.getOption.getOrElse((0L, mg.zero))
    val merged = mg.merge(s0, batchSummary)
    state.update((n0 + batchN, merged))
    Trending(lang, n0 + batchN, mg.finish(merged).take(t))
  }

  /** token stream → per-lang trending summaries (update mode). */
  def trending(tokens: Dataset[_], k: Int = 16, topT: Int = 5): Dataset[Trending] = {
    implicit val evEnc = Encoders.product[TokenEvent]
    implicit val stEnc = Encoders.tuple(Encoders.scalaLong,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]())
    implicit val outEnc = Encoders.product[Trending]
    tokens.select("lang", "tok").as[TokenEvent]
      .groupByKey(_.lang)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update(k, topT))
  }

  val outputMode: OutputMode = OutputMode.Update()
}
