package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via mapGroupsWithState (SURVEY §2.12 extension:
  * KeyValueGroupedDataset state, the Structured Streaming primitive the
  * reference never needed because its pipeline was stateless).
  *
  * Tracks a running per-city profile of the posting stream: count,
  * cumulative salary, max salary seen. State is one fixed-size record per
  * key — executor memory scales with key cardinality (cities), never with
  * stream length. NoTimeout keeps batches purely data-driven (with
  * ProcessingTimeTimeout the engine schedules timeout-check batches
  * forever, which wedges processAllAvailable-style test harnesses; for
  * production TTL eviction, switch to EventTimeTimeout + watermark).
  */
object Sessionize {

  case class PostingEvent(city: String, salary_avg: Double)
  case class CityProfile(city: String, n_postings: Long,
      total_salary: Double, max_salary: Double)

  def updateProfile(
      city: String,
      events: Iterator[PostingEvent],
      state: GroupState[CityProfile]): CityProfile = {
    val prev = state.getOption.getOrElse(CityProfile(city, 0L, 0.0, 0.0))
    val next = events.foldLeft(prev) { (acc, e) =>
      CityProfile(city, acc.n_postings + 1,
        acc.total_salary + e.salary_avg, math.max(acc.max_salary, e.salary_avg))
    }
    state.update(next)
    next
  }

  /** cleaned postings stream → per-city running profiles (update mode). */
  def cityProfiles(etl: Dataset[_]): Dataset[CityProfile] = {
    implicit val eventEnc = Encoders.product[PostingEvent]
    implicit val profileEnc = Encoders.product[CityProfile]
    etl.select("city", "salary_avg").as[PostingEvent]
      .groupByKey(_.city)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateProfile)
  }

  val outputMode: OutputMode = OutputMode.Update()

  // ---- flatMapGroupsWithState: gap-closed sessions, append mode ----

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** The streaming counterpart of eq03's batch sessionization, via
    * flatMapGroupsWithState (0..n outputs per group per batch — a closed
    * session is emitted only when the event-time watermark passes the
    * session's gap timeout, so results are final and append-safe). State
    * per key is ONE fixed-size open-session record; eviction is by
    * EventTimeTimeout, which unlike ProcessingTimeTimeout is driven by the
    * data clock and therefore deterministic in tests and replays.
    *
    * Late-data contract: under EventTimeTimeout the exec node filters
    * input rows older than the current watermark before they reach the
    * state function, so a straggler can neither resurrect a closed
    * session nor push a timeout below the watermark — emitted sessions
    * are final. (mapGroupsWithState with NoTimeout does NOT filter; the
    * guarantee is specific to this event-time configuration.) */
  def closedSessions(events: Dataset[_], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    val gapMs = gapMinutes * 60L * 1000L

    def update(user: Long, batch: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(ClosedSession(user, s.start, s.end, s.n))
      } else {
        val times = batch.map(_.ts.getTime).toSeq
        val prev = state.getOption
        // one open session per key: events within the gap extend it; a
        // batch can also contain an internal gap, closing the session
        // mid-batch and opening the next one
        var closed = List.empty[ClosedSession]
        var open = prev
        for (t <- times.sorted) {
          open = open match {
            case Some(s) if t - s.end <= gapMs =>
              // min/max, not (start, t): events sort only WITHIN a batch, so
              // a later batch can deliver an event above the watermark but
              // inside (or before) the open session's span — the span must
              // only ever widen, never move backward
              Some(OpenSession(math.min(s.start, t), math.max(s.end, t), s.n + 1))
            case Some(s) =>
              closed ::= ClosedSession(user, s.start, s.end, s.n)
              Some(OpenSession(t, t, 1))
            case None => Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          // Safe: with EventTimeTimeout the exec node drops input rows
          // older than the watermark before they reach this function
          // (verified by SessionizeSpec's straggler test), so s.end >=
          // watermark and s.end + gap is always a legal timeout.
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events.withWatermark("ts", "10 minutes").as[SessionEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
