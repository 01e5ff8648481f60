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
  /** Per-key state: the OPEN islands, possibly several when out-of-order
    * events (above the watermark) arrive more than a gap apart. */
  case class OpenSessions(islands: List[OpenSession])
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** The streaming counterpart of eq03's batch sessionization, via
    * flatMapGroupsWithState (0..n outputs per group per batch — a closed
    * session is emitted only when the event-time watermark passes the
    * session's gap timeout, so results are final and append-safe). State
    * per key is the list of OPEN islands — usually one, several only
    * while out-of-order events (above the watermark) sit more than a gap
    * apart, so its size is bounded by the watermark-delay/gap ratio, not
    * the stream. Eviction is by EventTimeTimeout, which unlike
    * ProcessingTimeTimeout is driven by the data clock and therefore
    * deterministic in tests and replays.
    *
    * Late-data contract: under EventTimeTimeout the exec node filters
    * input rows older than the current watermark before they reach the
    * state function, so a straggler can neither resurrect a closed
    * session nor push a timeout below the watermark — emitted sessions
    * are final. (mapGroupsWithState with NoTimeout does NOT filter; the
    * guarantee is specific to this event-time configuration.) */
  def closedSessions(events: Dataset[_], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val stEnc = Encoders.product[OpenSessions]
    implicit val outEnc = Encoders.product[ClosedSession]
    val gapMs = gapMinutes * 60L * 1000L

    // Emit expired islands, store the rest, re-arm the earliest deadline.
    // Expiry is STRICT (`< wm`, not `<=`): rows at ts == watermark are
    // still admitted (the late filter drops only ts < wm) and can bridge
    // an island whose deadline equals the watermark — closing it at
    // equality would split a session a batch recomputation keeps whole.
    // setTimeoutTimestamp(deadline == wm) is legal (must not be EARLIER
    // than the watermark).
    def settle(user: Long, all: List[OpenSession],
        state: GroupState[OpenSessions], wm: Long): Iterator[ClosedSession] = {
      val (expired, live) = all.partition(_.end + gapMs < wm)
      if (live.nonEmpty) {
        state.update(OpenSessions(live))
        state.setTimeoutTimestamp(live.map(_.end + gapMs).min)
      } else if (state.exists) state.remove()
      expired.sortBy(_.start)
        .map(s => ClosedSession(user, s.start, s.end, s.n)).iterator
    }

    def update(user: Long, batch: Iterator[SessionEvent],
        state: GroupState[OpenSessions]): Iterator[ClosedSession] = {
      val wm = state.getCurrentWatermarkMs()
      if (state.hasTimedOut) {
        settle(user, state.get.islands, state, wm)
      } else {
        val times = batch.map(_.ts.getTime).toSeq.sorted
        val prev = state.getOption.map(_.islands).getOrElse(Nil)
        // A key can hold SEVERAL open islands: out-of-order events above
        // the watermark may open a session more than `gap` BEFORE an
        // existing one (merging those would glue sessions a batch
        // recomputation keeps apart). Insert each event into the island
        // whose [start-gap, end+gap] hull covers it, else open a new
        // island; then merge islands a new point bridged.
        var islands = prev
        for (t <- times) {
          islands.find(s => t >= s.start - gapMs && t <= s.end + gapMs) match {
            case Some(s) =>
              islands = Sessionize.mergeIslands(
                OpenSession(math.min(s.start, t), math.max(s.end, t), s.n + 1) ::
                  islands.filterNot(_ eq s), gapMs)
            case None =>
              islands = Sessionize.mergeIslands(OpenSession(t, t, 1) :: islands, gapMs)
          }
        }
        // islands already expired by the data clock (possible when the
        // watermark advanced since this key's last batch) close NOW —
        // their timer may never fire because data arrival suppresses it
        settle(user, islands, state, wm)
      }
    }

    events.withWatermark("ts", "10 minutes").as[SessionEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Collapse any islands whose hulls now bridge (a new point can connect
    * two existing islands). Input order free; output sorted by start. */
  def mergeIslands(islands: List[OpenSession], gapMs: Long): List[OpenSession] =
    islands.sortBy(_.start).foldLeft(List.empty[OpenSession]) {
      case (acc @ (prev :: rest), cur) if cur.start - prev.end <= gapMs =>
        OpenSession(prev.start, math.max(prev.end, cur.end), prev.n + cur.n) :: rest
      case (acc, cur) => cur :: acc
    }.reverse
}
