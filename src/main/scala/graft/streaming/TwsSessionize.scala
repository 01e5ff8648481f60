package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Gap-closed sessions via transformWithState — Spark 4's replacement for
  * flatMapGroupsWithState (SPIP: arbitrary stateful processing v2). Same
  * semantics as [[Sessionize.closedSessions]], expressed in the new API:
  *
  *   - typed state handles instead of one opaque GroupState blob — the
  *     open islands live in a ListState, each handle mapping to its own
  *     RocksDB column family (with the v1 API a list must be smuggled
  *     through a single value);
  *   - explicit timers (registerTimer/handleExpiredTimer) instead of one
  *     implicit timeout per key;
  *   - TTLConfig-driven state expiry as a first-class concern.
  *
  * State per key is the open-island list (bounded by the
  * watermark-delay/gap ratio, not the stream) plus one timer, and with
  * the RocksDB provider (required by transformWithState) live state
  * spills to local SSD, so even the live-key set isn't bounded by the
  * heap.
  *
  * The semantic equivalence with the v1 operator is asserted by
  * TwsSessionizeSpec, which feeds both implementations the same stream.
  */
object TwsSessionize {
  import Sessionize.{ClosedSession, OpenSession, SessionEvent}

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {

    @transient private var open: ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def islands(): List[OpenSession] = {
      val it = open.get()
      var acc = List.empty[OpenSession]
      while (it.hasNext) acc ::= it.next()
      acc
    }

    /** Emit expired islands, store the rest, re-arm the earliest
      * deadline. Shared by the data and timer paths. Expiry is STRICT
      * (`< wm`): a row at ts == watermark is still admitted and can
      * bridge an island whose deadline equals the watermark (see the v1
      * Sessionize.settle for the full boundary argument). Unlike
      * flatMapGroupsWithState, transformWithState FIRES timers at
      * deadline <= watermark and consumes them — so when an island
      * survives strict expiry at the knife edge, the re-arm must land
      * STRICTLY beyond the current watermark or the emission is lost
      * (the clamp advances every fire, so this terminates). */
    private def settle(user: Long, all: List[OpenSession], wm: Long,
        prevDeadline: Option[Long]): Iterator[ClosedSession] = {
      val (expired, live) = all.partition(_.end + gapMs < wm)
      open.clear()
      if (live.nonEmpty) {
        open.appendList(live.toArray)
        val armAt = math.max(live.map(_.end + gapMs).min, wm + 1)
        if (!prevDeadline.contains(armAt)) {
          prevDeadline.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(armAt)
        }
      } else prevDeadline.foreach(getHandle.deleteTimer)
      expired.sortBy(_.start)
        .map(s => ClosedSession(user, s.start, s.end, s.n)).iterator
    }

    override def handleInputRows(
        user: Long,
        rows: Iterator[SessionEvent],
        timers: TimerValues): Iterator[ClosedSession] = {
      val prev = islands()
      // the armed timer may have been clamped past a watermark tick, so
      // ask the handle rather than recomputing from island deadlines
      val timerIt = getHandle.listTimers()
      val prevDeadline = if (timerIt.hasNext) Some(timerIt.next()) else None
      var all = prev
      for (t <- rows.map(_.ts.getTime).toSeq.sorted) {
        all.find(s => t >= s.start - gapMs && t <= s.end + gapMs) match {
          case Some(s) =>
            all = Sessionize.mergeIslands(
              OpenSession(math.min(s.start, t), math.max(s.end, t), s.n + 1) ::
                all.filterNot(_ eq s), gapMs)
          case None =>
            all = Sessionize.mergeIslands(OpenSession(t, t, 1) :: all, gapMs)
        }
      }
      settle(user, all, timers.getCurrentWatermarkInMs(), prevDeadline)
    }

    override def handleExpiredTimer(
        user: Long,
        timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // the fired timer is already consumed: prevDeadline=None makes
      // settle re-register the next deadline unconditionally
      settle(user, islands(), timers.getCurrentWatermarkInMs(), None)
    }
  }

  /** events (user_id, ts) → final closed sessions, append mode. */
  def closedSessions(events: Dataset[_], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val outEnc = Encoders.product[ClosedSession]
    val gapMs = gapMinutes * 60L * 1000L
    events.withWatermark("ts", "10 minutes").as[SessionEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
