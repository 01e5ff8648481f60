package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Gap-closed sessions via transformWithState — Spark 4's replacement for
  * flatMapGroupsWithState (SPIP: arbitrary stateful processing v2). Same
  * semantics as [[Sessionize.closedSessions]], expressed in the new API:
  *
  *   - typed state handles (ValueState here; ListState/MapState exist)
  *     instead of one opaque GroupState blob — state is composable and
  *     each handle maps to its own RocksDB column family;
  *   - explicit timers (registerTimer/handleExpiredTimer) instead of one
  *     implicit timeout per key — a key can hold many timers;
  *   - TTLConfig-driven state expiry as a first-class concern.
  *
  * State per key stays ONE fixed-size OpenSession record + one timer, so
  * executor memory scales with live keys, never stream length — and with
  * the RocksDB provider (required by transformWithState) live state spills
  * to local SSD, so even the live-key set isn't bounded by the heap.
  *
  * The semantic equivalence with the v1 operator is asserted by
  * TwsSessionizeSpec, which feeds both implementations the same stream.
  */
object TwsSessionize {
  import Sessionize.{ClosedSession, OpenSession, SessionEvent}

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[SessionEvent],
        timers: TimerValues): Iterator[ClosedSession] = {
      val times = rows.map(_.ts.getTime).toSeq.sorted
      var closed = List.empty[ClosedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      val prevTimer = cur.map(_.end + gapMs)
      for (t <- times) {
        cur = cur match {
          case Some(s) if t - s.end <= gapMs =>
            // widen-only (see Sessionize): a cross-batch out-of-order event
            // above the watermark must not move the session end backward
            Some(OpenSession(math.min(s.start, t), math.max(s.end, t), s.n + 1))
          case Some(s) =>
            closed ::= ClosedSession(user, s.start, s.end, s.n)
            Some(OpenSession(t, t, 1))
          case None => Some(OpenSession(t, t, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        val newTimer = s.end + gapMs
        // one live timer per key: re-arm only when the deadline moved
        if (!prevTimer.contains(newTimer)) {
          prevTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(newTimer)
        }
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        user: Long,
        timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // A stale timer (superseded deadline) can still fire; only close the
      // session if the gap has truly elapsed at this timer's timestamp.
      if (open.exists()) {
        val s = open.get()
        if (expired.getExpiryTimeInMs >= s.end + gapMs) {
          open.clear()
          Iterator.single(ClosedSession(user, s.start, s.end, s.n))
        } else Iterator.empty
      } else Iterator.empty
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
