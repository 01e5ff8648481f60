package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** mapGroupsWithState keeps one fixed-size profile per city across
  * micro-batches (custom streaming state, SURVEY §2.12 extension). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-city state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Sessionize.PostingEvent]
    val query = Sessionize.cityProfiles(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("profiles")
      .outputMode(Sessionize.outputMode)
      .start()
    try {
      stream.addData(
        Sessionize.PostingEvent("Hà Nội", 10.0),
        Sessionize.PostingEvent("Hà Nội", 20.0),
        Sessionize.PostingEvent("Huế", 8.0))
      query.processAllAvailable()
      stream.addData(Sessionize.PostingEvent("Hà Nội", 30.0))
      query.processAllAvailable()

      // update mode: take the LAST emitted profile per city
      val latest = spark.table("profiles")
        .groupBy($"city")
        .agg(org.apache.spark.sql.functions.max($"n_postings").as("n"),
          org.apache.spark.sql.functions.max($"total_salary").as("total"),
          org.apache.spark.sql.functions.max($"max_salary").as("mx"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      assert(latest("Hà Nội") == ((3L, 60.0, 30.0)))
      assert(latest("Huế") == ((1L, 8.0, 8.0)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState emits a session only once its gap timeout passes the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    val stream = MemoryStream[Sessionize.SessionEvent]
    val query = Sessionize.closedSessions(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      // session 1: three events 10:00-10:10 for user 1
      stream.addData(
        Sessionize.SessionEvent(1L, ts("10:00")),
        Sessionize.SessionEvent(1L, ts("10:05")),
        Sessionize.SessionEvent(1L, ts("10:10")))
      query.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0, "session must stay open")

      // a much later event advances the watermark (12:00 − 10 min lateness)
      // past the session's 10:40 gap timeout → session 1 closes
      stream.addData(Sessionize.SessionEvent(2L, ts("12:00")))
      query.processAllAvailable()
      val closed = spark.table("closed_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      assert(closed.toSeq == Seq((1L, 3L)),
        s"expected user 1's 3-event session, got ${closed.toSeq}")
    } finally query.stop()
  }

  test("a straggler below the watermark is dropped before the state function, not a timeout error") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    val stream = MemoryStream[Sessionize.SessionEvent]
    val query = Sessionize.closedSessions(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("straggler_sessions")
      .outputMode("append").start()
    try {
      stream.addData(Sessionize.SessionEvent(5L, ts("12:00")))
      query.processAllAvailable() // watermark ≈ 11:50
      // Under EventTimeTimeout the exec node late-filters input rows, so
      // this event (natural timeout 10:30, far below the watermark) must
      // be dropped — NOT reach setTimeoutTimestamp and throw.
      stream.addData(Sessionize.SessionEvent(6L, ts("10:00")))
      query.processAllAvailable()
      stream.addData(Sessionize.SessionEvent(5L, ts("12:30")))
      query.processAllAvailable() // extends user 5's open session
      // advance the watermark past user 5's gap timeout (13:00)
      stream.addData(Sessionize.SessionEvent(7L, ts("14:00")))
      query.processAllAvailable() // watermark 13:50 → user 5 closes
      val byUser = spark.table("straggler_sessions")
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(byUser.get(5L).contains(2L),
        s"user 5's 2-event session should have closed by timeout, got $byUser")
      assert(!byUser.contains(6L),
        s"the late straggler should have been dropped, got $byUser")
    } finally query.stop()
  }

  test("built-in session_window works in streaming append mode (fourth sessionization path)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    val stream = MemoryStream[Sessionize.SessionEvent]
    val sessions = stream.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("start"), $"n_events")
    val query = sessions.writeStream
      .format("memory").queryName("builtin_sessions")
      .outputMode("append").start()
    try {
      stream.addData(Sessionize.SessionEvent(1L, ts("09:00")),
        Sessionize.SessionEvent(1L, ts("09:10")))
      query.processAllAvailable()
      stream.addData(Sessionize.SessionEvent(1L, ts("11:00")))
      query.processAllAvailable() // watermark 10:50 > 09:40 → session emits
      val rows = spark.table("builtin_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, ts("09:00"), 2L)),
        s"expected the closed 2-event session, got ${rows.toSeq}")
    } finally query.stop()
  }

  test("an out-of-order event more than a gap BEFORE the span opens its own island") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    // gap (5 min) < watermark delay (10 min): an above-watermark event can
    // arrive more than a gap before the open session and must NOT merge
    val stream = MemoryStream[Sessionize.SessionEvent]
    val query = Sessionize.closedSessions(stream.toDS(), gapMinutes = 5)
      .writeStream.format("memory").queryName("island_sessions")
      .outputMode("append").start()
    try {
      stream.addData(Sessionize.SessionEvent(4L, ts("12:00")))
      query.processAllAvailable() // watermark 11:50
      stream.addData(Sessionize.SessionEvent(4L, ts("11:52")))
      query.processAllAvailable() // 8 min before 12:00 > gap → own island
      stream.addData(Sessionize.SessionEvent(7L, ts("12:30")))
      query.processAllAvailable() // watermark 12:20 closes both islands
      val rows = spark.table("island_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .filter(_._1 == 4L).toSet
      assert(rows == Set((4L, ts("11:52").getTime, 1L), (4L, ts("12:00").getTime, 1L)),
        s"expected two separate singleton sessions, got $rows")
    } finally query.stop()
  }

  test("a cross-batch out-of-order event inside the session widens it, never moves end backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    val stream = MemoryStream[Sessionize.SessionEvent]
    val query = Sessionize.closedSessions(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("ooo_sessions")
      .outputMode("append").start()
    try {
      stream.addData(Sessionize.SessionEvent(9L, ts("12:00")))
      query.processAllAvailable() // watermark ≈ 11:50
      // above the watermark, earlier than the stored end: must widen the
      // span to [11:55, 12:00], not move end back to 11:55
      stream.addData(Sessionize.SessionEvent(9L, ts("11:55")))
      query.processAllAvailable()
      // 12:28 is within 30 min of the TRUE end (12:00) → same session
      stream.addData(Sessionize.SessionEvent(9L, ts("12:28")))
      query.processAllAvailable()
      stream.addData(Sessionize.SessionEvent(8L, ts("14:00")))
      query.processAllAvailable() // watermark 13:50 closes user 9
      val rows = spark.table("ooo_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 9L)
      assert(rows.length == 1, s"expected ONE widened session, got $rows")
      val (_, start, end, n) = rows.head
      assert(start == ts("11:55").getTime && end == ts("12:28").getTime && n == 3L,
        s"expected [11:55, 12:28] n=3, got start=$start end=$end n=$n")
    } finally query.stop()
  }
}
