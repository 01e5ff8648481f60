package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState requires the RocksDB state store provider; the conf
  * is set per-test and restored so the rest of the suite keeps the default
  * HDFS-backed provider.
  */
class TwsSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState emits the same closed sessions as flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    // user 1: two events 5 min apart, then a 40-min gap event → session of
    // 2 closes (gap 30); user 2: single event, stays open past the end
    val script = Seq(
      Seq(Sessionize.SessionEvent(1L, ts("09:00")), Sessionize.SessionEvent(2L, ts("09:01"))),
      Seq(Sessionize.SessionEvent(1L, ts("09:05"))),
      Seq(Sessionize.SessionEvent(1L, ts("09:02"))), // out-of-order, inside the span: widen only
      Seq(Sessionize.SessionEvent(1L, ts("09:45"))), // closes 09:00-09:05 mid-batch
      Seq(Sessionize.SessionEvent(3L, ts("11:00")))) // watermark → timers fire

    def run(mk: org.apache.spark.sql.Dataset[Sessionize.SessionEvent] =>
        org.apache.spark.sql.Dataset[Sessionize.ClosedSession], name: String) = {
      val stream = MemoryStream[Sessionize.SessionEvent]
      val query = mk(stream.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        script.foreach { batch =>
          stream.addData(batch: _*)
          query.processAllAvailable()
        }
        spark.table(name).as[Sessionize.ClosedSession].collect().toSet
      } finally query.stop()
    }

    val v2 = withRocksDb(run(TwsSessionize.closedSessions(_), "tws_sessions"))
    val v1 = run(Sessionize.closedSessions(_), "fmgws_sessions")
    assert(v2 == v1, s"v2=$v2 v1=$v1")
    // and the expected content, not just equivalence
    assert(v2.contains(Sessionize.ClosedSession(1L, ts("09:00").getTime, ts("09:05").getTime, 3L)))
    assert(v2.exists(s => s.user_id == 1L && s.n_events == 1L)) // the 09:45 singleton
    assert(v2.exists(s => s.user_id == 2L && s.n_events == 1L))
  }
}
