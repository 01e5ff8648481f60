package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketches × streaming: approximate distinct users per tumbling window
  * with a watermark — the bounded-state way to count uniques on an
  * unbounded stream (exact distinct state grows with the universe of
  * keys; an HLL± register set is constant-size per window and merges
  * across micro-batches and, on a cluster, across partial aggregates).
  */
case class UserEvent(user_id: Long, event_ts: java.sql.Timestamp)

class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed approx_count_distinct merges across micro-batches under a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val counted = stream.toDS()
      .withWatermark("event_ts", "30 minutes")
      .groupBy(window($"event_ts", "10 minutes").as("w"))
      .agg(approx_count_distinct($"user_id").as("approx_users"))
      .select($"w.start".as("w_start"), $"approx_users")
    val query = counted.writeStream
      .format("memory")
      .queryName("sketch_sink")
      .outputMode("append")
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
      def ts(mins: Int) = new java.sql.Timestamp(t0.getTime + mins * 60000L)
      // window [10:00, 10:10): users 1..40 across TWO micro-batches, with
      // overlap — the union must dedup across batches, not re-count
      stream.addData((1L to 25L).map(u => UserEvent(u, ts(u.toInt % 10))): _*)
      query.processAllAvailable()
      stream.addData((20L to 40L).map(u => UserEvent(u, ts(u.toInt % 10))): _*)
      query.processAllAvailable()
      // advance the watermark past the window so append mode emits it
      stream.addData(UserEvent(999L, ts(60)))
      query.processAllAvailable()
      val rows = spark.table("sketch_sink")
        .filter($"w_start" === ts(0)).collect()
      assert(rows.length == 1, s"window should emit once: ${rows.toSeq}")
      val approx = rows.head.getAs[Long]("approx_users")
      // 40 true uniques; default rsd 5% — accept a generous band, but the
      // cross-batch union must be visible (a per-batch count would be ≤25)
      assert(approx >= 36 && approx <= 44, s"approx $approx vs true 40")
    } finally query.stop()
  }
}
