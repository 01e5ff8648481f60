package graft.streaming

import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream inner join under MicroBatchExecution: in-range clicks
  * attach to purchases, out-of-range ones don't, and results arrive in
  * append mode (the only mode an unbounded pipeline can actually run). */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-03-01 $hhmm:00")

  test("purchases join same-user clicks within the 10-minute lookback only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = StreamJoin.purchaseAttribution(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts", "amount"))
    val query = joined.writeStream
      .format("memory").queryName("attribution_sink")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, 101L, ts("10:00")), // in range of purchase at 10:05
        (1L, 102L, ts("09:40")), // too old (>10 min before)
        (2L, 201L, ts("10:04")), // other user, in range of their purchase
        (3L, 301L, ts("10:10"))) // after the purchase → excluded
      purchases.addData(
        (1L, 9001L, ts("10:05"), 25.0),
        (2L, 9002L, ts("10:06"), 10.0),
        (3L, 9003L, ts("10:08"), 99.0))
      query.processAllAvailable()
      val rows = spark.table("attribution_sink")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((9001L, 101L), (9002L, 201L)))
    } finally query.stop()
  }
}
