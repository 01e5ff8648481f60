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

  test("stream-static enrichment joins each micro-batch against the dimension, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_custkey", $"c_mktsegment")
    val events = MemoryStream[(Long, Double)]
    val enriched = StreamJoin.enrichWithDim(
      events.toDF().toDF("c_custkey", "amount"), dim, "c_custkey")
    val query = enriched.writeStream
      .format("memory").queryName("enriched_sink")
      .outputMode("append").start()
    try {
      events.addData((1L, 10.0), (2L, 20.0), (-999L, 5.0)) // -999: no dim row
      query.processAllAvailable()
      events.addData((1L, 30.0)) // second batch joins again
      query.processAllAvailable()
      val rows = spark.table("enriched_sink").collect()
      assert(rows.length == 4)
      val segs = rows.map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)))).toSet
      assert(segs.count(_._3.isEmpty) == 1, s"left join must keep the unmatched row: $segs")
      assert(segs.filter(_._1 == 1L).forall(_._3.nonEmpty))
    } finally query.stop()
  }
}
