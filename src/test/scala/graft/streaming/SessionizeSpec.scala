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
}
