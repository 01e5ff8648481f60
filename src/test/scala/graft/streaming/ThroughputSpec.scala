package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ETL throughput floor: the reference's pipeline was
  * producer-bound at 1 msg/s (real_time_data_simulation.py:22); the
  * engine's micro-batch ETL must sustain orders of magnitude more. This
  * asserts a conservative floor (>2,000 rows/s through the full regex
  * cascade on the test box) and prints the measured figure for the
  * bench record.
  */
class ThroughputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming ETL sustains >2k rows/s through the full cascade") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val etl = StreamingEtl.transform(stream.toDF())
    val query = etl.writeStream
      .format("noop")
      .outputMode("append")
      .start()
    try {
      val n = 40000
      val lines = (0 until n).map { i =>
        s"""{"job_title": "Job $i", "city": "Hà Nội", "salary": "${10 + i % 30} - ${20 + i % 30} triệu",
           |"experience": "${i % 10} - ${i % 10 + 3} năm", "skills": "Python, SQL",
           |"job_fields": "IT", "position_level": "Senior", "job_type": "FT",
           |"unit": "trieu", "event_time": "2024-03-01 10:00:00", "event_type": "c"}"""
          .stripMargin.replaceAll("\n", " ")
      }
      // warm the stream machinery outside the timed window
      stream.addData(lines.take(100))
      query.processAllAvailable()
      val t0 = System.nanoTime()
      stream.addData(lines)
      query.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = n / secs
      info(f"streaming ETL throughput: $rate%.0f rows/s over $n rows in $secs%.2f s")
      assert(rate > 2000, f"throughput $rate%.0f rows/s below floor")
    } finally query.stop()
  }
}
