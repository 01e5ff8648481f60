package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven + boundary-exhaustive checks of the salary cascade
  * (semantics of job_streaming.py:70-110; see SalaryParser). */
class SalaryParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(texts: Seq[String]): Map[String, (Option[Double], Option[Double], Double)] = {
    val df = texts.toDF("salary")
      .select(col("salary"),
        SalaryParser.salaryMin(col("salary")).as("mn"),
        SalaryParser.salaryMax(col("salary")).as("mx"))
      .withColumn("avg", SalaryParser.salaryAvg(col("mn"), col("mx")))
    df.collect().map { r =>
      r.getString(0) -> (
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3))
    }.toMap
  }

  test("representative formats hit the right cascade branches") {
    val out = parse(Seq(
      "10 - 20 triệu",              // millions keyword, range
      "Từ 34 triệu",                // millions keyword, lower-only
      "1200 - 2200 USD",            // usd conversion *25/1000
      "Thỏa thuận",                 // negotiable: no numbers
      "15000000 - 25000000",        // raw VND >= 1000 → /1e6
      "15.000.000 - 25.000.000",    // dot separators stripped
      "12m - 22m"))                 // 'm' keyword
    assert(out("10 - 20 triệu") == (Some(10.0), Some(20.0), 15.0))
    assert(out("Từ 34 triệu") == (Some(34.0), None, 34.0))
    assert(out("1200 - 2200 USD") == (Some(30.0), Some(55.0), 42.5))
    assert(out("Thỏa thuận") == (None, None, 0.0))
    assert(out("15000000 - 25000000") == (Some(15.0), Some(25.0), 20.0))
    assert(out("15.000.000 - 25.000.000") == (Some(15.0), Some(25.0), 20.0))
    assert(out("12m - 22m") == (Some(12.0), Some(22.0), 17.0))
  }

  test("unit-inference boundaries at 100 and 1000 (job_streaming.py:89-99)") {
    // Exhaustive over the boundary region: bare numbers, no unit keyword.
    val ns = (0 to 1500) ++ Seq(10000, 500000, 1000000, 25000000)
    val expected = ns.map { n =>
      val v =
        if (n >= 1000) n / 1000000.0
        else if (n > 100 && n < 1000) n / 1000.0
        else n.toDouble
      n.toString -> v
    }.toMap
    val out = parse(ns.map(_.toString))
    expected.foreach { case (txt, want) =>
      assert(out(txt)._1.contains(want), s"salary '$txt'")
      assert(out(txt)._2.isEmpty, s"no max for '$txt'")
    }
  }

  test("usd detection applies before magnitude heuristics") {
    // Reference quirk preserved: the max regex `-\s*(\d+…)` cannot see past
    // the '$' in "- $900", so only the min parses (job_streaming.py:72).
    val out = parse(Seq("$500 - $900", "500 - 900 usd", "2000 usd"))
    assert(out("$500 - $900") == (Some(12.5), None, 12.5))
    assert(out("500 - 900 usd") == (Some(12.5), Some(22.5), 17.5))
    assert(out("2000 usd") == (Some(50.0), None, 50.0))
  }
}
