package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Branch coverage of the 7-way experience cascade + exp_type enum
  * (semantics of job_streaming.py:115-147; see ExperienceParser). */
class ExperienceParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class P(min: Option[Double], max: Option[Double],
      avg: Option[Double], typ: String)

  private def parse(texts: Seq[String]): Map[String, P] = {
    import ExperienceParser._
    texts.toDF("experience")
      .select(col("experience"),
        expMinYear(col("experience")).as("mn"),
        expMaxYear(col("experience")).as("mx"),
        expAvgYear(expMinYear(col("experience"))).as("avg"),
        expType(col("experience")).as("typ"))
      .collect().map { r =>
        r.getString(0) -> P(
          Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getString(4))
      }.toMap
  }

  test("cascade branches in priority order") {
    val out = parse(Seq(
      "Không yêu cầu kinh nghiệm",
      "Chưa có kinh nghiệm",
      "Mới tốt nghiệp",
      "Từ 3 năm",
      "At least 5 years",
      "3 - 6 năm",
      "5+ năm",
      "Trên 7 năm",
      "2 years",
      "Intern position"))
    assert(out("Không yêu cầu kinh nghiệm") == P(None, None, Some(0.0), "no_requirement"))
    assert(out("Chưa có kinh nghiệm") == P(Some(0.0), None, Some(0.0), "no_experience"))
    assert(out("Mới tốt nghiệp") == P(Some(0.0), None, Some(0.0), "fresh_graduate"))
    assert(out("Từ 3 năm") == P(Some(3.0), None, Some(3.0), "unknown"))
    assert(out("At least 5 years") == P(Some(5.0), None, Some(5.0), "unknown"))
    assert(out("3 - 6 năm") == P(Some(3.0), Some(6.0), Some(3.0), "range"))
    assert(out("5+ năm") == P(Some(5.0), None, Some(5.0), "unknown"))
    assert(out("Trên 7 năm") == P(Some(7.0), None, Some(7.0), "lower_bound"))
    assert(out("2 years") == P(Some(2.0), None, Some(2.0), "unknown"))
    assert(out("Intern position") == P(Some(0.0), None, Some(0.0), "unknown"))
  }

  test(">40-year noise gate nulls the average but keeps the min") {
    val out = parse(Seq("45 năm", "40 năm"))
    assert(out("45 năm") == P(Some(45.0), None, None, "unknown"))
    assert(out("40 năm") == P(Some(40.0), None, Some(40.0), "unknown"))
  }

  test("upper-bound phrasing classifies without a keyword-branch match") {
    val out = parse(Seq("Lên đến 5 năm"))
    assert(out("Lên đến 5 năm") == P(Some(5.0), None, Some(5.0), "upper_bound"))
  }
}
