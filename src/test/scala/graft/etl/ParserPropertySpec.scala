package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests for the parser cascades (SURVEY §5: the
  * regex cascades are the highest-risk code). A driver-side Scala model
  * re-implements the cascade semantics; generated inputs are evaluated in
  * ONE Spark pass per property and compared row-for-row. */
class ParserPropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property (no scalatestplus bridge in the offline
    * cache): 20 batched trials, fail the suite on any falsification. */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
  private lazy val spark = TestSpark.spark

  /** Driver-side model of the salary unit inference for bare "A - B"
    * numeric ranges (job_streaming.py:87-99). */
  private def modelMillions(n: Long): Double =
    if (n >= 1000) n / 1000000.0
    else if (n > 100 && n < 1000) n / 1000.0
    else n.toDouble

  test("salary ranges 'A - B' parse to unit-inferred (min,max,avg) for any magnitudes") {
    import spark.implicits._
    val gen = Gen.listOfN(300,
      for {
        a <- Gen.chooseNum(0L, 50000000L)
        b <- Gen.chooseNum(0L, 50000000L)
      } yield (a, b))
    val prop = Prop.forAllNoShrink(gen) { pairs =>
      val texts = pairs.map { case (a, b) => s"$a - $b" }
      val out = texts.toDF("salary")
        .select(col("salary"),
          SalaryParser.salaryMin(col("salary")).as("mn"),
          SalaryParser.salaryMax(col("salary")).as("mx"))
        .collect()
        .map(r => r.getString(0) -> ((r.get(1), r.get(2)))).toMap
      pairs.forall { case (a, b) =>
        val (mn, mx) = out(s"$a - $b")
        mn == modelMillions(a) && mx == modelMillions(b)
      }
    }
    check(prop)
  }

  test("experience 'E - F năm' always parses as a range with min E, max F") {
    import spark.implicits._
    val gen = Gen.listOfN(200,
      for {
        e <- Gen.chooseNum(0, 39)
        f <- Gen.chooseNum(0, 39)
      } yield (e, f))
    val prop = Prop.forAllNoShrink(gen) { pairs =>
      val texts = pairs.map { case (e, f) => s"$e - $f năm" }
      import ExperienceParser._
      val out = texts.toDF("experience")
        .select(col("experience"),
          expMinYear(col("experience")).as("mn"),
          expMaxYear(col("experience")).as("mx"),
          expType(col("experience")).as("t"))
        .collect()
        .map(r => r.getString(0) -> ((r.get(1), r.get(2), r.getString(3)))).toMap
      pairs.forall { case (e, f) =>
        // cascade order quirk preserved: "E - F năm" hits the "N năm"
        // branch before the range branch — min is still the FIRST number
        out(s"$e - $f năm") == ((e.toDouble, f.toDouble, "range"))
      }
    }
    check(prop)
  }

  test("the parser never throws on arbitrary unicode garbage") {
    import spark.implicits._
    val gen = Gen.listOfN(150, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOfN(12, Gen.oneOf('ệ', 'ộ', '-', '$', '9', ' ', 'm', 't', 'r', '.')).map(_.mkString)))
    val prop = Prop.forAllNoShrink(gen) { texts =>
      val n = texts.toDF("salary")
        .select(
          SalaryParser.salaryMin(col("salary")).as("mn"),
          ExperienceParser.expMinYear(col("salary")).as("emn"),
          ExperienceParser.expType(col("salary")).as("t"))
        .count()
      n == texts.length
    }
    check(prop)
  }
}
