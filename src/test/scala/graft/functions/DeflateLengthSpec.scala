package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compression-length expression: the repetitive-vs-noise separation the
  * quality signal rests on, determinism, nulls, and SQL registration.
  */
class DeflateLengthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import DeflateLength.deflateLen

  private def len(s: String): Int =
    Seq(s).toDF("t").select(deflateLen($"t")).as[Int].head()

  test("repetitive text compresses an order of magnitude below hex noise") {
    val repetitive = "spam " * 400
    val noise = Seq.tabulate(400)(i =>
      java.lang.Long.toHexString(i * 2654435761L)).mkString(" ")
    val rRep = len(repetitive).toDouble / repetitive.getBytes("UTF-8").length
    val rNoise = len(noise).toDouble / noise.getBytes("UTF-8").length
    assert(rRep < 0.05, s"repetition must crush: $rRep")
    assert(rNoise > 0.4, s"noise must resist: $rNoise")
  }

  test("deterministic across calls; empty and null behave") {
    val s = "the quick brown fox " * 20
    assert(len(s) == len(s))
    assert(len("") == 0 || len("") > 0) // raw deflate of empty: tiny, non-negative
    val r = Seq[(Integer, String)]((1, "abc"), (2, null)).toDF("id", "t")
      .selectExpr("id", "graft_deflate_len(t) AS n").orderBy($"id").collect()
    assert(r(0).getInt(1) > 0)
    assert(r(1).isNullAt(1))
  }
}
