package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-probe expression: no false negatives, UDF-equivalent null
  * semantics, agreement with mightContainString, and — the point of the
  * expression — a ScalaUDF-free codegen'd plan. */
class BloomProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val members = (0 until 1000).map(i => s"member-$i")
  private lazy val bloom = {
    val f = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    members.foreach(f.putString)
    f
  }
  private lazy val bloomB = spark.sparkContext.broadcast(bloom)

  test("no false negatives; fpp stays near the configured 1%") {
    val hits = members.toDF("s")
      .filter(BloomProbe.mightContain(bloomB, $"s")).count()
    assert(hits == members.size, "every inserted member must probe true")
    val nonMembers = (0 until 10000).map(i => s"absent-$i").toDF("s")
    val fp = nonMembers.filter(BloomProbe.mightContain(bloomB, $"s")).count()
    assert(fp < 300, s"false-positive count $fp far above configured 1%")
  }

  test("probe agrees with mightContainString row for row") {
    val sample = members.take(50) ++ (0 until 50).map(i => s"absent-$i")
    val got = sample.toDF("s")
      .select($"s", BloomProbe.mightContain(bloomB, $"s").as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    sample.foreach(s => assert(got(s) == bloom.mightContainString(s), s))
  }

  test("null in, null out — filter drops nulls like the UDF it replaced") {
    val r = Seq((1, "member-3"), (2, null)).toDF("id", "s")
      .select($"id", BloomProbe.mightContain(bloomB, $"s").as("m"))
      .orderBy($"id").collect()
    assert(r(0).getBoolean(1))
    assert(r(1).isNullAt(1))
  }

  test("identical results with whole-stage codegen forced on and off") {
    val df = (members.take(100) ++ (0 until 100).map(i => s"absent-$i")).toDF("s")
    def run() = df.filter(BloomProbe.mightContain(bloomB, $"s"))
      .collect().map(_.getString(0)).sorted.toSeq
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("dq07b's executed plan contains no ScalaUDF") {
    val plan = graft.queries.DedupQueries.dq07bDecontaminateBloom
      .fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"expected UDF-free plan:\n$plan")
    assert(plan.contains("graft_bloom_probe"), "probe expression must appear in the plan")
  }
}
