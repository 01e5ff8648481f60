package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's runtime skew-join split — the AUTOMATIC complement to
  * operators/SaltedJoin (the manual shape for when the planner must be
  * forced). A hot key that would pin one reducer for the whole stage is
  * detected from runtime shuffle statistics and its partition split into
  * parallel sub-joins; the executed plan records `skew=true` on the
  * SortMergeJoin. At 100 TB this is the difference between a stage that
  * finishes and one that runs a single task for hours.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a hot join key triggers AQE's skew split (skew=true in the executed plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of left rows share key 0; right side is uniform
      val left = spark.range(200000)
        .select(when($"id" < 190000, 0L).otherwise($"id" % 97).as("k"),
          concat(lit("pad-"), $"id".cast("string")).as("payload"))
      val right = spark.range(97).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) executes THIS dataset's QueryExecution —
      // count() wraps a new plan and would leave joined's AQE unfinalized
      val n = joined.collect().length
      assert(n == 200000, s"join lost rows: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not split the skewed partition:\n" + plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
