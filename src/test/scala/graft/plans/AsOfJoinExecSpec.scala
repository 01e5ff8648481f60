package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The physical as-of join (custom LogicalPlan → Strategy → SparkPlan)
  * must agree row-for-row with the union+window composition on randomized
  * inputs — including null payload values and left rows with no match —
  * and must plan as one streaming merge over two sorted exchanges. */
class AsOfJoinExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomFrames(seed: Int) = {
    val rng = new scala.util.Random(seed)
    // keys 0-9, times 0-999; right unique per (key, time) by construction
    val left = (1 to 300).map(i =>
      (rng.nextInt(10).toLong, rng.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "left_id")
    val right = rng.shuffle((0 until 10).flatMap(k =>
        rng.shuffle((0 until 1000).toList).take(40).map(t =>
          (k.toLong, t.toLong, s"p$k-$t",
            if (rng.nextBoolean()) null else s"v$t"))))
      .toDF("k", "t", "pay_a", "pay_b") // pay_b nullable: the row-atomicity case
    (left, right)
  }

  test("physical exec is row-identical to the union+window composition") {
    for (seed <- Seq(1, 7, 42)) {
      val (left, right) = randomFrames(seed)
      val viaExec = AsOfJoinPhysical
        .joinAsOf(left, right, "k", "t", "t", Seq("pay_a", "pay_b"))
        .select($"left_id", $"asof_pay_a", $"asof_pay_b")
      val viaWindow = graft.operators.AsOfJoin
        .joinAsOf(left, right.withColumnRenamed("t", "rt"), "k", "t", "rt",
          Seq("pay_a", "pay_b"))
        .select($"left_id", $"asof_pay_a", $"asof_pay_b")
      val a = viaExec.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      val b = viaWindow.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      assert(a.length == 300)
      assert(a.sameElements(b), s"seed $seed: exec and composition disagree")
    }
  }

  test("a matching right row's null payload stays null (row atomicity)") {
    val left = Seq((1L, 100L, 1L)).toDF("k", "t", "left_id")
    val right = Seq(
      (1L, 50L, "old", "old_b"),
      (1L, 90L, "new", null)). // newest match has a NULL pay_b
      toDF("k", "t", "pay_a", "pay_b")
    val row = AsOfJoinPhysical
      .joinAsOf(left, right, "k", "t", "t", Seq("pay_a", "pay_b"))
      .select($"asof_pay_a", $"asof_pay_b").head()
    assert(row.getString(0) == "new")
    assert(row.isNullAt(1), "null payload must not be backfilled from an older row")
  }

  test("unmatched keys and an empty right side yield null payloads, not errors") {
    val left = Seq((1L, 100L, 1L), (99L, 5L, 2L)).toDF("k", "t", "left_id")
    val right = Seq((1L, 50L, "hit", "b")).toDF("k", "t", "pay_a", "pay_b")
    val out = AsOfJoinPhysical
      .joinAsOf(left, right, "k", "t", "t", Seq("pay_a"))
      .select($"left_id", $"asof_pay_a")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("hit"), 2L -> None))

    val empty = right.filter($"k" < 0)
    val allNull = AsOfJoinPhysical
      .joinAsOf(left, empty, "k", "t", "t", Seq("pay_a"))
      .select($"asof_pay_a").collect()
    assert(allNull.length == 2 && allNull.forall(_.isNullAt(0)))
  }

  test("plans as AsOfJoinExec over two sorted hash exchanges, no join node") {
    val (left, right) = randomFrames(3)
    val df = AsOfJoinPhysical.joinAsOf(left, right, "k", "t", "t", Seq("pay_a"))
    df.collect() // finalize the adaptive plan
    // executedPlan prints Final + Initial under AQE; assert on the final only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsOfJoin"), p) // nodeName strips the Exec suffix
    assert(!p.contains("!AsOfJoin"), "missing-input marker in plan:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$p")
    val sorts = "Sort \\[".r.findAllIn(p).size
    assert(sorts == 2, s"expected 2 sorts, got $sorts:\n$p")
  }
}
