package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries guarantees: exactness when counters cover the key space,
  * the no-false-negative threshold, the underestimate bound, and that the
  * guarantees hold under ANY partitioning (counter values may shift; the
  * contract may not).
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    items.toDS().repartition(parts)
      .select(MisraGries.summary(k).toColumn.name("hh"))
      .head().toMap
  }

  test("counters >= cardinality: exact counts") {
    val items = Seq.fill(30)("a") ++ Seq.fill(12)("b") ++ Seq.fill(3)("c")
    val got = run(scala.util.Random.shuffle(items), k = 8, parts = 3)
    assert(got == Map("a" -> 30L, "b" -> 12L, "c" -> 3L))
  }

  test("no false negatives above n/(k+1); underestimates bounded by n/(k+1)") {
    val hot = Seq.fill(500)("hot") ++ Seq.fill(300)("warm")
    val noise = (0 until 400).map(i => s"cold$i")
    val items = scala.util.Random.shuffle(hot ++ noise)
    val n = items.size
    val k = 8
    val bound = n / (k + 1)
    for (parts <- Seq(1, 2, 9)) {
      val got = run(items, k, parts)
      assert(got.contains("hot") && got.contains("warm"),
        s"heavy items (count > $bound) must survive at parts=$parts: $got")
      assert(got("hot") <= 500 && got("hot") >= 500 - bound,
        s"estimate outside [exact - n/(k+1), exact]: ${got("hot")}")
      assert(got("warm") <= 300 && got("warm") >= 300 - bound)
      assert(got.size <= k, s"state must stay bounded by k: ${got.size}")
    }
  }

  test("uniform stream: nothing exceeds the threshold, output stays <= k") {
    val items = (0 until 600).map(i => s"u${i % 60}") // every count = 10, n/(k+1) = 85
    val got = run(items, k = 6, parts = 4)
    assert(got.size <= 6)
    // all estimates must still respect the underestimate-only contract
    assert(got.values.forall(c => c >= 1 && c <= 10))
  }
}
