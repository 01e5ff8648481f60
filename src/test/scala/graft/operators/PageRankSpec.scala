package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Integer fixed-point PageRank: hand-computed exact values, stationarity
  * on symmetric graphs, and bit-identical results across partitionings —
  * the determinism the fixed-point representation exists to provide.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rankMap(edges: Seq[(String, String)], iters: Int,
      parts: Int = 4): Map[String, Long] = {
    import spark.implicits._
    val und = edges ++ edges.map(_.swap)
    PageRank.ranks(und.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("symmetric two-node graph is exactly stationary") {
    // r0 = 5e11 each; contrib = (5e11 * 85) DIV 100 = 4.25e11;
    // base = (1.5e11) DIV 2 = 7.5e10; 4.25e11 + 7.5e10 = 5e11 — a fixpoint
    val r = rankMap(Seq(("a", "b")), 5)
    assert(r == Map("a" -> 500000000000L, "b" -> 500000000000L))
  }

  test("star graph round-1 values match the integer recurrence by hand") {
    // a–b, a–c: n=3, r0=333333333333, base=50000000000
    // leaf→a: (333333333333*85) DIV 100 = 283333333333, a = base + 2·that
    // a→leaf: ((333333333333 DIV 2)*85) DIV 100 = 141666666666
    val r = rankMap(Seq(("a", "b"), ("a", "c")), 1)
    assert(r("a") == 50000000000L + 2L * 283333333333L)
    assert(r("b") == 50000000000L + 141666666666L)
    assert(r("c") == r("b"))
  }

  test("hub outranks leaves and total mass stays within truncation loss") {
    val edges = Seq(("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
      ("a", "b"))
    val r = rankMap(edges, 10)
    assert(r("hub") > r("c") && r("hub") > r("d"))
    val total = r.values.sum
    // truncation only ever LOSES mass, bounded per vertex per round
    assert(total <= 1000000000000L)
    assert(total > 990000000000L, s"lost too much mass: $total")
  }

  test("sink vertices appear in the output and hold their inbound rank") {
    import spark.implicits._
    // DIRECTED chain a→b→c: c is a pure sink (never a src). n=3.
    val r = PageRank.ranks(Seq(("a", "b"), ("b", "c")).toDF("src", "dst"), 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set("a", "b", "c"), "sink c must exist in the output")
    // n=3: r0 = 333333333333, base = 50000000000,
    // contrib along each edge = (r0 * 85) DIV 100 = 283333333333
    assert(r("a") == 50000000000L) // no inbound
    assert(r("b") == 50000000000L + 283333333333L)
    assert(r("c") == r("b"), "sink receives the same single contribution")
  }

  test("bit-identical across partition counts") {
    val edges = (0 until 40).map(i => (s"n$i", s"n${(i * 7) % 40}"))
      .filter { case (a, b) => a != b }
    assert(rankMap(edges, 6, parts = 2) == rankMap(edges, 6, parts = 13))
  }
}
