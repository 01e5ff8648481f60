package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chain, triangle, and isolated pair resolve to min-id components") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round),
    // triangle 10-11-12 (+redundant edges), pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("a", "b")
    val got = ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("empty edge list yields empty components") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.components(empty).count() == 0)
  }

  test("adversarial long chain escalates past min-label and resolves") {
    import spark.implicits._
    // a 300-vertex path has diameter 299 — min-label would need 299
    // rounds; components() must escalate to the alternating algorithm
    // and still produce the exact min-id labeling
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.components(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("alternating converges on a 2048-chain within O(log n) rounds") {
    import spark.implicits._
    // diameter 2047; large-star halves chains each round so ~log2(2048)
    // = 11 rounds suffice — 20 proves the geometric collapse (min-label
    // would need 2047). Also shuffles the edge order and flips edge
    // direction so convergence can't lean on input layout.
    val chain = scala.util.Random.shuffle(
      (0L until 2047L).map(i => if (i % 2 == 0) (i, i + 1) else (i + 1, i)))
      .toDF("a", "b")
    val got = ConnectedComponents.alternating(chain, maxIterations = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 2048 && got.values.forall(_ == 0L))
  }

  test("alternating matches min-label on mixed cluster shapes") {
    import spark.implicits._
    // star, triangle with redundant edges, two chains, isolated pair —
    // alternating and the dedup fast path must agree exactly
    val pairs = Seq(
      (5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L), (22L, 23L),
      (31L, 30L)).toDF("a", "b")
    val alt = ConnectedComponents.alternating(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt == fast)
    assert(alt(5L) == 1L && alt(12L) == 10L && alt(23L) == 20L && alt(31L) == 30L)
  }
}
