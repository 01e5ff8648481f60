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
}
