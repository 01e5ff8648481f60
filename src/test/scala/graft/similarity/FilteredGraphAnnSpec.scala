package graft.similarity

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** sq25's filtered serving answers from the SAME blind walk sq22
  * hash-freezes (one shared loop, blindBeamPools) — so its unfiltered
  * recall column must equal sq22's exactly, and the filtered recall
  * can never exceed the unfiltered at any depth (the filtered truth is
  * at least as hard to hit from a filter-blind pool). */
class FilteredGraphAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sq25's blind-walk recall equals sq22's exactly; the filter only costs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val sq22 = graft.SparkEntry.queries("sq22_graph_ann_serve")(spark, dir)
      .select($"round", $"recall_at_k").as[(Long, Double)].collect().toMap
    val sq25 = graft.SparkEntry.queries("sq25_filtered_graph_ann")(spark, dir)
      .select($"round", $"recall_at_k", $"recall_filtered")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(sq25.length == 5)
    sq25.foreach { case (r, unf, _) =>
      assert(unf == sq22(r),
        s"round $r: sq25's blind walk diverged from sq22 ($unf vs ${sq22(r)})")
    }
    // a filter-blind pool can't serve the filtered target better than
    // the unfiltered one at the final depth, where the pool is richest
    val (_, unfLast, fLast) = sq25.last
    assert(fLast <= unfLast + 1e-12,
      s"filtered recall $fLast above unfiltered $unfLast at final depth")
  }
}
