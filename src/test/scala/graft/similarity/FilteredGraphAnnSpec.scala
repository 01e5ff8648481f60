package graft.similarity

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** sq25's filtered serving answers from the SAME blind walk sq22
  * hash-freezes (one shared loop, blindBeamPools) — so its unfiltered
  * recall column must equal sq22's exactly. The second case is a
  * FIXTURE PIN, not a theorem: on this corpus/label layout the
  * filtered recall lands at or below the unfiltered at the final
  * depth. (It is NOT an invariant — filtered recall is scored against
  * the label-pruned truth, unfiltered against the global truth, and a
  * label slice small enough makes every matching pool member a truth
  * hit; if the fixture or labeling changes and this fires, re-derive
  * the expected relation rather than assuming a bug in the walk.) */
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
    // fixture pin (see scaladoc): on THIS corpus/labeling the filter
    // only costs at the final depth — not a general invariant
    val (_, unfLast, fLast) = sq25.last
    assert(fLast <= unfLast + 1e-12,
      s"filtered recall $fLast above unfiltered $unfLast at final depth")
  }
}
