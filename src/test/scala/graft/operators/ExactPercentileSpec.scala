package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactPercentile (distributed bucket-and-refine) must equal Spark's
  * single-task-per-group `percentile` aggregate bit-for-bit on the cases
  * that stress the bucketing: ties, constant groups, single-row groups,
  * skewed buckets, and interpolation fractions. */
class ExactPercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 1.0)
  private val names = Seq("q000", "q001", "q025", "q050", "q090", "q100")

  private def check(data: Seq[(String, Double)], buckets: Int = 64): Unit = {
    val df = data.toDF("g", "v").repartition(7) // deliberately awkward split
    val got = ExactPercentile.quantiles(df, "g", "v", qs, names, buckets)
      .collect().map(r => r.getString(0) -> names.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val want = df.groupBy($"g")
      .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet; i <- qs.indices)
      assert(math.abs(got(g)(i) - want(g)(i)) <= math.abs(want(g)(i)) * 1e-12 + 1e-12,
        s"group $g q=${qs(i)}: got ${got(g)(i)} want ${want(g)(i)}")
  }

  test("matches percentile() on mixed groups with ties and skew") {
    val rng = new scala.util.Random(42)
    val data =
      (1 to 500).map(_ => "a" -> rng.nextGaussian() * 100) ++
      (1 to 300).map(_ => "b" -> math.floor(rng.nextDouble() * 5)) ++ // heavy ties
      (1 to 200).map(_ => "c" -> (if (rng.nextBoolean()) 0.0 else rng.nextDouble() * 1e9)) // skew
    check(data)
  }

  test("constant group, single-row group, two-row group") {
    check(Seq.fill(40)("const" -> 7.5) ++ Seq("one" -> 3.0) ++
      Seq("two" -> 1.0, "two" -> 2.0))
  }

  test("nulls are ignored like the aggregate ignores them") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val got = ExactPercentile.quantiles(df, "g", "v", Seq(0.5), Seq("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // group b has no non-null values → absent; a's median of (1,3) = 2
    assert(got == Map("a" -> 2.0))
  }

  test("tiny bucket count still exact (every bucket is a boundary bucket)") {
    val rng = new scala.util.Random(7)
    check((1 to 400).map(_ => "x" -> rng.nextDouble() * 50), buckets = 2)
  }
}
