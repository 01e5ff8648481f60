package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The estimator queries are rows-only (a hash oracle can't check an
  * approximation), so the published error bounds are asserted here on the
  * smoke fixture, plus a count-min-sketch probe (count_min_sketch stays
  * spec-only because its result is an opaque binary the compare harness
  * can't sort).
  */
class SketchQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bitmap distinct is exactly COUNT(DISTINCT)") {
    import spark.implicits._
    val got = SketchQueries.kq01BitmapDistinct.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.sources.Tables.orders(spark, dir)
      .groupBy($"o_orderstatus").agg(countDistinct($"o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("hll rollup estimates within 5% of exact (lgConfigK=14 ⇒ σ≈0.81%)") {
    val rows = SketchQueries.kq02HllRollup.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("rel_err")
      assert(err < 0.05, s"status ${r.get(0)}: rel_err $err")
    }
  }

  test("kll merged quantiles land within rank tolerance of the exact quantile") {
    // The KLL guarantee is on RANK (±1.65% at k=200 w.h.p.), not value, so
    // assert the exact rank of each estimated quantile is near the target.
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice")
    val est = SketchQueries.kq03KllQuantiles.fn(spark, dir)
      .select($"l_returnflag", $"p50_est", $"p95_est").collect()
    est.foreach { r =>
      val flag = r.getString(0)
      val grp = li.filter($"l_returnflag" === flag)
      val n = grp.count().toDouble
      def rankOf(v: Double): Double =
        grp.filter($"l_extendedprice" <= v).count() / n
      val r50 = rankOf(r.getDouble(1))
      val r95 = rankOf(r.getDouble(2))
      assert(math.abs(r50 - 0.50) < 0.04, s"$flag p50 rank $r50")
      assert(math.abs(r95 - 0.95) < 0.04, s"$flag p95 rank $r95")
    }
  }

  test("theta union/intersection estimates track exact set cardinalities") {
    val r = SketchQueries.kq04ThetaSetAlgebra.fn(spark, dir).collect().head
    def est(c: String) = r.getAs[Long](c).toDouble // theta estimate is bigint
    def exact(c: String) = r.getAs[Long](c).toDouble
    // sf0.001 populations are far below the default 4096 nominal entries,
    // so the sketches are in exact mode — estimates must match exactly.
    assert(est("est_a") == exact("exact_a"))
    assert(est("est_b") == exact("exact_b"))
    assert(est("est_union") == exact("exact_union"))
    assert(est("est_intersect") == exact("exact_intersect"))
  }

  test("count-min sketch frequency estimate over-counts within eps·N") {
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, dir)
    val eps = 0.001
    val bytes = orders
      .agg(count_min_sketch($"o_orderpriority", lit(eps), lit(0.99), lit(42))
        .as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val truth = orders.groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    truth.foreach { case (k, c) =>
      // the SQL agg hashed the value's UTF-8 bytes; a java String probes
      // the same representation (UTF8String itself is not accepted)
      val e = sk.estimateCount(k)
      assert(e >= c, s"$k: CMS must never under-count ($e < $c)")
      assert(e <= c + (eps * n).ceil.toLong, s"$k: over-count $e vs $c beyond eps·N")
    }
  }
}
