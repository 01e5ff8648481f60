package graft.plans

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning (SPARK-32268): when a shuffle join
  * has a SELECTIVE build side, Catalyst can inject a bloom filter built
  * from the dim keys into the fact side's scan — at 100 TB this is the
  * difference between shuffling every fact row and shuffling only the
  * ~matching ones. The thresholds that gate it are sized for clusters
  * (10 MB creation side, 10 GB application side), so the fixture
  * exercises the rule by lowering them — the point is that OUR join
  * shapes are eligible: equi-join, selective filter on the creation
  * side, shuffle join (broadcast disabled to force the case where the
  * bloom matters). Conf is restored in finally — the shared-session
  * contract. */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("a selective dim filter injects a bloom filter into the fact-side scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creationSideThreshold is a MAX (don't build blooms from huge
      // dims) — default 10 MB already admits the fixture dim; the
      // application-side threshold is a MIN (don't bother filtering a
      // small fact scan), which the fixture must duck under
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val fact = Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_extendedprice")
      val dim = Tables.orders(spark, dir)
        .filter($"o_orderstatus" === "F" && $"o_totalprice" > 200000.0)
        .select($"o_orderkey")
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .agg(sum($"l_extendedprice"))
      val optimized = joined.queryExecution.optimizedPlan.toString()
      assert(optimized.toLowerCase.contains("bloomfilter"),
        "no runtime bloom filter was injected into the fact side:\n" + optimized)
      // and the filtered result is still correct
      val expected = fact.join(dim.hint("broadcast"), $"l_orderkey" === $"o_orderkey")
        .agg(sum($"l_extendedprice")).head.getDouble(0)
      assert(math.abs(joined.head.getDouble(0) - expected) < 1e-6)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
