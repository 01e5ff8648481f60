package graft.plans

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column lineage extraction: value inputs traced through aliases,
  * aggregates, joins, and unions; predicate columns kept separate.
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("aggregate over a join: each output traces to its leaf columns only") {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val q = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_orderpriority")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
    val lin = Lineage.columnLineage(q)
    assert(lin("revenue") == Set("lineitem.l_extendedprice", "lineitem.l_discount"),
      lin.toString)
    assert(lin("o_orderpriority") == Set("orders.o_orderpriority"))
    // predicate/join columns show up in filterInputs, not value lineage
    val f = Lineage.filterInputs(q)
    assert(f.contains("orders.o_orderstatus") && f.contains("lineitem.l_orderkey"), f)
    assert(!lin("revenue").contains("orders.o_orderstatus"))
  }

  test("aliases chain and unions fan into every branch") {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val a = li.select(($"l_quantity" * 2).as("v"), $"l_returnflag".as("k"))
    val b = Tables.orders(spark, dir)
      .select($"o_totalprice".as("v"), $"o_orderstatus".as("k"))
    val lin = Lineage.columnLineage(a.unionByName(b).select(($"v" + 1).as("w"), $"k"))
    assert(lin("w") == Set("lineitem.l_quantity", "orders.o_totalprice"), lin.toString)
    assert(lin("k") == Set("lineitem.l_returnflag", "orders.o_orderstatus"))
  }

  test("window outputs trace to frame inputs, partition keys stay predicates-free") {
    import spark.implicits._
    val q = Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey").orderBy($"o_totalprice")))
      .select($"o_orderkey", $"rk")
    val lin = Lineage.columnLineage(q)
    assert(lin("o_orderkey") == Set("orders.o_orderkey"))
    // rank derives from the window spec's inputs
    assert(lin("rk").subsetOf(Set("orders.o_custkey", "orders.o_totalprice")), lin.toString)
  }
}
