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

  test("explode (Generate) outputs trace to the generator's inputs") {
    import spark.implicits._
    val q = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", "\\s+")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(q)
    assert(lin("tok") == Set("documents.text"), lin.toString)
    assert(!lin.values.exists(_.exists(_.startsWith("?"))), s"no unknowns expected: $lin")
  }

  test("SQL surface: WITH-clause plan over a temp view traces through the CTE") {
    Tables.orders(spark, dir).createOrReplaceTempView("lineage_orders")
    val q = spark.sql(
      """WITH big AS (
        |  SELECT o_custkey, o_totalprice * 2 AS dbl
        |  FROM lineage_orders WHERE o_totalprice > 1000)
        |SELECT o_custkey, sum(dbl) AS s FROM big GROUP BY o_custkey""".stripMargin)
    val lin = Lineage.columnLineage(q)
    assert(lin("s") == Set("orders.o_totalprice"), lin.toString)
    assert(lin("o_custkey") == Set("orders.o_custkey"))
    // the CTE-internal predicate resolves from its own node
    assert(Lineage.filterInputs(q).contains("orders.o_totalprice"))
  }

  test("SQL grouping sets (Expand) trace value columns; grouping id has no inputs") {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineage_lineitem")
    val q = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS qty,
        |  grouping(l_returnflag) AS g
        |FROM lineage_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
    val lin = Lineage.columnLineage(q)
    assert(lin("qty") == Set("lineitem.l_quantity"), lin.toString)
    assert(lin("l_returnflag") == Set("lineitem.l_returnflag"))
    assert(lin("l_linestatus") == Set("lineitem.l_linestatus"))
    // grouping(...) derives from the synthetic grouping id — no source col
    assert(lin("g") == Set.empty, lin.toString)
  }
}
