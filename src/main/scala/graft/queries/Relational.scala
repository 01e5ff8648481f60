package graft.queries

import graft.QueryDef
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.sources.Tables
import graft.util.Num._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.3-§2.9): scan, project,
  * filter (pushdown), equi/broadcast/semi/anti join, hash aggregate,
  * rollup/cube, windows, sorts/top-K, set ops, string/date/JSON functions.
  *
  * Scale notes baked into each query:
  *   - filters and column selection are declared first so Catalyst pushes
  *     them into the parquet scan (check `PushedFilters`/`ReadSchema`);
  *   - dimension joins (region/nation/customer/part) use `broadcast()` —
  *     at 100 TB the fact side never shuffles for these;
  *   - aggregates use decimal-exact partial aggregation (see graft.util.Num)
  *     which is both oracle-portable and shuffle-count-independent;
  *   - top-K is orderBy+limit → Spark plans TakeOrderedAndProject (no
  *     full sort, no single-node shuffle of the whole table).
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: scan → filter → hash agg → sort.
    * Exercises A2 (multi-agg with aliases), P5 (range filter), O1. */
  val q01PricingSummary: QueryDef = sqlChecked(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST((l_extendedprice) AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST((l_quantity) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST((l_extendedprice) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST((l_discount) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("2000-12-01 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q6-shaped forecast revenue: pure scan-side filter (all four
    * predicates push to parquet), single global agg — no shuffle beyond
    * one partial/final exchange. Exercises P5, A2. */
  val q02FilterRevenue: QueryDef = sqlChecked(
    "q02_filter_revenue",
    """SELECT
      |  CAST(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01 00:00:00").cast("timestamp") &&
        $"l_discount".between(0.02, 0.07) && $"l_quantity" < 24)
      .agg(
        dsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Star join: fact lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    * broadcast dims, revenue per (region, nation). Exercises the equi-join
    * surface of §2.4 the scalable way: only the two fact tables shuffle
    * (on orderkey); every dimension is broadcast. */
  val q03StarJoinRevenue: QueryDef = sqlChecked(
    "q03_star_join_revenue",
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderstatus <> 'P'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" =!= "P"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  /** Broadcast dim join: lineitem ⋈ part on partkey, stats per brand.
    * part is small at any SF ratio vs lineitem → explicit broadcast
    * keeps the fact table un-shuffled. */
  val q04BroadcastPartJoin: QueryDef = sqlChecked(
    "q04_broadcast_part_join",
    """SELECT p_brand,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST((l_extendedprice) AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 30
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter($"p_size" <= 30)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"),
        count(lit(1)).as("n_items"))
      .orderBy($"p_brand")
  }

  /** Left-semi join (EXISTS): customers having ≥1 open order, counted per
    * market segment. Semi joins ship only the key column of the probe side. */
  val q05SemiJoin: QueryDef = sqlChecked(
    "q05_semi_join",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "O"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no URGENT order at all,
    * per nation. */
  val q06AntiJoin: QueryDef = sqlChecked(
    "q06_anti_join",
    """SELECT n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST((c_acctbal) AS DECIMAL(30,6))) AS DOUBLE) AS sum_acctbal
      |FROM customer c JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_acctbal"))
      .orderBy($"n_name")
  }

  /** Ranking window: top-3 orders per customer by totalprice
    * (row_number over partitioned window, deterministic tiebreak).
    * This is the proper distributed form of the reference's per-group
    * `filter(cluster==i).show(5)` loop (SURVEY §2.6). */
  val q07WindowTopkPerGroup: QueryDef = sqlChecked(
    "q07_window_topk_per_group",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 AND o_custkey < 200
      |ORDER BY o_custkey, rk""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 200) // partition-key predicate below the window → parquet pushdown
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
      .orderBy($"o_custkey", $"rk")
  }

  /** q07's semantics via the typed TopK Aggregator instead of a window:
    * map-side K-bounded partial aggregation means the shuffle carries at
    * most K rows per (task, group) instead of every row — the scale path
    * for top-K-per-group (see graft.operators.TopKPerGroup). Same oracle
    * as q07 proves row-identical results. */
  val q07bTopkAggregator: QueryDef = sqlChecked(
    "q07b_topk_aggregator",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 AND o_custkey < 200
      |ORDER BY o_custkey, rk""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    graft.operators.TopKPerGroup
      .topOrders(spark, Tables.orders(spark, dir).filter($"o_custkey" < 200), 3)
      .orderBy($"o_custkey", $"rk")
  }

  /** Frame-spec window: running quantity per supplier in shipdate order
    * (integer-valued measure → exact under any aggregation tree). */
  val q08WindowRunningSum: QueryDef = sqlChecked(
    "q08_window_running_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  SUM(l_quantity) OVER (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey < 5
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter($"l_suppkey" < 5)
      .withColumn("running_qty", sum($"l_quantity").over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty",
        $"l_shipdate")
      .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
      .drop("l_shipdate")
  }

  /** Distinct aggregation: exact distinct counts per group (expands to a
    * two-phase aggregate; keys shuffle once). */
  val q09DistinctCounts: QueryDef = sqlChecked(
    "q09_distinct_counts",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** ROLLUP grouping sets: (region, nation) hierarchy totals over customers.
    * Reference's 5-flag groupBy (SURVEY §2.5 A3) generalized to true
    * grouping sets. */
  val q10Rollup: QueryDef = sqlChecked(
    "q10_rollup",
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST((c_acctbal) AS DECIMAL(30,6))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_acctbal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** CUBE grouping sets over (mktsegment, orderstatus). */
  val q11Cube: QueryDef = sqlChecked(
    "q11_cube",
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST((o_totalprice) AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY CUBE(c_mktsegment, o_orderstatus)
      |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .cube($"c_mktsegment", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .orderBy($"c_mktsegment".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** Set-operation semantics (UNION/INTERSECT/EXCEPT distinct counts over
    * two customer-key sets) computed in ONE scan of orders: per-custkey
    * boolean flags via max(), then conditional counts. At 100 TB this is a
    * single fact-table scan + one shuffle on custkey, vs six scans for the
    * literal union/intersect/except formulation. */
  val q12SetOps: QueryDef = sqlChecked(
    "q12_set_ops",
    """SELECT
      |  COUNT(*) FILTER (WHERE has_urgent OR has_fin) AS n_union,
      |  COUNT(*) FILTER (WHERE has_urgent AND has_fin) AS n_intersect,
      |  COUNT(*) FILTER (WHERE has_urgent AND NOT has_fin) AS n_except
      |FROM (
      |  SELECT o_custkey,
      |    bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
      |    bool_or(o_orderstatus = 'F') AS has_fin
      |  FROM orders GROUP BY o_custkey)""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        max($"o_orderpriority" === "1-URGENT").as("has_urgent"),
        max($"o_orderstatus" === "F").as("has_fin"))
      .agg(
        count(when($"has_urgent" || $"has_fin", true)).as("n_union"),
        count(when($"has_urgent" && $"has_fin", true)).as("n_intersect"),
        count(when($"has_urgent" && !$"has_fin", true)).as("n_except"))
  }

  /** The literal set-operator surface (union/intersect/except nodes in the
    * plan — q12 computes the same answer scan-efficiently; this one proves
    * the operators themselves work). Small keyspace → cheap at any SF. */
  val q12bSetOperators: QueryDef = sqlChecked(
    "q12b_set_operators",
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT c_nationkey FROM customer WHERE c_acctbal > 0
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    c.filter($"c_mktsegment" === "BUILDING").select($"c_nationkey")
      .intersect(c.filter($"c_acctbal" > 0).select($"c_nationkey"))
      .orderBy($"c_nationkey")
  }

  /** HAVING-style post-aggregation filter (A9): busy customers. */
  val q13Having: QueryDef = sqlChecked(
    "q13_having",
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST((o_totalprice) AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY o_custkey
      |HAVING COUNT(*) >= 16
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .filter($"n_orders" >= 16)
      .orderBy($"o_custkey")
  }

  /** CASE WHEN cascade (F6): price-band bucketing, the reference's
    * when/otherwise idiom over a numeric measure. */
  val q14CaseWhenBuckets: QueryDef = sqlChecked(
    "q14_case_when_buckets",
    """SELECT
      |  CASE WHEN o_totalprice < 50000 THEN 'low'
      |       WHEN o_totalprice < 150000 THEN 'mid'
      |       ELSE 'high' END AS price_band,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST((o_totalprice) AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY price_band""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("price_band",
        when($"o_totalprice" < 50000, "low")
          .when($"o_totalprice" < 150000, "mid")
          .otherwise("high"))
      .groupBy($"price_band")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .orderBy($"price_band")
  }

  /** String function battery (F3-F5, F11, F13, F14): lower, substring,
    * length, regexp_extract, replace, trim, concat. */
  val q15StringFuncs: QueryDef = sqlChecked(
    "q15_string_funcs",
    """SELECT p_partkey,
      |  lower(p_name) AS name_lc,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  length(p_name) AS name_len,
      |  CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) AS brand_num,
      |  replace(p_type, 'ECONOMY', 'ECO') AS type_short,
      |  concat(p_brand, ':', p_type) AS brand_type
      |FROM part
      |WHERE p_partkey < 300
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_partkey" < 300)
      .select(
        $"p_partkey",
        lower($"p_name").as("name_lc"),
        substring($"p_name", 1, 8).as("name_prefix"),
        length($"p_name").as("name_len"),
        regexp_extract($"p_brand", "#(\\d+)", 1).cast("long").as("brand_num"),
        regexp_replace($"p_type", "ECONOMY", "ECO").as("type_short"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"))
      .orderBy($"p_partkey")
  }

  /** Date/time functions (F2-family): year/month extraction + month
    * truncation rollup of order volume. */
  val q16DateFuncs: QueryDef = sqlChecked(
    "q16_date_funcs",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST((o_totalprice) AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY order_year, order_month""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(
        year($"o_orderdate").cast("long").as("order_year"),
        month($"o_orderdate").cast("long").as("order_month"),
        date_trunc("month", $"o_orderdate").as("month_start"))
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .orderBy($"order_year", $"order_month")
  }

  /** JSON extraction (F1 surface on the events stream table): pull props.k
    * out of the JSON payload, aggregate per event_type. */
  val q17JsonExtract: QueryDef = sqlChecked(
    "q17_json_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST((value) AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(
        sum($"k").as("sum_k"),
        count(lit(1)).as("n"),
        dsum($"value").as("sum_value"))
      .orderBy($"event_type")
  }

  /** IN-list / set membership (P9) + null-handling surface (P10):
    * coalesce/nullif over segment values. */
  val q18IsinNullHandling: QueryDef = sqlChecked(
    "q18_isin_null_handling",
    """SELECT coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST((c_acctbal) AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal
      |FROM customer
      |WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
      |GROUP BY 1
      |ORDER BY segment""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .filter($"c_nationkey".isin(0 to 11: _*))
      .withColumn("segment",
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("OTHER")))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"segment")
  }

  /** Global top-K (O2): TakeOrderedAndProject, deterministic tiebreak. */
  val q19TopkGlobal: QueryDef = sqlChecked(
    "q19_topk_global",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 15""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(15)
  }

  /** Statistical aggregates: stddev/correlation. rowsOnly: engines use
    * different streaming-moment algorithms, so values adjacent to a
    * rounding boundary can round differently and flake an exact hash
    * compare (ADVICE r1). min/max stay exact and are sanity-visible. */
  val q20Stats: QueryDef = rowsOnly("q20_stats") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qty_price"),
        round(min($"l_extendedprice"), 4).as("min_price"),
        round(max($"l_extendedprice"), 4).as("max_price"))
      .orderBy($"l_returnflag")
  }

  /** q20's statistics made oracle-exact AND cheap: one-pass raw moments in
    * scaled-integer fixed point. l_quantity is integer-valued (1–50) and
    * l_extendedprice has exactly 2 decimals, so every moment is an exact
    * BIGINT sum — no Decimal128 accumulation anywhere (the r5 bench found
    * the DECIMAL(30,6) version ~8× the float cost; long sums stay in
    * whole-stage codegen). The quadratic cent moments overflow a single
    * long at corpus scale, so each row's value is split into base-10^k
    * limbs summed separately and recombined in the final 3-row projection.
    * corr is scale-invariant, so it is computed directly in (qty, cents)
    * units — no /100 fix-ups. Final double formulas are written
    * identically on both sides → identical IEEE results → exact hash.
    *
    * Overflow budgets at 100 TB (~6e11 rows/group, qty ≤ 50,
    * cents ≤ 1.05e7): Σq ≤ 3e13, Σq² ≤ 1.5e15, Σc ≤ 6.3e18 (1.5×
    * headroom — promote to two limbs beyond ~10^12 rows/group),
    * Σ(qc div 1e3) ≤ 3.2e17, Σ(qc mod 1e3) ≤ 6e14,
    * Σ(c² div 1e10) ≤ 6.6e15, Σ limbs of c² mod 1e10 ≤ 6e16 — all inside
    * long range. Per-row products: qc ≤ 5.25e8, c² ≤ 1.11e14 — no row
    * overflow. */
  val q20bMomentStats: QueryDef = sqlChecked(
    "q20b_moment_stats",
    """WITH t AS (
      |  SELECT l_returnflag,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
      |  FROM lineitem
      |), g AS (
      |  SELECT l_returnflag,
      |    SUM(q) AS sx, SUM(q * q) AS sxx, SUM(c) AS sy_c,
      |    SUM((q * c) // 1000) AS sxy_hi, SUM((q * c) % 1000) AS sxy_lo,
      |    SUM((c * c) // 10000000000) AS syy_hi,
      |    SUM(((c * c) // 100000) % 100000) AS syy_mid,
      |    SUM((c * c) % 100000) AS syy_lo,
      |    COUNT(*) AS n
      |  FROM t GROUP BY l_returnflag
      |)
      |SELECT l_returnflag,
      |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 4) AS sd_qty,
      |  round((CAST(sxy_hi AS DOUBLE) * 1000 + CAST(sxy_lo AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy_c AS DOUBLE) / n) /
      |    (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
      |     sqrt(CAST(syy_hi AS DOUBLE) * 1e10 + CAST(syy_mid AS DOUBLE) * 100000 + CAST(syy_lo AS DOUBLE) - CAST(sy_c AS DOUBLE) * CAST(sy_c AS DOUBLE) / n)), 4) AS corr_qty_price,
      |  CAST(n AS BIGINT) AS n
      |FROM g
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .selectExpr(
        "l_returnflag",
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c")
      .selectExpr(
        "l_returnflag", "q", "c",
        "(q * c) div 1000 AS xy_hi", "(q * c) % 1000 AS xy_lo",
        "(c * c) div 10000000000 AS yy_hi",
        "((c * c) div 100000) % 100000 AS yy_mid",
        "(c * c) % 100000 AS yy_lo")
      .groupBy($"l_returnflag")
      .agg(
        sum($"q").as("sx"), sum($"q" * $"q").as("sxx"), sum($"c").as("sy_c"),
        sum($"xy_hi").as("sxy_hi"), sum($"xy_lo").as("sxy_lo"),
        sum($"yy_hi").as("syy_hi"), sum($"yy_mid").as("syy_mid"),
        sum($"yy_lo").as("syy_lo"),
        count(lit(1)).as("n"))
      .selectExpr(
        "l_returnflag",
        "round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 4) AS sd_qty",
        """round((CAST(sxy_hi AS DOUBLE) * 1000 + CAST(sxy_lo AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy_c AS DOUBLE) / n) /
          |  (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
          |   sqrt(CAST(syy_hi AS DOUBLE) * 1e10 + CAST(syy_mid AS DOUBLE) * 100000 + CAST(syy_lo AS DOUBLE) - CAST(sy_c AS DOUBLE) * CAST(sy_c AS DOUBLE) / n)), 4) AS corr_qty_price""".stripMargin,
        "n")
      .orderBy($"l_returnflag")
  }

  /** Pivot (reference's per-city/per-cluster breakdown generalized):
    * daily event counts pivoted by event_type. Oracle uses conditional
    * aggregation — same result, same column names. */
  val q21Pivot: QueryDef = sqlChecked(
    "q21_pivot",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
      .orderBy($"day")
  }

  /** Correlated-style aggregation via join on derived aggregate (A6/A8):
    * customers whose account balance exceeds their nation's average. */
  val q22JoinOnAggregate: QueryDef = sqlChecked(
    "q22_join_on_aggregate",
    """WITH nat_avg AS (
      |  SELECT c_nationkey,
      |    CAST(SUM(CAST((c_acctbal) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
      |  FROM customer GROUP BY c_nationkey)
      |SELECT n_name, COUNT(*) AS n_above
      |FROM customer
      |JOIN nat_avg USING (c_nationkey)
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > avg_bal
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val natAvg = cust.groupBy($"c_nationkey").agg(davg($"c_acctbal").as("avg_bal"))
    cust
      .join(broadcast(natAvg), Seq("c_nationkey"))
      .filter($"c_acctbal" > $"avg_bal")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_above"))
      .orderBy($"n_name")
  }

  /** Approximate distinct (HLL++) — scale substitute for exact distinct at
    * 100 TB: sketches merge in the partial agg, so the shuffle carries one
    * 16 KB sketch per (task, group) instead of every distinct key. Engines'
    * sketches differ → rows-only check; exactness is covered by q09's
    * oracle-checked countDistinct (pairing the exact aggregate in here
    * would re-add the very shuffle the sketch exists to avoid). */
  val q23ApproxDistinct: QueryDef = rowsOnly("q23_approx_distinct") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        // rsd 0.05 (the Spark default): 2^11 registers per partial sketch.
        // The r5 bench showed rsd=0.01 (2^17 registers) made the "cheap"
        // approximate path 17× slower than exact countDistinct at sf0.1 —
        // the sketch's point is a small mergeable summary, so size it so.
        approx_count_distinct($"l_partkey", 0.05).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** q23's portable twin (the kq03b pattern applied to HLL++): the sketch
    * estimate can't hash-match another engine, but its PUBLISHED GUARANTEE
    * can. `approx_count_distinct(rsd = 0.05)` bounds the relative-error
    * standard deviation at 5%; we assert the estimate lands within 3σ
    * (15%) of the exact distinct count — flake-proof margin, yet tight
    * enough that a mis-merged or mis-sized sketch bursts it. The oracle
    * replays the exact count and expects the bound flag to be 1, so a
    * drifting sketch OR a broken exact path both surface as a hash
    * mismatch. Unlike q23 (which deliberately avoids the exact shuffle),
    * this twin pays the exact countDistinct — that's the price of the
    * check, not the 100 TB serving shape; q23 remains the scale path. */
  val q23bApproxDistinctBound: QueryDef = sqlChecked(
    "q23b_approx_distinct_bound",
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  CAST(1 AS BIGINT) AS in_error_bound
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.05).as("est"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"est" - $"exact_parts") <= $"exact_parts" * 0.15)
          .cast("long").as("in_error_bound"))
      .orderBy($"l_returnflag")
  }

  /** Exact per-group percentiles via the distributed bucket-and-refine
    * operator (graft.operators.ExactPercentile): three fully-parallel
    * passes with bounded memory, vs Spark's `percentile` aggregate which
    * buffers every value of a group in ONE task (the r1-flagged 100 TB
    * scale-killer). Same quantile_cont semantics → same DuckDB oracle
    * hash. q25 below is the sketch path (approx_percentile) for when one
    * exact pass over boundary buckets is still too much. */
  val q24Percentiles: QueryDef = sqlChecked(
    "q24_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.01), 4) AS p01,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    graft.operators.ExactPercentile.quantiles(
        Tables.lineitem(spark, dir).select($"l_returnflag", $"l_extendedprice"),
        "l_returnflag", "l_extendedprice",
        Seq(0.01, 0.50, 0.99), Seq("p01", "p50", "p99"))
      .select($"l_returnflag",
        round($"p01", 4).as("p01"),
        round($"p50", 4).as("p50"),
        round($"p99", 4).as("p99"))
      .orderBy($"l_returnflag")
  }

  /** F21 isnan/isnull surface: 0/0 double division produces NaN (non-ANSI),
    * nullif produces nulls — count both per flag. */
  val q26NanNullChecks: QueryDef = sqlChecked(
    "q26_nan_null_checks",
    """SELECT l_returnflag,
      |  COUNT(*) FILTER (WHERE isnan(CASE WHEN l_discount = 0
      |    THEN CAST('NaN' AS DOUBLE) ELSE l_discount END)) AS n_nan,
      |  COUNT(*) FILTER (WHERE nullif(l_linestatus, 'O') IS NULL) AS n_null,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(when(isnan(when($"l_discount" === 0, lit("NaN").cast("double"))
          .otherwise($"l_discount")), 1)).as("n_nan"),
        count(when(nullif($"l_linestatus", lit("O")).isNull, 1)).as("n_null"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** Approximate percentiles — the 100 TB path for A5: bounded-memory
    * sketch, mergeable partials, no per-group value buffering. rowsOnly
    * because the sketch isn't engine-portable. */
  val q25ApproxPercentiles: QueryDef = rowsOnly("q25_approx_percentiles") { (spark, dir) =>
    import spark.implicits._
    // scalar columns, not the raw array: the driver's compare harness
    // sorts every output column and can't sort array cells
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.01, 0.5, 0.99), 10000)").as("pcts"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        element_at($"pcts", 1).as("p01"),
        element_at($"pcts", 2).as("p50"),
        element_at($"pcts", 3).as("p99"),
        $"n")
      .orderBy($"l_returnflag")
  }

  /** q25's portable twin — kq03b's rank-band assertion applied to Spark's
    * own `approx_percentile`: accuracy=10000 bounds normalized rank error
    * at 1/accuracy = 1e-4; we take ε=0.005 (50× margin, still tight) and
    * assert the sketch's p50/p99 land between the EXACT values at ranks
    * q±ε from the distributed [[graft.operators.ExactPercentile]]. The
    * returned sketch value is an actual dataset element, which always lies
    * within the quantile_cont envelope of its rank band, so the flag is
    * deterministic. Oracle replays the exact quantiles and expects both
    * band predicates true — sketch drift and exact-operator breakage both
    * land as hash mismatches. */
  val q25bApproxPercentileBound: QueryDef = sqlChecked(
    "q25b_approx_percentile_bound",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50_exact,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
      |  CAST(1 AS BIGINT) AS p50_in_rank_band,
      |  CAST(1 AS BIGINT) AS p99_in_rank_band
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val est = li
      .groupBy($"l_returnflag")
      .agg(expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)").as("pcts"))
      .select($"l_returnflag",
        element_at($"pcts", 1).as("p50_est"),
        element_at($"pcts", 2).as("p99_est"))
    val eps = 0.005 // 50× the accuracy=10000 rank-error bound
    val bands = graft.operators.ExactPercentile.quantiles(
      li.select($"l_returnflag", $"l_extendedprice"),
      "l_returnflag", "l_extendedprice",
      Seq(0.5 - eps, 0.5, 0.5 + eps, 0.99 - eps, 0.99, 0.99 + eps),
      Seq("p50_lo", "p50", "p50_hi", "p99_lo", "p99", "p99_hi"))
    est.join(bands, "l_returnflag")
      .select($"l_returnflag",
        round($"p50", 4).as("p50_exact"),
        round($"p99", 4).as("p99_exact"),
        ($"p50_est" >= $"p50_lo" && $"p50_est" <= $"p50_hi")
          .cast("long").as("p50_in_rank_band"),
        ($"p99_est" >= $"p99_lo" && $"p99_est" <= $"p99_hi")
          .cast("long").as("p99_in_rank_band"))
      .orderBy($"l_returnflag")
  }

  /** Analytic window battery: lag/lead, first_value over a running frame,
    * ntile quartiles, percent_rank, cume_dist — one shuffle on the
    * partition key serves all six functions (they share the window).
    * Deterministic because the window order (o_orderdate, o_orderkey) is a
    * total order. */
  val q27WindowBattery: QueryDef = sqlChecked(
    "q27_window_battery",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  first_value(o_totalprice) OVER
      |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 100) // pushes below the window (partition-key predicate)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"o_orderdate")
      .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
      .withColumn("next_price", lead($"o_totalprice", 1).over(w))
      .withColumn("first_price", first($"o_totalprice").over(wRows))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .drop("o_orderdate")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** arg-min/arg-max aggregates (max_by/min_by): per customer the
    * orderkeys of the most/least expensive order. The struct-valued
    * ordering column makes ties deterministic (price, then orderkey) —
    * required for an exact-hash oracle; the DuckDB side expresses the
    * same pick via ranked windows because its arg_max can't composite-
    * order. One hash-agg shuffle; no window on the Spark side. */
  val q28ArgMinMax: QueryDef = sqlChecked(
    "q28_arg_min_max",
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
      |  FROM orders WHERE o_custkey < 500)
      |SELECT o_custkey,
      |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS best_order,
      |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS worst_order,
      |  max(o_totalprice) AS best_price,
      |  min(o_totalprice) AS worst_price
      |FROM ranked
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 500)
      .groupBy($"o_custkey")
      .agg(
        max_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("best_order"),
        min_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("worst_order"),
        max($"o_totalprice").as("best_price"),
        min($"o_totalprice").as("worst_price"))
      .orderBy($"o_custkey")
  }

  /** Uncorrelated scalar subquery through the SQL surface: orders above
    * the global average price, counted per status. Spark plans the
    * subquery once (SubqueryExec, reused), then the main scan filters —
    * no join. The decimal-exact avg makes the threshold identical across
    * engines, so a price adjacent to the mean can't flip. */
  val q29ScalarSubquery: QueryDef = {
    val sql =
      s"""SELECT o_orderstatus, COUNT(*) AS n_above,
         |  ${sqlDavg("o_totalprice")} AS avg_above
         |FROM orders
         |WHERE o_totalprice > (SELECT ${sqlDavg("o_totalprice")} FROM orders)
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    sqlChecked("q29_scalar_subquery", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02FilterRevenue, q03StarJoinRevenue,
    q04BroadcastPartJoin, q05SemiJoin, q06AntiJoin,
    q07WindowTopkPerGroup, q07bTopkAggregator, q08WindowRunningSum,
    q09DistinctCounts,
    q10Rollup, q11Cube, q12SetOps, q12bSetOperators, q13Having,
    q14CaseWhenBuckets, q15StringFuncs, q16DateFuncs, q17JsonExtract,
    q18IsinNullHandling, q19TopkGlobal, q20Stats, q20bMomentStats, q21Pivot,
    q22JoinOnAggregate, q23ApproxDistinct, q23bApproxDistinctBound,
    q24Percentiles,
    q25ApproxPercentiles, q25bApproxPercentileBound,
    q26NanNullChecks, q27WindowBattery,
    q28ArgMinMax, q29ScalarSubquery)
}
