package graft.queries

import graft.QueryDef
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation battery (DataSketches surface of Spark 4).
  *
  * THE 100 TB pattern: distinct counts / quantiles / set cardinalities are
  * the aggregations that do not decompose — a naive COUNT(DISTINCT) over
  * 100 TB shuffles every key and an exact percentile buffers whole groups.
  * Sketches restore map-side partial aggregation: each partition (or each
  * partition of a pre-aggregated rollup table) produces a small fixed-size
  * summary, summaries merge associatively at query time, and accuracy is a
  * tunable constant. Every query below is written in that two-level shape —
  * build partials at fine grain, merge at coarse grain — so the plan is the
  * one you'd run on a real cluster (partial_* → merge_* with no row
  * explosion), not a single-level toy.
  *
  * kq01 is EXACT (RoaringBitmap-style bucketed bitmaps) and oracle-checked
  * against DuckDB COUNT(DISTINCT). kq02-kq04 are estimators, so no SQL
  * oracle can hash-match them; instead each emits its own ground truth and
  * relative error as columns (self-validating output), and SketchSpec
  * asserts the published error bounds hold.
  */
object SketchQueries {

  /** Exact distinct via bucketed bitmaps (bitmap_bucket_number splits the
    * key space into 32k-bit buckets; bitmap_construct_agg ORs positions
    * within a bucket). Built at a FINER grain than asked — per (status,
    * priority, bucket), the shape of a pre-aggregated rollup table — then
    * rolled up with bitmap_or_agg, proving the bitmaps merge losslessly
    * across the extra dimension. Unlike COUNT(DISTINCT), every level is a
    * mergeable partial aggregate — the dense-integer-key answer to exact
    * distinct at scale. */
  val kq01BitmapDistinct: QueryDef = sqlChecked(
    "kq01_bitmap_distinct",
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus", $"o_orderpriority",
        bitmap_bucket_number($"o_custkey").as("bucket"))
      .agg(bitmap_construct_agg(bitmap_bit_position($"o_custkey")).as("bm"))
      .groupBy($"o_orderstatus", $"bucket")
      .agg(bitmap_or_agg($"bm").as("bm"))
      .groupBy($"o_orderstatus")
      .agg(sum(bitmap_count($"bm")).as("n_customers"))
      .orderBy($"o_orderstatus")
  }

  /** HLL rollup: per-(status, orderdate) sketches of the customer set —
    * the shape of a daily pre-aggregated rollup table — merged per status
    * with hll_union_agg. Emits the exact distinct alongside so the output
    * is self-validating (rel_err column; lgConfigK=14 ⇒ σ ≈ 0.81%). */
  val kq02HllRollup: QueryDef = rowsOnly("kq02_hll_rollup") { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val daily = orders
      .groupBy($"o_orderstatus", $"o_orderdate")
      .agg(hll_sketch_agg($"o_custkey", 14).as("sk"))
    val est = daily
      .groupBy($"o_orderstatus")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_distinct"))
    val exact = orders
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("exact_distinct"))
    est.join(exact, "o_orderstatus")
      .select($"o_orderstatus", $"est_distinct", $"exact_distinct",
        (abs($"est_distinct" - $"exact_distinct") / $"exact_distinct")
          .as("rel_err"))
      .orderBy($"o_orderstatus")
  }

  /** KLL quantile sketches: partial sketches of l_extendedprice built per
    * (returnflag, linestatus) — the finer partial grain — merged per
    * returnflag with kll_merge_agg_double, then p50/p95 read from the
    * merged sketch. Exact quantile_cont values ride along for validation.
    * At 100 TB this replaces exact percentile's bucket-and-refine passes
    * with one pass + constant-size merges (k=200 ⇒ rank error ≈ 1.65%). */
  val kq03KllQuantiles: QueryDef = rowsOnly("kq03_kll_quantiles") { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val partial = li
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(kll_sketch_agg_double($"l_extendedprice", 200).as("sk"))
    val merged = partial
      .groupBy($"l_returnflag")
      .agg(kll_merge_agg_double($"sk").as("sk"))
      .select($"l_returnflag",
        kll_sketch_get_quantile_double($"sk", lit(0.5)).as("p50_est"),
        kll_sketch_get_quantile_double($"sk", lit(0.95)).as("p95_est"))
    // validation side via the engine's own distributed exact-percentile
    // operator (bounded memory), not the whole-group-buffering built-in
    val exact = graft.operators.ExactPercentile.quantiles(
      li.select($"l_returnflag", $"l_extendedprice"),
      "l_returnflag", "l_extendedprice",
      Seq(0.5, 0.95), Seq("p50_exact", "p95_exact"))
    merged.join(exact, "l_returnflag")
      .select($"l_returnflag", $"p50_est", $"p50_exact", $"p95_est", $"p95_exact",
        (abs($"p50_est" - $"p50_exact") / $"p50_exact").as("p50_rel_err"),
        (abs($"p95_est" - $"p95_exact") / $"p95_exact").as("p95_rel_err"))
      .orderBy($"l_returnflag")
  }

  /** kq03's portable twin — the dq03b pattern applied to an estimator:
    * the KLL estimate itself cannot hash-match any SQL engine, but its
    * PUBLISHED GUARANTEE can. KLL k=200 bounds normalized RANK error at
    * ≈1.65% (99% confidence); we take double that (ε=0.033) and assert
    * the sketch's p50/p95 land between the EXACT values at ranks q±ε —
    * computed by the engine's own distributed [[graft.operators.ExactPercentile]],
    * whose interpolation is quantile_cont-identical (q24's hash-green
    * precedent). The oracle replays the exact quantiles and expects the
    * band predicates to be 1, so a sketch drifting outside its error
    * bound — or a broken exact-percentile operator — both surface as a
    * hash mismatch. Same two-level partial/merge sketch shape as kq03. */
  val kq03bKllErrorBound: QueryDef = sqlChecked(
    "kq03b_kll_error_bound",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50_exact,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
      |  CAST(1 AS BIGINT) AS p50_in_rank_band,
      |  CAST(1 AS BIGINT) AS p95_in_rank_band
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val est = li
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(kll_sketch_agg_double($"l_extendedprice", 200).as("sk"))
      .groupBy($"l_returnflag")
      .agg(kll_merge_agg_double($"sk").as("sk"))
      .select($"l_returnflag",
        kll_sketch_get_quantile_double($"sk", lit(0.5)).as("p50_est"),
        kll_sketch_get_quantile_double($"sk", lit(0.95)).as("p95_est"))
    val eps = 0.033 // 2× the k=200 rank-error bound: flake-proof margin
    val bands = graft.operators.ExactPercentile.quantiles(
      li.select($"l_returnflag", $"l_extendedprice"),
      "l_returnflag", "l_extendedprice",
      Seq(0.5 - eps, 0.5, 0.5 + eps, 0.95 - eps, 0.95, 0.95 + eps),
      Seq("p50_lo", "p50", "p50_hi", "p95_lo", "p95", "p95_hi"))
    est.join(bands, "l_returnflag")
      .select($"l_returnflag",
        round($"p50", 4).as("p50_exact"),
        round($"p95", 4).as("p95_exact"),
        ($"p50_est" >= $"p50_lo" && $"p50_est" <= $"p50_hi")
          .cast("long").as("p50_in_rank_band"),
        ($"p95_est" >= $"p95_lo" && $"p95_est" <= $"p95_hi")
          .cast("long").as("p95_in_rank_band"))
      .orderBy($"l_returnflag")
  }

  /** Theta sketches: set algebra over customer populations without
    * materializing the sets. A = customers with an urgent order, B =
    * customers with a high-value order; union/intersection/difference
    * cardinalities all come from two fixed-size sketches. Exact values
    * (one extra aggregate over the same scan shape) ride along. */
  val kq04ThetaSetAlgebra: QueryDef = rowsOnly("kq04_theta_set_algebra") { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val urgent  = $"o_orderpriority" === "1-URGENT"
    val bigspend = $"o_totalprice" > 200000.0
    val sketches = orders.agg(
      theta_sketch_agg(when(urgent, $"o_custkey")).as("sk_a"),
      theta_sketch_agg(when(bigspend, $"o_custkey")).as("sk_b"))
    // Ground truth must use SET semantics: a customer is in A∩B when they
    // have some urgent order AND some big order (not necessarily the same
    // order!), so reduce to per-customer flags first — one scan, and the
    // same single-pass shape q12 uses for set-op counts.
    val exact = orders
      .groupBy($"o_custkey")
      .agg(max(urgent.cast("int")).as("a"), max(bigspend.cast("int")).as("b"))
      .agg(
        sum($"a").as("exact_a"),
        sum($"b").as("exact_b"),
        sum(greatest($"a", $"b")).as("exact_union"),
        sum(least($"a", $"b")).as("exact_intersect"))
    sketches.crossJoin(exact)
      .select(
        theta_sketch_estimate($"sk_a").as("est_a"),
        theta_sketch_estimate($"sk_b").as("est_b"),
        theta_sketch_estimate(theta_union($"sk_a", $"sk_b")).as("est_union"),
        theta_sketch_estimate(theta_intersection($"sk_a", $"sk_b")).as("est_intersect"),
        $"exact_a", $"exact_b", $"exact_union", $"exact_intersect")
  }

  /** Frequent tokens via Misra–Gries candidates + exact confirm — and
    * UNLIKE kq02-kq04 this sketch query IS hash-oracle-checkable: the
    * summary's no-false-negative guarantee (every item with count >
    * n/(k+1) survives, operators/MisraGries.scala) means
    * sketch-candidates → exact-re-count → threshold-filter yields exactly
    * the set a full groupBy would — deterministically, whatever the
    * partitioning did to the counter values. Same architecture as dq07b's
    * Bloom pass: the sketch DECIMATES (at 100 TB the exact count runs
    * over ≤ k candidate tokens via semi-join, not the whole vocabulary),
    * the exact pass confirms. Three corpus passes, each map-friendly: an
    * in-row token count (no explode), the bounded-state sketch, and the
    * candidate-only count. Threshold compares as `cnt · (k+1) > n` —
    * pure integers, no division ambiguity. */
  val kq05HeavyHitters: QueryDef = sqlChecked(
    "kq05_heavy_hitters",
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok)
      |SELECT c.tok, c.cnt
      |FROM c, n WHERE c.cnt * 33 > n.n
      |ORDER BY c.cnt DESC, c.tok""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val k = 32
    def docs = Tables.documents(spark, dir)
      .select(split(lower($"text"), "\\s+").as("w"))
    // pass 1 (in-row, no explode): total token count n
    val n = docs.agg(sum(size($"w")).cast("long").as("n"))
    // pass 2: bounded-state sketch → candidate tokens (≤ k rows)
    def toks = docs.select(explode($"w").as("tok"))
    val cand = toks.as[String]
      .select(graft.operators.MisraGries.summary(k).toColumn.name("hh"))
      .toDF("hh")
      .select(explode($"hh").as("e"))
      .select($"e._1".as("tok"))
    // pass 3: exact counts for candidates ONLY (semi-join decimation)
    toks.join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter($"cnt" * (k + 1) > $"n")
      .select($"tok", $"cnt")
      .orderBy($"cnt".desc, $"tok")
  }

  /** kq02's portable twin (the kq03b pattern): the HLL estimates are
    * engine-binary, but the sketch's PUBLISHED guarantee is checkable in
    * SQL — lgK=14 has standard error 1.04/√2¹⁴ ≈ 0.81%, so a merged
    * estimate outside ±3% (well past 3σ) means the sketch or the daily
    * partial→union merge path is broken. The oracle carries the exact
    * distincts and the literal all-within-bound flags; a broken merge
    * hash-mismatches. */
  val kq02bHllErrorBound: QueryDef = sqlChecked(
    "kq02b_hll_error_bound",
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS exact_distinct,
      |  CAST(1 AS BIGINT) AS hll_in_bound
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val est = orders
      .groupBy($"o_orderstatus", $"o_orderdate")
      .agg(hll_sketch_agg($"o_custkey", 14).as("sk"))
      .groupBy($"o_orderstatus")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val exact = orders
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("exact_distinct"))
    est.join(exact, "o_orderstatus")
      .select($"o_orderstatus", $"exact_distinct",
        (abs($"est" - $"exact_distinct") / $"exact_distinct" <= 0.03)
          .cast("long").as("hll_in_bound"))
      .orderBy($"o_orderstatus")
  }

  /** kq04's portable twin: exact set-algebra cardinalities (per-customer
    * flag reduction — replayable SQL) plus literal within-bound flags
    * for every theta estimate. Below the sketch's nominal-entries
    * threshold theta is EXACT, so the 5% band is generous at every test
    * SF while still catching a broken union/intersection operator. */
  val kq04bThetaErrorBound: QueryDef = sqlChecked(
    "kq04b_theta_error_bound",
    """WITH f AS (
      |  SELECT o_custkey,
      |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS a,
      |    MAX(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS b
      |  FROM orders GROUP BY o_custkey)
      |SELECT
      |  CAST(SUM(a) AS BIGINT) AS exact_a,
      |  CAST(SUM(b) AS BIGINT) AS exact_b,
      |  CAST(SUM(GREATEST(a, b)) AS BIGINT) AS exact_union,
      |  CAST(SUM(LEAST(a, b)) AS BIGINT) AS exact_intersect,
      |  CAST(1 AS BIGINT) AS a_in_bound,
      |  CAST(1 AS BIGINT) AS b_in_bound,
      |  CAST(1 AS BIGINT) AS union_in_bound
      |FROM f""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val urgent = $"o_orderpriority" === "1-URGENT"
    val bigspend = $"o_totalprice" > 200000.0
    val sketches = orders.agg(
      theta_sketch_agg(when(urgent, $"o_custkey")).as("sk_a"),
      theta_sketch_agg(when(bigspend, $"o_custkey")).as("sk_b"))
    val exact = orders
      .groupBy($"o_custkey")
      .agg(max(urgent.cast("int")).as("a"), max(bigspend.cast("int")).as("b"))
      .agg(
        sum($"a").cast("long").as("exact_a"),
        sum($"b").cast("long").as("exact_b"),
        sum(greatest($"a", $"b")).cast("long").as("exact_union"),
        sum(least($"a", $"b")).cast("long").as("exact_intersect"))
    def inBound(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      (abs(est - exact) <= greatest(exact * 0.05, lit(1.0))).cast("long")
    sketches.crossJoin(broadcast(exact))
      .select($"exact_a", $"exact_b", $"exact_union", $"exact_intersect",
        inBound(theta_sketch_estimate($"sk_a"), $"exact_a").as("a_in_bound"),
        inBound(theta_sketch_estimate($"sk_b"), $"exact_b").as("b_in_bound"),
        inBound(theta_sketch_estimate(theta_union($"sk_a", $"sk_b")), $"exact_union")
          .as("union_in_bound"))
  }

  val all: Seq[QueryDef] = Seq(
    kq01BitmapDistinct, kq02HllRollup, kq02bHllErrorBound, kq03KllQuantiles,
    kq03bKllErrorBound, kq04ThetaSetAlgebra, kq04bThetaErrorBound,
    kq05HeavyHitters)
}
