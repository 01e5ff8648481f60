package graft.queries

import graft.QueryDef
import graft.QueryDef.sqlChecked
import graft.sources.Tables
import graft.util.Num._
import org.apache.spark.sql.functions._

/** Second relational battery: the SQL-surface features added to Spark 4's
  * Dataset API that the first battery (q01-q29) predates — GROUPING SETS
  * as a first-class grouping (not just rollup/cube), relational unpivot,
  * correlated LATERAL subqueries, and the higher-order array-function
  * family (aggregate/exists/forall/slice over unbounded-width arrays,
  * which stay codegen-friendly and never leave the row — the scalable
  * alternative to exploding token arrays into row space).
  */
object RelationalExt {

  /** GROUPING SETS via the Dataset groupingSets API (more general than
    * rollup q10 / cube q11: an explicit set list skips the cross-product
    * of grouping combinations — at 100 TB each extra grouping combination
    * is another full pass of partial aggregation, so enumerating exactly
    * the sets a dashboard needs is the cheap form). grouping_id()
    * disambiguates which set each output row belongs to. */
  val q30GroupingSets: QueryDef = sqlChecked(
    "q30_grouping_sets",
    """SELECT n_regionkey, n_nationkey % 5 AS nk,
      |  GROUPING(n_regionkey, n_nationkey % 5) AS gid, COUNT(*) AS n
      |FROM nation
      |GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey % 5), ())
      |ORDER BY gid, n_regionkey NULLS FIRST, nk NULLS FIRST""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // NB: the set members and the grouping columns must be the SAME
    // attribute references — an expression in one and an alias of it in
    // the other do not unify (the aliased column comes back all-null with
    // a phantom third grouping bit). Projecting nk first sidesteps it.
    Tables.nation(spark, dir)
      .withColumn("nk", $"n_nationkey" % 5)
      .groupingSets(
        Seq(Seq($"n_regionkey"), Seq($"nk"), Seq.empty),
        $"n_regionkey", $"nk")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      .orderBy($"gid", $"n_regionkey".asc_nulls_first, $"nk".asc_nulls_first)
  }

  /** Relational unpivot (wide metric columns → long (metric, value) rows)
    * then re-aggregation — the standard reshape before a per-metric
    * rollup. Decimal-exact sums keep the result engine-portable. */
  val q31Unpivot: QueryDef = sqlChecked(
    "q31_unpivot", {
      s"""SELECT metric, ${sqlDsum("value")} AS total, COUNT(*) AS n
         |FROM (
         |  SELECT * FROM (
         |    SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice,
         |           CAST(p_size AS DOUBLE) AS p_size
         |    FROM part WHERE p_size <= 20)
         |  UNPIVOT (value FOR metric IN (p_retailprice, p_size)))
         |GROUP BY metric
         |ORDER BY metric""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_size" <= 20)
      .select($"p_partkey",
        $"p_retailprice".cast("double").as("p_retailprice"),
        $"p_size".cast("double").as("p_size"))
      .unpivot(Array($"p_partkey"), Array($"p_retailprice", $"p_size"),
        "metric", "value")
      .groupBy($"metric")
      .agg(dsum($"value").as("total"), count(lit(1)).as("n"))
      .orderBy($"metric")
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 customers
    * per nation. Same semantics as the window top-K (q07) but through the
    * lateral-join operator surface — Catalyst plans the correlation as a
    * DomainJoin and the per-key LIMIT never materializes a full sort of
    * the fact side. */
  val q32LateralTopK: QueryDef = {
    val sql =
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) AS c
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin
    sqlChecked("q32_lateral_topk", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** Higher-order array functions over tokenized text: aggregate (fold),
    * exists, forall, array_sort + slice — all computed inside the row
    * with codegen, no explode. At 100 TB this is the difference between
    * a map-only pass and a shuffle of every token. */
  val q33HofBattery: QueryDef = sqlChecked(
    "q33_hof_battery",
    """SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS BIGINT) AS total_len,
      |  len(list_filter(toks, x -> len(x) > 7)) > 0 AS has_long,
      |  len(list_filter(toks, x -> NOT (len(x) > 0))) = 0 AS all_nonempty,
      |  array_to_string(list_sort(toks)[1:3], ' ') AS first3
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE doc_id < 200)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select(
        $"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        aggregate($"toks", lit(0), (acc, x) => acc + length(x)).cast("long").as("total_len"),
        exists($"toks", x => length(x) > 7).as("has_long"),
        forall($"toks", x => length(x) > 0).as("all_nonempty"),
        concat_ws(" ", slice(array_sort($"toks"), 1, 3)).as("first3"))
      .orderBy($"doc_id")
  }

  /** Extended string-function battery beyond q15's core set: initcap,
    * translate, pads, repeat/reverse, position, ascii/chr, hashing
    * (md5/sha2), edit distance, regexp_count. All codegen'd built-ins —
    * the full text-normalization vocabulary a cleaning pipeline draws
    * from, each proven against an independent engine. (DuckDB lacks
    * initcap, so the oracle reconstructs it from word-split — which also
    * pins down the exact per-word semantics.) */
  val q34StringExt: QueryDef = sqlChecked(
    "q34_string_ext",
    """SELECT p_partkey,
      |  array_to_string(list_transform(string_split(lower(p_name), ' '),
      |    x -> upper(x[1]) || x[2:]), ' ') AS name_title,
      |  translate(p_name, 'aeiou', '12345') AS name_leet,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
      |  rpad(substring(p_name, 1, 4), 6, '.') AS name_cell,
      |  repeat(right(p_name, 2), 2) AS tail_twice,
      |  reverse(p_name) AS name_rev,
      |  strpos(p_name, 'o') AS first_o,
      |  ascii(p_name) AS first_code,
      |  md5(p_name) AS name_md5,
      |  sha256(p_name) AS name_sha,
      |  levenshtein(substring(p_name, 1, 8), reverse(substring(p_name, 1, 8))) AS palindrome_dist,
      |  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels
      |FROM part
      |WHERE p_partkey < 300
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_partkey" < 300)
      .select($"p_partkey",
        initcap($"p_name").as("name_title"),
        translate($"p_name", "aeiou", "12345").as("name_leet"),
        lpad($"p_partkey".cast("string"), 8, "0").as("key_padded"),
        rpad(substring($"p_name", 1, 4), 6, ".").as("name_cell"),
        repeat(substring($"p_name", -2, 2), 2).as("tail_twice"),
        reverse($"p_name").as("name_rev"),
        instr($"p_name", "o").as("first_o"),
        ascii($"p_name").as("first_code"),
        md5($"p_name").as("name_md5"),
        sha2($"p_name", 256).as("name_sha"),
        levenshtein(substring($"p_name", 1, 8),
          reverse(substring($"p_name", 1, 8))).as("palindrome_dist"),
        regexp_count($"p_name", lit("[aeiou]")).as("n_vowels"))
      .orderBy($"p_partkey")
  }

  /** Semi-structured VARIANT (Spark 4): parse_json once into the binary
    * variant encoding, then typed variant_get path extraction — unlike
    * per-path get_json_object (q17) the document is parsed ONCE however
    * many paths are read, the shape lakehouse event tables want.
    * try_variant_get on an absent path yields null instead of failing. */
  val q35Variant: QueryDef = sqlChecked(
    "q35_variant",
    """SELECT event_type,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
      |  COUNT(*) FILTER (props->>'$.absent' IS NULL) AS n_missing,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("v", parse_json($"props"))
      .withColumn("k", variant_get($"v", "$.k", "bigint"))
      .groupBy($"event_type")
      .agg(
        sum($"k").as("sum_k"),
        max($"k").as("max_k"),
        count(when(try_variant_get($"v", "$.absent", "string").isNull, 1))
          .as("n_missing"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Correlated EXISTS / NOT EXISTS / IN subqueries — the remaining
    * subquery surface beyond scalar (q29) and lateral (q32). Catalyst
    * rewrites all three to semi/anti joins, so the SQL-shaped predicates
    * cost the same as the explicit join forms (q05/q06). */
  val q36ExistsSubquery: QueryDef = {
    val sql =
      """SELECT c_mktsegment,
        |  COUNT(*) FILTER (WHERE has_urgent) AS n_with_urgent,
        |  COUNT(*) FILTER (WHERE no_orders) AS n_without_orders,
        |  COUNT(*) FILTER (WHERE in_big_nation) AS n_big_nation
        |FROM (
        |  SELECT c_mktsegment,
        |    EXISTS (SELECT 1 FROM orders
        |            WHERE o_custkey = c_custkey
        |              AND o_orderpriority = '1-URGENT') AS has_urgent,
        |    NOT EXISTS (SELECT 1 FROM orders
        |                WHERE o_custkey = c_custkey) AS no_orders,
        |    c_nationkey IN (SELECT n_nationkey FROM nation
        |                    WHERE n_regionkey = 0) AS in_big_nation
        |  FROM customer)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    sqlChecked("q36_exists_subquery", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** Generator with ordinality: posexplode keeps each element's position
    * — the explode variant order-sensitive consumers (token streams,
    * windowed shingles) need. Oracle: DuckDB generate_series + 1-based
    * list indexing. */
  val q37Posexplode: QueryDef = sqlChecked(
    "q37_posexplode",
    """SELECT doc_id, i - 1 AS pos, toks[i] AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE doc_id < 20),
      |  LATERAL unnest(generate_series(1, len(toks))) AS t(i)
      |ORDER BY doc_id, pos""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 20)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .orderBy($"doc_id", $"pos")
  }

  /** Schema-full JSON path (F1): from_json with an explicit schema into a
    * typed struct, field access, and to_json re-serialization — the
    * batch oracle-checked counterpart of the streaming parseJson path.
    * Both engines canonicalize to {"k":69} (no whitespace), so the
    * round-trip string itself is part of the hash-checked output. */
  val q38JsonRoundtrip: QueryDef = sqlChecked(
    "q38_json_roundtrip",
    """WITH j AS (
      |  SELECT event_type,
      |    TRY_CAST(TRY_CAST(props AS JSON)->>'$.k' AS BIGINT) AS k,
      |    props IS NULL AS props_null
      |  FROM events)
      |SELECT event_type,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  COUNT(*) FILTER (NOT props_null AND CAST(to_json(struct_pack(k := k))
      |    AS VARCHAR) = '{"k":69}') AS n_k69,
      |  COUNT(DISTINCT CASE WHEN props_null THEN NULL
      |    ELSE CAST(to_json(struct_pack(k := k)) AS VARCHAR) END) AS n_distinct_json
      |FROM j
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, dir)
      .withColumn("parsed", from_json($"props", schema))
      // ignoreNullFields=false: a null k serializes as {"k":null} exactly
      // like the oracle's struct_pack (the default would emit {} and
      // silently diverge on any fixture row without k). The oracle also
      // mirrors from_json's other null behaviors: TRY_CAST(props AS JSON)
      // nulls out malformed JSON (Spark yields a null-fields struct →
      // same '{"k":null}' serialization), and a NULL props row maps to a
      // NULL round-trip string on both sides.
      .withColumn("rt", to_json($"parsed", Map("ignoreNullFields" -> "false")))
      .groupBy($"event_type")
      .agg(
        sum($"parsed.k").as("sum_k"),
        count(when($"rt" === """{"k":69}""", 1)).as("n_k69"),
        countDistinct($"rt").as("n_distinct_json"))
      .orderBy($"event_type")
  }

  /** Winsorization (percentile clipping) — the robust-scaling step of
    * numeric feature engineering: per group, clip values into the
    * [p05, p95] band computed by the engine's distributed EXACT
    * percentile operator (bucket-and-refine, bounded memory — no
    * per-group value buffering), and account for what was clipped.
    * The thresholds are rounded to 4 dp in BOTH engines before any
    * comparison: q24 proves the exact-interpolation values agree at that
    * precision, and clipping against the rounded threshold removes the
    * last-ulp boundary risk a raw interpolated double would carry. The
    * per-group threshold frame is #groups rows and broadcasts back onto
    * the fact scan; the clipped sum is decimal-exact. */
  val q39Winsorize: QueryDef = sqlChecked(
    "q39_winsorize",
    s"""WITH t AS (
       |  SELECT l_returnflag,
       |    round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
       |    round(quantile_cont(l_extendedprice, 0.95), 4) AS hi
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l.l_returnflag,
       |  COUNT(*) AS n,
       |  COUNT(*) FILTER (l.l_extendedprice < t.lo) AS n_clipped_low,
       |  COUNT(*) FILTER (l.l_extendedprice > t.hi) AS n_clipped_high,
       |  ${sqlDsum("LEAST(GREATEST(l.l_extendedprice, t.lo), t.hi)")} AS sum_winsorized
       |FROM lineitem l JOIN t USING (l_returnflag)
       |GROUP BY l.l_returnflag
       |ORDER BY l.l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_returnflag", $"l_extendedprice")
    val t = graft.operators.ExactPercentile.quantiles(
        li, "l_returnflag", "l_extendedprice", Seq(0.05, 0.95), Seq("lo", "hi"))
      .select($"l_returnflag", round($"lo", 4).as("lo"), round($"hi", 4).as("hi"))
    val clipped = least(greatest($"l_extendedprice", $"lo"), $"hi")
    li.join(broadcast(t), Seq("l_returnflag"))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        count(when($"l_extendedprice" < $"lo", 1)).as("n_clipped_low"),
        count(when($"l_extendedprice" > $"hi", 1)).as("n_clipped_high"),
        dsum(clipped).as("sum_winsorized"))
      .orderBy($"l_returnflag")
  }

  /** JSONL source round trip (§2.1 source formats beyond parquet/CSV):
    * write a documents projection as JSON Lines, read it back with an
    * EXPLICIT schema (inference is a second full scan and a type-drift
    * hazard at corpus scale — never infer in production), aggregate per
    * lang. The oracle computes the same aggregate from the parquet
    * directly, so a hash match proves the JSONL write→read path preserves
    * every row and value exactly. */
  val q40JsonlSource: QueryDef = sqlChecked(
    "q40_jsonl_source",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_id
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-jsonl") + "/docs"
    val docs = Tables.documents(spark, dir).select($"doc_id", $"lang", $"n_chars")
    docs.write.mode("overwrite").json(path)
    spark.read.schema(docs.schema).json(path)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        min($"doc_id").cast("long").as("min_id"),
        max($"doc_id").cast("long").as("max_id"))
      .orderBy($"lang")
  }

  /** ORC source round trip: same proof shape as q40 for the other
    * columnar format Spark ships built-in — including DOUBLE columns,
    * which must survive the ORC round trip bit-exactly for the
    * decimal-exact aggregate to hash-match the parquet-side oracle. */
  val q41OrcSource: QueryDef = sqlChecked(
    "q41_orc_source",
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${sqlDsum("l_extendedprice")} AS sum_price,
       |  CAST(MAX(l_orderkey) AS BIGINT) AS max_key
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-orc") + "/li"
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_orderkey", $"l_extendedprice")
    li.write.mode("overwrite").orc(path)
    spark.read.schema(li.schema).orc(path)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum($"l_extendedprice").as("sum_price"),
        max($"l_orderkey").cast("long").as("max_key"))
      .orderBy($"l_returnflag")
  }

  /** Salted skew join, oracle-proven equivalent to the plain join: the
    * big (fact) side takes a random salt in [0,8), the supplier dimension
    * replicates once per salt value, and the join runs on (key, salt) —
    * the deterministic skew shield for when AQE can't split (its runtime
    * complement is spec'd in AqeSkewSpec). DuckDB computes the PLAIN
    * join; the hash match is the proof that salting changes the physical
    * distribution and nothing else. Dimension-side replication ×8 is the
    * entire cost — keep the replicated side the small one. */
  val q42SaltedSkewJoin: QueryDef = sqlChecked(
    "q42_salted_skew_join",
    s"""SELECT n_name, COUNT(*) AS n_items,
       |  ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_suppkey", $"l_extendedprice")
    val sup = Tables.supplier(spark, dir)
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    graft.operators.SaltedJoin.join(li, sup, "l_suppkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("revenue"))
      .orderBy($"n_name")
  }

  /** XML source round trip — the third interchange format, using the
    * XML reader Spark 4 ships natively (the spark-xml package merged
    * into core): write a projection with a rowTag, read it back with an
    * EXPLICIT schema (inference is a full extra pass at corpus scale),
    * aggregate, hash-match the parquet-side oracle. Same proof shape as
    * q40 (JSONL) / q41 (ORC). */
  val q43XmlSource: QueryDef = sqlChecked(
    "q43_xml_source",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_id
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-xml") + "/docs"
    val docs = Tables.documents(spark, dir).select($"doc_id", $"lang", $"n_chars")
    docs.write.mode("overwrite").option("rowTag", "doc").xml(path)
    spark.read.schema(docs.schema).option("rowTag", "doc").xml(path)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        max($"doc_id").cast("long").as("max_id"))
      .orderBy($"lang")
  }

  /** Snapshot reconciliation via FULL OUTER join — the one join type the
    * battery didn't exercise, in its natural habitat: diff per-customer
    * revenue between two order-date periods, classifying every customer
    * as left-only (churned), right-only (new), or present-in-both, with
    * decimal-exact revenue sums per class and the absolute-delta total
    * for the both-class. The join coalesces the key (`Seq(...)` join in
    * Spark ≡ `USING` in SQL) so neither side's null key leaks into the
    * grouping.
    *
    * 100 TB: both sides pre-aggregate to customer grain BEFORE the full
    * outer join (the shuffle carries one row per customer per side, not
    * order rows), and the join is key-partitioned hash — no broadcast
    * needed, no skew concern beyond what the aggregate already bounded. */
  val q44FullOuterReconcile: QueryDef = sqlChecked(
    "q44_full_outer_reconcile",
    """WITH a AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS rev_a
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |  GROUP BY o_custkey),
      |b AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS rev_b
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY o_custkey),
      |j AS (
      |  SELECT o_custkey, rev_a, rev_b,
      |    CASE WHEN rev_b IS NULL THEN 'left_only'
      |         WHEN rev_a IS NULL THEN 'right_only'
      |         ELSE 'both' END AS status
      |  FROM a FULL JOIN b USING (o_custkey))
      |SELECT status, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(COALESCE(rev_a, 0) AS DECIMAL(30,6))) AS DOUBLE) AS revenue_a,
      |  CAST(SUM(CAST(COALESCE(rev_b, 0) AS DECIMAL(30,6))) AS DOUBLE) AS revenue_b,
      |  CAST(SUM(CAST(CASE WHEN status = 'both'
      |    THEN abs(rev_b - rev_a) ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE) AS abs_delta
      |FROM j GROUP BY status ORDER BY status""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    def period(from: String, until: String, out: String) = orders
      .filter($"o_orderdate" >= lit(from).cast("timestamp") &&
        $"o_orderdate" < lit(until).cast("timestamp"))
      .groupBy($"o_custkey")
      .agg(dsum($"o_totalprice").as(out))
    val a = period("1995-01-01", "1996-01-01", "rev_a")
    val b = period("1996-01-01", "1997-01-01", "rev_b")
    val D = org.apache.spark.sql.types.DecimalType(30, 6)
    a.join(b, Seq("o_custkey"), "full_outer")
      .withColumn("status",
        when($"rev_b".isNull, "left_only")
          .when($"rev_a".isNull, "right_only")
          .otherwise("both"))
      .groupBy($"status")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(coalesce($"rev_a", lit(0)).cast(D)).cast("double").as("revenue_a"),
        sum(coalesce($"rev_b", lit(0)).cast(D)).cast("double").as("revenue_b"),
        sum(when($"status" === "both", abs($"rev_b" - $"rev_a"))
          .otherwise(lit(0)).cast(D)).cast("double").as("abs_delta"))
      .orderBy($"status")
  }

  /** Recursive CTE — the SQL surface Spark gained in 4.0 (SPARK-24497)
    * and the declarative alternative to hand-rolled iteration for
    * bounded-depth graph walks: a customer-key decimal tree (parent =
    * key div 10, roots below 10) traversed top-down to its full
    * transitive closure, every node labeled with its ROOT and DEPTH in
    * one statement. Output is the per-depth census with checksums over
    * node and root ids, so a dropped or duplicated closure row is a hash
    * mismatch. DuckDB replays the identical recursion (`//` ≡ Spark's
    * `DIV` on non-negative keys — the portable subset).
    *
    * 100 TB: each recursion step is one equi-join of the frontier
    * against the (pruned) child scan — the same per-round shape as
    * [[graft.operators.ConnectedComponents]]; Spark's recursion-depth
    * limit guards runaways. For UNBOUNDED-diameter graphs the engine's
    * alternating-star CC remains the right tool; recursive SQL is the
    * right tool when depth is small and known (org charts, BOM trees,
    * category paths). */
  val q45RecursiveHierarchy: QueryDef = {
    val sparkSql =
      """WITH RECURSIVE anc(node, root, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, a.root, a.depth + 1
        |  FROM customer c JOIN anc a ON c.c_custkey DIV 10 = a.node
        |  WHERE c.c_custkey >= 10)
        |SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes,
        |  CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
        |  CAST(SUM(node) AS BIGINT) AS sum_node,
        |  CAST(SUM(root) AS BIGINT) AS sum_root
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin
    sqlChecked(
      "q45_recursive_hierarchy",
      """WITH RECURSIVE anc(node, root, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, a.root, a.depth + 1
        |  FROM customer c JOIN anc a ON c.c_custkey // 10 = a.node
        |  WHERE c.c_custkey >= 10)
        |SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes,
        |  CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
        |  CAST(SUM(node) AS BIGINT) AS sum_node,
        |  CAST(SUM(root) AS BIGINT) AS sum_root
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin) { (spark, dir) =>
      // only customer is read — register just it (keeps the query
      // runnable on partial layouts like the scale-probe replicas)
      Tables.customer(spark, dir).createOrReplaceTempView("customer")
      // the hierarchy walk touches every customer once, so recursion
      // rows grow LINEARLY with the table; Spark's default 1M-row
      // recursion guard is a runaway-loop safety valve, not a scaling
      // wall — the 100× probe (1.5M customers) trips it, so raise it to
      // corpus scale here (depth stays log₁₀ N; each step is one join).
      // The limit is read at EXECUTION time, so the raised value must be
      // in effect when the frame runs, yet must not leak into every later
      // query on the shared session: materialize eagerly inside the
      // guarded window (the grouped result is depth-bounded, ~8 rows)
      // and restore the previous value in a finally block.
      val key = "spark.sql.cteRecursionRowLimit"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, 100000000)
      try spark.sql(sparkSql).localCheckpoint(eager = true)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** SQL pipe syntax (Spark 4.0, SPARK-49555 — the GoogleSQL `|>`
    * operator-chain form): the same filter → aggregate → having →
    * project → sort pipeline q13 writes in nested SQL, expressed as a
    * linear chain in dataflow order. Semantically identical plans — the
    * parser desugars each `|>` stage onto the previous — so the oracle
    * is plain ANSI SQL in DuckDB; the hash proves the surface maps to
    * the same relational algebra, decimal shields intact. */
  val q46PipeSyntax: QueryDef = {
    val sparkSql =
      """FROM lineitem
        ||> WHERE l_quantity > 10
        ||> AGGREGATE SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS rev_d,
        |     COUNT(*) AS n
        |   GROUP BY l_returnflag, l_linestatus
        ||> WHERE n > 1000
        ||> SELECT l_returnflag, l_linestatus, CAST(rev_d AS DOUBLE) AS revenue, n
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin
    sqlChecked(
      "q46_pipe_syntax",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_quantity > 10
        |GROUP BY l_returnflag, l_linestatus
        |HAVING COUNT(*) > 1000
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
      spark.sql(sparkSql)
    }
  }

  /** String collations (Spark 4.0, SPARK-46830): case-insensitive
    * equality as a COLUMN PROPERTY rather than scattered lower() calls —
    * the collation rides the type, so every comparison, DISTINCT, and
    * GROUP BY downstream folds case natively (and codegen sees one
    * collation-aware comparator instead of a wrapping expression). The
    * fixture corpus is case-uniform, so both engines append an
    * upper-cased clone of every customer name: binary-distinct must see
    * 2N names, UTF8_LCASE-distinct must collapse back to N, and the
    * per-segment rollup pins the fold at group grain. Oracle replays
    * with lower() — equivalent folding on this data, which is exactly
    * the point: the surface moves the fold into the type system. */
  val q47Collation: QueryDef = {
    val sparkSql =
      """WITH u AS (
        |  SELECT c_mktsegment, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT c_mktsegment, upper(c_name) AS name FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  CAST(COUNT(DISTINCT name) AS BIGINT) AS n_binary_distinct,
        |  CAST(COUNT(DISTINCT name COLLATE UTF8_LCASE) AS BIGINT) AS n_ci_distinct
        |FROM u GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    sqlChecked(
      "q47_collation",
      """WITH u AS (
        |  SELECT c_mktsegment, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT c_mktsegment, upper(c_name) AS name FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  CAST(COUNT(DISTINCT name) AS BIGINT) AS n_binary_distinct,
        |  CAST(COUNT(DISTINCT lower(name)) AS BIGINT) AS n_ci_distinct
        |FROM u GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
      Tables.customer(spark, dir).createOrReplaceTempView("customer")
      spark.sql(sparkSql)
    }
  }

  /** SQL user-defined function (Spark 4.0, SPARK-46246): the UDF
    * surface a 100 TB engine should actually encourage — the function
    * body is SQL, so Catalyst INLINES it into the plan (full codegen,
    * pushdown, constant folding all survive; PlanSpec's no-ScalaUDF
    * discipline holds by construction, unlike JVM/Python UDFs which are
    * optimizer black boxes). The business expression lives once as
    * `disc_price`, the query uses it inside a decimal-shielded
    * aggregate, and the oracle replays the inlined body — identical
    * results prove the function boundary is transparent. */
  val q48SqlUdf: QueryDef = {
    sqlChecked(
      "q48_sql_udf",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
        |    AS DOUBLE) AS disc_revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)""")
      spark.sql(
        """SELECT l_returnflag,
          |  CAST(SUM(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(30,6)))
          |    AS DOUBLE) AS disc_revenue,
          |  COUNT(*) AS n
          |FROM lineitem
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }
  }

  /** Parameterized SQL (Spark 3.4+/4.0 named parameter markers): the
    * serving-path hygiene surface — a dashboard's filter values arrive
    * as TYPED ARGUMENTS (`spark.sql(text, args)`), never string-spliced,
    * so the query text is constant (one plan to cache/review) and
    * injection is structurally impossible. The reference's Streamlit
    * dashboard interpolated filters into SQL strings
    * (streamlit_app.py's f-string queries) — this is that query shape
    * done right. Oracle inlines the same constants. */
  val q49ParameterizedSql: QueryDef = {
    sqlChecked(
      "q49_parameterized_sql",
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(
        """SELECT o_orderpriority,
          |  COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
          |FROM orders
          |WHERE o_orderstatus = :status
          |  AND o_orderdate >= CAST(:from_ts AS TIMESTAMP)
          |  AND o_orderdate < CAST(:until_ts AS TIMESTAMP)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("status" -> "F",
          "from_ts" -> "1995-01-01 00:00:00",
          "until_ts" -> "1997-01-01 00:00:00"))
    }
  }

  /** Avro SOURCE round trip, hash-checked end to end: a bounded document
    * slice is written into THREE Avro container files (schema: nullable
    * long/string fields — the flat-tabular subset [[graft.sources.Avro]]
    * maps), read back through the hand-rolled source (binaryFile bytes →
    * DataFileReader decode map-side, one task per container file), and
    * aggregated per lang. The oracle computes the same aggregate from
    * the ORIGINAL parquet — a hash match proves the Avro write → read
    * path is lossless on every row and column it touched. This closes
    * the "no spark-avro connector offline" gap from the inside: Avro
    * core ships in Spark's own jars, the connector does not. */
  val q50AvroRoundtrip: QueryDef = sqlChecked(
    "q50_avro_roundtrip",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents WHERE doc_id < 300
      |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val slice = Tables.documents(spark, dir)
      .filter($"doc_id" < 300)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
    val out = graft.util.Scratch.tempDir("graft-avro")
    val rows = slice.collect()
    rows.grouped(math.max(1, (rows.length + 2) / 3)).zipWithIndex.foreach {
      case (chunk, i) =>
        graft.sources.Avro.writeFile(chunk.toSeq, slice.schema, "doc",
          new java.io.File(s"$out/part$i.avro"))
    }
    graft.sources.Avro.read(spark, out)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        sum(length($"text")).cast("long").as("sum_text_len"),
        countDistinct($"source").cast("long").as("n_sources"))
      .orderBy($"lang")
  }

  val all: Seq[QueryDef] = Seq(
    q30GroupingSets, q31Unpivot, q32LateralTopK, q33HofBattery, q34StringExt,
    q35Variant, q36ExistsSubquery, q37Posexplode, q38JsonRoundtrip, q39Winsorize,
    q40JsonlSource, q41OrcSource, q42SaltedSkewJoin, q43XmlSource,
    q44FullOuterReconcile, q45RecursiveHierarchy, q46PipeSyntax, q47Collation,
    q48SqlUdf, q49ParameterizedSql, q50AvroRoundtrip)
}
