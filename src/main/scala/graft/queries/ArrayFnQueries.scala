package graft.queries

import graft.QueryDef
import graft.QueryDef.sqlChecked
import graft.etl.{JobEtl, JobsFixture}
import graft.sources.Tables
import graft.util.Num._
import org.apache.spark.sql.functions._

/** Remaining operator-surface coverage: startsWith/contains predicates
  * (P7/P8), collect_set/collect_list (A4), the array built-in family
  * (array_intersect/array_except/size — §2.8/U2/U3 replacing the
  * reference's python set UDFs), the skill-match score, and the
  * spark.sql/table entry surface (S4).
  */
object ArrayFnQueries {

  /** P8 startsWith + P7 contains: skills autocomplete
    * (pyc autocomplete_skills@382: prefix filter + top-K). */
  val aq01Autocomplete: QueryDef = sqlChecked(
    "aq01_autocomplete", {
      s"""WITH ${JobsFixture.duckSql},
         |sk0 AS (SELECT unnest(string_split(lower(skills), ',')) AS skill0 FROM jobs),
         |sk AS (SELECT trim(skill0) AS skill FROM sk0)
         |SELECT skill, COUNT(*) AS n
         |FROM sk
         |WHERE skill LIKE 'p%' OR contains(skill, 'sql')
         |GROUP BY skill
         |ORDER BY n DESC, skill LIMIT 10""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    JobsFixture.jobs(spark, dir)
      .select(explode(split(lower($"skills"), ",")).as("skill0"))
      .select(trim($"skill0").as("skill"))
      .filter($"skill".startsWith("p") || $"skill".contains("sql"))
      .groupBy($"skill")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"skill")
      .limit(10)
  }

  /** A4 collect_set/collect_list: per-lang distinct source sets, sorted
    * for determinism (pyc extract_skills@145 collect_set idiom). The set is
    * serialized to a scalar (concat_ws) because the driver's compare
    * harness can't sort array cells. */
  val aq02CollectSet: QueryDef = sqlChecked(
    "aq02_collect_set",
    """SELECT lang,
      |  array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
      |  len(list(DISTINCT source)) AS n_sources,
      |  len(list(source)) AS n_rows
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(
        concat_ws(",", sort_array(collect_set($"source"))).as("sources"),
        size(collect_set($"source")).as("n_sources"),
        size(collect_list($"source")).as("n_rows"))
      .orderBy($"lang")
  }

  /** U3 skill-match score via array built-ins (replaces pyc
    * calculate_skill_match@526's python-set UDF): |user ∩ job| / |job|,
    * match threshold 0.3; plus array_except for the gap list (U2/§2.8). */
  val aq03SkillMatch: QueryDef = sqlChecked(
    "aq03_skill_match", {
      s"""WITH ${JobsFixture.duckSql},
         |arr AS (
         |  SELECT job_id,
         |    list_filter(list_transform(string_split(lower(skills), ','), x -> trim(x)),
         |      x -> len(x) > 1) AS job_skills
         |  FROM jobs WHERE job_id < 3000),
         |scored AS (
         |  SELECT job_id,
         |    len(list_intersect(job_skills, ['python', 'sql'])) / CAST(len(job_skills) AS DOUBLE) AS match_score,
         |    len(list_filter(job_skills, x -> NOT list_contains(['python', 'sql'], x))) AS n_missing
         |  FROM arr)
         |SELECT job_id, match_score, n_missing
         |FROM scored
         |WHERE match_score > 0.3
         |ORDER BY job_id""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val userSkills = array(lit("python"), lit("sql"))
    JobsFixture.jobs(spark, dir)
      .filter($"job_id" < 3000)
      .select($"job_id",
        filter(transform(split(lower($"skills"), ","), x => trim(x)),
          x => length(x) > 1).as("job_skills"))
      .select($"job_id",
        (size(array_intersect($"job_skills", userSkills)) /
          size($"job_skills").cast("double")).as("match_score"),
        size(array_except($"job_skills", userSkills)).as("n_missing"))
      .filter($"match_score" > 0.3)
      .orderBy($"job_id")
  }

  /** S4: the spark.sql/table entry surface — the engine's queries are also
    * reachable through registered views + SQL text. */
  val aq04SqlSurface: QueryDef = sqlChecked(
    "aq04_sql_surface",
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
       |  ${sqlDavg("c_acctbal")} AS avg_bal
       |FROM customer
       |WHERE c_nationkey < 10
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT c_mktsegment, COUNT(1) AS n_customers,
         |  ${sqlDavg("c_acctbal")} AS avg_bal
         |FROM customer
         |WHERE c_nationkey < 10
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin)
  }

  /** F19 concat_ws/array/struct + U4 label mapping: cluster-name style
    * string assembly (streamlit_app.py:237's f-string as concat). */
  val aq05LabelAssembly: QueryDef = sqlChecked(
    "aq05_label_assembly",
    """SELECT concat('Nhóm ', CAST(c_nationkey AS VARCHAR)) AS cluster_name,
      |  concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment) AS compound_key,
      |  COUNT(*) AS n
      |FROM customer
      |WHERE c_nationkey < 5
      |GROUP BY 1, 2
      |ORDER BY cluster_name, compound_key""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .filter($"c_nationkey" < 5)
      .groupBy(
        concat(lit("Nhóm "), $"c_nationkey".cast("string")).as("cluster_name"),
        concat_ws("|", $"c_nationkey".cast("string"), $"c_mktsegment").as("compound_key"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"cluster_name", $"compound_key")
  }

  /** MAP-typed higher-order functions — the one functions family the
    * battery hadn't exercised: per-customer order-priority counts
    * assembled into a MAP column (`map_from_entries` over a SORTED
    * entry array — maps are unordered, the sort is for deterministic
    * construction), thinned with `map_filter`, rescaled with
    * `transform_values`, sized with `map_keys`, then exploded back to
    * rows. All in-row codegen work between two aggregates. The oracle
    * can't hold a Spark map, so it replays the RELATIONAL equivalent of
    * the whole map pipeline (HAVING ≥ 2, ×10) — the hash proves the map
    * round trip loses and invents nothing.
    *
    * 100 TB: maps are the natural shape for sparse per-entity feature
    * bags (per-user event-type counts, per-doc tag weights); this is
    * the pattern that keeps them inside whole-stage codegen instead of
    * exploding to rows between every step. */
  val aq06MapHofBattery: QueryDef = sqlChecked(
    "aq06_map_hof_battery",
    """WITH c AS (
      |  SELECT o_custkey, o_orderpriority AS prio, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders WHERE o_custkey < 200
      |  GROUP BY o_custkey, o_orderpriority),
      |k AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_keys
      |  FROM c GROUP BY o_custkey)
      |SELECT c.o_custkey, k.n_keys, c.prio,
      |  c.cnt * 10 AS scaled
      |FROM c JOIN k ON c.o_custkey = k.o_custkey
      |WHERE c.cnt >= 2
      |ORDER BY c.o_custkey, c.prio""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val m = Tables.orders(spark, dir)
      .filter($"o_custkey" < 200)
      .groupBy($"o_custkey", $"o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"o_custkey")
      .agg(map_from_entries(
        array_sort(collect_list(struct($"o_orderpriority", $"cnt")))).as("bag"))
    m.select($"o_custkey",
        size(map_keys($"bag")).cast("long").as("n_keys"),
        transform_values(
          map_filter($"bag", (_, v) => v >= 2),
          (_, v) => v * 10).as("kept"))
      .select($"o_custkey", $"n_keys", explode($"kept").as(Seq("prio", "scaled")))
      .orderBy($"o_custkey", $"prio")
  }

  val all: Seq[QueryDef] = Seq(
    aq01Autocomplete, aq02CollectSet, aq03SkillMatch, aq04SqlSurface,
    aq05LabelAssembly, aq06MapHofBattery)
}
