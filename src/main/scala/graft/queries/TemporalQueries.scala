package graft.queries

import graft.QueryDef
import graft.QueryDef.sqlChecked
import graft.operators.AsOfJoin
import graft.sources.Tables
import graft.util.Num._
import org.apache.spark.sql.functions._

/** Temporal join operators over the events stream table: as-of join
  * (checked against DuckDB's native ASOF JOIN) and a keyed range join.
  */
object TemporalQueries {

  /** Each purchase picks up the user's most recent click at or before the
    * purchase time. The engine side is the union+window composition
    * (graft.operators.AsOfJoin); the oracle is DuckDB's native
    * ASOF LEFT JOIN — two independent implementations of the semantics. */
  val eq01AsofJoin: QueryDef = sqlChecked(
    "eq01_asof_join",
    """WITH clicks AS (
      |  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |purchases AS (
      |  SELECT user_id, ts, event_id, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
      |  c.click_id AS asof_click_id, CAST(c.ts AS TIMESTAMP) AS asof_ts
      |FROM purchases p
      |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    // right side unique per (key, time): AsOfJoin caller contract
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    AsOfJoin.joinAsOf(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("click_id", "ts"))
      .select($"event_id", $"user_id", $"ts", $"value",
        $"asof_click_id", $"asof_ts")
      .orderBy($"event_id")
  }

  /** eq01's semantics through the engine's custom plan path: a first-class
    * AsOfJoinPlan logical node planned by GraftStrategies into
    * AsOfJoinExec's streaming sort-merge (O(1) state per task vs the
    * composition's window frames). Same DuckDB ASOF JOIN oracle as eq01 —
    * three independent implementations of the semantics must agree. */
  val eq01bAsofExec: QueryDef = sqlChecked(
    "eq01b_asof_exec",
    """WITH clicks AS (
      |  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |purchases AS (
      |  SELECT user_id, ts, event_id, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
      |  c.click_id AS asof_click_id, CAST(c.ts AS TIMESTAMP) AS asof_ts
      |FROM purchases p
      |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    graft.plans.AsOfJoinPhysical.joinAsOf(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("click_id", "ts"))
      .select($"event_id", $"user_id", $"ts", $"value",
        $"asof_click_id", $"asof_ts")
      .orderBy($"event_id")
  }

  /** Keyed range join: per purchase, activity in the preceding 10 minutes
    * by the same user — equi-join on the key with a time-range predicate
    * (the key equi-condition keeps it a hash join; the range is a
    * post-join filter, never a CartesianProduct). */
  val eq02RangeJoin: QueryDef = sqlChecked(
    "eq02_range_join",
    s"""WITH purchases AS (
       |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
       |activity AS (
       |  SELECT user_id, ts, value FROM events WHERE event_type <> 'purchase')
       |SELECT p.event_id, COUNT(a.user_id) AS n_recent,
       |  CAST(COALESCE(SUM(CAST((a.value) AS DECIMAL(30,6))), 0) AS DOUBLE) AS sum_recent_value
       |FROM purchases p
       |LEFT JOIN activity a
       |  ON p.user_id = a.user_id
       |  AND a.ts >= p.ts - INTERVAL 10 MINUTE AND a.ts < p.ts
       |GROUP BY p.event_id
       |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id")
    val activity = ev.filter($"event_type" =!= "purchase")
      .select($"user_id".as("a_user"), $"ts".as("a_ts"), $"value")
    purchases
      .join(activity,
        $"p_user" === $"a_user" &&
          $"a_ts" >= $"p_ts" - expr("INTERVAL 10 MINUTES") && $"a_ts" < $"p_ts",
        "left")
      .groupBy($"event_id")
      .agg(
        count($"a_user").as("n_recent"),
        coalesce(dsum($"value"), lit(0.0)).as("sum_recent_value"))
      .orderBy($"event_id")
  }

  /** Gap-based sessionization: a new session starts after >30 min of
    * user inactivity. The lag+cumsum window idiom — two window passes
    * over ONE shuffle on user_id (both windows share the partitioning),
    * no state, no iteration; the 100 TB shape for batch sessionization. */
  val eq03Sessionize: QueryDef = sqlChecked(
    "eq03_sessionize",
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > INTERVAL 30 MINUTE
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS is_start,
      |    event_id
      |  FROM events),
      |sessions AS (
      |  SELECT user_id,
      |    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
      |FROM sessions
      |WHERE user_id < 100
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter($"user_id" < 100) // partition-key predicate pushes to the scan
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      // gap math in microseconds: a seconds cast truncates and can flip
      // comparisons within 1s of the boundary vs the oracle's exact interval
      .withColumn("is_start",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"is_start").over(wRun).cast("long"))
      .groupBy($"user_id")
      .agg(
        countDistinct($"session_id").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** Sessionization via the BUILT-IN session_window aggregation — the
    * idiomatic one-liner next to eq03's window-islands formulation (and
    * the streaming Sessionize state machines): groupBy(user,
    * session_window(ts, gap)) merges events into gap-separated sessions
    * inside a single aggregate, no window functions at all.
    *
    * Boundary semantics differ from eq03 by design and the oracle
    * encodes them exactly: session_window treats the session as
    * [start, last+gap) half-open, so an event at EXACTLY gap distance
    * starts a NEW session (oracle rule `>= INTERVAL` not `>`), while
    * eq03's island rule (`> INTERVAL`) merges it. */
  val eq04SessionWindow: QueryDef = sqlChecked(
    "eq04_session_window",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_start
      |  FROM events WHERE user_id < 100
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  COUNT(*) AS n_events
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"user_id" < 100)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("w") // struct output breaks the compare harness; min/max carry the bounds
      .orderBy($"user_id", $"session_start")
  }

  /** Pure interval-overlap join — NO equi key at all, the shape eq02's
    * keyed range join can't cover (global maintenance windows, outage
    * blackouts, promo periods vs an event stream). Naively this is a
    * CartesianProduct with a range filter; the scale path is time-bucket
    * quantization: each 15-minute window explodes to the (≤2) 15-minute
    * epoch buckets it covers, each activity event computes its single
    * bucket, and the join becomes an EQUI-join on bucket followed by the
    * exact range predicate. An event has exactly one bucket, so a
    * (window, event) pair can match at most once — no dedup pass. The
    * bucket width equals the window length, bounding the explode factor
    * at 2 regardless of data volume; both sides stay shuffle-joinable at
    * any scale (the window side ALSO needs no broadcast). The oracle is
    * DuckDB's plain range join — two independent evaluation strategies,
    * one answer. */
  val eq05IntervalOverlap: QueryDef = sqlChecked(
    "eq05_interval_overlap",
    s"""WITH win AS (
       |  SELECT event_id AS win_id, ts AS w_start,
       |    ts + INTERVAL 15 MINUTE AS w_end
       |  FROM events WHERE event_type = 'purchase' AND event_id % 20 = 0),
       |act AS (
       |  SELECT ts, value FROM events WHERE event_type <> 'purchase')
       |SELECT w.win_id, COUNT(a.ts) AS n_overlap,
       |  CAST(COALESCE(SUM(CAST((a.value) AS DECIMAL(30,6))), 0) AS DOUBLE) AS sum_value
       |FROM win w LEFT JOIN act a
       |  ON a.ts >= w.w_start AND a.ts < w.w_end
       |GROUP BY w.win_id ORDER BY w.win_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val bucketSec = 900L // bucket width == window length ⇒ ≤2 buckets/window
    val ev = Tables.events(spark, dir)
    val win = ev
      .filter($"event_type" === "purchase" && $"event_id" % 20 === 0)
      .select($"event_id".as("win_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 15 MINUTES")).as("w_end"))
    // floor-of-epoch-seconds is monotone, so any t in [start, end) lands in
    // a bucket the window exploded to — candidate generation is lossless
    // Column./ is double division; floor() restores the integral bucket id
    // (epoch seconds / 900 is far inside double's exact-integer range)
    val wb = win.withColumn("bucket",
      explode(sequence(floor($"w_start".cast("long") / bucketSec),
        floor($"w_end".cast("long") / bucketSec))))
    val act = ev.filter($"event_type" =!= "purchase")
      .select($"ts".as("a_ts"), $"value",
        floor($"ts".cast("long") / bucketSec).as("bucket"))
    val hits = wb
      .join(act, Seq("bucket"))
      .filter($"a_ts" >= $"w_start" && $"a_ts" < $"w_end")
      .groupBy($"win_id")
      .agg(count(lit(1)).as("n_overlap"), dsum($"value").as("sum_value"))
    win.select($"win_id")
      .join(hits, Seq("win_id"), "left")
      .select($"win_id",
        coalesce($"n_overlap", lit(0L)).as("n_overlap"),
        coalesce($"sum_value", lit(0.0)).as("sum_value"))
      .orderBy($"win_id")
  }

  /** Ordered conversion funnel: signup → first click strictly AFTER the
    * signup → first purchase strictly AFTER that click. Each stage gate
    * depends on the previous stage's timestamp, so this is NOT three
    * independent filters — it is the sequential funnel every product
    * analytics engine ships. Shape: three aggregates/joins ALL keyed by
    * user_id, so after the first hash exchange the stage frames stay
    * co-partitioned and the follow-up joins plan without new shuffles;
    * per-user state is one timestamp per stage (no event lists are ever
    * collected). Counts are exact integers — no float drift surface. */
  val eq06EventFunnel: QueryDef = sqlChecked(
    "eq06_event_funnel",
    """WITH s AS (
      |  SELECT user_id, min(ts) AS s_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
      |  JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s.s_ts GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
      |SELECT * FROM (
      |  SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s
      |  UNION ALL
      |  SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      |  UNION ALL
      |  SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p)
      |ORDER BY stage""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts")
    val s = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("s_ts"))
    val c = ev.filter($"event_type" === "click")
      .join(s, Seq("user_id"))
      .filter($"ts" > $"s_ts")
      .groupBy($"user_id").agg(min($"ts").as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id"))
      .filter($"ts" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), $"n_users")
    stage(s, "1_signup")
      .unionByName(stage(c, "2_click"))
      .unionByName(stage(p, "3_purchase"))
      .orderBy($"stage")
  }

  /** Weekly cohort retention: users grouped by the week of their FIRST
    * event; for each cohort, how many distinct users were active k weeks
    * later. Both engines truncate to Monday-aligned weeks, so the day
    * difference is an exact multiple of 7 and the offset division is
    * exact. Shape: first-event aggregate and the distinct (user, week)
    * activity frame both hash on user_id (one co-partitioned join), then
    * a count-distinct keyed by (cohort, offset) — cohort cardinality is
    * tiny (weeks × weeks), the heavy lifting stays per-user. */
  val eq07CohortRetention: QueryDef = sqlChecked(
    "eq07_cohort_retention",
    """WITH first_seen AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY user_id),
      |act AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events)
      |SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
      |  CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS BIGINT) AS week_offset,
      |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
      |FROM first_seen f JOIN act a ON f.user_id = a.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"ts")
    val firstSeen = ev.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_week"))
    val act = ev
      .select($"user_id", date_trunc("week", $"ts").as("act_week"))
      .distinct()
    firstSeen.join(act, Seq("user_id"))
      // both weeks are Monday 00:00, so the gap is an exact multiple of 7
      // days; double division by 7 is exact and the long cast is safe
      .groupBy($"cohort_week",
        (datediff($"act_week", $"cohort_week") / 7).cast("long").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_active"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** Daily event-volume anomaly detection: per event type, z-score each
    * day's count against that type's own mean/std over the window. The
    * moments are EXACT BIGINT sums (counts are integers), so mean and
    * variance derive from identical integer inputs in both engines and
    * the double arithmetic below is the same IEEE expression tree —
    * z-scores match to the bit before the defensive 1e-6 rounding. Shape:
    * daily counts hash on (type, day); the per-type moment frame is
    * #types rows and broadcasts back — the scan never repeats and nothing
    * wider than a count crosses the exchange. Zero-variance types emit
    * NULL z rather than ±Inf (both engines). */
  val eq08DailyAnomaly: QueryDef = sqlChecked(
    "eq08_daily_anomaly",
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt * cnt) AS BIGINT) AS ss
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day, d.cnt,
      |  round((CAST(d.cnt AS DOUBLE) - CAST(t.s AS DOUBLE) / t.n_days) /
      |    sqrt(NULLIF((CAST(t.ss AS DOUBLE) -
      |      CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n_days) /
      |      (t.n_days - 1), 0.0)), 6) AS z,
      |  COALESCE(abs(round((CAST(d.cnt AS DOUBLE) - CAST(t.s AS DOUBLE) / t.n_days) /
      |    sqrt(NULLIF((CAST(t.ss AS DOUBLE) -
      |      CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n_days) /
      |      (t.n_days - 1), 0.0)), 6)) > 2.5, FALSE) AS is_anomaly
      |FROM daily d JOIN stats t ON d.event_type = t.event_type
      |ORDER BY d.event_type, day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"cnt").as("s"), sum($"cnt" * $"cnt").as("ss"))
    // variance from raw moments, NULL when degenerate — mirrors the oracle
    // term-for-term so the pre-rounding doubles are bit-identical
    val mean = $"s".cast("double") / $"n_days"
    val variance = ($"ss".cast("double") - $"s".cast("double") * $"s".cast("double") / $"n_days") /
      ($"n_days" - lit(1))
    val z = round(($"cnt".cast("double") - mean) /
      sqrt(when(variance === 0.0, lit(null)).otherwise(variance)), 6)
    daily.join(broadcast(stats), Seq("event_type"))
      .select($"event_type", $"day", $"cnt", z.as("z"),
        coalesce(abs(z) > 2.5, lit(false)).as("is_anomaly"))
      .orderBy($"event_type", $"day")
  }

  /** Time-series resampling with gap fill: per-user purchase activity
    * re-gridded onto the CONTINUOUS daily calendar (absent days
    * materialize as zero rows) with the last observed daily total carried
    * forward across gaps — the resample/ffill operation of every
    * time-series store. Shape: the daily aggregate hashes on (user, day);
    * the calendar bounds are a 1-row broadcast; the grid explodes a
    * bounded per-user `sequence` (explode factor = span in days, data
    * independent); the forward fill is one window pass per user. The
    * carried value derives from the decimal-exact daily sum, so the fill
    * chain is bit-stable across engines. */
  val eq09GapFill: QueryDef = sqlChecked(
    "eq09_gap_fill",
    s"""WITH p AS (
       |  SELECT user_id, date_trunc('day', ts) AS day,
       |    CAST(count(*) AS BIGINT) AS n, ${sqlDsum("value")} AS v
       |  FROM events WHERE event_type = 'purchase' AND user_id < 20
       |  GROUP BY 1, 2),
       |bounds AS (
       |  SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
       |  FROM events),
       |users AS (SELECT DISTINCT user_id FROM p),
       |grid AS (
       |  SELECT u.user_id, unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day
       |  FROM users u, bounds b)
       |SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
       |  COALESCE(p.n, 0) AS n_events,
       |  COALESCE(p.v, 0.0) AS day_value,
       |  COALESCE(last_value(p.v IGNORE NULLS) OVER (
       |    PARTITION BY g.user_id ORDER BY g.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS carried_value
       |FROM grid g LEFT JOIN p ON g.user_id = p.user_id AND g.day = p.day
       |ORDER BY g.user_id, g.day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val p = ev.filter($"event_type" === "purchase" && $"user_id" < 20)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("v"))
    val bounds = ev.agg(
      min(date_trunc("day", $"ts")).as("d0"), max(date_trunc("day", $"ts")).as("d1"))
    val grid = p.select($"user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(p, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n", lit(0L)).as("n_events"),
        coalesce($"v", lit(0.0)).as("day_value"),
        coalesce(last($"v", ignoreNulls = true).over(w), lit(0.0)).as("carried_value"))
      .orderBy($"user_id", $"day")
  }

  /** Trailing 7-day moving window over a SPARSE daily series — the
    * RANGE-interval window frame (q08/q27 cover ROWS frames; a RANGE
    * frame bounds by VALUE distance, so a day with no neighbors within a
    * week averages only itself — a rows-frame would wrongly reach back
    * across the gap). Exactness: the windowed aggregate is computed as
    * exact BIGINT sum / exact BIGINT count — both engines aggregate the
    * identical frame row set, so the single final division is the only
    * float op. Shape: one hash exchange on event_type, one sort, one
    * frame pass; per-row state is the bounded 7-day slice. */
  val eq10MovingWindow: QueryDef = sqlChecked(
    "eq10_moving_window",
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events WHERE user_id % 10 = 3 GROUP BY 1, 2)
      |SELECT event_type, CAST(day AS TIMESTAMP) AS day, cnt,
      |  CAST(SUM(cnt) OVER w AS BIGINT) AS w_sum,
      |  CAST(COUNT(cnt) OVER w AS BIGINT) AS w_days,
      |  CAST(SUM(cnt) OVER w AS DOUBLE) / COUNT(cnt) OVER w AS w_avg
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .filter($"user_id" % 10 === 3)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
    // RANGE frame over epoch seconds: value-distance bounds, not row
    // counts — 6 days back through the current day, gaps excluded
    val w = Window.partitionBy($"event_type")
      .orderBy($"day".cast("long"))
      .rangeBetween(-6L * 86400L, 0L)
    daily
      .select($"event_type", $"day", $"cnt",
        sum($"cnt").over(w).as("w_sum"),
        count($"cnt").over(w).as("w_days"),
        (sum($"cnt").over(w).cast("double") / count($"cnt").over(w)).as("w_avg"))
      .orderBy($"event_type", $"day")
  }

  /** SCD2 version derivation, ORACLE-CHECKED: spending-tier history per
    * user built by the engine's SCD Type 2 merge (sources/Scd2.scala —
    * elsewhere proven by specs and a property fold) vs a DuckDB window
    * replay of the versioning rules (suppress-equal-to-predecessor, chain
    * valid_from/valid_to, last version open). Two entirely different
    * evaluation strategies — distributed semi-prune + window passes vs
    * declarative lag/lead SQL — must emit the identical version table.
    * (user, ts) is deduplicated first so the version order is total. */
  val eq11Scd2Versions: QueryDef = sqlChecked(
    "eq11_scd2_versions",
    """WITH p AS (
      |  SELECT user_id, ts, max(value) AS v FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |t AS (
      |  SELECT user_id, ts,
      |    CASE WHEN v < 50 THEN 'low' WHEN v < 200 THEN 'mid' ELSE 'high' END AS tier
      |  FROM p),
      |k AS (
      |  SELECT user_id, ts, tier,
      |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS pt
      |  FROM t),
      |kept AS (SELECT user_id, ts, tier FROM k WHERE pt IS NULL OR tier <> pt)
      |SELECT user_id, tier, CAST(ts AS TIMESTAMP) AS valid_from,
      |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS TIMESTAMP) AS valid_to,
      |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL) AS is_current
      |FROM kept
      |ORDER BY user_id, valid_from""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val updates = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("v"))
      .select($"user_id", $"ts",
        when($"v" < 50, "low").when($"v" < 200, "mid").otherwise("high").as("tier"))
    val empty = updates
      .select($"user_id", $"tier", $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current"))
      .limit(0)
    graft.sources.Scd2.merge(empty, updates, "user_id", "ts", Seq("tier"))
      .orderBy($"user_id", $"valid_from")
  }

  /** SCD2 quarantining merge, ORACLE-CHECKED end to end: an 80%-of-range
    * tier history is built first (every version before the cutoff), then
    * the FULL update stream replays against it through
    * Scd2.mergeWithQuarantine — updates before a user's open version are
    * split to the quarantine side output (the operational late-arrival
    * shape; the fail-fast merge stays the default), the rest merge.
    * Output: the final version table plus each user's quarantined count.
    *
    * The oracle replays both halves declaratively: closed pre-cutoff
    * versions pass through immutably; the open-version chain equals
    * plain SCD2 derivation over the non-late rows (the batch row at the
    * open version's valid_from IS the open version, and every
    * re-delivered row between two kept versions carries the prevailing
    * tier, so suppress-equal yields the identical chain); late = rows
    * before the per-user max kept pre-cutoff ts. Distributed semi-prune
    * + window merge vs pure window SQL must agree row-for-row. */
  val eq13Scd2Quarantine: QueryDef = sqlChecked(
    "eq13_scd2_quarantine",
    """WITH p AS (
      |  SELECT user_id, ts, max(value) AS v FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |t AS (
      |  SELECT user_id, ts,
      |    CASE WHEN v < 50 THEN 'low' WHEN v < 200 THEN 'mid' ELSE 'high' END AS tier
      |  FROM p),
      |h AS (SELECT * FROM t WHERE ts < TIMESTAMP '2024-01-24 00:00:00'),
      |hk AS (
      |  SELECT user_id, ts, tier,
      |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS pt
      |  FROM h),
      |hkept AS (SELECT user_id, ts, tier FROM hk WHERE pt IS NULL OR tier <> pt),
      |open_v AS (SELECT user_id, max(ts) AS open_from FROM hkept GROUP BY user_id),
      |late AS (
      |  SELECT t.user_id FROM t JOIN open_v o ON t.user_id = o.user_id
      |  WHERE t.ts < o.open_from),
      |ok AS (
      |  SELECT t.user_id, t.ts, t.tier FROM t
      |  LEFT JOIN open_v o ON t.user_id = o.user_id
      |  WHERE o.user_id IS NULL OR t.ts >= o.open_from),
      |closedv AS (
      |  SELECT user_id, tier, ts AS vf,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS vt
      |  FROM hkept),
      |k AS (
      |  SELECT user_id, ts, tier,
      |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS pt
      |  FROM ok),
      |kept AS (SELECT user_id, ts, tier FROM k WHERE pt IS NULL OR tier <> pt),
      |final AS (
      |  SELECT user_id, tier, vf, vt, FALSE AS is_current
      |  FROM closedv WHERE vt IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, tier, ts AS vf,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS vt,
      |    (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL) AS is_current
      |  FROM kept),
      |qc AS (SELECT user_id, COUNT(*) AS nq FROM late GROUP BY user_id)
      |SELECT f.user_id, f.tier, CAST(f.vf AS TIMESTAMP) AS valid_from,
      |  CAST(f.vt AS TIMESTAMP) AS valid_to, f.is_current,
      |  CAST(COALESCE(qc.nq, 0) AS BIGINT) AS n_quarantined
      |FROM final f LEFT JOIN qc ON f.user_id = qc.user_id
      |ORDER BY f.user_id, valid_from""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // checkpointed: the nested merges would otherwise re-derive the
    // events aggregation once per self-reference (merge reads history
    // and updates several times each)
    val t = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("v"))
      .select($"user_id", $"ts",
        when($"v" < 50, "low").when($"v" < 200, "mid").otherwise("high").as("tier"))
      .localCheckpoint(true)
    val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-24 00:00:00"))
    val empty = t
      .select($"user_id", $"tier", $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current"))
      .limit(0)
    val hist = graft.sources.Scd2
      .merge(empty, t.filter($"ts" < cutoff), "user_id", "ts", Seq("tier"))
      .localCheckpoint(true)
    val (merged, quarantined) = graft.sources.Scd2
      .mergeWithQuarantine(hist, t, "user_id", "ts", Seq("tier"))
    val qc = quarantined.groupBy($"user_id").agg(count(lit(1)).as("nq"))
    merged.join(qc, Seq("user_id"), "left")
      .select($"user_id", $"tier", $"valid_from", $"valid_to", $"is_current",
        coalesce($"nq", lit(0L)).cast("long").as("n_quarantined"))
      .orderBy($"user_id", $"valid_from")
  }

  /** Point-in-time join — the canonical consumer of SCD2 history: every
    * click event picks up the spending tier that was VALID at the
    * click's timestamp (valid_from ≤ ts < valid_to, open version
    * unbounded). Joins on user_id (hash join) with the interval predicate
    * as a post-join filter — never a range-only join; a user's version
    * count is tiny, so the per-key fan-out is bounded. Events before a
    * user's first version, and users with no history, fall out as
    * 'unknown' via the left join — the time-travel-correct answer, not
    * the current tier (which would leak future information into
    * training features). */
  val eq12PitJoin: QueryDef = sqlChecked(
    "eq12_pit_join",
    """WITH p AS (
      |  SELECT user_id, ts, max(value) AS v FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |t AS (
      |  SELECT user_id, ts,
      |    CASE WHEN v < 50 THEN 'low' WHEN v < 200 THEN 'mid' ELSE 'high' END AS tier
      |  FROM p),
      |k AS (
      |  SELECT user_id, ts, tier,
      |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS pt
      |  FROM t),
      |kept AS (SELECT user_id, ts, tier FROM k WHERE pt IS NULL OR tier <> pt),
      |v AS (
      |  SELECT user_id, tier, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
      |  FROM kept),
      |clicks AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'click')
      |SELECT COALESCE(v.tier, 'unknown') AS tier_at_click,
      |  CAST(count(*) AS BIGINT) AS n_clicks,
      |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users
      |FROM clicks c LEFT JOIN v
      |  ON c.user_id = v.user_id
      |  AND c.ts >= v.valid_from AND (v.valid_to IS NULL OR c.ts < v.valid_to)
      |GROUP BY 1
      |ORDER BY tier_at_click""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val updates = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("v"))
      .select($"user_id", $"ts",
        when($"v" < 50, "low").when($"v" < 200, "mid").otherwise("high").as("tier"))
    val empty = updates
      .select($"user_id", $"tier", $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current"))
      .limit(0)
    val versions = graft.sources.Scd2.merge(empty, updates, "user_id", "ts", Seq("tier"))
      .select($"user_id".as("v_user"), $"tier", $"valid_from", $"valid_to")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts")
    clicks.join(versions,
        $"user_id" === $"v_user" && $"ts" >= $"valid_from" &&
          ($"valid_to".isNull || $"ts" < $"valid_to"),
        "left")
      .groupBy(coalesce($"tier", lit("unknown")).as("tier_at_click"))
      .agg(count(lit(1)).as("n_clicks"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"tier_at_click")
  }

  /** As-of join with a TOLERANCE bound — the pandas/polars
    * `merge_asof(tolerance=...)` surface: the nearest-preceding click
    * only counts if it is at most 30 minutes stale; an older match is
    * nulled out exactly as if no click existed. Implemented as the
    * standard as-of join ([[graft.operators.AsOfJoin]]) plus a post-match
    * staleness predicate — the tolerance never changes the JOIN shape
    * (still one sort-merge pass, O(1) state), it only gates the payload,
    * so the 100 TB properties of eq01 carry over unchanged. The oracle
    * replays DuckDB's native ASOF JOIN with the same CASE gate, and a
    * matched-within-tolerance flag rides along so the hash pins exactly
    * which rows the bound nulls (1958 of 1981 matches at sf0.01 — the
    * fixture's clicks are sparse, so the bound bites hard). */
  val eq14AsofTolerance: QueryDef = sqlChecked(
    "eq14_asof_tolerance",
    """WITH clicks AS (
      |  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |purchases AS (
      |  SELECT user_id, ts, event_id, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
      |  CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.click_id END
      |    AS asof_click_id,
      |  CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE
      |    THEN CAST(c.ts AS TIMESTAMP) END AS asof_ts,
      |  CAST(CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE
      |    THEN 1 ELSE 0 END AS BIGINT) AS in_tolerance
      |FROM purchases p
      |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val fresh = $"asof_ts" >= $"ts" - expr("INTERVAL 30 MINUTES")
    AsOfJoin.joinAsOf(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("click_id", "ts"))
      .select($"event_id", $"user_id", $"ts", $"value",
        when(fresh, $"asof_click_id").as("asof_click_id"),
        when(fresh, $"asof_ts").as("asof_ts"),
        when(fresh, 1L).otherwise(0L).as("in_tolerance"))
      .orderBy($"event_id")
  }

  /** Nearest-direction as-of join — polars' `strategy="nearest"`: each
    * purchase matches its temporally CLOSEST click in either direction
    * (ties prefer backward, the inclusive side). The composition gets
    * both directions from ONE shuffle: the as-of union frame computes
    * the backward match with `last(payload) ignoreNulls` over the
    * preceding frame and the forward match with `first(payload)
    * ignoreNulls` over the following frame — two window functions over
    * the SAME partitioning and sort, so nearest costs exactly what
    * backward-only costs at 100 TB. Tie/side rules pinned by
    * construction: right rows sort before left at equal ts, making
    * backward inclusive and forward strict. The oracle runs DuckDB's
    * native ASOF twice (>= and <) and replays the distance arbitration
    * on exact epoch micros. */
  val eq15AsofNearest: QueryDef = sqlChecked(
    "eq15_asof_nearest",
    """WITH clicks AS (
      |  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |purchases AS (
      |  SELECT user_id, ts, event_id, value FROM events
      |  WHERE event_type = 'purchase'),
      |b AS (
      |  SELECT p.event_id, c.click_id AS b_id, c.ts AS b_ts
      |  FROM purchases p
      |  ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts),
      |f AS (
      |  SELECT p.event_id, c.click_id AS f_id, c.ts AS f_ts
      |  FROM purchases p
      |  ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts < c.ts),
      |j AS (
      |  SELECT p.event_id, p.user_id, p.ts, p.value, b_id, b_ts, f_id, f_ts,
      |    CASE WHEN b_id IS NULL AND f_id IS NULL THEN 'none'
      |         WHEN f_id IS NULL THEN 'backward'
      |         WHEN b_id IS NULL THEN 'forward'
      |         WHEN epoch_us(p.ts) - epoch_us(b_ts)
      |              <= epoch_us(f_ts) - epoch_us(p.ts) THEN 'backward'
      |         ELSE 'forward' END AS direction
      |  FROM purchases p JOIN b USING (event_id) JOIN f USING (event_id))
      |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, direction,
      |  CASE WHEN direction = 'backward' THEN b_id
      |       WHEN direction = 'forward' THEN f_id END AS nearest_click_id,
      |  CAST(CASE WHEN direction = 'backward' THEN b_ts
      |       WHEN direction = 'forward' THEN f_ts END AS TIMESTAMP) AS nearest_ts
      |FROM j ORDER BY event_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val plType = "struct<click_id:bigint,click_ts:timestamp>"
    val rTagged = clicks.select($"user_id", $"ts".as("t"), lit(0).as("side"),
      struct($"click_id", $"ts".as("click_ts")).as("pl"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("double").as("value"))
    val lTagged = purchases.select($"user_id", $"ts".as("t"), lit(1).as("side"),
      lit(null).cast(plType).as("pl"), $"event_id", $"value")
    val wB = Window.partitionBy($"user_id").orderBy($"t", $"side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy($"user_id").orderBy($"t", $"side")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val joined = rTagged.unionByName(lTagged)
      .withColumn("back", last($"pl", ignoreNulls = true).over(wB))
      .withColumn("fwd", first($"pl", ignoreNulls = true).over(wF))
      .filter($"side" === 1)
    val direction =
      when($"back".isNull && $"fwd".isNull, "none")
        .when($"fwd".isNull, "backward")
        .when($"back".isNull, "forward")
        .when(unix_micros($"t") - unix_micros($"back.click_ts")
          <= unix_micros($"fwd.click_ts") - unix_micros($"t"), "backward")
        .otherwise("forward")
    joined
      .withColumn("direction", direction)
      .select($"event_id", $"user_id", $"t".as("ts"), $"value", $"direction",
        when($"direction" === "backward", $"back.click_id")
          .when($"direction" === "forward", $"fwd.click_id").as("nearest_click_id"),
        when($"direction" === "backward", $"back.click_ts")
          .when($"direction" === "forward", $"fwd.click_ts").as("nearest_ts"))
      .orderBy($"event_id")
  }

  /** OHLC time-bucket resampling — the downsampler every metrics/market
    * pipeline runs: events collapse into hourly bars of (open, high,
    * low, close, volume, decimal-exact value sum). Open/close are
    * `min_by`/`max_by` under a FIXED-WIDTH sortable key
    * `printf('%020d%012d', epoch_micros, event_id)` — timestamps alone
    * tie (the fixture proves it; eq01 groups clicks for the same
    * reason), and a zero-padded string is the composite order both
    * engines agree on (DuckDB's arg_min takes no struct keys). One
    * map-side-combining aggregate per bar; no window, no sort of the
    * event stream.
    *
    * 100 TB: the classic pre-aggregation — bars are hours-sized, not
    * events-sized; partial min_by/max_by/max/min/sum all combine
    * map-side, so the shuffle carries one partial bar per (task, hour). */
  val eq17OhlcResample: QueryDef = sqlChecked(
    "eq17_ohlc_resample",
    """WITH e AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar,
      |    value,
      |    printf('%020d%012d', epoch_us(ts), event_id) AS k
      |  FROM events)
      |SELECT bar, COUNT(*) AS volume,
      |  arg_min(value, k) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  arg_max(value, k) AS close,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
      |FROM e GROUP BY bar ORDER BY bar""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val k = format_string("%020d%012d", unix_micros($"ts"), $"event_id")
    Tables.events(spark, dir)
      .select(date_trunc("hour", $"ts").as("bar"), $"value", k.as("k"))
      .groupBy($"bar")
      .agg(
        count(lit(1)).as("volume"),
        min_by($"value", $"k").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", $"k").as("close"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double").as("value_sum"))
      .orderBy($"bar")
  }

  /** Linear interpolation over the gapped daily grid — eq09's resample
    * with the OTHER fill policy every time-series store offers
    * (pandas `interpolate`, InfluxDB/Timescale `interpolate()`): a
    * missing day takes prev + (next − prev) · gap_position / gap_length,
    * where prev/next are the nearest OBSERVED days on either side
    * (leading/trailing gaps fall back to the one-sided neighbor). Both
    * neighbors resolve in ONE window pass each (last/first ignoring
    * nulls over the calendar grid), the weights are exact day offsets
    * from epoch-day arithmetic, and the anchors are decimal-exact daily
    * sums — the single interpolating division rounds at 6 dp on both
    * engines. Shape: eq09's (bounded per-user sequence explode + two
    * ordered window passes per user). */
  val eq18LinearInterp: QueryDef = sqlChecked(
    "eq18_linear_interp",
    s"""WITH p AS (
       |  SELECT user_id, date_trunc('day', ts) AS day,
       |    ${sqlDsum("value")} AS v
       |  FROM events WHERE event_type = 'purchase' AND user_id < 20
       |  GROUP BY 1, 2),
       |bounds AS (
       |  SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
       |  FROM events),
       |users AS (SELECT DISTINCT user_id FROM p),
       |grid AS (
       |  SELECT u.user_id, unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day
       |  FROM users u, bounds b),
       |j AS (
       |  SELECT g.user_id, g.day,
       |    CAST(epoch(CAST(g.day AS TIMESTAMP)) // 86400 AS BIGINT) AS dn,
       |    p.v
       |  FROM grid g LEFT JOIN p ON g.user_id = p.user_id AND g.day = p.day),
       |f AS (
       |  SELECT user_id, day, dn, v,
       |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |    last_value(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
       |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |    first_value(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
       |  FROM j)
       |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
       |  CASE WHEN v IS NOT NULL THEN 'observed'
       |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interpolated'
       |       ELSE 'edge' END AS fill_kind,
       |  round(CASE
       |    WHEN v IS NOT NULL THEN v
       |    WHEN pv IS NOT NULL AND nv IS NOT NULL
       |      THEN pv + (nv - pv) * (CAST(dn - pd AS DOUBLE) / (nd - pd))
       |    ELSE COALESCE(pv, nv) END, 6) AS filled_value
       |FROM f ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val p = ev.filter($"event_type" === "purchase" && $"user_id" < 20)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(dsum($"value").as("v"))
    val bounds = ev.agg(
      min(date_trunc("day", $"ts")).as("d0"), max(date_trunc("day", $"ts")).as("d1"))
    val grid = p.select($"user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val j = grid.join(p, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        (unix_seconds($"day") / 86400).cast("long").as("dn"), $"v")
    val wB = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val f = j.select($"user_id", $"day", $"dn", $"v",
      last($"v", ignoreNulls = true).over(wB).as("pv"),
      last(when($"v".isNotNull, $"dn"), ignoreNulls = true).over(wB).as("pd"),
      first($"v", ignoreNulls = true).over(wF).as("nv"),
      first(when($"v".isNotNull, $"dn"), ignoreNulls = true).over(wF).as("nd"))
    f.select($"user_id", $"day",
      when($"v".isNotNull, "observed")
        .when($"pv".isNotNull && $"nv".isNotNull, "interpolated")
        .otherwise("edge").as("fill_kind"),
      round(
        when($"v".isNotNull, $"v")
          .when($"pv".isNotNull && $"nv".isNotNull,
            $"pv" + ($"nv" - $"pv") *
              (($"dn" - $"pd").cast("double") / ($"nd" - $"pd")))
          .otherwise(coalesce($"pv", $"nv")), 6).as("filled_value"))
      .orderBy($"user_id", $"day")
  }

  val all: Seq[QueryDef] = Seq(eq01AsofJoin, eq01bAsofExec, eq02RangeJoin,
    eq03Sessionize, eq04SessionWindow, eq05IntervalOverlap, eq06EventFunnel,
    eq07CohortRetention, eq08DailyAnomaly, eq09GapFill, eq10MovingWindow,
    eq11Scd2Versions, eq12PitJoin, eq13Scd2Quarantine, eq14AsofTolerance,
    eq15AsofNearest, eq17OhlcResample, eq18LinearInterp)
}
