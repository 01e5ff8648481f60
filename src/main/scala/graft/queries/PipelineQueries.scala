package graft.queries

import graft.QueryDef
import graft.QueryDef.sqlChecked
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation — the composed pipeline every
  * LLM corpus actually runs, as ONE oracle-checked query:
  *
  *   quality filter → exact dedup (keep-first) → deterministic sample
  *   → token-budget shard packing → per-shard manifest
  *
  * Each stage is the scale shape its standalone query establishes
  * (fq02/tq04 one-scan features, dq08's bag-of-words digest with only
  * 32-byte hashes in the dedup shuffle, tq09's partition-independent
  * md5 sampling, tq11's distributed PrefixSum packing), so the
  * composition inherits every individual 100 TB argument: the document
  * bodies are consumed by exactly one scan's projection; everything
  * after moves (doc_id, n_tokens, digest) triplets. The DuckDB oracle
  * replays the full funnel and hash-checks the final shard manifest —
  * stage boundaries can't silently drift apart.
  */
object PipelineQueries {

  val pq01TrainingPrep: QueryDef = sqlChecked(
    "pq01_training_prep",
    """WITH feats AS (
      |  SELECT doc_id, text,
      |    len(string_split_regex(text, '\s+')) AS n_tokens,
      |    len(string_split(concat(' ', text, ' '), ' the ')) - 1
      |      + len(string_split(concat(' ', text, ' '), ' a ')) - 1 AS stop_hits
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, text, n_tokens FROM feats
      |  WHERE n_tokens >= 20 AND CAST(stop_hits AS DOUBLE) / n_tokens > 0.02),
      |h AS (
      |  SELECT doc_id, n_tokens,
      |    sha256(array_to_string(list_sort(list_distinct(
      |      string_split_regex(lower(text), '\s+'))), ' ')) AS h
      |  FROM q),
      |d AS (
      |  SELECT doc_id, n_tokens FROM (
      |    SELECT doc_id, n_tokens,
      |      ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |    FROM h)
      |  WHERE rn = 1),
      |s AS (
      |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM d
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'),
      |p AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS running
      |  FROM s)
      |SELECT CAST(FLOOR((running - n_tokens) / 4096.0) AS BIGINT) AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc,
      |  CAST(max(doc_id) AS BIGINT) AS max_doc
      |FROM p GROUP BY shard ORDER BY shard""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def hits(marker: String) =
      size(split(concat(lit(" "), $"text", lit(" ")), s" $marker ", -1)) - 1
    // single scan computes every per-doc feature; bodies die here
    val feats = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"text",
        size(split($"text", "\\s+")).as("n_tokens"),
        (hits("the") + hits("a")).as("stop_hits"))
    val quality = feats
      .filter($"n_tokens" >= 20 &&
        $"stop_hits".cast("double") / $"n_tokens" > 0.02)
    // dq08's canonical bag-of-words digest: the dedup shuffle carries
    // 32-byte hashes + two longs, never text
    val hashed = quality.select($"doc_id", $"n_tokens",
      sha2(concat_ws(" ",
        array_sort(array_distinct(split(lower($"text"), "\\s+")))), 256).as("h"))
    val deduped = hashed
      .withColumn("rn",
        row_number().over(Window.partitionBy($"h").orderBy($"doc_id")))
      .filter($"rn" === 1)
      .select($"doc_id", $"n_tokens")
    // partition-independent md5 threshold (tq09): ~80% keep, reproducible
    // on any cluster layout
    val sampled = deduped
      .filter(substring(md5($"doc_id".cast("string")), 1, 4) < "cccd")
      .select($"doc_id", $"n_tokens".cast("long").as("n_tokens"))
    // distributed prefix sum (tq11's operator) — never a single-partition
    // window sort of the surviving corpus
    val packed = graft.operators.PrefixSum
      .runningSum(sampled, "doc_id", "n_tokens", "running")
    packed
      .withColumn("shard", floor(($"running" - $"n_tokens") / 4096.0))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("shard_tokens"),
        min($"doc_id").cast("long").as("min_doc"),
        max($"doc_id").cast("long").as("max_doc"))
      .orderBy($"shard")
  }

  /** Curriculum binning — order the corpus by a difficulty proxy and cut
    * it into quartile bins (curriculum learning feeds easy→hard; data
    * teams also use the bins for mixture re-weighting). The difficulty
    * score is in-row (mean word length proxy — one scan, no shuffle); the
    * quartile thresholds come from the engine's distributed EXACT
    * percentile operator over the whole corpus (single logical group),
    * rounded to 4 dp in both engines before any comparison exactly like
    * q39, then broadcast back as three scalars. Bin assignment and
    * per-bin accounting ride one more scan. */
  val pq02Curriculum: QueryDef = sqlChecked(
    "pq02_curriculum",
    """WITH s AS (
      |  SELECT doc_id,
      |    CAST(n_chars AS DOUBLE) / len(string_split_regex(lower(text), '\s+')) AS score
      |  FROM documents),
      |t AS (
      |  SELECT round(quantile_cont(score, 0.25), 4) AS t25,
      |    round(quantile_cont(score, 0.50), 4) AS t50,
      |    round(quantile_cont(score, 0.75), 4) AS t75
      |  FROM s)
      |SELECT
      |  CASE WHEN score < t25 THEN 'q1_easy'
      |       WHEN score < t50 THEN 'q2_mid_low'
      |       WHEN score < t75 THEN 'q3_mid_high'
      |       ELSE 'q4_hard' END AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CAST((score) AS DECIMAL(30,6))) AS DOUBLE) AS sum_score,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc_id,
      |  CAST(max(doc_id) AS BIGINT) AS max_doc_id
      |FROM s, t
      |GROUP BY bin
      |ORDER BY bin""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.util.Num.dsum
    val s = Tables.documents(spark, dir)
      .select($"doc_id",
        ($"n_chars".cast("double") / size(split(lower($"text"), "\\s+")))
          .as("score"))
    val t = graft.operators.ExactPercentile.quantiles(
        s.withColumn("g", lit(1)), "g", "score",
        Seq(0.25, 0.50, 0.75), Seq("t25", "t50", "t75"))
      .select(round($"t25", 4).as("t25"), round($"t50", 4).as("t50"),
        round($"t75", 4).as("t75"))
    s.crossJoin(broadcast(t))
      .select($"doc_id", $"score",
        when($"score" < $"t25", "q1_easy")
          .when($"score" < $"t50", "q2_mid_low")
          .when($"score" < $"t75", "q3_mid_high")
          .otherwise("q4_hard").as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"), dsum($"score").as("sum_score"),
        min($"doc_id").cast("long").as("min_doc_id"),
        max($"doc_id").cast("long").as("max_doc_id"))
      .orderBy($"bin")
  }

  /** Snapshot time travel, ORACLE-CHECKED end to end: commit the corpus
    * as v1, overwrite with the filtered corpus as v2 (sources/Snapshots —
    * append-only files + atomically renamed manifests), then read BOTH
    * versions back through the manifest path and report their aggregates.
    * The oracle computes the same two aggregates straight from the source
    * parquet — so the snapshot write→manifest→time-travel-read round trip
    * must preserve every row and value bit for bit, or the hash breaks.
    * The overwrite's old version staying readable IS the feature under
    * test. */
  val pq03SnapshotTimeTravel: QueryDef = sqlChecked(
    "pq03_snapshot_time_travel",
    """SELECT CAST(1 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CAST((n_chars) AS DECIMAL(30,6))) AS DOUBLE) AS sum_chars
      |FROM documents
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
      |  CAST(SUM(CAST((n_chars) AS DECIMAL(30,6))) AS DOUBLE)
      |FROM documents WHERE lang = 'en'
      |ORDER BY version""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.util.Num.dsum
    val path = graft.util.Scratch.tempDir("graft-snap-q") + "/docs"
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars")
    graft.sources.Snapshots.commit(spark, path, docs)
    graft.sources.Snapshots.commit(spark, path, docs.filter($"lang" === "en"))
    def stats(v: Long) = graft.sources.Snapshots.read(spark, path, v)
      .agg(count(lit(1)).as("n_docs"), dsum($"n_chars").as("sum_chars"))
      .select(lit(v).as("version"), $"n_docs", $"sum_chars")
    stats(1L).unionByName(stats(2L)).orderBy($"version")
  }

  /** Leakage-free train/val/test split: the split key is the
    * duplicate-CLUSTER label (dq09's near-dup graph — exact dups
    * collapsed, 3-gram Jaccard >= 0.5 edges, connected components), not
    * the document id, so two near-duplicates can never land in
    * different splits — the standard guard against eval contamination
    * when a test set is carved out of a deduplicated-but-not-perfectly
    * corpus. Assignment is an md5-prefix threshold on the label
    * (80/10/10), the same partition-independent draw tq09 establishes:
    * deterministic under any partitioning or cluster size, no shuffle
    * beyond the label computation itself.
    *
    * The oracle recomputes the clusters with a doc-level recursive CTE
    * and replays the identical hash split — a hash match proves both
    * engines assign every document to the same split, which subsumes
    * the zero-leakage property (same label → same split by
    * construction). */
  val pq04LeakageFreeSplit: QueryDef = sqlChecked(
    "pq04_leakage_free_split",
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(len(w) - 2),
      |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh),
      |sz AS (SELECT doc_id, len(shingles) AS sz FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT doc_a, doc_b FROM pairs
      |  JOIN sz sa ON sa.doc_id = doc_a
      |  JOIN sz sb ON sb.doc_id = doc_b
      |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5),
      |e AS (SELECT doc_a AS a, doc_b AS b FROM jac
      |      UNION SELECT doc_b, doc_a FROM jac),
      |reach AS (
      |  SELECT a AS doc, a AS label FROM e
      |  UNION
      |  SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.doc),
      |comp AS (SELECT doc, min(label) AS component FROM reach GROUP BY doc),
      |lab AS (
      |  SELECT d.doc_id, d.n_chars,
      |    COALESCE(c.component, d.doc_id) AS label
      |  FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id),
      |assigned AS (
      |  SELECT doc_id, n_chars, label,
      |    CASE WHEN substr(md5(CAST(label AS VARCHAR)), 1, 4) < 'cccc'
      |           THEN 'train'
      |         WHEN substr(md5(CAST(label AS VARCHAR)), 1, 4) < 'e666'
      |           THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM lab),
      |bylab AS (
      |  SELECT split, label, COUNT(*) AS c, SUM(n_chars) AS chars
      |  FROM assigned GROUP BY 1, 2)
      |SELECT split,
      |  CAST(SUM(c) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_groups,
      |  COUNT(*) FILTER (c >= 2) AS n_clusters,
      |  CAST(COALESCE(SUM(c) FILTER (c >= 2), 0) AS BIGINT) AS n_clustered_docs,
      |  CAST(SUM(chars) AS BIGINT) AS sum_chars
      |FROM bylab GROUP BY split
      |ORDER BY split""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val labels = DedupQueries.dupClusterLabels(
      Tables.fanOut(spark, Tables.documents(spark, dir)))
    val lab = Tables.documents(spark, dir).select($"doc_id", $"n_chars")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("label", coalesce($"label", $"doc_id"))
    val h = substring(md5($"label".cast("string")), 1, 4)
    val byLabel = lab
      .withColumn("split",
        when(h < "cccc", "train").when(h < "e666", "val").otherwise("test"))
      .groupBy($"split", $"label")
      .agg(count(lit(1)).as("c"), sum($"n_chars").as("chars"))
    byLabel.groupBy($"split")
      .agg(
        sum($"c").cast("long").as("n_docs"),
        count(lit(1)).as("n_groups"),
        count(when($"c" >= 2, 1)).as("n_clusters"),
        coalesce(sum(when($"c" >= 2, $"c")), lit(0)).cast("long")
          .as("n_clustered_docs"),
        sum($"chars").cast("long").as("sum_chars"))
      .orderBy($"split")
  }

  /** DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169):
    * select raw-corpus documents that look most like a target domain by
    * hashed-n-gram log-likelihood ratio — the published data-selection
    * method behind domain-matched pretraining mixes.
    *
    * Features are word uni+bigrams hashed into B=4096 buckets (md5-derived
    * so the oracle replays the hash exactly). Bucket distributions of the
    * target (lang='en' here) and the raw corpus get add-1 smoothing; the
    * per-doc score is the sum of its gram occurrences' log-ratio weights.
    *
    * Scale shape: one corpus explode feeds bucket counting AND scoring
    * (cached, vocab-bounded at 4096 buckets after the count); the weight
    * table is a broadcast scalar-sized frame, so scoring is a map-side
    * join + one groupBy(doc_id) — no data-sized shuffle beyond the gram
    * count. Determinism: ln() is taken on identical int-ratio doubles in
    * both engines and rounded to 9 dp (tq20's ulp shield); per-doc sums
    * run in DECIMAL so association order can't move the score; final
    * ranking tie-breaks on doc_id. */
  val pq05DsirResample: QueryDef = sqlChecked(
    "pq05_dsir_resample",
    """WITH arr AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS a
      |  FROM documents),
      |uni AS (SELECT doc_id, lang, unnest(a) AS gr FROM arr),
      |bi AS (SELECT doc_id, lang,
      |         unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS gr
      |       FROM arr WHERE len(a) >= 2),
      |g AS (SELECT doc_id, lang,
      |        CAST(('0x' || substring(md5(gr), 1, 8)) AS BIGINT) % 4096 AS b
      |      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
      |cr AS (SELECT b, COUNT(*) AS c_r FROM g GROUP BY b),
      |ct AS (SELECT b, COUNT(*) AS c_t FROM g WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT (SELECT COUNT(*) FROM g) AS n_r,
      |               (SELECT COUNT(*) FROM g WHERE lang = 'en') AS n_t),
      |w AS (SELECT cr.b,
      |        round(ln((COALESCE(ct.c_t, 0) + 1) / (tot.n_t + 4096.0))
      |            - ln((cr.c_r + 1) / (tot.n_r + 4096.0)), 9) AS wt
      |      FROM cr LEFT JOIN ct ON cr.b = ct.b, tot)
      |SELECT g.doc_id, g.lang,
      |  CAST(SUM(CAST(wt AS DECIMAL(25,9))) AS DOUBLE) AS dsir_score
      |FROM g JOIN w ON g.b = w.b
      |GROUP BY g.doc_id, g.lang
      |ORDER BY dsir_score DESC, doc_id
      |LIMIT 50""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val B = 4096
    val a = filter(split(lower($"text"), "\\s+"), w => w =!= "")
    val docsA = Tables.documents(spark, dir).select($"doc_id", $"lang", a.as("a"))
    val uni = docsA.select($"doc_id", $"lang", explode($"a").as("gr"))
    val bi = docsA.filter(size($"a") >= 2).select($"doc_id", $"lang",
      explode(transform(sequence(lit(1), size($"a") - 1),
        i => concat(element_at($"a", i), lit(" "), element_at($"a", i + 1)))).as("gr"))
    val g = uni.union(bi).select($"doc_id", $"lang",
      (conv(substring(md5($"gr"), 1, 8), 16, 10).cast("long") % B).as("b"))
      .cache()
    val cr = g.groupBy($"b").agg(count(lit(1)).as("c_r"))
    val ct = g.filter($"lang" === "en").groupBy($"b").agg(count(lit(1)).as("c_t"))
    val tot = g.agg(count(lit(1)).as("n_r"),
      coalesce(sum(when($"lang" === "en", 1L).otherwise(0L)), lit(0L)).as("n_t"))
    val w = cr.join(ct, Seq("b"), "left").na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(tot))
      .select($"b",
        round(log(($"c_t" + 1).cast("double") / ($"n_t" + lit(B)).cast("double"))
            - log(($"c_r" + 1).cast("double") / ($"n_r" + lit(B)).cast("double")), 9).as("wt"))
    g.join(broadcast(w), Seq("b"))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"wt".cast(DecimalType(25, 9))).cast("double").as("dsir_score"))
      .orderBy($"dsir_score".desc, $"doc_id")
      .limit(50)
      .select($"doc_id", $"lang", $"dsir_score")
  }

  /** Shard packing in REAL tokenizer units: pq01's funnel packs whitespace
    * tokens, but training budgets are measured in subword tokens, and the
    * two disagree exactly where it hurts (boilerplate compresses, code and
    * rare words expand). This query packs shards by the frozen-vocab BPE
    * token count (tq31's oracle-replayable encoder), composed with the
    * distributed PrefixSum — so the manifest is in the units the training
    * job actually consumes.
    *
    * Scale shape: one scan computes the encode chain in-row (bodies die at
    * the projection); PrefixSum packs without a single-partition sort; the
    * oracle replays encode + window sum + shard cut end to end. */
  val pq06BpeShardPacking: QueryDef = sqlChecked(
    "pq06_bpe_shard_packing",
    s"""WITH n AS (SELECT doc_id, ${graft.tokenizer.Bpe.sqlNorm} AS norm FROM documents),
       |e AS (SELECT doc_id, norm, ${graft.tokenizer.Bpe.sqlEncode(graft.tokenizer.Bpe.FixedMerges)} AS enc FROM n),
       |t AS (SELECT doc_id,
       |  CAST(len(enc) - len(replace(enc, chr(1), ''))
       |       - (len(norm) - len(replace(norm, ' ', ''))) AS BIGINT) AS n_bpe
       |  FROM e),
       |s AS (SELECT doc_id, n_bpe FROM t WHERE n_bpe > 0),
       |p AS (SELECT doc_id, n_bpe,
       |  CAST(SUM(n_bpe) OVER (ORDER BY doc_id) AS BIGINT) AS running FROM s)
       |SELECT CAST(FLOOR((running - n_bpe) / 8192.0) AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_bpe) AS BIGINT) AS shard_tokens,
       |  CAST(min(doc_id) AS BIGINT) AS min_doc,
       |  CAST(max(doc_id) AS BIGINT) AS max_doc
       |FROM p GROUP BY shard ORDER BY shard""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.tokenizer.Bpe
    val sized = Tables.fanOut(spark, Tables.documents(spark, dir))
      .withColumn("norm", Bpe.normText($"text"))
      .withColumn("enc", Bpe.encode($"norm", Bpe.FixedMerges))
      .select($"doc_id",
        Bpe.subwordCount($"norm", $"enc").cast("long").as("n_bpe"))
      .filter($"n_bpe" > 0)
    graft.operators.PrefixSum.runningSum(sized, "doc_id", "n_bpe", "running")
      .withColumn("shard", floor(($"running" - $"n_bpe") / 8192.0))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bpe").cast("long").as("shard_tokens"),
        min($"doc_id").cast("long").as("min_doc"),
        max($"doc_id").cast("long").as("max_doc"))
      .orderBy($"shard")
  }

  /** Sequence-length bucketing — the padding-waste side of batching that
    * pq06's token-budget packing does not address: a training batch pads
    * every sequence to its bucket's length, so the efficiency metric is
    * wasted-pad-tokens per bucket. Docs are assigned to power-of-two
    * length buckets (the standard bucketed-batching scheme; the final
    * bucket also CAPS — longer docs truncate to it, reported as
    * truncated tokens, the other half of the trade). All-integer
    * arithmetic, so the oracle replays the whole accounting; waste_pct
    * is one exact division at the end.
    *
    * Scale shape: one scan, per-row bucket CASE, tiny 7-group agg with
    * map-side partials — the measurement that decides a real pipeline's
    * bucket boundaries before a single batch is built. */
  val pq07LengthBuckets: QueryDef = {
    val buckets = Seq(32, 64, 128, 256, 512, 1024, 2048)
    val cap = buckets.last
    val sqlBucket = {
      val whens = buckets.init.map(b => s"WHEN n_tokens <= $b THEN $b").mkString(" ")
      s"CASE $whens ELSE $cap END"
    }
    sqlChecked(
      "pq07_length_buckets",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |b AS (SELECT doc_id, n_tokens, CAST($sqlBucket AS BIGINT) AS bucket FROM t)
         |SELECT bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(LEAST(n_tokens, bucket)) AS BIGINT) AS kept_tokens,
         |  CAST(SUM(bucket - LEAST(n_tokens, bucket)) AS BIGINT) AS pad_tokens,
         |  CAST(SUM(GREATEST(n_tokens - bucket, 0)) AS BIGINT) AS truncated_tokens,
         |  CAST(SUM(bucket - LEAST(n_tokens, bucket)) AS DOUBLE)
         |    / CAST(COUNT(*) * bucket AS DOUBLE) AS waste_pct
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val t = Tables.documents(spark, dir)
        .select($"doc_id",
          size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
      val bucket = buckets.init.foldRight(lit(cap.toLong)) { (b, els) =>
        when($"n_tokens" <= b, lit(b.toLong)).otherwise(els)
      }
      t.withColumn("bucket", bucket)
        .groupBy($"bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(least($"n_tokens", $"bucket")).cast("long").as("kept_tokens"),
          sum($"bucket" - least($"n_tokens", $"bucket")).cast("long").as("pad_tokens"),
          sum(greatest($"n_tokens" - $"bucket", lit(0L))).cast("long").as("truncated_tokens"),
          (sum($"bucket" - least($"n_tokens", $"bucket")).cast("double")
            / (count(lit(1)) * $"bucket").cast("double")).as("waste_pct"))
        .orderBy($"bucket")
    }
  }

  /** Temperature-scaled mixture planning (Conneau & Lample 2019 §3.1;
    * the α=0.3 recipe mT5 made standard): fq04 draws a corpus given
    * target weights — this computes the weights FROM the corpus. Per
    * source: token count n_i, raw share p_i, temperature share
    * q_i ∝ p_i^α (flattens head sources, lifts tail ones), the
    * single-epoch-constrained token budget B = min_i(n_i / q_i) — the
    * largest plan where no source must repeat — and each source's
    * planned draw + epoch fraction. One corpus scan for
    * the per-source token counts (in-row size(split), no explode), then
    * everything is a 20-row frame. pow() is shielded by the 9-dp
    * rounding both engines apply before any downstream arithmetic
    * (tq20's ulp rule); all outputs round 6 dp. */
  val pq08MixturePlan: QueryDef = sqlChecked(
    "pq08_mixture_plan",
    """WITH t AS (
      |  SELECT source,
      |    CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT SUM(n_tokens) AS total FROM t),
      |p AS (SELECT source, n_tokens,
      |    round(CAST(n_tokens AS DOUBLE) / total, 9) AS p_raw FROM t, tot),
      |qn AS (SELECT CAST(SUM(CAST(round(pow(p_raw, 0.3), 9) AS DECIMAL(25,9))) AS DOUBLE) AS z FROM p),
      |q AS (SELECT source, n_tokens, p_raw,
      |    round(round(pow(p_raw, 0.3), 9) / z, 9) AS q_temp FROM p, qn),
      |b AS (SELECT MIN(n_tokens / q_temp) AS budget FROM q)
      |SELECT source, n_tokens,
      |  round(p_raw, 6) AS p_raw,
      |  round(q_temp, 6) AS q_temp,
      |  round(q_temp * budget, 2) AS planned_tokens,
      |  round(q_temp * budget / n_tokens, 6) AS epochs
      |FROM q, b
      |ORDER BY source""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables.documents(spark, dir)
      .select($"source",
        size(filter(split($"text", "\\s+"), x => x =!= "")).as("nt"))
      .groupBy($"source").agg(sum($"nt").cast("long").as("n_tokens"))
    val tot = t.agg(sum($"n_tokens").as("total"))
    val p = t.crossJoin(broadcast(tot))
      .select($"source", $"n_tokens",
        round($"n_tokens".cast("double") / $"total", 9).as("p_raw"))
    import graft.util.Num.dsum
    val qn = p.agg(dsum(round(pow($"p_raw", 0.3), 9)).as("z"))
    val q = p.crossJoin(broadcast(qn))
      .select($"source", $"n_tokens", $"p_raw",
        round(round(pow($"p_raw", 0.3), 9) / $"z", 9).as("q_temp"))
    val b = q.agg(min($"n_tokens" / $"q_temp").as("budget"))
    q.crossJoin(broadcast(b))
      .select($"source", $"n_tokens",
        round($"p_raw", 6).as("p_raw"),
        round($"q_temp", 6).as("q_temp"),
        round($"q_temp" * $"budget", 2).as("planned_tokens"),
        round($"q_temp" * $"budget" / $"n_tokens", 6).as("epochs"))
      .orderBy($"source")
  }

  /** The corpus data card (Gebru et al. 2021, "Datasheets for Datasets"
    * — the composition/quality summary a released corpus ships): one
    * row per (source, lang) with document and token counts, the exact
    * duplicate rate (bag-of-words digests — dq08's canonical form, so
    * reordered clones unify), the quality-pass rate under the fq02-style
    * gate, and mean document length. One scan computes every per-doc
    * feature in-row; the digest-distinct is the only second aggregate
    * and it shuffles 32-byte hashes. The ratios are single exact
    * divisions rounded 6 dp. This is the query a data team actually
    * publishes next to the corpus — and every number in it is
    * hash-checked against an independent engine. */
  val pq09DataCard: QueryDef = sqlChecked(
    "pq09_data_card",
    """WITH f AS (
      |  SELECT source, lang,
      |    sha256(array_to_string(list_sort(list_distinct(
      |      string_split_regex(lower(text), '\s+'))), ' ')) AS dig,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
      |    CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE)
      |      / len(string_split_regex(text, '\s+')) AS distinct_frac,
      |    (list_contains(string_split(lower(text), ' '), 'the')
      |      OR list_contains(string_split(lower(text), ' '), 'a')) AS has_stop
      |  FROM documents),
      |g AS (
      |  SELECT source, lang,
      |    COUNT(*) AS n_docs,
      |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |    COUNT(DISTINCT dig) AS distinct_docs,
      |    COUNT(*) FILTER (n_tokens >= 30 AND distinct_frac >= 0.3 AND has_stop)
      |      AS quality_pass
      |  FROM f GROUP BY source, lang)
      |SELECT source, lang, n_docs, total_tokens, distinct_docs,
      |  round(1.0 - CAST(distinct_docs AS DOUBLE) / n_docs, 6) AS dup_rate,
      |  round(CAST(quality_pass AS DOUBLE) / n_docs, 6) AS quality_pass_rate,
      |  round(CAST(total_tokens AS DOUBLE) / n_docs, 2) AS mean_tokens
      |FROM g ORDER BY source, lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val f = Tables.documents(spark, dir)
      .select($"source", $"lang",
        sha2(concat_ws(" ",
          array_sort(array_distinct(split(lower($"text"), "\\s+")))), 256).as("dig"),
        size(filter(split($"text", "\\s+"), x => x =!= "")).as("n_tokens"),
        (size(array_distinct(split(lower($"text"), "\\s+"))).cast("double") /
          size(split($"text", "\\s+"))).as("distinct_frac"),
        (array_contains(split(lower($"text"), " "), "the") ||
          array_contains(split(lower($"text"), " "), "a")).as("has_stop"))
    f.groupBy($"source", $"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("total_tokens"),
        countDistinct($"dig").as("distinct_docs"),
        count(when($"n_tokens" >= 30 && $"distinct_frac" >= 0.3 && $"has_stop", 1))
          .as("quality_pass"))
      .select($"source", $"lang", $"n_docs", $"total_tokens", $"distinct_docs",
        round(lit(1.0) - $"distinct_docs".cast("double") / $"n_docs", 6).as("dup_rate"),
        round($"quality_pass".cast("double") / $"n_docs", 6).as("quality_pass_rate"),
        round($"total_tokens".cast("double") / $"n_docs", 2).as("mean_tokens"))
      .orderBy($"source", $"lang")
  }

  /** Preference-pair construction — the data shape DPO/RLHF reward
    * training consumes (Rafailov et al. 2023): within each source,
    * pair the K highest-scoring documents with the K lowest-scoring
    * ones (chosen vs rejected under a quality-classifier proxy), keep
    * only pairs whose score margin clears a floor, and emit the
    * per-source pairing manifest. The score is a deterministic
    * fine-grained quality proxy (stopword density minus token-length
    * deviation, rounded once to 6 dp) so ranks are total-ordered and
    * engine-portable; both row_number windows tie-break on doc_id.
    *
    * 100 TB: scoring is one map-side scan; ranking partitions by source
    * (bounded groups); the pair join matches rank-to-rank inside a
    * source — K-sized, never quadratic. */
  val pq10PreferencePairs: QueryDef = sqlChecked(
    "pq10_preference_pairs",
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    round(
      |      (CAST(len(string_split(concat(' ', text, ' '), ' the ')) - 1
      |         + len(string_split(concat(' ', text, ' '), ' a ')) - 1 AS DOUBLE)
      |        / len(string_split_regex(text, '\s+')))
      |      - abs(CAST(n_chars AS DOUBLE)
      |          / len(string_split_regex(text, '\s+')) - 5.0) / 10.0,
      |      6) AS score
      |  FROM documents),
      |hi AS (
      |  SELECT source, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rnk
      |  FROM scored),
      |lo AS (
      |  SELECT source, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY score ASC, doc_id) AS rnk
      |  FROM scored),
      |pairs AS (
      |  SELECT hi.source, hi.rnk,
      |    hi.doc_id AS chosen_doc, lo.doc_id AS rejected_doc,
      |    round(hi.score - lo.score, 6) AS margin
      |  FROM hi JOIN lo ON hi.source = lo.source AND hi.rnk = lo.rnk
      |  WHERE hi.rnk <= 5 AND hi.doc_id <> lo.doc_id
      |    AND hi.score - lo.score >= 0.05)
      |SELECT source, COUNT(*) AS n_pairs,
      |  CAST(SUM(CAST((margin) AS DECIMAL(30,6))) AS DOUBLE) / COUNT((margin)) AS avg_margin,
      |  MIN(chosen_doc) AS first_chosen, MIN(rejected_doc) AS first_rejected
      |FROM pairs GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.util.Num._
    def hits(marker: String) =
      (size(split(concat(lit(" "), $"text", lit(" ")), s" $marker ", -1)) - 1)
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        round(
          ((hits("the") + hits("a")).cast("double") /
            size(split($"text", "\\s+"))) -
          abs($"n_chars".cast("double") /
            size(split($"text", "\\s+")) - 5.0) / 10.0,
          6).as("score"))
    val wHi = Window.partitionBy($"source").orderBy($"score".desc, $"doc_id")
    val wLo = Window.partitionBy($"source").orderBy($"score".asc, $"doc_id")
    val hi = scored.withColumn("rnk", row_number().over(wHi))
      .select($"source", $"rnk", $"doc_id".as("chosen_doc"), $"score".as("s_hi"))
    val lo = scored.withColumn("rnk", row_number().over(wLo))
      .select($"source", $"rnk", $"doc_id".as("rejected_doc"), $"score".as("s_lo"))
    hi.join(lo, Seq("source", "rnk"))
      .filter($"rnk" <= 5 && $"chosen_doc" =!= $"rejected_doc" &&
        $"s_hi" - $"s_lo" >= 0.05)
      .select($"source", round($"s_hi" - $"s_lo", 6).as("margin"),
        $"chosen_doc", $"rejected_doc")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_pairs"),
        davg($"margin").as("avg_margin"),
        min($"chosen_doc").as("first_chosen"),
        min($"rejected_doc").as("first_rejected"))
      .orderBy($"source")
  }

  /** Constraint audit — the dbt-test / Great-Expectations layer as one
    * engine query: primary-key uniqueness (orders), referential
    * integrity (orders→customer orphans via anti-join), null/domain
    * rates (lineitem quantity bounds, discount ∈ [0,1]), and event-time
    * sanity (events.ts within the fixture epoch). One row per check
    * with violation and population counts, so the whole audit is a
    * 6-row hash — any data regression flips the hash before it reaches
    * a training run.
    *
    * 100 TB: every check is a scan-local aggregate or a broadcast/hash
    * anti-join on the key — checks batch into per-table passes, never
    * per-rule scans (the PK and FK checks share orders' scan here via
    * cache). */
  val pq11ConstraintAudit: QueryDef = sqlChecked(
    "pq11_constraint_audit",
    """WITH orders_u AS (
      |  SELECT * FROM orders
      |  UNION ALL
      |  SELECT * REPLACE (CAST(-1 AS BIGINT) AS o_custkey)
      |  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 1)),
      |li_u AS (
      |  SELECT * FROM lineitem
      |  UNION ALL
      |  SELECT * REPLACE (CAST(-5 AS DOUBLE) AS l_quantity,
      |                    CAST(1.5 AS DOUBLE) AS l_discount)
      |  FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1)),
      |pk AS (
      |  SELECT 'orders_pk_unique' AS check_name,
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
      |    CAST(COUNT(*) AS BIGINT) AS n_checked
      |  FROM orders_u),
      |fk AS (
      |  SELECT 'orders_customer_fk' AS check_name,
      |    CAST(COUNT(*) AS BIGINT) AS n_violations,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders_u) AS n_checked
      |  FROM orders_u o ANTI JOIN customer c ON o.o_custkey = c.c_custkey),
      |qty AS (
      |  SELECT 'lineitem_qty_domain' AS check_name,
      |    CAST(COUNT(*) FILTER (l_quantity IS NULL OR l_quantity <= 0
      |      OR l_quantity > 50) AS BIGINT) AS n_violations,
      |    CAST(COUNT(*) AS BIGINT) AS n_checked
      |  FROM li_u),
      |disc AS (
      |  SELECT 'lineitem_discount_domain' AS check_name,
      |    CAST(COUNT(*) FILTER (l_discount IS NULL OR l_discount < 0
      |      OR l_discount > 1) AS BIGINT) AS n_violations,
      |    CAST(COUNT(*) AS BIGINT) AS n_checked
      |  FROM li_u),
      |pnn AS (
      |  SELECT 'part_name_not_null' AS check_name,
      |    CAST(COUNT(*) FILTER (p_name IS NULL OR trim(p_name) = '') AS BIGINT)
      |      AS n_violations,
      |    CAST(COUNT(*) AS BIGINT) AS n_checked
      |  FROM part),
      |ets AS (
      |  SELECT 'events_ts_epoch' AS check_name,
      |    CAST(COUNT(*) FILTER (ts IS NULL
      |      OR ts < TIMESTAMP '2020-01-01 00:00:00'
      |      OR ts >= TIMESTAMP '2030-01-01 00:00:00') AS BIGINT) AS n_violations,
      |    CAST(COUNT(*) AS BIGINT) AS n_checked
      |  FROM events)
      |SELECT * FROM pk UNION ALL SELECT * FROM fk
      |UNION ALL SELECT * FROM qty UNION ALL SELECT * FROM disc
      |UNION ALL SELECT * FROM pnn UNION ALL SELECT * FROM ets
      |ORDER BY check_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def row(name: String, violations: org.apache.spark.sql.Column,
        frame: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      frame.agg(violations.cast("long").as("n_violations"),
          count(lit(1)).as("n_checked"))
        .select(lit(name).as("check_name"), $"n_violations", $"n_checked")
    // both engines plant the same violations (the fq05 pattern), so the
    // detection arms are proven, not vacuously zero: a duplicate-PK row
    // that is also an FK orphan, and a lineitem row breaking both domains
    val orders0 = Tables.orders(spark, dir)
    val orders = orders0.unionByName(
        orders0.orderBy($"o_orderkey").limit(1)
          .withColumn("o_custkey", lit(-1L)))
      .cache() // PK + FK checks share it
    val li0 = Tables.lineitem(spark, dir)
    val li = li0.unionByName(
        li0.orderBy($"l_orderkey", $"l_linenumber").limit(1)
          .withColumn("l_quantity", lit(-5.0))
          .withColumn("l_discount", lit(1.5)))
      .cache() // two domain checks share it
    val pk = row("orders_pk_unique",
      count(lit(1)) - countDistinct($"o_orderkey"), orders)
    val orphans = orders.join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(orders.agg(count(lit(1)).as("n_checked"))))
      .select(lit("orders_customer_fk").as("check_name"),
        $"n_violations", $"n_checked")
    val qty = row("lineitem_qty_domain",
      count(when($"l_quantity".isNull || $"l_quantity" <= 0 ||
        $"l_quantity" > 50, 1)), li)
    val disc = row("lineitem_discount_domain",
      count(when($"l_discount".isNull || $"l_discount" < 0 ||
        $"l_discount" > 1, 1)), li)
    val pnn = row("part_name_not_null",
      count(when($"p_name".isNull || trim($"p_name") === "", 1)),
      Tables.part(spark, dir))
    val ets = row("events_ts_epoch",
      count(when($"ts".isNull ||
        $"ts" < lit("2020-01-01 00:00:00").cast("timestamp") ||
        $"ts" >= lit("2030-01-01 00:00:00").cast("timestamp"), 1)),
      Tables.events(spark, dir))
    pk.unionByName(orphans).unionByName(qty).unionByName(disc)
      .unionByName(pnn).unionByName(ets)
      .orderBy($"check_name")
  }

  val all: Seq[QueryDef] = Seq(pq01TrainingPrep, pq02Curriculum,
    pq03SnapshotTimeTravel, pq04LeakageFreeSplit, pq05DsirResample,
    pq06BpeShardPacking, pq07LengthBuckets, pq08MixturePlan, pq09DataCard,
    pq10PreferencePairs, pq11ConstraintAudit)
}
