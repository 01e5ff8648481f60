package graft.queries

import graft.QueryDef
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.dedup.Shingles
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, MinHash-LSH banded,
  * SimHash, and an n-gram Jaccard set-similarity join.
  *
  * 100 TB design notes:
  *   - exact dedup hashes BEFORE grouping: the shuffle moves 32-byte
  *     digests, never document bodies;
  *   - near-dup candidate generation is ALWAYS banded/bucketed (LSH bands
  *     or shared-shingle equi-join) — no all-pairs crossJoin anywhere; the
  *     plan contains no CartesianProduct node;
  *   - per-doc state (signatures, shingle sets) is bounded by document
  *     length, not corpus size, so executor memory is flat in SF.
  */
object DedupQueries {

  /** Exact dedup summary: sha256 of normalized text, grouped. */
  val dq01ExactDedup: QueryDef = sqlChecked(
    "dq01_exact_dedup",
    """WITH h AS (
      |  SELECT sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
      |  FROM documents),
      |g AS (SELECT h, COUNT(*) AS c FROM h GROUP BY h)
      |SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_distinct,
      |  COUNT(*) FILTER (WHERE c > 1) AS n_dup_groups,
      |  CAST(COALESCE(SUM(c - 1) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_dup_surplus
      |FROM g""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(sha2(Shingles.normalized($"text"), 256).as("h"))
      .groupBy($"h").agg(count(lit(1)).as("c"))
      .agg(
        sum($"c").cast("long").as("n_docs"),
        count(lit(1)).as("n_distinct"),
        count(when($"c" > 1, 1)).as("n_dup_groups"),
        coalesce(sum(when($"c" > 1, $"c" - 1)), lit(0)).cast("long").as("n_dup_surplus"))
  }

  /** Dedup with keep-first representative: min(doc_id) per content hash
    * survives; per-lang surviving counts. */
  val dq02DedupKeepFirst: QueryDef = sqlChecked(
    "dq02_dedup_keep_first",
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
      |  FROM documents),
      |keep AS (SELECT h, min(doc_id) AS keep_id FROM h GROUP BY h)
      |SELECT lang, COUNT(*) AS n_kept
      |FROM h JOIN keep ON h.doc_id = keep.keep_id
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val h = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", sha2(Shingles.normalized($"text"), 256).as("h"))
    val keep = h.groupBy($"h").agg(min($"doc_id").as("keep_id"))
    h.join(keep, h("doc_id") === keep("keep_id"), "left_semi")
      .groupBy($"lang").agg(count(lit(1)).as("n_kept"))
      .orderBy($"lang")
  }

  /** Shared shingled base frame (fanned out: tokenize+shingle is the
    * CPU-heavy projection and the fixture scan is one row group). */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.fanOut(spark, Tables.documents(spark, dir))
      .withColumn("toks", Shingles.tokens($"text"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", Shingles.shingles3($"toks").as("shingles"))
  }

  /** MinHash + LSH banded near-dup detection, the 100 TB shape (see
    * graft.dedup.MinHashLsh; MinHashSpec proves planted near-dups are
    * found). rowsOnly: the xxhash64 minhash isn't reproducible in the
    * oracle engine; the output is a one-row invariant summary. */
  val dq03MinhashLsh: QueryDef = rowsOnly("dq03_minhash_lsh") { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"text")
    // adaptive exact-collapse: identical values to aggregating
    // candidatePairs (spec-asserted), but clone-heavy corpora collapse to
    // set-class representatives first — see MinHashLsh.pairStats
    graft.dedup.MinHashLsh.pairStats(docs, numHashes = 16, numBands = 4)
  }

  /** dq03's machinery under an independent engine: the SAME MinHash+LSH
    * pipeline (shingles → 16 per-doc signature minima → 4 banded buckets →
    * candidate equi-join → exact Jaccard) run with the md5-derived
    * permutation family that DuckDB implements bit-for-bit, so every stage
    * — not just the summary invariants — is oracle-hash-checked. dq03
    * keeps the faster xxhash64 family for the production path (the
    * q24-exact / q25-sketch pattern applied to dedup). */
  val dq03bMinhashPortable: QueryDef = {
    val numHashes = 16
    val numBands = 4
    val rowsPerBand = numHashes / numBands
    val sigCols = (0 until numHashes).map { i =>
      s"    list_min(list_transform(shingles, s -> CAST(('0x' || substring(md5('$i:' || s), 1, 15)) AS BIGINT))) AS h$i"
    }.mkString(",\n")
    val bandSelects = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => s"CAST(h$i AS VARCHAR)").mkString(" || ',' || ")
      s"  SELECT doc_id, $b AS band_idx, md5($cols) AS band_hash FROM sigs"
    }.mkString("\n  UNION ALL\n")
    sqlChecked(
      "dq03b_minhash_portable",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents),
         |base AS (
         |  SELECT doc_id, list_distinct(list_transform(range(len(w) - 2),
         |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))) AS shingles
         |  FROM toks WHERE len(w) >= 3),
         |sigs AS (
         |  SELECT doc_id,
         |$sigCols
         |  FROM base),
         |bands AS (
         |$bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |    AND a.doc_id < b.doc_id),
         |jac AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
         |      len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
         |  FROM cand c
         |  JOIN base sa ON sa.doc_id = c.doc_a
         |  JOIN base sb ON sb.doc_id = c.doc_b)
         |SELECT CAST($numHashes AS INT) AS num_hashes, CAST($numBands AS INT) AS num_bands,
         |  COUNT(*) AS n_candidate_pairs,
         |  COUNT(*) FILTER (jaccard >= 0.8) AS n_near_dups,
         |  CAST(MAX(jaccard) AS DOUBLE) AS max_jaccard
         |FROM jac""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = Tables.fanOut(spark, Tables.documents(spark, dir))
        .select($"doc_id", $"text")
      graft.dedup.MinHashLsh
        .candidatePairs(docs, numHashes, numBands, portable = true)
        .agg(
          lit(numHashes).as("num_hashes"),
          lit(numBands).as("num_bands"),
          count(lit(1)).as("n_candidate_pairs"),
          count(when($"jaccard" >= 0.8, 1)).as("n_near_dups"),
          max($"jaccard").as("max_jaccard"))
    }
  }

  /** SimHash fingerprinting (see graft.dedup.SimHash; SimHashSpec proves
    * near-dups land at small Hamming distance). rowsOnly summary — the
    * hash isn't oracle-portable. */
  val dq04Simhash: QueryDef = rowsOnly("dq04_simhash") { (spark, dir) =>
    import spark.implicits._
    graft.dedup.SimHash.fingerprints(
        Tables.fanOut(spark, Tables.documents(spark, dir)).select($"doc_id", $"text"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"simhash").as("n_distinct_fp"),
        count(when($"simhash" === 0L, 1)).as("n_zero_fp"))
  }

  /** dq04's machinery row-level-checked under an independent engine: the
    * SAME SimHash construction (per-token hash → 32 bit-votes → sign →
    * fingerprint) with a 32-bit md5-prefix token hash DuckDB reproduces
    * exactly, emitting the per-document fingerprints themselves (not a
    * summary) for the first 200 docs — every bit of every fingerprint is
    * hash-compared. */
  val dq04bSimhashPortable: QueryDef = {
    val bits = graft.dedup.SimHash.Bits
    val voteCols = (0 until bits).map { j =>
      s"    SUM(CASE WHEN (th >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS w$j"
    }.mkString(",\n")
    val fpSum = (0 until bits)
      .map(j => s"(CASE WHEN w$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" +\n    ")
    sqlChecked(
      "dq04b_simhash_portable",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
         |  FROM documents WHERE doc_id < 200),
         |h AS (
         |  SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS th
         |  FROM toks),
         |votes AS (
         |  SELECT doc_id,
         |$voteCols
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id,
         |  CAST($fpSum AS BIGINT) AS simhash
         |FROM votes
         |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.dedup.SimHash.fingerprints(
          Tables.fanOut(spark, Tables.documents(spark, dir))
            .filter($"doc_id" < 200).select($"doc_id", $"text"),
          portable = true)
        .orderBy($"doc_id")
    }
  }

  /** n-gram Jaccard set-similarity join — candidate pairs ONLY via the
    * shared-shingle equi-join (SURVEY §2.4 J3 pattern), then Jaccard from
    * intersection counts. Fully SQL-expressible → oracle-checked. */
  val dq05NgramJaccard: QueryDef = sqlChecked(
    "dq05_ngram_jaccard",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(w) - 2),
      |      i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh),
      |sz AS (SELECT doc_id, len(shingles) AS sz FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT doc_a, doc_b,
      |    CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
      |  FROM pairs
      |  JOIN sz sa ON sa.doc_id = doc_a
      |  JOIN sz sb ON sb.doc_id = doc_b)
      |SELECT COUNT(*) AS n_candidate_pairs,
      |  COUNT(*) FILTER (WHERE jaccard >= 0.1) AS n_ge_01,
      |  COUNT(*) FILTER (WHERE jaccard >= 0.8) AS n_near_dups
      |FROM jac""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val base = shingled(spark, dir).cache() // consumed twice: explode + sizes
    val ex = base.select($"doc_id", explode($"shingles").as("sh"))
    val sz = base.select($"doc_id", size($"shingles").as("sz"))
    val pairs = ex.as("a")
      .join(ex.as("b"), $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sz.select($"doc_id".as("doc_a"), $"sz".as("sz_a")), Seq("doc_a"))
      .join(sz.select($"doc_id".as("doc_b"), $"sz".as("sz_b")), Seq("doc_b"))
      .withColumn("jaccard", $"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter"))
      .agg(
        count(lit(1)).as("n_candidate_pairs"),
        count(when($"jaccard" >= 0.1, 1)).as("n_ge_01"),
        count(when($"jaccard" >= 0.8, 1)).as("n_near_dups"))
  }

  /** dq06's winnowing SELECTION row-level-checked under an independent
    * engine: the fingerprint set of a document is the DISTINCT set of
    * sliding-window hash minima, which is tie-rule-independent (equal
    * minima collapse under dedup), so the algorithm is reproducible from
    * any shared gram hash. This variant hashes each k-gram with an md5
    * prefix (DuckDB-exact) and selects window minima with array built-ins,
    * emitting every fingerprint of the first 50 docs for hash compare.
    * The native graft.functions.Winnow expression stays the production
    * path (dq06): its rolling hash + monotonic deque is O(n) per doc vs
    * this variant's O(n·w) — WinnowSpec proves that path's guarantee. */
  val dq06bWinnowPortable: QueryDef = {
    val k = 8
    val w = 16
    sqlChecked(
      "dq06b_winnow_portable",
      s"""WITH d AS (
         |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
         |  FROM documents WHERE doc_id < 50),
         |g AS (
         |  SELECT doc_id, list_transform(range(len(s) - ${k - 1}),
         |    i -> CAST(('0x' || substring(md5(substring(s, i + 1, $k)), 1, 8)) AS BIGINT)) AS hs
         |  FROM d WHERE len(s) >= ${w + k - 1}),
         |f AS (
         |  SELECT doc_id, list_sort(list_distinct(list_transform(range(len(hs) - ${w - 1}),
         |    j -> list_min(hs[j + 1 : j + $w])))) AS fps
         |  FROM g)
         |SELECT doc_id, unnest(fps) AS fp FROM f
         |ORDER BY doc_id, fp""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val s = Shingles.normalized($"text")
      val hs = transform(sequence(lit(0), length(s) - k),
        i => conv(substring(md5(s.substr(i + lit(1), lit(k))), 1, 8), 16, 10).cast("long"))
      Tables.fanOut(spark, Tables.documents(spark, dir))
        .filter($"doc_id" < 50)
        .filter(length(s) >= w + k - 1)
        .select($"doc_id", hs.as("hs"))
        .select($"doc_id", explode(array_sort(array_distinct(
          transform(sequence(lit(0), size($"hs") - w),
            j => array_min(slice($"hs", j + lit(1), lit(w))))))).as("fp"))
        .orderBy($"doc_id", $"fp")
    }
  }

  /** Winnowing rolling-hash fingerprints (graft.functions.Winnow, the
    * MOSS algorithm): near-dup candidates = pairs sharing fingerprints,
    * found by an equi-join on the fingerprint — never all-pairs. Hot
    * fingerprints (k-grams common to > 20 docs, the stop-gram analogue)
    * are dropped before pairing so one boilerplate phrase can't quadratic
    * a bucket. rowsOnly: the hash isn't oracle-portable (WinnowSpec proves
    * the guarantee + planted near-dups). */
  val dq06WinnowFingerprints: QueryDef = rowsOnly("dq06_winnow_fingerprints") { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"doc_id",
        graft.functions.Winnow(Shingles.normalized($"text"), 8, 16).as("fps"))
      .cache() // consumed three times: explode, both rerank sides
    val ex = docs.select($"doc_id", explode($"fps").as("fp"))
    // stop-fingerprints gate CANDIDATE GENERATION only (a gram common to
    // > 20 docs can't quadratic a bucket); the verify step below uses the
    // FULL fingerprint sets, so dropping hot grams costs no recall as long
    // as a near-dup pair shares one rare gram
    val rare = ex.groupBy($"fp").agg(count(lit(1)).as("df")).filter($"df" <= 20)
    val exr = ex.join(rare, Seq("fp"), "left_semi")
    val cand = exr.as("a")
      .join(exr.as("b"), $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_shared_rare"))
      .filter($"n_shared_rare" >= 2) // one shared rare gram is coincidence-prone
      .select($"doc_a", $"doc_b")
    // rerank candidates on full sets: |A ∩ B| / min(|A|, |B|)
    val pairs = cand
      .join(docs.select($"doc_id".as("doc_a"), $"fps".as("fps_a")), Seq("doc_a"))
      .join(docs.select($"doc_id".as("doc_b"), $"fps".as("fps_b")), Seq("doc_b"))
      .withColumn("shared", size(array_intersect($"fps_a", $"fps_b")))
      .withColumn("overlap",
        $"shared" / least(size($"fps_a"), size($"fps_b")).cast("double"))
    val docStats = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(size($"fps")).as("avg_fp_per_doc"))
    docStats.crossJoin(
      pairs.agg(
        count(lit(1)).as("n_candidate_pairs"),
        count(when($"overlap" >= 0.5, 1)).as("n_near_dups"),
        coalesce(max($"overlap"), lit(0.0)).as("max_overlap")))
  }

  /** Benchmark decontamination: flag corpus documents sharing any 8-gram
    * shingle with an eval/benchmark set (stand-in: doc_id % 7 == 3) —
    * the pre-training hygiene pass that keeps eval answers out of the
    * training mix. 8-grams, not 3-grams: a long-gram match is copied
    * text, not shared phrasing.
    *
    * Scale shape: the eval set is small and bounded, so its exploded
    * shingle set BROADCASTS; the corpus side streams through a map-side
    * hash join — no shuffle of the 100 TB side, no candidate explosion.
    * Oracle: DuckDB recomputes the same shingle join with list
    * comprehensions. */
  /** Shared oracle for dq07/dq07b: the Bloom variant's pre-filter has no
    * false negatives and the exact confirm join removes false positives,
    * so both must produce the identical answer. */
  private val decontaminateOracle =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(w) - 7),
      |      i -> array_to_string(w[i+1:i+8], ' '))) AS shingles
      |  FROM toks WHERE len(w) >= 8),
      |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh),
      |ev AS (SELECT doc_id AS eval_doc, sh FROM ex WHERE doc_id % 7 = 3),
      |corpus AS (SELECT doc_id AS corpus_doc, sh FROM ex WHERE doc_id % 7 <> 3),
      |hits AS (
      |  SELECT corpus_doc, eval_doc FROM corpus JOIN ev USING (sh))
      |SELECT COUNT(DISTINCT corpus_doc) AS n_contaminated,
      |  COUNT(DISTINCT eval_doc) AS n_eval_hit,
      |  COUNT(*) AS n_hits
      |FROM hits""".stripMargin

  /** Exploded (doc_id, 8-gram shingle) rows plus the eval/corpus split
    * used by both decontamination variants. */
  private def contaminationSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val ex = Tables.fanOut(spark, Tables.documents(spark, dir))
      .withColumn("toks", Shingles.tokens($"text"))
      .filter(size($"toks") >= 8)
      .select($"doc_id", explode(Shingles.shinglesN($"toks", 8)).as("sh"))
    (ex.filter($"doc_id" % 7 === 3).select($"doc_id".as("eval_doc"), $"sh"),
     ex.filter($"doc_id" % 7 =!= 3).select($"doc_id".as("corpus_doc"), $"sh"))
  }

  val dq07Decontaminate: QueryDef = QueryDef.sqlChecked(
    "dq07_decontaminate", decontaminateOracle) { (spark, dir) =>
    import spark.implicits._
    val (ev, corpus) = contaminationSides(spark, dir)
    corpus.join(broadcast(ev), Seq("sh"))
      .agg(
        countDistinct($"corpus_doc").as("n_contaminated"),
        countDistinct($"eval_doc").as("n_eval_hit"),
        count(lit(1)).as("n_hits"))
  }

  /** dq07 with a Bloom pre-filter on the corpus side — the shape for when
    * the eval suite's shingle SET no longer broadcasts as strings but its
    * Bloom bitset does (~10 bits/item vs ~50 B/shingle, a 40× reduction).
    * One mergeable filter is built over the distinct eval shingles
    * (partial filters OR-merge inside `DataFrameStatFunctions
    * .bloomFilter` — public `org.apache.spark.util.sketch.BloomFilter`
    * API), broadcast once, and probed map-side so ~(1 - hit_rate - fpp)
    * of the 100 TB corpus's shingles die BEFORE the confirm join's
    * exchange. Bloom filters have no false negatives and the exact join
    * removes false positives, hence the oracle is dq07's verbatim. The
    * probe is a native codegen'd expression (functions/BloomProbe) over
    * the broadcast filter — no ScalaUDF boxing in the corpus-scan hot
    * path, whole-stage codegen stays fused; the confirm join is
    * deliberately NOT hint-broadcast: at scale it is a shuffle join whose
    * left input the Bloom filter has already decimated. */
  val dq07bDecontaminateBloom: QueryDef = QueryDef.sqlChecked(
    "dq07b_decontaminate_bloom", decontaminateOracle) { (spark, dir) =>
    import spark.implicits._
    val (ev0, corpus) = contaminationSides(spark, dir)
    val ev = ev0.cache() // consumed twice: filter build + confirm join
    val distinctEval = ev.select($"sh").distinct()
    val expected = math.max(distinctEval.count(), 1L)
    val bloom = distinctEval.stat.bloomFilter("sh", expected, 0.01)
    val bloomB = spark.sparkContext.broadcast(bloom)
    corpus.filter(graft.functions.BloomProbe.mightContain(bloomB, $"sh"))
      .join(ev, Seq("sh"))
      .agg(
        countDistinct($"corpus_doc").as("n_contaminated"),
        countDistinct($"eval_doc").as("n_eval_hit"),
        count(lit(1)).as("n_hits"))
  }

  /** Incremental-ingest dedup: a new batch (stand-in: the top fifth of
    * doc_ids) is deduped AGAINST the historical corpus by content digest
    * — the day-2 shape of every training-data pipeline (the corpus is
    * only ever deduped once; each ingest then anti-joins the history).
    * Only 32-byte digests move: the history side is a digest projection,
    * the anti-join shuffles hashes, and document bodies stay put. Batch
    * rows also dedup within themselves (keep-first) before the history
    * check, so a doc duplicated inside the batch counts once.
    *
    * Canonical form: sha256 of the SORTED DISTINCT token set (bag of
    * words) rather than dq01's whitespace-normalized text — order- and
    * repetition-insensitive, so shuffled/near-reordered copies unify
    * (this corpus's planted near-dups do: the history check genuinely
    * fires — 12 batch groups dropped vs history + 4 in-batch at
    * sf0.01). The oracle cut uses FLOOR before the BIGINT cast because
    * DuckDB's CAST rounds to nearest while Spark's non-ANSI cast
    * truncates. */
  val dq08IncrementalDedup: QueryDef = sqlChecked(
    "dq08_incremental_dedup",
    """WITH bounds AS (SELECT CAST(FLOOR(max(doc_id) * 0.8) AS BIGINT) AS cut FROM documents),
      |h AS (
      |  SELECT doc_id, lang,
      |    sha256(array_to_string(list_sort(list_distinct(
      |      string_split_regex(lower(text), '\s+'))), ' ')) AS h
      |  FROM documents),
      |hist AS (SELECT DISTINCT h FROM h, bounds WHERE doc_id < cut),
      |batch AS (
      |  SELECT h, lang, min(doc_id) AS keep_id, COUNT(*) AS n_in_batch
      |  FROM h, bounds WHERE doc_id >= cut GROUP BY h, lang),
      |kept AS (
      |  SELECT lang, n_in_batch,
      |    NOT EXISTS (SELECT 1 FROM hist WHERE hist.h = batch.h) AS fresh
      |  FROM batch)
      |SELECT lang,
      |  CAST(SUM(n_in_batch) AS BIGINT) AS n_batch_rows,
      |  COUNT(*) FILTER (WHERE fresh) AS n_kept,
      |  COUNT(*) FILTER (WHERE NOT fresh) AS n_dropped_vs_history,
      |  CAST(SUM(n_in_batch - 1) AS BIGINT) AS n_dropped_in_batch
      |FROM kept
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val h = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        sha2(concat_ws(" ",
          array_sort(array_distinct(split(lower($"text"), "\\s+")))), 256).as("h"))
    // cut stays a broadcast 1-row frame, not a driver collect — the split
    // point is data-derived without leaving the executors
    val bounds = h.agg((max($"doc_id") * 0.8).cast("long").as("cut"))
    val hb = h.crossJoin(broadcast(bounds))
    val hist = hb.filter($"doc_id" < $"cut").select($"h").distinct()
    val batch = hb.filter($"doc_id" >= $"cut")
      .groupBy($"h", $"lang")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_in_batch"))
    val checked = batch.join(hist, Seq("h"), "left_anti")
      .select($"lang", $"n_in_batch", lit(true).as("fresh"))
      .unionByName(
        batch.join(hist, Seq("h"), "left_semi")
          .select($"lang", $"n_in_batch", lit(false).as("fresh")))
    checked
      .groupBy($"lang")
      .agg(
        sum($"n_in_batch").cast("long").as("n_batch_rows"),
        count(when($"fresh", 1)).as("n_kept"),
        count(when(!$"fresh", 1)).as("n_dropped_vs_history"),
        sum($"n_in_batch" - 1).cast("long").as("n_dropped_in_batch"))
      .orderBy($"lang")
  }

  /** Duplicate-cluster resolution: near-dup PAIRS (3-gram Jaccard ≥ 0.5,
    * dq05's candidate machinery) collapsed into duplicate GROUPS via
    * connected components (operators/ConnectedComponents) — dedup must
    * respect the transitive closure: a~b and b~c keep ONE of {a,b,c}
    * even though a~c was never paired (the fixture genuinely contains
    * size-3 chains). Oracle: DuckDB recomputes the components with a
    * recursive CTE — an exact cross-engine check of the distributed
    * fixpoint. */
  val dq09DupClusters: QueryDef = sqlChecked(
    "dq09_dup_clusters",
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
      |cl AS (SELECT component, COUNT(*) AS c FROM comp GROUP BY component)
      |SELECT COUNT(*) AS n_clusters,
      |  CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_docs_in_clusters,
      |  CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_cluster_size
      |FROM cl""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // Plan (semantics unchanged vs the oracle's all-pairs recursive CTE;
    // measured on the 10× ScaleProbe replica, where the naive
    // shingle-bucket self-join was 21 s of dq09's 25 s wall):
    //  1. EXACT collapse first: identical shingle SETS are Jaccard-1
    //     duplicates of each other and have identical Jaccard to every
    //     other doc, so each set-class joins as ONE representative
    //     carrying its multiplicity. Without this, k identical copies
    //     inflate every candidate bucket k× and the pair join k²× — the
    //     real-corpus version of the pathology is boilerplate/mirror
    //     pages, and exact-dedup-before-near-dup is the standard
    //     pipeline order for exactly this reason.
    //  2. The exact shingle-bucket join + Jaccard filter then runs over
    //     REPRESENTATIVES only (a prefix-filtered PPJoin variant was
    //     measured slower here: its candidate set — 408k pairs for 5k
    //     reps at the weak t=0.5 prefix bound — made the exact-verify
    //     join cost more than the full bucket join it avoided).
    //  3. Components over representative pairs, then multiplicity
    //     expansion back to doc-level cluster stats.
    val base = shingled(spark, dir)
    // the SORTED shingle array is itself the set-identity group key (no
    // hashing pass needed — Spark group-bys on array columns directly),
    // and doubles as the per-group shingle set downstream
    val groups = base
      .groupBy(array_sort($"shingles").as("shingles"))
      .agg(min($"doc_id").as("rep"), count(lit(1)).as("gsz"))
      .cache()
    val ex = groups.select($"rep", explode($"shingles").as("sh"))
    val szr = groups.select($"rep", size($"shingles").as("szv"))
    val pairs = ex.as("a")
      .join(ex.as("b"), $"a.sh" === $"b.sh" && $"a.rep" < $"b.rep")
      .groupBy($"a.rep".as("rep_a"), $"b.rep".as("rep_b"))
      .agg(count(lit(1)).as("inter"))
      .join(szr.select($"rep".as("rep_a"), $"szv".as("sz_a")), Seq("rep_a"))
      .join(szr.select($"rep".as("rep_b"), $"szv".as("sz_b")), Seq("rep_b"))
      .filter($"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter") >= 0.5)
      .select($"rep_a", $"rep_b")
    val comps = graft.operators.ConnectedComponents.components(pairs)
    // every member of a set-class lands in its representative's
    // component; a class of ≥ 2 docs is a cluster even with no
    // cross-class edge (its members are mutual exact dups), labeled by
    // its min doc_id = rep, which is exactly the oracle's min-label
    val labeled = groups
      .join(comps, groups("rep") === comps("vertex"), "left")
      .withColumn("cluster",
        coalesce($"component", when($"gsz" >= 2, $"rep")))
      .filter($"cluster".isNotNull)
    labeled.groupBy($"cluster").agg(sum($"gsz").as("c"))
      .agg(
        count(lit(1)).as("n_clusters"),
        coalesce(sum($"c"), lit(0)).cast("long").as("n_docs_in_clusters"),
        coalesce(max($"c"), lit(0)).cast("long").as("max_cluster_size"))
  }

  /** Passage-level dedup — finer-grained than whole-document dedup: the
    * corpus is split into non-overlapping 16-token passages, and only
    * the FIRST occurrence (by doc_id, then chunk position) of each
    * distinct passage is retained; repeats anywhere else in the corpus
    * (boilerplate, quoted text, licence headers) are dropped.
    *
    * 100 TB shape: the dedup window partitions by the passage's sha256
    * DIGEST, not its text — Catalyst prunes the passage column before the
    * exchange, so the shuffle carries 32-byte keys plus row metadata,
    * never passage bodies. The oracle partitions by the raw text; the
    * results agree up to sha256 collision (none). */
  val dq10PassageDedup: QueryDef = sqlChecked(
    "dq10_passage_dedup",
    """WITH toks AS (
      |  SELECT lang, doc_id, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |idx AS (
      |  SELECT lang, doc_id, w,
      |    unnest(range(CAST(CEIL(len(w) / 16.0) AS BIGINT))) AS ci
      |  FROM toks),
      |pas AS (
      |  SELECT lang, doc_id, ci,
      |    array_to_string(w[ci * 16 + 1 : LEAST(ci * 16 + 16, len(w))], ' ') AS passage
      |  FROM idx),
      |ranked AS (
      |  SELECT lang, passage,
      |    row_number() OVER (PARTITION BY passage ORDER BY doc_id, ci) AS rn
      |  FROM pas)
      |SELECT lang, COUNT(*) AS n_passages,
      |  COUNT(*) FILTER (rn = 1) AS n_retained,
      |  COUNT(*) FILTER (rn > 1) AS n_dropped
      |FROM ranked
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val pas = Tables.documents(spark, dir)
      .select($"lang", $"doc_id", split(lower($"text"), "\\s+").as("w"))
      .withColumn("n", size($"w").cast("long"))
      .select($"lang", $"doc_id", $"w",
        explode(sequence(lit(0L), ceil($"n" / lit(16.0)).cast("long") - 1L)).as("ci"))
      .select($"lang", $"doc_id", $"ci",
        concat_ws(" ", slice($"w", ($"ci" * 16L + 1L).cast("int"), lit(16))).as("passage"))
      .withColumn("fp", sha2($"passage", 256))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"fp").orderBy($"doc_id", $"ci")
    pas.withColumn("rn", row_number().over(w))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_passages"),
        count(when($"rn" === 1, 1)).as("n_retained"),
        count(when($"rn" > 1, 1)).as("n_dropped"))
      .orderBy($"lang")
  }

  /** Blocked fuzzy join (entity resolution): find record pairs whose
    * names are within Levenshtein distance 1 WITHOUT the all-pairs
    * quadratic. Candidate generation is trigram blocking: a single edit
    * destroys at most 3 positional trigrams, so any two strings of
    * length ≥ 6 within distance 1 still SHARE a trigram — the equi-join
    * on trigrams is provably lossless for this radius, and the exact
    * Levenshtein check runs only inside blocks. The oracle is the brute
    * force: every pair over the same bounded universe, so a blocking bug
    * that loses a candidate is a hash mismatch, not a silent recall dip.
    * The universe plants a deterministic typo of every name (one char
    * dropped at a key-derived position) — every original must pair with
    * its typo, plus whatever genuine near-collisions the catalog has. */
  val dq11FuzzyJoin: QueryDef = sqlChecked(
    "dq11_fuzzy_join",
    """WITH base AS (
      |  SELECT p_partkey AS id, p_name AS nm FROM part WHERE p_partkey < 500),
      |typo AS (
      |  SELECT id + 100000 AS id,
      |    substr(nm, 1, (id % 5) + 2) || substr(nm, (id % 5) + 4) AS nm
      |  FROM base),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM typo)
      |SELECT a.id AS i, b.id AS j, CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
      |FROM u a JOIN u b ON a.id < b.id
      |WHERE levenshtein(a.nm, b.nm) <= 1
      |ORDER BY i, j""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val base = Tables.part(spark, dir)
      .filter($"p_partkey" < 500)
      .select($"p_partkey".as("id"), $"p_name".as("nm"))
    // drop one char at a key-derived position (1-based pos = id%5 + 3,
    // always interior for names of length >= 7)
    val typo = base.select(($"id" + 100000L).as("id"),
      expr("concat(substr(nm, 1, (id % 5) + 2), substr(nm, (id % 5) + 4))").as("nm"))
    val u = base.unionByName(typo)
    // blocking: distinct positional trigrams per name; an equi-join on the
    // trigram replaces the 1M-pair cross product with shared-gram blocks
    val grams = u.select($"id", $"nm",
      explode(array_distinct(expr(
        "transform(sequence(1, length(nm) - 2), i -> substring(nm, i, 3))")))
        .as("g"))
    val cands = grams.select($"g", $"id".as("i"), $"nm".as("nmi"))
      .join(grams.select($"g", $"id".as("j"), $"nm".as("nmj")), Seq("g"))
      .filter($"i" < $"j")
      .select($"i", $"j", $"nmi", $"nmj")
      .distinct()
    cands
      .filter(levenshtein($"nmi", $"nmj") <= 1)
      .select($"i", $"j", levenshtein($"nmi", $"nmj").cast("long").as("dist"))
      .orderBy($"i", $"j")
  }

  /** Per-document duplicate-cluster label over the SAME graph dq09
    * resolves (3-gram Jaccard >= 0.5 near-dup edges, exact dups
    * collapsed to set-class representatives first): every doc maps to
    * the min doc_id of its connected component, unclustered docs to
    * themselves. This is the grouping key leakage-free splitting needs —
    * any split keyed on it can never separate two near-duplicates. */
  def dupClusterLabels(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .withColumn("toks", Shingles.tokens($"text"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", Shingles.shingles3($"toks").as("shingles"))
    val groups = base
      .groupBy(array_sort($"shingles").as("shingles"))
      .agg(min($"doc_id").as("rep"), collect_list($"doc_id").as("members"))
      .cache()
    val ex = groups.select($"rep", explode($"shingles").as("sh"))
    val szr = groups.select($"rep", size($"shingles").as("szv"))
    val pairs = ex.as("a")
      .join(ex.as("b"), $"a.sh" === $"b.sh" && $"a.rep" < $"b.rep")
      .groupBy($"a.rep".as("rep_a"), $"b.rep".as("rep_b"))
      .agg(count(lit(1)).as("inter"))
      .join(szr.select($"rep".as("rep_a"), $"szv".as("sz_a")), Seq("rep_a"))
      .join(szr.select($"rep".as("rep_b"), $"szv".as("sz_b")), Seq("rep_b"))
      .filter($"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter") >= 0.5)
      .select($"rep_a", $"rep_b")
    val comps = graft.operators.ConnectedComponents.components(pairs)
    // members of a set-class inherit their representative's component;
    // min-over-reps = min-over-docs because every rep is already the min
    // of its class
    val mapping = groups.select($"rep", explode($"members").as("doc_id"))
    mapping.join(comps, mapping("rep") === comps("vertex"), "left")
      .select($"doc_id", coalesce($"component", $"rep").as("label"))
  }

  /** Exact substring dedup (Lee et al. 2022 arXiv:2107.06499): maximal
    * spans of >= 8 consecutive tokens occurring more than once anywhere
    * in the corpus, summarized per document. The distributed shape is an
    * n-gram inverted index + gaps-and-islands merge (see
    * graft.dedup.SubstringDedup); the oracle replays it over gram TEXT
    * (the Spark side shuffles 64-bit xxhash64 keys instead — identical
    * up to hash collision, and a collision can only add a span, the
    * conservative direction for dedup). */
  val dq12SubstringDedup: QueryDef = sqlChecked(
    "dq12_substring_dedup",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, w,
      |    unnest(generate_series(0, len(w) - 8)) AS pos
      |  FROM t WHERE len(w) >= 8),
      |grams AS (
      |  SELECT doc_id, n_tokens, pos,
      |    array_to_string(w[pos + 1 : pos + 8], ' ') AS gram
      |  FROM occ),
      |dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
      |dp AS (SELECT g.doc_id, g.n_tokens, g.pos
      |       FROM grams g JOIN dup USING (gram)),
      |lagd AS (
      |  SELECT doc_id, n_tokens, pos,
      |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |  FROM dp),
      |isl AS (
      |  SELECT doc_id, n_tokens, pos,
      |    SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS UNBOUNDED PRECEDING) AS island
      |  FROM lagd),
      |spans AS (
      |  SELECT doc_id, n_tokens, island, MIN(pos) AS s, MAX(pos) + 7 AS e
      |  FROM isl GROUP BY 1, 2, 3)
      |SELECT doc_id, COUNT(*) AS n_spans,
      |  CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
      |  CAST(MAX(e - s + 1) AS BIGINT) AS max_span,
      |  n_tokens
      |FROM spans GROUP BY doc_id, n_tokens
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.dedup.SubstringDedup.perDoc(
      Tables.fanOut(spark, Tables.documents(spark, dir)), k = 8)
  }

  /** Semantic decontamination: the embedding-space sibling of dq07's exact
    * n-gram check. A bounded held-out eval set (vec_id < 20 stands in for
    * a benchmark's embeddings) is broadcast against the corpus; a corpus
    * item whose max cosine to ANY eval vector clears 0.8 is contaminated —
    * paraphrased leakage that exact n-gram overlap misses (per the SemDeDup
    * / DataComp decontamination recipe).
    *
    * Scale shape: identical to sq01 — broadcast the BOUNDED eval side,
    * stream the corpus (BroadcastNestedLoopJoin, never a shuffle of N);
    * per-item max-aggregation collapses before any shuffle. Cosines are
    * rounded to 6 dp BEFORE the max (ulp shield), so the oracle's floats
    * can't flip the flag or the ranking. */
  val dq13SemanticDecontam: QueryDef = sqlChecked(
    "dq13_semantic_decontam",
    """WITH ev AS (SELECT vec_id AS eid, CAST(embedding AS DOUBLE[]) AS evv
      |           FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
      |      FROM embeddings WHERE vec_id >= 20),
      |s AS (SELECT vec_id, MAX(round(list_cosine_similarity(cv, evv), 6)) AS max_cos
      |      FROM c, ev GROUP BY vec_id)
      |SELECT vec_id, max_cos, max_cos >= 0.8 AS contaminated
      |FROM s
      |ORDER BY max_cos DESC, vec_id
      |LIMIT 100""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.similarity.VectorOps.{cosine, toDouble}
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", toDouble($"embedding").as("v"))
    val ev = emb.filter($"vec_id" < 20).select($"vec_id".as("eid"), $"v".as("evv"))
    emb.filter($"vec_id" >= 20).select($"vec_id", $"v".as("cv"))
      .crossJoin(broadcast(ev))
      .groupBy($"vec_id")
      .agg(max(round(cosine($"cv", $"evv"), 6)).as("max_cos"))
      .withColumn("contaminated", $"max_cos" >= 0.8)
      .orderBy($"max_cos".desc, $"vec_id")
      .limit(100)
  }

  /** CCNet-style cross-document line deduplication (Wenzek et al. 2020,
    * arXiv:1911.00359 §3.1): a line appearing in ≥ 10 DISTINCT documents
    * is boilerplate (navigation, cookie banners, newsletter prompts) and
    * is removed from every document, with per-lang accounting of what the
    * pass removed. Runs over the shared webified corpus (WebCorpus) whose
    * planted newsletter line 1 doc in 4 carries — and also catches the
    * corpus's REAL cross-doc boilerplate (clone-heavy 8-token chunks).
    *
    * 100 TB shape (CCNet's own): the exchange carries md5 DIGESTS (16
    * bytes) + doc_id, never line bodies; the doc-frequency table shrinks
    * to heavy hitters after the HAVING, so the verdict join's build side
    * is boilerplate-sized and broadcasts. Per-doc rollup happens before
    * the per-lang rollup, so no multi-countDistinct EXPAND touches the
    * exploded lines. */
  val dq14LineDedup: QueryDef = sqlChecked(
    "dq14_line_dedup",
    s"""WITH ${WebCorpus.linesSql},
       |ex AS (SELECT doc_id, lang, unnest(lines) AS line FROM webl),
       |freq AS (SELECT md5(line) AS dig, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY 1),
       |boiler AS (SELECT dig FROM freq WHERE df >= 10),
       |v AS (SELECT doc_id, lang, line,
       |  md5(line) IN (SELECT dig FROM boiler) AS is_boiler FROM ex),
       |perdoc AS (
       |  SELECT lang, doc_id, COUNT(*) AS n_lines,
       |    COUNT(*) FILTER (is_boiler) AS n_drop,
       |    CAST(SUM(CASE WHEN is_boiler THEN len(line) ELSE 0 END) AS BIGINT) AS chars_drop
       |  FROM v GROUP BY lang, doc_id),
       |langagg AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(n_lines) AS BIGINT) AS lines_total,
       |    CAST(SUM(n_drop) AS BIGINT) AS lines_dropped,
       |    CAST(SUM(chars_drop) AS BIGINT) AS chars_dropped,
       |    CAST(SUM(n_lines - n_drop) AS BIGINT) AS lines_kept,
       |    COUNT(*) FILTER (n_drop > 0) AS docs_affected
       |  FROM perdoc GROUP BY lang),
       |bdist AS (
       |  SELECT lang, COUNT(DISTINCT md5(line)) AS boiler_lines_distinct
       |  FROM v WHERE is_boiler GROUP BY lang)
       |SELECT l.lang, n_docs, lines_total, lines_dropped, chars_dropped, lines_kept,
       |  docs_affected, COALESCE(boiler_lines_distinct, 0) AS boiler_lines_distinct
       |FROM langagg l LEFT JOIN bdist b ON l.lang = b.lang
       |ORDER BY l.lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ex = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        explode(WebCorpus.webLines($"doc_id", $"text")).as("line"))
      .withColumn("dig", md5($"line"))
    // line bodies are pruned before the doc-frequency shuffle: only
    // (dig, doc_id) reaches the exchange, and only heavy hitters
    // survive. The survivor set is boilerplate-sized, so MATERIALIZE it
    // (eager localCheckpoint): both verdict joins below reuse it instead
    // of re-running the df aggregation — plan audit showed 4 corpus
    // scans without this, 2 with. The remaining two scans are the
    // deliberate cache-vs-rescan call (tq33's): ex is the exploded
    // corpus with bodies; at 100 TB rescanning beats caching it.
    val boiler = ex.select($"dig", $"doc_id").distinct()
      .groupBy($"dig").agg(count(lit(1)).as("df"))
      .filter($"df" >= 10)
      .select($"dig".as("bdig"))
      .localCheckpoint()
    val v = ex.join(broadcast(boiler), $"dig" === $"bdig", "left")
      .withColumn("is_boiler", $"bdig".isNotNull)
    val perDoc = v.groupBy($"lang", $"doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when($"is_boiler", 1)).as("n_drop"),
        sum(when($"is_boiler", length($"line")).otherwise(0)).cast("long").as("chars_drop"))
    val langAgg = perDoc.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_lines").cast("long").as("lines_total"),
        sum($"n_drop").cast("long").as("lines_dropped"),
        sum($"chars_drop").cast("long").as("chars_dropped"),
        sum($"n_lines" - $"n_drop").cast("long").as("lines_kept"),
        count(when($"n_drop" > 0, 1)).as("docs_affected"))
    val bDist = v.filter($"is_boiler")
      .groupBy($"lang").agg(countDistinct($"dig").as("bld"))
    langAgg.join(bDist, Seq("lang"), "left")
      .withColumn("boiler_lines_distinct", coalesce($"bld", lit(0L)))
      .drop("bld")
      .orderBy($"lang")
  }

  /** URL canonicalization + dedup — the first dedup pass every web-crawl
    * corpus gets (the same page arrives under scheme/host case variants,
    * default ports, trailing slashes, tracking params, reordered query
    * strings, and fragments). The normalizer: lowercase scheme+host,
    * strip `www.`, drop default ports (443/https, 80/http), strip the
    * fragment, collapse the trailing slash, drop `utm_*`/`fbclid`/`gclid`
    * params, and SORT the surviving query params. The fixture corpus has
    * no URL column, so BOTH engines derive the same deterministic URL
    * universe from `documents`: two variants per doc that must collapse
    * to one canonical form (every normalizer rule exercised), plus a
    * genuinely distinct third URL for every third doc that must survive.
    * Counts + min/max canonical strings hash-check the normalizer
    * end to end.
    *
    * 100 TB: pure map-side string work until the per-source aggregate;
    * the dedup key is the canonical string (in production, its digest —
    * dq01's shuffle-digests-not-bodies rule applies unchanged). */
  val dq15UrlDedup: QueryDef = sqlChecked(
    "dq15_url_dedup",
    """WITH raw AS (
      |  SELECT doc_id, source,
      |    'https://www.' || source || '.example.com/' || lang || '/doc/' || doc_id ||
      |      '?id=' || doc_id || '&ref=home' AS url
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, source,
      |    'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM:443/' || lang || '/doc/' || doc_id ||
      |      '/?utm_source=feed&ref=home&id=' || doc_id || '#frag' AS url
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, source,
      |    'http://' || source || '.example.com/' || lang || '/doc/' || doc_id ||
      |      '?id=' || doc_id || '&page=2' AS url
      |  FROM documents WHERE doc_id % 3 = 0),
      |p1 AS (
      |  SELECT source,
      |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      |    regexp_extract(url, '^[A-Za-z]+://([^#]*)', 1) AS rest
      |  FROM raw),
      |p2 AS (
      |  SELECT source, scheme,
      |    regexp_extract(rest, '^([^/?]+)', 1) AS hostport,
      |    substr(rest, length(regexp_extract(rest, '^([^/?]+)', 1)) + 1) AS pathq
      |  FROM p1),
      |p3 AS (
      |  SELECT source, scheme,
      |    regexp_replace(lower(regexp_extract(hostport, '^([^:]+)', 1)), '^www\.', '') AS host,
      |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      |    regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') AS path_c,
      |    regexp_extract(pathq, '\?(.*)$', 1) AS qstr
      |  FROM p2),
      |canon AS (
      |  SELECT source,
      |    scheme || '://' || host ||
      |    CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443')
      |        OR (scheme = 'http' AND port = '80'))
      |      THEN ':' || port ELSE '' END ||
      |    path_c ||
      |    CASE WHEN q <> '' THEN '?' || q ELSE '' END AS curl
      |  FROM (SELECT *,
      |      array_to_string(list_sort(list_filter(string_split(qstr, '&'),
      |        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid)='))), '&') AS q
      |    FROM p3))
      |SELECT source, COUNT(*) AS n_raw,
      |  COUNT(DISTINCT curl) AS n_canonical,
      |  COUNT(*) - COUNT(DISTINCT curl) AS n_dropped,
      |  MIN(curl) AS min_url, MAX(curl) AS max_url
      |FROM canon GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source", $"lang")
    val u1 = docs.select($"doc_id", $"source",
      concat(lit("https://www."), $"source", lit(".example.com/"), $"lang",
        lit("/doc/"), $"doc_id", lit("?id="), $"doc_id", lit("&ref=home")).as("url"))
    val u2 = docs.select($"doc_id", $"source",
      concat(lit("HTTPS://WWW."), upper($"source"), lit(".EXAMPLE.COM:443/"), $"lang",
        lit("/doc/"), $"doc_id", lit("/?utm_source=feed&ref=home&id="), $"doc_id",
        lit("#frag")).as("url"))
    val u3 = docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"source",
      concat(lit("http://"), $"source", lit(".example.com/"), $"lang",
        lit("/doc/"), $"doc_id", lit("?id="), $"doc_id", lit("&page=2")).as("url"))
    val raw = u1.unionByName(u2).unionByName(u3)
    // the normalizer itself lives in dedup/UrlCanon (reused by ingest
    // paths; UrlCanonSpec covers the rules this planted universe
    // doesn't reach — http:80 drop, non-default port retention)
    val canon = raw.select($"source",
      graft.dedup.UrlCanon.canonical($"url").as("curl"))
    canon.groupBy($"source").agg(
        count(lit(1)).as("n_raw"),
        countDistinct($"curl").as("n_canonical"),
        (count(lit(1)) - countDistinct($"curl")).as("n_dropped"),
        min($"curl").as("min_url"),
        max($"curl").as("max_url"))
      .orderBy($"source")
  }

  /** Containment dedup (Broder 1997's second resemblance measure):
    * C(A,B) = |S(A)∩S(B)| / min(|S(A)|,|S(B)|) — the asymmetric overlap
    * that catches a SMALL document contained in a big one (quotes,
    * reposts, boilerplate-wrapped excerpts), which Jaccard structurally
    * misses: a 16-shingle excerpt inside a 400-shingle page has J ≈ 0.04
    * but C = 1.0. The fixture corpus has no natural excerpts, so BOTH
    * engines plant one: every 5th doc long enough gains an 18-token
    * prefix snippet as a new doc; every plant must come back with
    * containment 1.0 (n_planted_recovered is part of the hash).
    *
    * Scale shape is dq03/dq09's adaptive-collapse discipline applied to
    * a pair-count query: identical shingle SETS collapse to one class
    * (md5 of the sorted set as the class key) BEFORE the shared-shingle
    * equi-join, and every count is multiplicity-expanded afterwards
    * (m_a·m_b across classes, C(m,2) within — within-class pairs are
    * containment 1 and Jaccard 1 by construction, so they land in every
    * bucket except contain-only). The naive form probed 17× at 10× on
    * the clone replica; the collapsed form is clone-invariant: class
    * count equals the 1× corpus, yet the EXPANDED counts equal the
    * naive pair counts exactly — the oracle replays the same collapse
    * and the hash pins both the metrics and the expansion algebra.
    * Pair fanout is bounded by shingle document-frequency over CLASSES
    * (hot boilerplate shingles would be df-capped in production, dq14's
    * move); bodies never shuffle, only class reps and 16-byte keys. */
  val dq16ContainmentDedup: QueryDef = sqlChecked(
    "dq16_containment_dedup",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |uni AS (
      |  SELECT doc_id, w FROM toks
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, w[1:18] AS w
      |  FROM toks WHERE doc_id % 5 = 0 AND len(w) >= 18),
      |dc AS MATERIALIZED (
      |  SELECT doc_id, shingles, md5(array_to_string(shingles, chr(1))) AS skey
      |  FROM (
      |    SELECT doc_id,
      |      list_sort(list_distinct(list_transform(range(len(w) - 2),
      |        i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])))) AS shingles
      |    FROM uni WHERE len(w) >= 3)),
      |cls AS MATERIALIZED (
      |  SELECT skey, MIN(doc_id) AS rep, COUNT(*) AS mult FROM dc GROUP BY skey),
      |rsh AS MATERIALIZED (
      |  SELECT c.rep, d.shingles, c.mult
      |  FROM cls c JOIN dc d ON d.doc_id = c.rep),
      |ex AS (SELECT rep, unnest(shingles) AS sh FROM rsh),
      |sz AS (SELECT rep, len(shingles) AS sz, mult FROM rsh),
      |pairs AS (
      |  SELECT a.rep AS rep_a, b.rep AS rep_b, COUNT(*) AS inter
      |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.rep < b.rep
      |  GROUP BY 1, 2),
      |m AS MATERIALIZED (
      |  SELECT rep_a, rep_b, sa.mult * sb.mult AS wt,
      |    CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) AS containment,
      |    CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
      |  FROM pairs
      |  JOIN sz sa ON sa.rep = rep_a
      |  JOIN sz sb ON sb.rep = rep_b),
      |x AS (
      |  SELECT
      |    COALESCE(SUM(wt), 0) AS n_cand,
      |    COALESCE(SUM(wt) FILTER (containment >= 0.8), 0) AS n_c08,
      |    COALESCE(SUM(wt) FILTER (jaccard >= 0.5), 0) AS n_j05,
      |    COALESCE(SUM(wt) FILTER (containment >= 0.8 AND jaccard < 0.5), 0) AS n_conly
      |  FROM m),
      |wi AS (
      |  SELECT COALESCE(SUM(mult * (mult - 1) // 2), 0) AS n_w FROM cls),
      |docrep AS (
      |  SELECT d.doc_id, c.rep FROM dc d JOIN cls c ON d.skey = c.skey),
      |pr AS (
      |  SELECT ro.rep AS rep_o, rs.rep AS rep_s
      |  FROM toks t
      |  JOIN docrep ro ON ro.doc_id = t.doc_id
      |  JOIN docrep rs ON rs.doc_id = t.doc_id + 200000
      |  WHERE t.doc_id % 5 = 0 AND len(t.w) >= 18),
      |prec AS (
      |  SELECT COUNT(*) AS n_planted FROM pr
      |  LEFT JOIN m ON m.rep_a = least(rep_o, rep_s)
      |    AND m.rep_b = greatest(rep_o, rep_s)
      |  WHERE rep_o = rep_s OR m.containment >= 0.999)
      |SELECT
      |  CAST(x.n_cand + wi.n_w AS BIGINT) AS n_candidate_pairs,
      |  CAST(x.n_c08 + wi.n_w AS BIGINT) AS n_contain_08,
      |  CAST(x.n_j05 + wi.n_w AS BIGINT) AS n_jaccard_05,
      |  CAST(x.n_conly AS BIGINT) AS n_contain_only,
      |  CAST(prec.n_planted AS BIGINT) AS n_planted_recovered
      |FROM x, wi, prec""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", split(lower($"text"), "\\s+").as("w"))
    val uni = toks.unionByName(
      toks.filter($"doc_id" % 5 === 0 && size($"w") >= 18)
        .select(($"doc_id" + 200000L).as("doc_id"), slice($"w", 1, 18).as("w")))
    // exact collapse: md5 of the SORTED shingle set is the class key —
    // identical sets are containment/Jaccard 1 regardless of doc identity.
    // fanOut first: the fixture is a single row group and the per-doc
    // shingling below is the expensive projection (dq03's guard)
    val dc = Tables.fanOut(spark, uni.filter(size($"w") >= 3))
      .select($"doc_id", array_sort(Shingles.shingles3($"w")).as("shingles"))
      .withColumn("skey", md5(concat_ws("\u0001", $"shingles")))
      .cache()
    val cls = dc.groupBy($"skey")
      .agg(min($"doc_id").as("rep"), count(lit(1)).as("mult"))
    val rsh = cls.join(dc, dc("doc_id") === cls("rep"))
      .select($"rep", $"shingles", $"mult").cache()
    val ex = rsh.select($"rep", explode($"shingles").as("sh"))
    val sz = rsh.select($"rep", size($"shingles").as("sz"), $"mult")
    val pairs = ex.as("a")
      .join(ex.as("b"), $"a.sh" === $"b.sh" && $"a.rep" < $"b.rep")
      .groupBy($"a.rep".as("rep_a"), $"b.rep".as("rep_b"))
      .agg(count(lit(1)).as("inter"))
    val m = pairs
      .join(sz.select($"rep".as("rep_a"), $"sz".as("sz_a"), $"mult".as("m_a")),
        Seq("rep_a"))
      .join(sz.select($"rep".as("rep_b"), $"sz".as("sz_b"), $"mult".as("m_b")),
        Seq("rep_b"))
      .select($"rep_a", $"rep_b", ($"m_a" * $"m_b").as("wt"),
        ($"inter".cast("double") / least($"sz_a", $"sz_b")).as("containment"),
        ($"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter")).as("jaccard"))
      .cache() // consumed twice: the count rollup + the plant lookup
    val x = m.agg(
      coalesce(sum($"wt"), lit(0L)).as("n_cand"),
      coalesce(sum(when($"containment" >= 0.8, $"wt")), lit(0L)).as("n_c08"),
      coalesce(sum(when($"jaccard" >= 0.5, $"wt")), lit(0L)).as("n_j05"),
      coalesce(sum(when($"containment" >= 0.8 && $"jaccard" < 0.5, $"wt")),
        lit(0L)).as("n_conly"))
    val wi = cls.agg(
      coalesce(sum((($"mult" * ($"mult" - 1)) / 2).cast("long")), lit(0L))
        .as("n_w"))
    val docrep = dc.select($"doc_id", $"skey")
      .join(cls.select($"skey", $"rep"), Seq("skey"))
      .select($"doc_id", $"rep")
    val pr = toks.filter($"doc_id" % 5 === 0 && size($"w") >= 18)
      .select($"doc_id")
      .join(docrep.select($"doc_id", $"rep".as("rep_o")), Seq("doc_id"))
      .join(docrep.select(($"doc_id" - 200000L).as("doc_id"), $"rep".as("rep_s")),
        Seq("doc_id"))
    val prec = pr
      .join(m,
        m("rep_a") === least($"rep_o", $"rep_s") &&
          m("rep_b") === greatest($"rep_o", $"rep_s"),
        "left")
      .filter($"rep_o" === $"rep_s" || $"containment" >= 0.999)
      .agg(count(lit(1)).as("n_planted"))
    x.crossJoin(wi).crossJoin(prec).select(
      ($"n_cand" + $"n_w").as("n_candidate_pairs"),
      ($"n_c08" + $"n_w").as("n_contain_08"),
      ($"n_j05" + $"n_w").as("n_jaccard_05"),
      $"n_conly".as("n_contain_only"),
      $"n_planted".as("n_planted_recovered"))
  }

  val all: Seq[QueryDef] = Seq(
    dq01ExactDedup, dq02DedupKeepFirst, dq03MinhashLsh, dq03bMinhashPortable,
    dq04Simhash, dq04bSimhashPortable, dq06bWinnowPortable,
    dq05NgramJaccard, dq06WinnowFingerprints, dq07Decontaminate,
    dq07bDecontaminateBloom,
    dq08IncrementalDedup, dq09DupClusters, dq10PassageDedup, dq11FuzzyJoin,
    dq12SubstringDedup, dq13SemanticDecontam, dq14LineDedup, dq15UrlDedup,
    dq16ContainmentDedup)
}
