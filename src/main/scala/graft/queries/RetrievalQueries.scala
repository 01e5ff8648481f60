package graft.queries

import graft.QueryDef
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.operators.TopKPerGroup
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus — the lexical-search half of a
  * data-curation stack (the embedding half is SimilarityQueries). BM25 is
  * the standard lexical ranking function (Robertson et al., TREC-3); data
  * pipelines use it for targeted corpus search, retrieval-augmented
  * filtering, and hard-negative mining.
  */
object RetrievalQueries {

  /** BM25 top-5 per query (k1=1.2, b=0.75) against a fixed bounded query
    * set. Shape at 100 TB:
    *
    *  - ONE corpus tokenize+explode produces the per-(doc, term) tf frame,
    *    which is cached and reused for BOTH document frequencies and
    *    scoring — document text never shuffles, only (doc_id, term, tf).
    *  - the query side is bounded (user queries, not data), so query
    *    terms + their df join map-side via broadcast; the corpus-side tf
    *    frame is filtered to query terms BEFORE any exchange, so the
    *    scoring aggregate only sees candidate postings.
    *  - the corpus moment (N, Σdl) is a 1-row broadcast.
    *  - ranking uses the K-bounded typed Aggregator (operators/
    *    TopKPerGroup), not a row_number window: each map task shuffles at
    *    most K candidates per query instead of every posting.
    *
    * Exactness: per-term scores are pure double arithmetic spelled
    * identically in both engines (same IEEE expression tree, ln included);
    * the per-(query, doc) sum goes through DECIMAL(38,18) so partial-sum
    * ORDER cannot perturb the total; the final round(6) is rank key AND
    * output, so ranking is tie-stable across engines (doc_id tiebreak). */
  val sq07Bm25TopK: QueryDef = sqlChecked(
    "sq07_bm25_topk",
    """WITH docs AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |dl AS (SELECT doc_id, len(toks) AS dl, toks FROM docs),
      |tf AS (
      |  SELECT doc_id, dl, unnest(toks) AS term FROM dl),
      |tfc AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, dl
      |  FROM tf GROUP BY doc_id, term, dl),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
      |  FROM dl),
      |dfreq AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY term),
      |q(qid, term) AS (VALUES
      |  (1, 'spark'), (1, 'window'), (1, 'agg'),
      |  (2, 'customer'), (2, 'query'), (2, 'join'),
      |  (3, 'fast'), (3, 'scan'),
      |  (4, 'stream'), (4, 'batch'),
      |  (5, 'sort'), (5, 'merge'), (5, 'table')),
      |parts AS (
      |  SELECT q.qid, t.doc_id,
      |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |      (CAST(t.tf AS DOUBLE) * 2.2) /
      |      (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        (CAST(t.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS ts
      |  FROM tfc t JOIN q ON t.term = q.term JOIN dfreq d ON t.term = d.term, stats s),
      |scored AS (
      |  SELECT qid, doc_id,
      |    round(CAST(SUM(CAST(ts AS DECIMAL(38,18))) AS DOUBLE), 6) AS score
      |  FROM parts GROUP BY qid, doc_id),
      |ranked AS (
      |  SELECT qid, doc_id, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      |  FROM scored)
      |SELECT CAST(qid AS BIGINT) AS qid, doc_id, score, CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val k1 = 1.2
    val b = 0.75
    val queries = Seq(
      (1L, "spark"), (1L, "window"), (1L, "agg"),
      (2L, "customer"), (2L, "query"), (2L, "join"),
      (3L, "fast"), (3L, "scan"),
      (4L, "stream"), (4L, "batch"),
      (5L, "sort"), (5L, "merge"), (5L, "table")).toDF("qid", "term")
    val dl = Tables.documents(spark, dir)
      .select($"doc_id",
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("dl"), $"toks")
    // one corpus explode feeds BOTH df and scoring; cache the posting
    // frame so the second consumer doesn't re-scan the corpus
    val tfc = dl
      .select($"doc_id", $"dl", explode($"toks").as("term"))
      .groupBy($"doc_id", $"term", $"dl")
      .agg(count(lit(1)).as("tf"))
      .cache()
    val stats = dl.agg(
      count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val dfreq = tfc.groupBy($"term").agg(count(lit(1)).as("df"))
    // bounded query side: restrict the vocab-sized df frame to query
    // terms first, then broadcast — the corpus side never shuffles for
    // the join
    val qterms = queries.join(dfreq, Seq("term"))
    val idf = log(lit(1.0) +
      ($"n_docs".cast("double") - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
    // 2.2 as ONE literal (not k1 + 1.0): the runtime sum of two rounded
    // doubles ties exactly halfway between neighbors of 2.2 — spell the
    // same literal both engines parse instead
    val ts = idf * ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) *
        ($"dl".cast("double") / ($"sum_dl".cast("double") / $"n_docs"))))
    val scored = tfc
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .select($"qid", $"doc_id",
        ts.cast(org.apache.spark.sql.types.DecimalType(38, 18)).as("ts"))
      .groupBy($"qid", $"doc_id")
      .agg(round(sum($"ts").cast("double"), 6).as("score"))
    TopKPerGroup.topK(spark, scored, "qid", "score", "doc_id", 5)
      .select($"qid", col("doc_id"), $"score", $"rnk")
      .orderBy($"qid", $"rnk")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04): PageRank
    * over the word co-occurrence graph — nodes are frequent tokens, edges
    * are adjacent-token pairs seen often enough, undirected. The rank runs
    * in the engine's deterministic integer fixed-point PageRank
    * (operators/PageRank.scala), so the final rank units are EXACT BIGINTs
    * and the DuckDB oracle — ten mechanically unrolled join+aggregate
    * iterations of the same integer recurrence — must hash-match them
    * bit for bit. That is the strongest cross-engine check an iterative
    * graph algorithm can get (float PageRank could never hash-compare).
    * Scale: the graph is vocab-sized (Heaps' law), the corpus is scanned
    * twice (token counts, adjacency pairs), and each of the 10 rounds is
    * one vertex-keyed hash join + aggregate on cached vocab-sized frames. */
  val tq19TextrankKeywords: QueryDef = {
    val prologue =
      """WITH toks AS (
        |  SELECT string_split_regex(lower(text), '\s+') AS w FROM documents),
        |uni AS (
        |  SELECT tok, count(*) AS c
        |  FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY tok),
        |nodes AS (SELECT tok FROM uni WHERE c >= 20),
        |pairs AS (
        |  SELECT w[i+1] AS w1, w[i+2] AS w2
        |  FROM (SELECT w, unnest(range(len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 2)),
        |bi AS (
        |  SELECT w1, w2 FROM pairs
        |  WHERE w1 <> w2
        |    AND w1 IN (SELECT tok FROM nodes) AND w2 IN (SELECT tok FROM nodes)
        |  GROUP BY w1, w2 HAVING count(*) >= 3),
        |edges AS (SELECT w1 AS src, w2 AS dst FROM bi
        |          UNION SELECT w2, w1 FROM bi),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
        |verts AS (SELECT DISTINCT src AS vertex FROM edges),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts),
        |b AS (SELECT ((1000000000000 * 15) // 100) // n AS base FROM nv),
        |r0 AS (SELECT v.vertex, 1000000000000 // nv.n AS r
        |       FROM verts v CROSS JOIN nv)""".stripMargin
    val rounds = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT v.vertex, b.base + COALESCE(c.s, 0) AS r
         |  FROM verts v CROSS JOIN b
         |  LEFT JOIN (
         |    SELECT e.dst AS vertex,
         |      CAST(SUM(((p.r // d.deg) * 85) // 100) AS BIGINT) AS s
         |    FROM r${i - 1} p
         |    JOIN edges e ON p.vertex = e.src
         |    JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) c ON c.vertex = v.vertex)""".stripMargin
    }.mkString(",\n")
    val epilogue =
      """SELECT vertex AS tok, CAST(r AS BIGINT) AS rank_units
        |FROM r10 ORDER BY r DESC, tok LIMIT 20""".stripMargin
    sqlChecked(
      "tq19_textrank_keywords",
      s"$prologue,\n$rounds\n$epilogue") { (spark, dir) =>
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
        .select(split(lower($"text"), "\\s+").as("w"))
      val uni = docs.select(explode($"w").as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("c"))
      val nodes = uni.filter($"c" >= 20).select($"tok")
      val pairs = docs.filter(size($"w") >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))"))
          .as("bg"))
        .select($"bg.w1", $"bg.w2")
        .filter($"w1" =!= $"w2")
      val bi = pairs
        .join(broadcast(nodes.withColumnRenamed("tok", "w1")), Seq("w1"))
        .join(broadcast(nodes.withColumnRenamed("tok", "w2")), Seq("w2"))
        .groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
        .filter($"n" >= 3)
      val edges = bi.select($"w1".as("src"), $"w2".as("dst"))
        .unionByName(bi.select($"w2".as("src"), $"w1".as("dst")))
      graft.operators.PageRank.ranks(edges, 10)
        .orderBy($"r".desc, $"vertex")
        .limit(20)
        .select($"vertex".as("tok"), $"r".as("rank_units"))
    }
  }

  /** Phrase search over a positional inverted index: docs where the
    * query's tokens appear ADJACENT, found by joining the two terms'
    * posting lists on (doc, next-position) — substring matching can't do
    * this against a tokenized corpus, and scanning every document at
    * query time can't do it at scale; the postings join touches only the
    * two terms' lists. The oracle is the DEFINITIONAL in-row adjacency
    * scan (a HOF filter over each doc's token array) — index path vs
    * definition, two independent strategies, one answer. At 100 TB the
    * posting frame is the thing you persist bucketed by token; here it's
    * built transiently from one posexplode. */
  val sq08PhraseSearch: QueryDef = sqlChecked(
    "sq08_phrase_search",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ph(phrase, a, b) AS (VALUES
      |  ('fast scan', 'fast', 'scan'),
      |  ('merge batch', 'merge', 'batch'),
      |  ('window agg', 'window', 'agg'))
      |SELECT ph.phrase, d.doc_id
      |FROM d, ph
      |WHERE len(list_filter(range(len(w) - 1),
      |  i -> w[i+1] = ph.a AND w[i+2] = ph.b)) > 0
      |ORDER BY phrase, doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val phrases = Seq(
      ("fast scan", "fast", "scan"),
      ("merge batch", "merge", "batch"),
      ("window agg", "window", "agg")).toDF("phrase", "a", "b")
    val post = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")))
      .toDF("doc_id", "pos", "tok")
    // two probes of the posting frame, one per phrase slot; the query
    // side broadcasts so each probe is a map-side filter of the postings
    val pa = post.join(broadcast(phrases), $"tok" === $"a")
      .select($"phrase", $"doc_id", $"pos")
    val pb = post.join(broadcast(phrases.select($"phrase", $"b")), $"tok" === $"b")
      .select($"phrase".as("ph2"), $"doc_id".as("doc2"), $"pos".as("pos2"))
    pa.join(pb,
        $"phrase" === $"ph2" && $"doc_id" === $"doc2" && $"pos2" === $"pos" + 1)
      .select($"phrase", $"doc_id")
      .distinct()
      .orderBy($"phrase", $"doc_id")
  }

  /** BM25 through a STORED inverted index — sq14's stored-index
    * discipline applied to text search, closing sq07's serving loop.
    * Build: the posting list (term, doc_id, tf, dl) denormalized with
    * each term's df (the standard index layout — df is written once at
    * build time, not recomputed per query) lands as parquet partitioned
    * by `b = pmod(xxhash64(term), 64)`; corpus stats (n_docs, Σdl) land
    * beside it. Serve: the 13 query terms map to ≤13 of the 64 buckets,
    * so the literal `b IN (...)` prunes the stored scan to the buckets
    * the query touches and the rest of the index is never opened
    * (StoredBm25Spec asserts `selectedPartitions ≤ distinct buckets` on
    * this exact plan, and that serving output ≡ sq07's direct
    * computation row for row). Scoring/rounding is sq07's exactly, so
    * the SAME DuckDB oracle hash-checks the whole build→store→serve
    * round trip.
    *
    * 100 TB: the index build is one corpus scan + vocab-keyed
    * aggregates; a serving request's cost is |query terms|/64 of the
    * postings bytes regardless of corpus size — the bench timing here
    * deliberately INCLUDES the full build. */
  val sq18Bm25StoredServing: QueryDef = sqlChecked(
    "sq18_bm25_stored_serving",
    """WITH docs AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |dl AS (SELECT doc_id, len(toks) AS dl, toks FROM docs),
      |tf AS (
      |  SELECT doc_id, dl, unnest(toks) AS term FROM dl),
      |tfc AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, dl
      |  FROM tf GROUP BY doc_id, term, dl),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
      |  FROM dl),
      |dfreq AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY term),
      |q(qid, term) AS (VALUES
      |  (1, 'spark'), (1, 'window'), (1, 'agg'),
      |  (2, 'customer'), (2, 'query'), (2, 'join'),
      |  (3, 'fast'), (3, 'scan'),
      |  (4, 'stream'), (4, 'batch'),
      |  (5, 'sort'), (5, 'merge'), (5, 'table')),
      |parts AS (
      |  SELECT q.qid, t.doc_id,
      |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |      (CAST(t.tf AS DOUBLE) * 2.2) /
      |      (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        (CAST(t.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS ts
      |  FROM tfc t JOIN q ON t.term = q.term JOIN dfreq d ON t.term = d.term, stats s),
      |scored AS (
      |  SELECT qid, doc_id,
      |    round(CAST(SUM(CAST(ts AS DECIMAL(38,18))) AS DOUBLE), 6) AS score
      |  FROM parts GROUP BY qid, doc_id),
      |ranked AS (
      |  SELECT qid, doc_id, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      |  FROM scored)
      |SELECT CAST(qid AS BIGINT) AS qid, doc_id, score, CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin) { (spark, dir) =>
    buildAndServeBm25(spark, dir)
  }

  /** sq18's fixed request battery (also sq07's). */
  private def bm25Requests(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    Seq(
      (1L, "spark"), (1L, "window"), (1L, "agg"),
      (2L, "customer"), (2L, "query"), (2L, "join"),
      (3L, "fast"), (3L, "scan"),
      (4L, "stream"), (4L, "batch"),
      (5L, "sort"), (5L, "merge"), (5L, "table")).toDF("qid", "term")
  }

  /** BUILD phase: denormalized postings bucketed 64-way by term hash +
    * the one-row stats table, written under `root`. */
  def buildBm25(spark: org.apache.spark.sql.SparkSession, dir: String,
      root: String): Unit = {
    import spark.implicits._
    val NB = 64
    val dl = Tables.documents(spark, dir)
      .select($"doc_id",
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("dl"), $"toks")
    val tfc = dl
      .select($"doc_id", $"dl", explode($"toks").as("term"))
      .groupBy($"doc_id", $"term", $"dl")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tfc.groupBy($"term").agg(count(lit(1)).as("df"))
    tfc.join(dfreq, Seq("term"))
      .withColumn("bkt", pmod(xxhash64($"term"), lit(NB)))
      .write.partitionBy("bkt").mode("overwrite").parquet(root + "/postings")
    dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
      .write.mode("overwrite").parquet(root + "/stats")
  }

  /** sq18's body, callable from StoredBm25Spec with the scratch root
    * surfaced (the spec asserts plan pruning over the stored layout). */
  def buildAndServeBm25(spark: org.apache.spark.sql.SparkSession, dir: String,
      rootOut: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val queries = bm25Requests(spark)
    val root = rootOut.getOrElse(graft.util.Scratch.tempDir("graft-sq18"))
    buildBm25(spark, dir, root)
    serveBm25(spark, root, queries)
  }

  /** SERVE phase over a built root: the request terms' buckets are a
    * bounded driver-side list — the literal IN becomes the postings
    * scan's PartitionFilter (≤ |terms| of the 64 dirs open). */
  def serveBm25(spark: org.apache.spark.sql.SparkSession, root: String,
      queries: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val k1 = 1.2
    val b = 0.75
    val NB = 64
    val qb = queries.withColumn("bkt", pmod(xxhash64($"term"), lit(NB)))
    val buckets = qb.select($"bkt").distinct().as[Long].collect().sorted
    val post = spark.read.parquet(root + "/postings")
      .filter(col("bkt").isin(buckets: _*))
    val st = spark.read.parquet(root + "/stats")
    val idf = log(lit(1.0) +
      ($"n_docs".cast("double") - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
    val ts = idf * ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) *
        ($"dl".cast("double") / ($"sum_dl".cast("double") / $"n_docs"))))
    val scored = post
      .join(broadcast(qb.select($"qid", $"term")), Seq("term"))
      .crossJoin(broadcast(st))
      .select($"qid", $"doc_id",
        ts.cast(org.apache.spark.sql.types.DecimalType(38, 18)).as("ts"))
      .groupBy($"qid", $"doc_id")
      .agg(round(sum($"ts").cast("double"), 6).as("score"))
    TopKPerGroup.topK(spark, scored, "qid", "score", "doc_id", 5)
      .select($"qid", col("doc_id"), $"score", $"rnk")
      .orderBy($"qid", $"rnk")
  }

  /** [[serveBm25]] against the PINNED build of a registered index
    * ([[graft.ml.IndexLifecycle]] — same contract as
    * StoredIndex.servePinned): resolve the pointer, serve from that
    * build's partitioned layout; unpromoted rebuilds stay invisible. */
  def serveBm25Pinned(spark: org.apache.spark.sql.SparkSession,
      registryPath: String, indexName: String,
      queries: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val root = graft.ml.IndexLifecycle.pinnedPath(spark, registryPath, indexName)
      .getOrElse(throw new IllegalStateException(
        s"no pinned build for index $indexName — promote one first"))
    serveBm25(spark, root, queries)
  }

  /** Build-vs-serve latency split for the stored BM25 index — the
    * measurement sq18's hash-green round trip can't carry (timings are
    * machine-dependent; adding them to sq18 would break its oracle
    * hash). Builds ONCE into scratch (timed), then serves each of the 5
    * requests INDEPENDENTLY — one pruned scan per request, forced to
    * completion — and reports per-request serving ms. The served union
    * must equal sq07's in-memory computation row for row
    * (`matches_batch` = 25 proves the timed path is the correct one).
    *
    * 100 TB: build cost scales with corpus bytes ONCE; each request's
    * cost is |terms|/64 of the postings regardless of corpus size —
    * the split is exactly what this row now records. */
  val sq18bBm25ServingLatency: QueryDef = rowsOnly("sq18b_bm25_serving_latency") { (spark, dir) =>
    import spark.implicits._
    val root = graft.util.Scratch.tempDir("graft-sq18b")
    val tBuild0 = System.nanoTime()
    buildBm25(spark, dir, root)
    val buildS = (System.nanoTime() - tBuild0) / 1e9
    val reqs = bm25Requests(spark).as[(Long, String)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
    val tServe0 = System.nanoTime()
    val served = reqs.map { case (_, terms) =>
      serveBm25(spark, root, terms.toSeq.toDF("qid", "term")).collect()
    }
    val serveMs = (System.nanoTime() - tServe0) / 1e6 / reqs.length
    val expected = sq07Bm25TopK.fn(spark, dir).collect()
    val matches = served.flatten.toSet.intersect(expected.toSet).size
    Seq((reqs.length.toLong, math.round(buildS * 1000) / 1000.0,
        math.round(serveMs * 10) / 10.0, served.map(_.length).sum.toLong,
        matches.toLong))
      .toDF("n_requests", "build_s", "serve_ms_per_query",
        "rows_served", "matches_batch")
  }

  /** Reciprocal Rank Fusion — HYBRID retrieval's standard list combiner
    * (Cormack et al., SIGIR 2009: RRF(d) = Σ_arms 1/(k + rank_arm(d)),
    * k = 60): production search fuses a lexical arm with a second signal
    * this way because rank-space fusion needs no score calibration
    * between arms. Arm 1 is sq07's exact BM25 (same literals, same
    * DECIMAL(38,18) shield); arm 2 is TF-IDF cosine (per-doc L2 norm
    * over the FULL vocabulary — one corpus pass — query treated as a
    * unit-weight indicator vector, whose own norm is rank-invariant per
    * query). Each arm keeps top-20 per query, fusion re-ranks the union,
    * top-5 ships. Both arms and the fusion arithmetic replay exactly in
    * DuckDB — ranks are integers, RRF scores identical rationals — so
    * the hybrid result is hash-checked end to end.
    *
    * 100 TB: two K-bounded per-query rank lists (each the pruned /
    * partial-agg shape its family already proved) and a fusion over
    * ≤ 2K rows per query — fusion cost is independent of corpus size. */
  val sq20RrfHybrid: QueryDef = sqlChecked(
    "sq20_rrf_hybrid",
    """WITH docs AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |dl AS (SELECT doc_id, len(toks) AS dl, toks FROM docs),
      |tfc AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, dl
      |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
      |  GROUP BY doc_id, term, dl),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
      |  FROM dl),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY term),
      |q(qid, term) AS (VALUES
      |  (1, 'spark'), (1, 'window'), (1, 'agg'),
      |  (2, 'customer'), (2, 'query'), (2, 'join'),
      |  (3, 'fast'), (3, 'scan'),
      |  (4, 'stream'), (4, 'batch'),
      |  (5, 'sort'), (5, 'merge'), (5, 'table')),
      |bm25 AS (
      |  SELECT qid, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
      |      round(CAST(SUM(CAST(
      |        ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |          (CAST(t.tf AS DOUBLE) * 2.2) /
      |          (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |            (CAST(t.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
      |        AS DECIMAL(38,18))) AS DOUBLE), 6) DESC, doc_id) AS rnk
      |  FROM tfc t JOIN q ON t.term = q.term JOIN dfreq d ON t.term = d.term, stats s
      |  GROUP BY qid, doc_id, s.n_docs, s.sum_dl),
      |tw AS (
      |  SELECT t.doc_id, t.term,
      |    CAST(t.tf AS DOUBLE) * ln(CAST(s.n_docs AS DOUBLE) / d.df) AS w
      |  FROM tfc t JOIN dfreq d ON t.term = d.term, stats s),
      |norms AS (
      |  SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM tw GROUP BY doc_id),
      |cosarm AS (
      |  SELECT qid, tw.doc_id AS doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
      |      round(CAST(SUM(CAST(tw.w AS DECIMAL(38,18))) AS DOUBLE) / n.nrm, 6)
      |        DESC, tw.doc_id) AS rnk
      |  FROM tw JOIN q ON tw.term = q.term JOIN norms n ON tw.doc_id = n.doc_id
      |  WHERE n.nrm > 0
      |  GROUP BY qid, tw.doc_id, n.nrm),
      |fused AS (
      |  SELECT COALESCE(b.qid, c.qid) AS qid,
      |    COALESCE(b.doc_id, c.doc_id) AS doc_id,
      |    round(COALESCE(1.0 / (60 + b.rnk), 0) +
      |          COALESCE(1.0 / (60 + c.rnk), 0), 9) AS rrf
      |  FROM (SELECT * FROM bm25 WHERE rnk <= 20) b
      |  FULL OUTER JOIN (SELECT * FROM cosarm WHERE rnk <= 20) c
      |    ON b.qid = c.qid AND b.doc_id = c.doc_id)
      |SELECT CAST(qid AS BIGINT) AS qid, doc_id, rrf,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      |    ORDER BY rrf DESC, doc_id) AS rnk FROM fused)
      |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val k1 = 1.2; val b = 0.75
    val queries = bm25Requests(spark)
    val dl = Tables.documents(spark, dir)
      .select($"doc_id",
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("dl"), $"toks")
    val tfc = dl
      .select($"doc_id", $"dl", explode($"toks").as("term"))
      .groupBy($"doc_id", $"term", $"dl")
      .agg(count(lit(1)).as("tf"))
      .cache()
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val dfreq = tfc.groupBy($"term").agg(count(lit(1)).as("df"))
    val Dec = org.apache.spark.sql.types.DecimalType(38, 18)
    // arm 1: BM25 top-20 (sq07's exact arithmetic)
    val ts = log(lit(1.0) +
      ($"n_docs".cast("double") - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
      ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) *
        ($"dl".cast("double") / ($"sum_dl".cast("double") / $"n_docs"))))
    val wB = Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id")
    val bm25 = tfc
      .join(broadcast(queries.join(dfreq, Seq("term"))), Seq("term"))
      .crossJoin(broadcast(stats))
      .select($"qid", $"doc_id", ts.cast(Dec).as("tsd"))
      .groupBy($"qid", $"doc_id")
      .agg(round(sum($"tsd").cast("double"), 6).as("score"))
      .withColumn("rnk", row_number().over(wB))
      .filter($"rnk" <= 20)
      .select($"qid", $"doc_id", $"rnk")
    // arm 2: TF-IDF cosine top-20 (full-vocabulary doc norms)
    val tw = tfc.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select($"doc_id", $"term",
        ($"tf".cast("double") * log($"n_docs".cast("double") / $"df")).as("w"))
      .cache()
    val norms = tw.groupBy($"doc_id").agg(sqrt(sum($"w" * $"w")).as("nrm"))
    val wC = Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id")
    val cosArm = tw
      .join(broadcast(queries.select($"qid", $"term")), Seq("term"))
      .join(norms, Seq("doc_id"))
      .filter($"nrm" > 0)
      .groupBy($"qid", $"doc_id", $"nrm")
      .agg(sum($"w".cast(Dec)).as("dot"))
      .select($"qid", $"doc_id",
        round($"dot".cast("double") / $"nrm", 6).as("score"))
      .withColumn("rnk", row_number().over(wC))
      .filter($"rnk" <= 20)
      .select($"qid", $"doc_id", $"rnk")
    // RRF fusion over the union of the two rank lists
    val fused = bm25.select($"qid", $"doc_id", $"rnk".as("rb"))
      .join(cosArm.select($"qid", $"doc_id", $"rnk".as("rc")),
        Seq("qid", "doc_id"), "full_outer")
      .select($"qid", $"doc_id",
        round(
          coalesce(lit(1.0) / (lit(60) + $"rb"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + $"rc"), lit(0.0)), 9).as("rrf"))
    val wF = Window.partitionBy($"qid").orderBy($"rrf".desc, $"doc_id")
    fused.withColumn("rnk", row_number().over(wF))
      .filter($"rnk" <= 5)
      .select($"qid", $"doc_id", $"rrf", $"rnk".cast("long").as("rnk"))
      .orderBy($"qid", $"rnk")
  }

  val all: Seq[QueryDef] = Seq(sq07Bm25TopK, sq08PhraseSearch,
    tq19TextrankKeywords, sq18Bm25StoredServing,
    sq18bBm25ServingLatency.measured,
    sq20RrfHybrid)
}
