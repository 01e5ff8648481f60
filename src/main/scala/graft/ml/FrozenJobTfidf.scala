package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The PUBLISHED job-text TF-IDF document scorer (mq16): the reference's
  * FOURTH persisted serving pipeline — the text leg of
  * job_attractiveness_lr_v1 (`models/job_attractiveness_lr_v1/stages/
  * 04_Tokenizer_…-07_IDF_…`: Tokenizer → StopWordsRemover(custom list) →
  * HashingTF(3000) → IDF) — with the trained IDF vector frozen as
  * published constants ([[FrozenSalaryRf]]/[[FrozenAttractivenessLr]]/
  * [[FrozenJobKmeans]]'s frozen-parameters move applied to the text
  * model; provenance in [[FreezeTfidf]], which also asserts the replay
  * below equals the spark.ml pipeline's vectors bit for bit over every
  * sf0.01 posting before publishing).
  *
  * What is replayed and why it is exact in BOTH engines:
  *   - tokenize: spark.ml Tokenizer is `toLowerCase.split("\\s")` —
  *     Java split semantics (interior empty tokens kept, trailing ones
  *     dropped, `"" → [""]`, all-whitespace → `[]`), reproduced with
  *     lower + rtrim + split and the two edge CASEs;
  *   - stop-filter: list membership against the published Vietnamese
  *     stop list (the remover's caseSensitive=false lowering is a no-op
  *     on already-lowercased tokens);
  *   - hash: HashingTF's bucket is nonNegativeMod(murmur3(term), 3000)
  *     with seed 42 over the UTF-8 bytes via `hashUnsafeBytes2` —
  *     reference MurmurHash3 x86_32, which is NOT Spark SQL's `hash()`
  *     (that one full-mixes each tail byte as signed; measured: "job"
  *     buckets 1557 vs 2470). The Spark side is the codegen'd native
  *     expression [[graft.functions.MlMurmur3]] calling the very same
  *     platform method; the DuckDB oracle replays the algorithm
  *     (4-byte little-endian words through mixK1/mixH1, the ≤3 tail
  *     bytes XOR-folded little-endian into ONE mixK1, fmix) as CREATE
  *     MACRO arithmetic over 32-bit-masked BIGINTs, hashing each
  *     DISTINCT token once ([[murmurMacrosSql]]);
  *   - weigh: tf(bucket) · idf(bucket) — an exactly-rounded
  *     int-cast-to-double multiply by a published Double literal (the
  *     transcendental log happened at TRAINING time and is frozen in
  *     the constant, the mq14 sigmoid-dodge discipline);
  *   - reduce: the per-document norm² folds (w·w) LEFT-ASSOCIATED over
  *     buckets in ASCENDING order in both engines (Spark `aggregate`
  *     over the sorted distinct-bucket array ≡ DuckDB `list_reduce`
  *     over `list(… ORDER BY bucket)` with a 0.0 head), and the top
  *     term is the strict-`>` fold (first max wins ⇒ smallest bucket on
  *     ties ≡ `ORDER BY w DESC, bucket`).
  *
  * 100 TB: pure per-row projection — tokenize, hash, and fold inside
  * one whole-stage-codegen'd map over the corpus; no shuffle, no model
  * object, no UDF in the hot path (the only non-trivial cost is the
  * per-document O(tokens · distinct-buckets) tf count, bounded by
  * document length).
  */
object FrozenJobTfidf {

  val numFeatures: Int = 3000

  /** The persisted StopWordsRemover list (Pipelines.attractivenessStopWords
    * — job_attractiveness_lr_v1 stage 05 metadata). */
  def stopWords: Seq[String] = Pipelines.attractivenessStopWords.toSeq

  // ── Tokenizer replay ────────────────────────────────────────────────

  /** spark.ml Tokenizer ≡ `toLowerCase.split("\\s")` with Java split
    * semantics: split() drops TRAILING empty tokens but keeps interior
    * ones, `"".split` is `[""]`, and an all-whitespace string splits to
    * `[]`. Spark SQL's `split` keeps trailing empties (limit −1), so
    * the replay right-trims whitespace first and special-cases the two
    * degenerate inputs. */
  def rawTokensCol(text: Column): Column = {
    val s = lower(text)
    val trimmed = regexp_replace(s, "\\s+$", "")
    when(s === "", array(lit("")))
      .when(trimmed === "", array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s"))
  }

  /** Tokenizer + StopWordsRemover replay (duplicates preserved —
    * `array_except` would dedup and change every tf). */
  def cleanTokensCol(text: Column): Column =
    filter(rawTokensCol(text), t => !t.isInCollection(stopWords))

  /** HashingTF bucket per token:
    * `pmod(hashUnsafeBytes2(t, 42), 3000)` via the native
    * [[graft.functions.MlMurmur3]] expression (NOT SQL `hash()` — see
    * the object scaladoc). */
  def bucketsCol(cleanTokens: Column): Column =
    transform(cleanTokens,
      t => pmod(graft.functions.MlMurmur3(t), lit(numFeatures)))

  // ── TF-IDF terms and folds ─────────────────────────────────────────

  /** Per-document sparse TF-IDF terms: `(bucket, w = tf·idf)` structs
    * over the document's DISTINCT buckets in ASCENDING order (sort →
    * keep-first-of-run; the downstream folds inherit this order, which
    * is what makes their double sums engine-portable). `idfW` defaults
    * to the published vector; [[FreezeTfidf]] passes the just-trained
    * one to validate before publishing. */
  def termsCol(buckets: Column, idfW: Seq[Double] = idf): Column = {
    val sorted = array_sort(buckets)
    val distinctAsc = filter(sorted, (x, i) =>
      (i === 0) || (x =!= element_at(sorted, greatest(i, lit(1)))))
    transform(distinctAsc, b => struct(
      b.as("bucket"),
      (size(filter(buckets, x => x === b)).cast("double") *
        element_at(typedlit(idfW), b + 1)).as("w")))
  }

  /** Σ w² over the terms, left-associated in bucket order. */
  def norm2Col(terms: Column): Column =
    aggregate(terms, lit(0.0), (acc, t) => acc + t("w") * t("w"))

  /** The strict-`>` max fold: first max wins, so ties resolve to the
    * smallest bucket (terms ascend); empty documents read (−1, −1.0). */
  def topCol(terms: Column): Column =
    aggregate(terms,
      struct(lit(-1).as("bucket"), lit(-1.0).as("w")),
      (acc, t) => when(t("w") > acc("w"), t).otherwise(acc))

  // ── DuckDB oracle fragments ────────────────────────────────────────

  /** CREATE MACRO block replaying Murmur3_x86_32.hashUnsafeBytes2
    * (seed 42 — spark.ml's feature hash, reference MurmurHash3) over
    * 32-bit-masked BIGINTs: `mul32` splits the multiply so no
    * intermediate exceeds 2⁴⁹ (uint32 × uint32 overflows BIGINT),
    * `utf8_bytes` re-encodes code points (DuckDB has no byte accessor),
    * word blocks are 4-byte little-endian through mixK1/mixH1, the ≤3
    * tail bytes XOR-fold little-endian into ONE k1 → mixK1 → h1 xor
    * (NO extra h1 mix — the hashUnsafeBytes2 tail, unconditional and a
    * no-op when the length is word-aligned since mixK1(0)=0), and the
    * final value is the signed int32 reinterpretation. OR REPLACE
    * because the driver's checker runs every oracle on one
    * connection. */
  val murmurMacrosSql: String =
    """CREATE OR REPLACE MACRO g_mul32(x, c) AS ((x::BIGINT % 65536) * c::BIGINT + (((x::BIGINT // 65536) * c::BIGINT) % 65536) * 65536) % 4294967296;
      |CREATE OR REPLACE MACRO g_rotl32(x, r) AS (x::BIGINT * (2**r)::BIGINT) % 4294967296 + x::BIGINT // (2**(32 - r))::BIGINT;
      |CREATE OR REPLACE MACRO g_mixk1(k) AS g_mul32(g_rotl32(g_mul32(k, 3432918353), 15), 461845907);
      |CREATE OR REPLACE MACRO g_mixh1(h, k) AS (g_mul32(g_rotl32(xor(h::BIGINT, k::BIGINT), 13), 5) + 3864292196) % 4294967296;
      |CREATE OR REPLACE MACRO g_fmix_a(h) AS g_mul32(xor(h::BIGINT, h::BIGINT // 65536), 2246822507);
      |CREATE OR REPLACE MACRO g_fmix_b(h) AS g_mul32(xor(h::BIGINT, h::BIGINT // 8192), 3266489909);
      |CREATE OR REPLACE MACRO g_utf8_bytes(s) AS flatten(list_transform(range(1, length(s)+1), i ->
      |  CASE WHEN unicode(s[i]) < 128 THEN [unicode(s[i])]
      |       WHEN unicode(s[i]) < 2048 THEN [192 + unicode(s[i]) // 64, 128 + unicode(s[i]) % 64]
      |       WHEN unicode(s[i]) < 65536 THEN [224 + unicode(s[i]) // 4096, 128 + (unicode(s[i]) // 64) % 64, 128 + unicode(s[i]) % 64]
      |       ELSE [240 + unicode(s[i]) // 262144, 128 + (unicode(s[i]) // 4096) % 64, 128 + (unicode(s[i]) // 64) % 64, 128 + unicode(s[i]) % 64] END));
      |CREATE OR REPLACE MACRO g_m3_words(b, na) AS list_reduce(list_prepend(42::BIGINT, list_transform(range(0, na // 4), w ->
      |  b[4*w+1]::BIGINT + b[4*w+2]::BIGINT*256 + b[4*w+3]::BIGINT*65536 + b[4*w+4]::BIGINT*16777216)), (h, k) -> g_mixh1(h, g_mixk1(k)));
      |CREATE OR REPLACE MACRO g_m3_tail(h0, b, na, n) AS xor(h0::BIGINT, g_mixk1(list_reduce(list_prepend(0::BIGINT, list_transform(range(na, n), i ->
      |  b[i+1]::BIGINT * (2**(8*(i - na)))::BIGINT)), (a, x) -> xor(a::BIGINT, x::BIGINT))));""".stripMargin

  /** The per-distinct-token hash CTE chain: `vocabCte` must name a CTE
    * with one VARCHAR column `t`; yields `g_vbucket(t, bucket)`. Each
    * stage materializes so the byte list is computed once per token. */
  def vocabBucketsSql(vocabCte: String): String =
    s"""g_vb AS MATERIALIZED (SELECT t, g_utf8_bytes(t) AS b FROM $vocabCte),
       |g_vn AS MATERIALIZED (SELECT t, b, len(b) AS n, len(b) - len(b) % 4 AS na FROM g_vb),
       |g_vw AS MATERIALIZED (SELECT t, b, n, na, g_m3_words(b, na) AS hw FROM g_vn),
       |g_vt AS MATERIALIZED (SELECT t, n, g_m3_tail(hw, b, na, n) AS ht FROM g_vw),
       |g_vf AS MATERIALIZED (SELECT t, xor(g_fmix_b(g_fmix_a(xor(ht, n))), g_fmix_b(g_fmix_a(xor(ht, n))) // 65536) AS hu FROM g_vt),
       |g_vbucket AS MATERIALIZED (SELECT t,
       |  CAST((((CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END) % $numFeatures) + $numFeatures) % $numFeatures AS INTEGER) AS bucket
       |FROM g_vf)""".stripMargin

  /** Tokenizer+stop-filter replay as a DuckDB expression over `expr`.
    * The whitespace class is spelled out as `[ \t\n\x0b\f\r]` — Java's
    * `\s` (what spark.ml's Tokenizer splits on) additionally matches
    * vertical tab `\x0B`, which RE2's `\s` does NOT, so a bare `\s`
    * here would tokenize a `\x0B`-bearing posting differently in the
    * oracle than in the engine (r16 advice). */
  def cleanTokensSql(expr: String): String = {
    val stopList = stopWords.map(w => s"'${w.replace("'", "''")}'")
      .mkString(", ")
    val ws = """[ \t\n\x0b\f\r]"""
    s"""list_filter(
       |  CASE WHEN lower($expr) = '' THEN ['']
       |       WHEN regexp_replace(lower($expr), '$ws+$$', '') = '' THEN []::VARCHAR[]
       |       ELSE regexp_split_to_array(regexp_replace(lower($expr), '$ws+$$', ''), '$ws') END,
       |  t -> t NOT IN ($stopList))""".stripMargin
  }

  /** The published IDF vector as a 3000-row (bucket, w) VALUES CTE. */
  def idfTableSql: String =
    "g_idf AS MATERIALIZED (SELECT * FROM (VALUES " +
      idf.zipWithIndex.map { case (w, i) => s"($i, ${w}::DOUBLE)" }
        .mkString(", ") +
      ") t(bucket, w))"

  // frozen from the Tokenizer→StopWords→HashingTF(3000)→IDF leg fit on
  // /root/testdata/sf0.01 featurized postings (FreezeTfidf writes the
  // literal; replay validated vector-exact against the spark.ml
  // pipeline over every posting before publishing)
  val idf: Seq[Double] = FrozenJobTfidfIdf.values
}
