package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded-LSH near-duplicate candidate generation with exact
  * Jaccard rerank — the 100 TB near-dup operator.
  *
  * Pipeline: word-3-gram shingles → k minhash permutations (seed-prefixed
  * xxhash64 minimum) → bands of k/b rows hashed to bucket ids → candidate
  * pairs = same (band, bucket) equi-join (never all-pairs; the plan has no
  * CartesianProduct) → exact Jaccard over shingle sets for the candidates
  * only. Collision probability per band for true Jaccard s is s^(k/b);
  * with 16 hashes / 4 bands, s=0.8 near-dups collide in ≥1 band with
  * p ≈ 1-(1-0.41)^4 ≈ 0.88.
  *
  * Per-doc state is bounded by document length; shuffles carry doc ids +
  * 8-byte hashes, never text.
  */
object MinHashLsh {

  /** @param docs (doc_id: long, text: string)
    * @param portable use the md5-derived permutation family instead of
    *   xxhash64. xxhash64 is the production choice (one native 64-bit mix
    *   per shingle per permutation); the md5 family computes the identical
    *   pipeline from a hash both engines implement bit-for-bit, which
    *   makes the ENTIRE operator (shingling → signatures → banding →
    *   candidate join → Jaccard) DuckDB-oracle-checkable (dq03b). Same
    *   machinery, different mixer — the q24/q25 exact-vs-sketch pattern.
    * @return (doc_a, doc_b, jaccard) — candidate pairs with exact Jaccard */
  def candidatePairs(docs: DataFrame, numHashes: Int = 16, numBands: Int = 4,
      portable: Boolean = false): DataFrame =
    pairsFromBase(shingled(docs).cache(), numHashes, numBands, portable)

  /** Stateless (doc_id, band_key) projection of a (doc_id, text) frame —
    * the per-document half of the LSH pipeline factored out so the
    * STREAMING ingest path (streaming/StreamingNearDup) can share the
    * exact signature/banding arithmetic with the batch candidate join
    * (dq03). Every doc emits exactly `numBands` keys; documents too short
    * to shingle (< 3 tokens — batch LSH filters them out pre-join) emit
    * ONE exact-content fallback key instead, so short docs still dedup
    * exactly and no document vanishes from the ingest filter. Key format
    * prefixes the band index / short marker, so bands never collide
    * across families. Production hash path (xxhash64) only: streaming
    * ingest has no DuckDB twin — batch dq03b carries the portable
    * oracle. */
  def bandKeys(docs: DataFrame, numHashes: Int = 16, numBands: Int = 4): DataFrame =
    bandKeysImpl(docs, numHashes, numBands, carryShingles = false)

  /** [[bandKeys]] plus a `sh` column: the doc's distinct shingle set as
    * 64-bit hashes (8 B/shingle — what the VERIFIED ingest filter carries
    * so band collisions can be reranked by exact Jaccard, batch dq03's
    * semantics on the streaming path). Jaccard over the hash sets equals
    * Jaccard over the shingle strings up to 64-bit collision probability
    * (~0 — the same argument the band keys already rest on). Short docs
    * carry an empty set: their fallback key IS exact content, so any
    * collision is Jaccard 1 by construction. */
  def bandKeysWithShingles(docs: DataFrame, numHashes: Int = 16,
      numBands: Int = 4): DataFrame =
    bandKeysImpl(docs, numHashes, numBands, carryShingles = true)

  private def bandKeysImpl(docs: DataFrame, numHashes: Int, numBands: Int,
      carryShingles: Boolean): DataFrame = {
    import docs.sparkSession.implicits._
    require(numHashes % numBands == 0, "bands must evenly divide hashes")
    val rowsPerBand = numHashes / numBands
    // per-ROW signature: min over the doc's own shingle array via
    // array_min(transform(...)) — no explode, no groupBy. Equivalent to
    // the batch explode+min-agg (same min over the same hashes) but a
    // pure projection: streaming-legal (no un-watermarked aggregation)
    // and shuffle-free at any scale
    def permHash(i: Int) = array_min(
      transform($"shingles", sh => xxhash64(lit(i), sh)))
    // null text must not vanish (r8 ADVICE): tokens(null) is null, which
    // BOTH branch filters reject — coalesce to the empty token list so
    // null-text docs take the short fallback and still get a verdict
    val toks = docs.withColumn("toks",
      coalesce(Shingles.tokens($"text"), typedlit(Seq.empty[String])))
    def shCols(sh: org.apache.spark.sql.Column) =
      if (carryShingles) Seq(sh.as("sh")) else Nil
    val long = toks.filter(size($"toks") >= 3)
      .withColumn("shingles", Shingles.shingles3($"toks"))
      .select($"doc_id" +: (shCols(transform($"shingles", s => xxhash64(s))) ++
        (0 until numHashes).map(i => permHash(i).as(s"h$i"))): _*)
      .select($"doc_id" +: (shCols($"sh") :+ explode(array((0 until numBands).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
        concat_ws(":", lit(s"b$b"), xxhash64(cols: _*)): org.apache.spark.sql.Column
      }: _*)).as("band_key")): _*)
    val short = toks.filter(size($"toks") < 3)
      .select($"doc_id" +: (shCols(typedlit(Seq.empty[Long])) :+
        concat_ws(":", lit("short"), xxhash64(concat_ws(" ", $"toks"))).as("band_key")): _*)
    long.unionByName(short)
  }

  /** (doc_id, shingles) projection of a (doc_id, text) frame. */
  private def shingled(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("toks", Shingles.tokens($"text"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", Shingles.shingles3($"toks").as("shingles"))
  }

  /** The signature → band → candidate-join → Jaccard pipeline over a
    * prepared (doc_id, shingles) frame. */
  private def pairsFromBase(base: DataFrame, numHashes: Int, numBands: Int,
      portable: Boolean): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    require(numHashes % numBands == 0, "bands must evenly divide hashes")
    // portable H_i(s) = int of first 15 hex chars of md5("i:" ++ s) —
    // < 2^60, positive; DuckDB: CAST('0x' || substring(md5(...),1,15) AS BIGINT)
    def permHash(i: Int, sh: org.apache.spark.sql.Column) =
      if (portable) conv(substring(md5(concat(lit(s"$i:"), sh)), 1, 15), 16, 10).cast("long")
      else xxhash64(lit(i), sh)
    val sigs = base
      .select($"doc_id", explode($"shingles").as("sh"))
      .groupBy($"doc_id")
      .agg(
        min(permHash(0, $"sh")).as("h0"),
        (1 until numHashes).map(i => min(permHash(i, $"sh")).as(s"h$i")): _*)
    val rowsPerBand = numHashes / numBands
    // portable band key: md5 hex of the comma-joined minima (string render
    // of BIGINT matches across engines); production: one xxhash64 mix
    def bandHash(b: Int) = {
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      if (portable) md5(concat_ws(",", cols: _*).cast("binary")).cast("string")
      else xxhash64(cols: _*).cast("string")
    }
    val bands = sigs.select($"doc_id", explode(array(
      (0 until numBands).map { b =>
        struct(lit(b).as("band_idx"), bandHash(b).as("band_hash"))
      }: _*)).as("band"))
      .select($"doc_id", $"band.band_idx", $"band.band_hash")
    val candidates = bands.as("a")
      .join(bands.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    candidates
      .join(base.select($"doc_id".as("doc_a"), $"shingles".as("sh_a")), Seq("doc_a"))
      .join(base.select($"doc_id".as("doc_b"), $"shingles".as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")))
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** Candidate-pair summary stats with ADAPTIVE exact-collapse.
    *
    * k identical documents inflate every LSH bucket k× and the candidate
    * pair join k²× — quadratic in the duplication factor (measured: the
    * 100× clone replica took the plain pipeline 107× over baseline). But
    * identical shingle SETS have identical signatures, bands, and Jaccard
    * to every other doc, so set-classes can join as ONE representative and
    * the pair stats expand back ARITHMETICALLY, exactly:
    *
    *   - a rep pair (a, b) stands for mult_a·mult_b doc pairs at the same
    *     Jaccard (cross-class pairs);
    *   - a class of size m stands for m(m−1)/2 Jaccard-1.0 pairs
    *     (within-class — the plain pipeline emits all of them because
    *     identical docs collide in every band).
    *
    * The collapse itself costs a groupBy over sorted shingle arrays —
    * pure overhead on a dup-free corpus (why the unconditional version
    * was rejected in round 6) — so it is gated on a measured duplication
    * factor: one count/countDistinct pass decides, the same
    * runtime-statistics-over-static-plan call AQE makes. Exact-dedup
    * upstream (dq01) normally removes clones first; this guard makes the
    * near-dup operator safe even when it runs first.
    *
    * Returns one row: (num_hashes, num_bands, n_candidate_pairs,
    * n_near_dups, max_jaccard, dup_factor) — identical values to
    * aggregating [[candidatePairs]] directly (spec-asserted). */
  def pairStats(docs: DataFrame, numHashes: Int = 16, numBands: Int = 4,
      collapseThreshold: Double = 1.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = shingled(docs)
      .select($"doc_id", array_sort($"shingles").as("shingles"))
      .cache()
    // the gate is a heuristic ROUTER, so it runs on the cheapest sufficient
    // statistic: approx-distinct over an 8-byte hash of the set key (one
    // pass, no array shuffle); the collapse itself still groups by the
    // true array, so a hash collision can only nudge the routing decision,
    // never the stats
    val st = keyed.agg(count(lit(1)), approx_count_distinct(xxhash64($"shingles"))).head()
    val dupFactor =
      st.getLong(0).toDouble / math.max(st.getLong(1), 1L).toDouble
    val out =
      if (dupFactor < collapseThreshold) {
        pairsFromBase(keyed, numHashes, numBands, portable = false).agg(
          lit(numHashes).as("num_hashes"),
          lit(numBands).as("num_bands"),
          count(lit(1)).as("n_candidate_pairs"),
          count(when($"jaccard" >= 0.8, 1)).as("n_near_dups"),
          max($"jaccard").as("max_jaccard"))
      } else {
        // the sorted shingle array IS the set-class key (dq09's trick)
        val groups = keyed.groupBy($"shingles")
          .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("mult"))
          .cache()
        val mults = groups.select($"doc_id", $"mult")
        val cross = pairsFromBase(
            groups.select($"doc_id", $"shingles"), numHashes, numBands,
            portable = false)
          .join(mults.toDF("doc_a", "m_a"), Seq("doc_a"))
          .join(mults.toDF("doc_b", "m_b"), Seq("doc_b"))
          .agg(
            coalesce(sum($"m_a" * $"m_b"), lit(0L)).as("np_x"),
            coalesce(sum(when($"jaccard" >= 0.8, $"m_a" * $"m_b")), lit(0L))
              .as("nd_x"),
            max($"jaccard").as("mj"))
        val within = groups.agg(
          coalesce(sum((($"mult" * ($"mult" - 1)) / 2).cast("long")), lit(0L))
            .as("np_w"),
          max($"mult").as("max_mult"))
        // collapse only fires when some class has mult >= 2, whose
        // within-class pairs are Jaccard 1.0 — same value the plain
        // pipeline's max would see
        cross.crossJoin(within).select(
          lit(numHashes).as("num_hashes"),
          lit(numBands).as("num_bands"),
          ($"np_x" + $"np_w").as("n_candidate_pairs"),
          ($"nd_x" + $"np_w").as("n_near_dups"),
          when($"max_mult" >= 2, lit(1.0)).otherwise($"mj").as("max_jaccard"))
      }
    out.withColumn("dup_factor", lit(math.rint(dupFactor * 1000) / 1000))
  }
}
