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
      portable: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % numBands == 0, "bands must evenly divide hashes")
    // portable H_i(s) = int of first 15 hex chars of md5("i:" ++ s) —
    // < 2^60, positive; DuckDB: CAST('0x' || substring(md5(...),1,15) AS BIGINT)
    def permHash(i: Int, sh: org.apache.spark.sql.Column) =
      if (portable) conv(substring(md5(concat(lit(s"$i:"), sh)), 1, 15), 16, 10).cast("long")
      else xxhash64(lit(i), sh)
    val base = docs
      .withColumn("toks", Shingles.tokens($"text"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", Shingles.shingles3($"toks").as("shingles"))
      .cache()
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
}
