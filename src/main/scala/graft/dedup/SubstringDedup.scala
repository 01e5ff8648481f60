package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication: find every maximal span of >= k
  * consecutive tokens that occurs more than once anywhere in the corpus
  * (across documents or repeated within one), per Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"
  * (arXiv:2107.06499). The single-node reference algorithm builds a
  * corpus suffix array; the distributed re-expression is the standard
  * n-gram inverted-index shape:
  *
  *   1. every k-token window becomes one (doc, pos, gramHash) occurrence
  *      row — the hash is a 64-bit xxhash64 computed IN-ROW before the
  *      explode, so the shuffle moves 8-byte keys, never gram text;
  *   2. a groupBy(gram) with map-side partial counts finds grams whose
  *      corpus frequency is > 1 (the duplicated vocabulary);
  *   3. a left-semi join marks the duplicated start positions, and a
  *      per-document gaps-and-islands window (partitioned by doc_id —
  *      state bounded by document length, never corpus size) merges
  *      overlapping / touching k-windows into maximal spans.
  *
  * A repeated substring of length L >= k produces exactly the L - k + 1
  * duplicated window starts whose union is the [start, start+L) span, so
  * island-merging windows at gap <= k reconstructs the maximal repeated
  * span without materializing any suffix structure.
  *
  * 100 TB notes: work is one occurrence row per token (linear), the only
  * shuffles are the gram-frequency groupBy and the semi join back — both
  * keyed on the 8-byte hash — and hot grams (boilerplate) skew only the
  * COUNT side, where partial aggregation has already collapsed them to
  * one row per partition. The 64-bit hash space makes a false gram
  * collision at 10^11 windows a ~10^-3-expected event; collisions can
  * only ADD a span, never lose one (the conservative direction for
  * dedup).
  */
object SubstringDedup {

  /** (doc_id, n_tokens, pos, g) — one row per k-token window start. */
  def occurrences(docs: DataFrame, k: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .filter(col("n_tokens") >= k)
    toks.select(
        col("doc_id"), col("n_tokens"),
        posexplode(transform(
          sequence(lit(0), (col("n_tokens") - k).cast("int")),
          i => xxhash64(concat_ws(" ", slice(col("w"), i + 1, lit(k))))))
          .as(Seq("pos", "g")))
  }

  /** Maximal repeated spans: (doc_id, n_tokens, s, e) with token
    * positions 0-based inclusive; e - s + 1 >= k. */
  def spans(docs: DataFrame, k: Int): DataFrame = {
    val occ = occurrences(docs, k)
    val dup = occ.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("g"))
    val dupPos = occ.join(dup, Seq("g"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPos
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      // windows at start distance <= k overlap or touch — same span
      .withColumn("brk",
        when(col("prev").isNull || col("pos") - col("prev") > k, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(k) - 1).as("e"))
      .select(col("doc_id"), col("n_tokens"), col("s"), col("e"))
  }

  /** Per-document summary of repeated spans, ordered by doc_id. */
  def perDoc(docs: DataFrame, k: Int): DataFrame =
    spans(docs, k)
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_tokens"),
        max(col("e") - col("s") + 1).cast("long").as("max_span"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
        col("max_span"), col("n_tokens"))
      .orderBy(col("doc_id"))
}
