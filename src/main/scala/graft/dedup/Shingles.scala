package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-canonicalization + shingling expressions for the dedup
  * family. All pure Column expressions (sequence/transform/element_at
  * array built-ins — no UDFs) so they stay inside whole-stage codegen.
  */
object Shingles {

  /** Whitespace-collapsed lowercase text — the exact-dedup canonical form. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Lowercase whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word 3-gram shingles (near-dup detection grain). */
  def shingles3(toks: Column): Column = shinglesN(toks, 3)

  /** Distinct word n-gram shingles (decontamination uses longer grams
    * than near-dup detection — an 8-gram match is strong evidence of
    * copied text, not shared phrasing). Caller must filter
    * size(tokens) >= n first: Spark's sequence(0, m) generates DESCENDING
    * sequences for negative m instead of an empty array. */
  def shinglesN(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
}
