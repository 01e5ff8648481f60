package graft.tokenizer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) re-expressed for Spark — the vocabulary-learning step
  * every large-scale training-data pipeline runs before token counting and
  * sequence packing (tq02/tq10/tq11 consume what this produces).
  *
  * Scale shape — the histogram compression is the whole game. BPE never
  * needs the raw corpus: it needs the DISTINCT-WORD histogram (word, freq).
  * At 100 TB the corpus may be 10^11 documents, but the histogram is
  * ~10^8 rows of a few bytes each — one explode + one groupBy (map-side
  * partial counts collapse hot words before the shuffle) reduces the
  * problem by 3-4 orders of magnitude, and every subsequent merge round
  * touches only the histogram. Per round: one pair-count groupBy over the
  * histogram, a 1-row argmax collect (a scalar reduce, same footprint as
  * any `count()`), and an in-row merge pass via the `aggregate` HOF — no
  * UDFs, no driver-side loops over data.
  *
  * Determinism: the argmax orders by (freq DESC, left, right) — a total
  * order — so the learned merge sequence is bit-identical under any
  * partitioning (spec-asserted). String ties compare in UTF8 binary order
  * on the engine side and UTF-16 order in the reference spec; these agree
  * for all BMP text (the corpus is ASCII).
  */
object Bpe {

  /** A learned merge: at rank `rank`, `left`+`right` (the most frequent
    * adjacent symbol pair, `freq` weighted occurrences) became one symbol. */
  final case class Merge(rank: Int, left_sym: String, right_sym: String,
                         pair_freq: Long, merged: String)

  /** Distinct-word histogram of a corpus: (word, freq). */
  def wordHistogram(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Character array of a word. Spark's split on the empty pattern keeps a
    * trailing empty element (Java regex, limit -1); strip it so the result
    * matches DuckDB's string_split(word, ''). */
  def chars(word: Column): Column = array_remove(split(word, ""), "")

  /** Adjacent symbol pairs of a symbol array as array<struct<l,r>>.
    * Callers must guarantee size(syms) >= 2 — Spark's sequence() runs
    * DESCENDING when start > stop, so an unguarded sequence(1, size-1)
    * on a 1-element array would fabricate pairs. */
  def adjacentPairs(syms: Column): Column =
    transform(sequence(lit(1), size(syms) - 1),
      i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r")))

  /** One BPE merge pass over a symbol array: replace adjacent (l, r)
    * occurrences with l+r, left-to-right, non-overlapping — "aaa" under
    * (a,a) becomes ["aa","a"], never ["aa","aa"]. A single `aggregate`
    * scan carrying (emitted prefix, one held symbol); no UDF. */
  def mergePair(syms: Column, l: String, r: String): Column = {
    val nullStr = lit(null).cast("string")
    aggregate(
      syms,
      struct(array().cast("array<string>").as("out"), nullStr.as("held")),
      (acc, x) => {
        val out  = acc.getField("out")
        val held = acc.getField("held")
        when(held.isNull, struct(out.as("out"), x.as("held")))
          .when(held === lit(l) && x === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"), nullStr.as("held")))
          .otherwise(struct(concat(out, array(held)).as("out"), x.as("held")))
      },
      acc => when(acc.getField("held").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("held")))))
  }

  /** Learn up to `nMerges` BPE merges from a (word, freq) histogram.
    * Stops early when no adjacent pair occurs at least twice (merging a
    * frequency-1 pair never compresses anything).
    *
    * Each round localCheckpoints the shrinking symbol frame — same lesson
    * as PageRank.scala: without it, analyzer cost compounds with lineage
    * depth across rounds. Words reduced to one symbol drop out (they can
    * produce no further pairs), so the frame only shrinks. */
  def train(hist: DataFrame, nMerges: Int): Seq[Merge] = {
    val merges = Seq.newBuilder[Merge]
    var cur = hist
      .filter(length(col("word")) >= 2)
      .select(chars(col("word")).as("syms"), col("freq"))
      .localCheckpoint(eager = true)
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val best = cur
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(2) < 2L) done = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, f, l + r)
        val next = cur
          .select(mergePair(col("syms"), l, r).as("syms"), col("freq"))
          .filter(size(col("syms")) >= 2)
          .localCheckpoint(eager = true)
        cur.unpersist()
        cur = next
        rank += 1
      }
    }
    cur.unpersist()
    merges.result()
  }

  // ---------------------------------------------------------------------
  // Encoding with a FIXED (published) merge table — the shape real
  // pipelines run: the tokenizer is trained once, frozen, and applied to
  // every corpus thereafter. The trick below makes the encode a chain of
  // plain `replace` built-ins (codegen'd in Spark, replayable verbatim by
  // the DuckDB oracle): wrap every character as <O>c<C>, then each
  // merge (l, r) is replace("<O>l<C><O>r<C>" -> "<O>lr<C>").
  // The self-contained wrappers make symbol boundaries unambiguous (a
  // suffix of one symbol can never false-match the left half of a pair),
  // and SQL replace's left-to-right non-overlapping, no-rescan semantics
  // are exactly BPE's within-rank merge semantics.
  // ---------------------------------------------------------------------

  private val O = "\u0001" // symbol-open sentinel (stripped from input first)
  private val C = "\u0002" // symbol-close sentinel

  /** Frozen English merge table in rank order. Invariant (required for the
    * single-pass-per-rank encode to equal canonical BPE): every multi-char
    * component is produced by an EARLIER merge (th@1 before the@2, in@3
    * before ing@4, an@6 before and@7). */
  val FixedMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "e" -> "r",
    "a" -> "n", "an" -> "d", "o" -> "n", "r" -> "e", "a" -> "t",
    "e" -> "n", "s" -> "t", "o" -> "r", "e" -> "s", "e" -> "d",
    "i" -> "s", "i" -> "t", "a" -> "l", "a" -> "r", "t" -> "o")

  /** Whitespace-normalized text with the two sentinel code points stripped
    * (they never occur in real text; stripping makes the wrapping safe by
    * construction). */
  def normText(text: Column): Column =
    trim(regexp_replace(
      replace(replace(text, lit(O), lit("")), lit(C), lit("")), "\\s+", " "))

  /** Encode normalized text: wrap each char, then apply merges in rank
    * order. Spaces get wrapped too but can never merge (no symbol contains
    * a space), so word boundaries hold with zero extra machinery. */
  def encode(norm: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(norm, "(.)", O + "$1" + C)
    merges.foldLeft(wrapped) { case (e, (l, r)) =>
      replace(e, lit(O + l + C + O + r + C), lit(O + l + r + C))
    }
  }

  /** Subword token count of an encoded doc: open-sentinel occurrences minus
    * the wrapped spaces (spaces are separators, not tokens). */
  def subwordCount(norm: Column, enc: Column): Column =
    (length(enc) - length(replace(enc, lit(O), lit("")))) -
      (length(norm) - length(replace(norm, lit(" "), lit(""))))

  /** Inverse of [[encode]] — detokenization. BPE merges only ever
    * CONCATENATE adjacent symbols (no symbol is rewritten), so decoding a
    * frozen-vocab encoding is pure sentinel removal: lossless by
    * construction, `decode(encode(norm, m)) == norm` for every merge
    * table over sentinel-free input. One codegen'd replace pair — the
    * detokenize side of the tokenizer surface every serving path needs. */
  def decode(enc: Column): Column =
    replace(replace(enc, lit(O), lit("")), lit(C), lit(""))

  /** DuckDB fragment equivalent to [[decode]] over a column named `enc`. */
  def sqlDecode: String = "replace(replace(enc, chr(1), ''), chr(2), '')"

  /** DuckDB fragment equivalent to [[normText]] over column `text`. */
  def sqlNorm: String =
    "trim(regexp_replace(replace(replace(text, chr(1), ''), chr(2), ''), '\\s+', ' ', 'g'))"

  /** DuckDB fragment equivalent to [[encode]] over a column named `norm`. */
  def sqlEncode(merges: Seq[(String, String)]): String = {
    val wrapped = "regexp_replace(norm, '(.)', chr(1)||'\\1'||chr(2), 'g')"
    merges.foldLeft(wrapped) { case (e, (l, r)) =>
      s"replace($e, chr(1)||'$l'||chr(2)||chr(1)||'$r'||chr(2), chr(1)||'$l$r'||chr(2))"
    }
  }
}
