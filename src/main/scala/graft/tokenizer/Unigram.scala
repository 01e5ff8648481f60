package graft.tokenizer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed unigram-language-model tokenizer (Kudo 2018, arXiv:
  * 1804.10959 — the SentencePiece `--model_type=unigram` family), the
  * second of the two tokenizer algorithms production pipelines train:
  * BPE (Bpe.scala) grows a vocabulary bottom-up by merging; unigram
  * starts from a large seed vocabulary and PRUNES it under an EM loop,
  * segmenting by Viterbi against per-piece log-probabilities.
  *
  * Scale shape — tq30's histogram compression applies verbatim: training
  * and encoding only ever touch the DISTINCT-WORD histogram (word, freq),
  * never the corpus. The Viterbi DP itself is expressed as UNROLLED
  * column arithmetic: position i's best parse is a `greatest` over the
  * ≤ MaxPiece predecessor states, each a string-packed (score, seg) key,
  * so the whole lattice is ~maxWordLen codegen'd projections over the
  * histogram frame — no UDF, no driver loop over data, and the DuckDB
  * oracle replays the identical unroll mechanically (viterbiSql).
  *
  * Determinism: piece scores are INTEGER fixed-point (round(ln p · 1e9),
  * the tq33/pq05 9-dp ulp shield), segmentation keys pack
  * (score + bias, seg) into a fixed-width sortable string, and ties
  * break on the lexicographically-greatest segmentation — a total order,
  * so Spark and DuckDB pick the identical parse everywhere.
  *
  * Model-state budget (the FAISS-codebook argument, same as Pq.scala):
  * the vocabulary is bounded (≤ 32k pieces in production), so holding it
  * driver-side between EM rounds and embedding it as a literal map costs
  * O(vocab), independent of corpus size. At vocabularies too large for a
  * literal map the score lookup becomes a broadcast join against the
  * piece table — same plan family, noted not needed at this grain.
  */
object Unigram {

  /** Longest candidate piece considered by the DP. */
  val MaxPiece = 6

  /** Unroll bound: words longer than this are excluded (and accounted
    * for) by callers — the fixture corpus tops out at 8 chars. */
  val MaxUnroll = 12

  /** Fixed-point score for a single character absent from the vocabulary
    * (ln p ≈ -25: the UNK floor; keeps the DP total without letting
    * unknown chars beat real pieces). */
  val UnkScoreFp: Long = -25000000000L

  /** Offset added to packed key scores so the fixed-width decimal string
    * sorts like the signed score (worst case MaxUnroll × UnkScoreFp =
    * -3e11 stays positive). */
  val KeyBias: Long = 1000000000000L
  val KeyWidth = 13

  final case class Piece(piece: String, scoreFp: Long)

  /** A "published" piece table, the frozen-tokenizer analogue of
    * Bpe.FixedMerges: every lowercase letter plus subword units common in
    * this domain's text. Scores are fixed-point ln-probabilities; multi-
    * char pieces score better than spelling them out char by char, longer
    * domain words better still — the shape every released unigram vocab
    * has. Frozen so both engines can carry it literally. */
  val FixedPieces: Seq[Piece] =
    "abcdefghijklmnopqrstuvwxyz0123456789".map(c =>
      Piece(c.toString, -6000000000L - c.toInt * 10000000L)) ++
    Seq(
      "ta" -> -5.1, "le" -> -5.2, "er" -> -4.9, "an" -> -5.0, "in" -> -4.8,
      "st" -> -5.3, "on" -> -5.05, "ar" -> -5.15, "ue" -> -5.4, "ry" -> -5.35,
      "ch" -> -5.45, "ow" -> -5.5, "al" -> -5.25, "om" -> -5.55, "us" -> -5.6,
      "ast" -> -6.2, "ine" -> -6.3, "art" -> -6.25, "tab" -> -6.4, "que" -> -6.35,
      "table" -> -7.1, "query" -> -7.2, "value" -> -7.3, "batch" -> -7.4,
      "spark" -> -7.5, "merge" -> -7.6, "scan" -> -6.9, "sort" -> -6.95,
      "join" -> -6.85, "hash" -> -6.8, "part" -> -6.75, "key" -> -6.0,
      "row" -> -6.05, "agg" -> -6.1, "fast" -> -7.0, "slow" -> -7.05,
      "stream" -> -8.1, "window" -> -8.2, "column" -> -8.3, "filter" -> -8.4
    ).map { case (p, s) => Piece(p, math.round(s * 1e9)) }

  /** Fixed-point ln(num/den) — round(ln · 1e9), the 9-dp shield. */
  def lnFp(num: Long, den: Long): Long =
    math.round(math.log(num.toDouble / den.toDouble) * 1e9)

  // ---------------------------------------------------------------- DP —

  private def packedDp0: Column = lit(KeyBias.toString + "|")

  private def scoreCol(vocab: Seq[Piece])(piece: Column): Column = {
    val m = typedlit(vocab.map(p => p.piece -> p.scoreFp).toMap)
    coalesce(element_at(m, piece),
      when(length(piece) === 1, lit(UnkScoreFp)))
  }

  /** Add Viterbi state columns dp1..dp`maxLen` and the terminal packed
    * key `vit_key` to a frame with a `word` column. Each dp_i is the best
    * (score, seg) over predecessors j ∈ [i−MaxPiece, i): predecessor key's
    * packed score + piece score, seg extended — all fixed-width string
    * arithmetic so `greatest` IS the argmax. Callers must pre-filter
    * length(word) <= maxLen. */
  def viterbiFrame(words: DataFrame, vocab: Seq[Piece], maxLen: Int): DataFrame = {
    require(maxLen <= MaxUnroll, s"unroll bound $maxLen exceeds $MaxUnroll")
    val score = scoreCol(vocab) _
    val wl = length(col("word"))
    var df = words.withColumn("dp0", packedDp0)
    for (i <- 1 to maxLen) {
      val cands = (math.max(0, i - MaxPiece) until i).map { j =>
        val piece = substring(col("word"), j + 1, i - j)
        val prev = col(s"dp$j")
        val s = score(piece)
        val newScore = substring(prev, 1, KeyWidth).cast("long") + s
        val prevSeg = substring(prev, KeyWidth + 2, Int.MaxValue)
        val newSeg = when(length(prevSeg) === 0, piece)
          .otherwise(concat(prevSeg, lit(" "), piece))
        when(prev.isNotNull && s.isNotNull,
          concat(lpad(newScore.cast("string"), KeyWidth, "0"), lit("|"), newSeg))
      }
      val best = if (cands.size == 1) cands.head else greatest(cands: _*)
      df = df.withColumn(s"dp$i", when(lit(i) <= wl, best))
    }
    val terminal = (1 to maxLen).foldLeft(lit(null).cast("string")) {
      (acc, k) => when(wl === k, col(s"dp$k")).otherwise(acc)
    }
    df.withColumn("vit_key", terminal)
      .drop((0 to maxLen).map(i => s"dp$i"): _*)
  }

  def vitScoreFp(key: Column): Column =
    substring(key, 1, KeyWidth).cast("long") - KeyBias
  def vitSeg(key: Column): Column =
    substring(key, KeyWidth + 2, Int.MaxValue)
  def vitNPieces(key: Column): Column = size(split(vitSeg(key), " "))

  /** DuckDB replay of [[viterbiFrame]]: a WITH-fragment reading CTE
    * `words` (column `word`, other columns carried) and ending in CTE
    * `vit` with the added `vit_key`. Generated from the same vocab Seq so
    * both engines carry the identical literal model. */
  def viterbiSql(vocab: Seq[Piece], maxLen: Int): String = {
    require(maxLen <= MaxUnroll)
    val entries = vocab.map(p => s"'${p.piece}': ${p.scoreFp}").mkString(", ")
    def scoreSql(piece: String, pieceLen: Int): String =
      if (pieceLen == 1) s"COALESCE(map_extract(m, $piece)[1], $UnkScoreFp)"
      else s"map_extract(m, $piece)[1]"
    val rounds = (1 to maxLen).map { i =>
      val cands = (math.max(0, i - MaxPiece) until i).map { j =>
        val piece = s"substr(word, ${j + 1}, ${i - j})"
        val s = scoreSql(piece, i - j)
        val prev = s"dp$j"
        // no generated line may START with '|': this fragment passes
        // through the caller's stripMargin too, which would eat it
        s"""CASE WHEN $prev IS NOT NULL AND $s IS NOT NULL THEN
           |  lpad(CAST(CAST(substr($prev, 1, $KeyWidth) AS BIGINT) + $s AS VARCHAR), $KeyWidth, '0') ||
           |  '|' ||
           |  CASE WHEN len(substr($prev, ${KeyWidth + 2}, 100000)) = 0 THEN $piece
           |       ELSE substr($prev, ${KeyWidth + 2}, 100000) || ' ' || $piece END
           |END""".stripMargin
      }
      val best =
        if (cands.size == 1) cands.head
        else s"greatest(${cands.mkString(",\n")})"
      s"d$i AS (SELECT *, CASE WHEN $i <= len(word) THEN $best END AS dp$i FROM d${i - 1})"
    }
    val terminal = (1 to maxLen)
      .map(k => s"WHEN $k THEN dp$k").mkString(" ")
    s"""vm AS (SELECT MAP {$entries} AS m),
       |d0 AS (SELECT w.*, m, '$KeyBias|' AS dp0 FROM words w CROSS JOIN vm),
       |${rounds.mkString(",\n")},
       |vit AS (SELECT *, CASE len(word) $terminal END AS vit_key FROM d$maxLen)""".stripMargin
  }

  // ------------------------------------------------------------ training —

  /** Seed vocabulary: every substring of every distinct word up to
    * MaxPiece chars, frequency-weighted by word freq, scored
    * ln(freq/total) in fixed point; the `seedSize` most frequent multi-
    * char pieces (total order: freq DESC, piece ASC) plus ALL single
    * chars (coverage guarantee). */
  def seedVocab(hist: DataFrame, seedSize: Int): Seq[Piece] = {
    val subs = hist
      .select(explode(allSubstrings(col("word"))).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("f"))
    val rows = subs.collect().map(r => r.getString(0) -> r.getLong(1))
    val total = rows.map(_._2).sum
    val (single, multi) = rows.partition(_._1.length == 1)
    val kept = single ++ multi.sortBy { case (p, f) => (-f, p) }.take(seedSize)
    kept.sortBy(_._1).map { case (p, f) => Piece(p, lnFp(f, total)) }.toSeq
  }

  /** In-row list of all substrings (length 1..MaxPiece) of `word`. */
  def allSubstrings(word: Column): Column =
    flatten(transform(sequence(lit(1), length(word)), s =>
      transform(sequence(lit(1), least(lit(MaxPiece), length(word) - s + lit(1))),
        l => word.substr(s, l))))

  /** Hard-EM rounds (Viterbi counts — the deterministic, integer-exact
    * variant of Kudo §3.2's EM; forward-backward expected counts would
    * put corpus-scale float sums in the E-step, Viterbi counts keep it
    * all-integer): segment the histogram under current scores, count
    * piece usage weighted by word freq (a vocab-bounded aggregate —
    * collected like the PQ codebooks), re-score ln(usage/total), prune to
    * `shrink` of the multi-char pieces by (usage DESC, piece ASC) keeping
    * all single chars, down to at most `targetVocab`. */
  def trainEm(hist: DataFrame, seed: Seq[Piece], rounds: Int,
      targetVocab: Int, maxLen: Int, shrink: Double = 0.75): Seq[Piece] = {
    var vocab = seed
    for (_ <- 1 to rounds) {
      val usage = viterbiFrame(hist, vocab, maxLen)
        .select(explode(split(vitSeg(col("vit_key")), " ")).as("piece"), col("freq"))
        .groupBy("piece").agg(sum(col("freq")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val (single, multi) = vocab.partition(_.piece.length == 1)
      val usedMulti = multi
        .map(p => p.piece -> usage.getOrElse(p.piece, 0L))
        .filter(_._2 > 0)
        .sortBy { case (p, u) => (-u, p) }
      val keepN = math.max(targetVocab - single.size,
        math.min(usedMulti.size, math.ceil(usedMulti.size * shrink).toInt))
      val keptMulti = usedMulti.take(math.min(keepN, usedMulti.size))
      val total = keptMulti.map(_._2).sum +
        single.map(p => usage.getOrElse(p.piece, 0L)).sum
      val tot = math.max(total, 1L)
      vocab = (single.map(p =>
          Piece(p.piece, lnFp(math.max(usage.getOrElse(p.piece, 0L), 1L), tot))) ++
        keptMulti.map { case (p, u) => Piece(p, lnFp(u, tot)) })
        .sortBy(_.piece)
    }
    vocab
  }
}
