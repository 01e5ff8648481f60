package graft.tokenizer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer — greedy longest-match-first subword encoding
  * (Wu et al. 2016, arXiv:1609.08144 §4.1; the BERT tokenizer), the
  * third production tokenizer family next to BPE (bottom-up merges,
  * Bpe.scala) and unigram-LM (Viterbi pruning, Unigram.scala): from
  * position p in a word, consume the LONGEST vocabulary entry matching
  * word[p..] — entries at p > 0 come from the separate continuation
  * (`##`) vocabulary — and repeat until the word is consumed.
  *
  * Scale shape: tq30's histogram compression verbatim — encoding only
  * touches the DISTINCT-WORD histogram. The greedy loop is UNROLLED
  * into ≤ MaxUnroll codegen'd projections (one per consumed piece; each
  * step consumes ≥ 1 char because every single character is in both
  * vocabularies, so no UNK branch is reachable); the longest-match
  * argmax at each step is a `greatest` over per-entry CASE lengths —
  * a literal-vocab expression, no join, no UDF. The DuckDB oracle
  * replays the identical unroll ([[greedySql]]).
  *
  * Determinism: the argmax is over exact integer lengths (at most one
  * vocabulary entry of a given length can prefix-match), state packs
  * (pos, n_tokens, segmentation) into a string — no floats anywhere. */
object WordPiece {

  /** Unroll bound, shared with Unigram so the exclusion accounting in
    * queries lines up across tokenizer families. */
  val MaxUnroll: Int = Unigram.MaxUnroll

  /** A "published" frozen vocabulary (the Bpe.FixedMerges analogue):
    * every [a-z0-9] character in BOTH positions (full coverage — greedy
    * always advances), plus domain subwords with the start/continuation
    * split a real WordPiece vocab has (e.g. "part" word-initial but
    * "##tion" only word-internal). */
  val FixedVocab: Seq[(String, Boolean)] = {
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString)
    val starts = Seq(
      "table", "query", "value", "batch", "spark", "merge", "scan", "sort",
      "join", "hash", "part", "key", "row", "agg", "fast", "slow", "stream",
      "window", "column", "filter", "the", "re", "un", "over", "in", "on")
    val conts = Seq(
      "ing", "ed", "er", "es", "ly", "tion", "s", "able", "ment", "ness",
      "ow", "ue", "ry", "le", "st", "an", "ar", "al", "om", "us", "ine",
      "art", "ast")
    chars.map(_ -> false) ++ chars.map(_ -> true) ++
      starts.map(_ -> false) ++ conts.map(_ -> true)
  }

  // -------------------------------------------------------- plain Scala

  /** Reference implementation (spec ground truth): greedy longest match,
    * `##`-prefixed continuation pieces. */
  def encodeScala(word: String, vocab: Seq[(String, Boolean)] = FixedVocab): Seq[String] = {
    val starts = vocab.collect { case (t, false) => t }.toSet
    val conts = vocab.collect { case (t, true) => t }.toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < word.length) {
      val table = if (p == 0) starts else conts
      val best = (word.length - p to 1 by -1)
        .map(l => word.substring(p, p + l)).find(table.contains)
        .getOrElse(sys.error(s"no match in $word at $p — chars must cover"))
      out += (if (p == 0) best else "##" + best)
      p += best.length
    }
    out.toSeq
  }

  // ------------------------------------------------------------- engine

  private val PosW = 2 // MaxUnroll ≤ 12 fits two digits

  /** Add the packed greedy state `wp` = "PPNN|seg" to a frame with a
    * `word` column (callers pre-filter length(word) <= maxLen). After
    * the unroll: PP = len(word), NN = piece count, seg = the space-
    * joined segmentation with ## continuation marks. */
  /** Tokens grouped by (continuation, length) → one membership test per
    * group instead of one CASE per token: the argmax tree per step is
    * ~2×maxTokLen branches, not |vocab| — the difference between a
    * codegen-friendly projection and a 100-branch blowup per unroll
    * step (measured 34.6 s → small at sf0.1). */
  private def byLen(vocab: Seq[(String, Boolean)], cont: Boolean): Seq[(Int, Seq[String])] =
    vocab.filter(_._2 == cont).map(_._1).groupBy(_.length).toSeq
      .sortBy(-_._1).map { case (l, ts) => (l, ts.sorted) }

  def greedyFrame(words: DataFrame, vocab: Seq[(String, Boolean)],
      maxLen: Int): DataFrame = {
    require(maxLen <= MaxUnroll, s"unroll bound $maxLen exceeds $MaxUnroll")
    var df = words.withColumn("wp0", lit("0" * PosW + "00|"))
    for (i <- 1 to maxLen) {
      val prev = col(s"wp${i - 1}")
      val pos = substring(prev, 1, PosW).cast("int")
      val ntok = substring(prev, PosW + 1, 2).cast("int")
      val seg = substring(prev, PosW + 4, Int.MaxValue)
      def arm(cont: Boolean) = greatest(byLen(vocab, cont).map { case (l, ts) =>
        when(col("word").substr(pos + lit(1), lit(l)).isin(ts: _*), lit(l))
          .otherwise(lit(0))
      }: _*)
      val bestLen = when(pos === 0, arm(false)).otherwise(arm(true))
      val piece = col("word").substr(pos + lit(1), bestLen)
      val pieceTok = when(pos > 0, concat(lit("##"), piece)).otherwise(piece)
      val newState = concat(
        lpad((pos + bestLen).cast("string"), PosW, "0"),
        lpad((ntok + 1).cast("string"), 2, "0"), lit("|"),
        when(length(seg) === 0, pieceTok)
          .otherwise(concat(seg, lit(" "), pieceTok)))
      df = df.withColumn(s"wp$i",
        when(pos < length(col("word")), newState).otherwise(prev))
    }
    df.withColumn("wp", col(s"wp$maxLen"))
      .drop((0 to maxLen).map(i => s"wp$i"): _*)
  }

  def wpNPieces(wp: Column): Column =
    substring(wp, PosW + 1, 2).cast("int")

  def wpSeg(wp: Column): Column = substring(wp, PosW + 4, Int.MaxValue)

  /** DuckDB CTE chain replaying [[greedyFrame]] mechanically: reads CTE
    * `words(lang, word, freq)`, ends in CTE `wpz(lang, word, freq, wp)`. */
  def greedySql(vocab: Seq[(String, Boolean)], maxLen: Int): String = {
    require(maxLen <= MaxUnroll)
    def esc(s: String) = s.replace("'", "''")
    def armSql(cont: Boolean) = byLen(vocab, cont).map { case (l, ts) =>
      val inList = ts.map(t => s"'${esc(t)}'").mkString(", ")
      s"CASE WHEN substr(word, p + 1, $l) IN ($inList) THEN $l ELSE 0 END"
    }.mkString(",\n          ")
    val steps = (1 to maxLen).map { i =>
      val cases =
        s"""CASE WHEN p = 0 THEN GREATEST(
           |          ${armSql(false)})
           |        ELSE GREATEST(
           |          ${armSql(true)}) END""".stripMargin
      s"""s$i AS (
         |  SELECT lang, word, freq,
         |    CASE WHEN p < len(word) THEN
         |      lpad(CAST(p + bl AS VARCHAR), $PosW, '0') ||
         |      lpad(CAST(t + 1 AS VARCHAR), 2, '0') || '|' ||
         |      CASE WHEN sg = '' THEN pc ELSE sg || ' ' || pc END
         |    ELSE wp END AS wp
         |  FROM (
         |    SELECT *, CASE WHEN p > 0 THEN '##' || substr(word, p + 1, bl)
         |      ELSE substr(word, p + 1, bl) END AS pc
         |    FROM (
         |      SELECT lang, word, freq, wp, p, t, sg,
         |        $cases AS bl
         |      FROM (SELECT lang, word, freq, wp,
         |        CAST(substr(wp, 1, $PosW) AS INT) AS p,
         |        CAST(substr(wp, ${PosW + 1}, 2) AS INT) AS t,
         |        substr(wp, ${PosW + 4}, 100000) AS sg
         |      FROM s${i - 1}))))""".stripMargin
    }
    s"""s0 AS (SELECT lang, word, freq, '${"0" * PosW}00|' AS wp FROM words),
       |${steps.mkString(",\n")},
       |wpz AS MATERIALIZED (SELECT lang, word, freq, wp FROM s$maxLen)""".stripMargin
  }
}
