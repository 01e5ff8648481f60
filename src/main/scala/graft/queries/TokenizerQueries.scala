package graft.queries

import graft.QueryDef
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.sources.Tables
import graft.tokenizer.{Bpe, Unigram, WordPiece}
import org.apache.spark.sql.functions._

/** Tokenizer-training operators — the step between raw text and the token
  * counting / packing queries (tq02/tq10/tq11): learn a BPE vocabulary from
  * the corpus, and apply a frozen one to it.
  *
  * Scale shape: tq29/tq30 run over the DISTINCT-WORD histogram (the classic
  * BPE compression — see tokenizer/Bpe.scala), so their cost is bounded by
  * vocabulary size, not corpus size; cloning the corpus 10× leaves the
  * histogram unchanged (scale-probed). tq31 is one scan with a codegen'd
  * replace chain — pure linear, no shuffle before the tiny per-lang
  * aggregate.
  */
object TokenizerQueries {

  /** Weighted adjacent-character pair counts over the word histogram — the
    * round-1 BPE statistics, fully oracle-checked (the anchor for tq30's
    * rows-only merge table, same pattern as kq sketch/exact twins). */
  val tq29BpePairCounts: QueryDef = sqlChecked(
    "tq29_bpe_pair_counts",
    """WITH w0 AS (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents),
      |words AS (SELECT word, COUNT(*) AS freq FROM w0 WHERE word <> '' GROUP BY word),
      |cs AS (SELECT freq, string_split(word, '') AS c FROM words WHERE len(word) >= 2),
      |pairs AS (SELECT freq, unnest(list_zip(c[1:len(c)-1], c[2:len(c)])) AS p FROM cs)
      |SELECT p[1] AS left_sym, p[2] AS right_sym, CAST(SUM(freq) AS BIGINT) AS pair_freq
      |FROM pairs
      |GROUP BY 1, 2
      |ORDER BY pair_freq DESC, left_sym, right_sym
      |LIMIT 50""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Bpe.wordHistogram(Tables.documents(spark, dir))
      .filter(length($"word") >= 2)
      .select(explode(Bpe.adjacentPairs(Bpe.chars($"word"))).as("p"), $"freq")
      .groupBy($"p.l".as("left_sym"), $"p.r".as("right_sym"))
      .agg(sum($"freq").as("pair_freq"))
      .orderBy($"pair_freq".desc, $"left_sym", $"right_sym")
      .limit(50)
  }

  /** Learn 20 BPE merges from the corpus. rowsOnly: the iterative argmax +
    * merge recurrence has no SQL equivalent, but BpeSpec asserts the merge
    * table equals an independent driver-side reference implementation on
    * this same corpus, and tq29 oracle-checks the statistics the first
    * round consumes. */
  val tq30BpeMerges: QueryDef = rowsOnly("tq30_bpe_merges") { (spark, dir) =>
    import spark.implicits._
    val merges = Bpe.train(Bpe.wordHistogram(Tables.documents(spark, dir)), 20)
    spark.createDataFrame(merges)
      .select($"rank", $"left_sym", $"right_sym", $"pair_freq", $"merged")
      .orderBy($"rank")
  }

  /** Apply the frozen [[Bpe.FixedMerges]] vocabulary to the corpus: per-lang
    * subword token totals (vs character totals — the compression the
    * tokenizer buys). The whole encode is a codegen'd replace chain built
    * from the same merge list the oracle SQL is built from, so DuckDB
    * replays it mechanically — a fully oracle-checked BPE encoder. */
  val tq31BpeEncode: QueryDef = sqlChecked(
    "tq31_bpe_encode",
    s"""WITH n AS (SELECT lang, ${Bpe.sqlNorm} AS norm FROM documents),
       |e AS (SELECT lang, norm, ${Bpe.sqlEncode(Bpe.FixedMerges)} AS enc FROM n)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(len(enc) - len(replace(enc, chr(1), ''))
       |           - (len(norm) - len(replace(norm, ' ', '')))) AS BIGINT) AS total_subwords,
       |  CAST(SUM(len(replace(norm, ' ', ''))) AS BIGINT) AS total_chars
       |FROM e
       |GROUP BY lang
       |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("norm", Bpe.normText($"text"))
      .withColumn("enc", Bpe.encode($"norm", Bpe.FixedMerges))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(Bpe.subwordCount($"norm", $"enc")).cast("long").as("total_subwords"),
        sum(length(replace($"norm", lit(" "), lit("")))).cast("long").as("total_chars"))
      .orderBy($"lang")
  }

  /** Tokenizer fertility — subwords emitted per word, the standard
    * tokenizer-evaluation metric (a vocabulary trained on English pays
    * 2-3× more tokens per word on unseen languages; fertility is how you
    * see that before burning a training run). Computed per lang over the
    * DISTINCT (lang, word) histogram: each distinct word is encoded ONCE
    * with the frozen merge table and its subword count is weighted by
    * corpus frequency — the same histogram compression as tq29/tq30, so
    * the encode cost is bounded by vocabulary size, not corpus size
    * (tq31 re-encodes every document; this is the cheap path when only
    * counts are needed). All-integer aggregates plus one exact final
    * division — deterministic under any partitioning. */
  val tq32TokenizerFertility: QueryDef = sqlChecked(
    "tq32_tokenizer_fertility",
    s"""WITH n0 AS (SELECT lang, unnest(string_split(${Bpe.sqlNorm}, ' ')) AS norm
       |           FROM documents),
       |w AS (SELECT lang, norm, COUNT(*) AS freq FROM n0 WHERE norm <> ''
       |      GROUP BY lang, norm),
       |e AS (SELECT lang, freq, ${Bpe.sqlEncode(Bpe.FixedMerges)} AS enc FROM w),
       |f AS (SELECT lang, freq,
       |        len(enc) - len(replace(enc, chr(1), '')) AS fert FROM e)
       |SELECT lang,
       |  COUNT(*) AS n_distinct_words,
       |  CAST(SUM(freq) AS BIGINT) AS total_words,
       |  CAST(SUM(fert * freq) AS BIGINT) AS total_subwords,
       |  CAST(SUM(fert * freq) AS DOUBLE) / CAST(SUM(freq) AS DOUBLE) AS fertility,
       |  CAST(SUM(freq) FILTER (fert <= 2) AS BIGINT) AS words_le2_subwords,
       |  CAST(MAX(fert) AS BIGINT) AS max_fertility
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .select($"lang", explode(split(Bpe.normText($"text"), " ")).as("norm"))
      .filter($"norm" =!= "")
      .groupBy($"lang", $"norm").agg(count(lit(1)).as("freq"))
    hist
      .select($"lang", $"freq",
        Bpe.subwordCount($"norm", Bpe.encode($"norm", Bpe.FixedMerges)).as("fert"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_distinct_words"),
        sum($"freq").cast("long").as("total_words"),
        sum($"fert" * $"freq").cast("long").as("total_subwords"),
        (sum($"fert" * $"freq").cast("double") / sum($"freq").cast("double"))
          .as("fertility"),
        sum(when($"fert" <= 2, $"freq")).cast("long").as("words_le2_subwords"),
        max($"fert").cast("long").as("max_fertility"))
      .orderBy($"lang")
  }

  /** Detokenization round trip — the lossless-ness contract of the frozen
    * vocabulary, audited over the WHOLE corpus: encode then decode every
    * document and count mismatches per lang (zero by construction; the
    * oracle hash-verifies the zeros AND the decoded character totals, so
    * a broken merge table or sentinel collision shows up as a value
    * diff, not a silent pass). Same one-scan map-only shape as tq31 —
    * the decode adds two codegen'd replaces to the chain. */
  val tq34BpeDecode: QueryDef = sqlChecked(
    "tq34_bpe_decode",
    s"""WITH n AS (SELECT lang, ${Bpe.sqlNorm} AS norm FROM documents),
       |e AS (SELECT lang, norm, ${Bpe.sqlEncode(Bpe.FixedMerges)} AS enc FROM n),
       |d AS (SELECT lang, norm, ${Bpe.sqlDecode} AS dec FROM e)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN dec = norm THEN 0 ELSE 1 END) AS BIGINT) AS n_roundtrip_fail,
       |  CAST(SUM(len(dec)) AS BIGINT) AS total_decoded_chars
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("norm", Bpe.normText($"text"))
      .withColumn("dec", Bpe.decode(Bpe.encode($"norm", Bpe.FixedMerges)))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"dec" === $"norm", 0).otherwise(1)).cast("long").as("n_roundtrip_fail"),
        sum(length($"dec")).cast("long").as("total_decoded_chars"))
      .orderBy($"lang")
  }

  /** Unigram-LM seed-vocabulary statistics (Kudo 2018 §3.2's starting
    * point): every substring up to 6 chars of every distinct word,
    * frequency-weighted, with its fixed-point ln(freq/total) score — the
    * statistics the EM loop consumes, fully oracle-checked (the anchor
    * for tq38's rows-only trained vocab, exactly the tq29↔tq30 pattern).
    * One in-row substring flatten over the vocab-bounded histogram; the
    * top-100 cut is total-ordered (freq DESC, piece ASC). */
  val tq37UnigramSeed: QueryDef = sqlChecked(
    "tq37_unigram_seed",
    s"""WITH w0 AS (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents),
       |words AS (SELECT word, COUNT(*) AS freq FROM w0 WHERE word <> '' GROUP BY word),
       |subs AS (SELECT unnest(flatten(list_transform(range(1, len(word) + 1),
       |    s -> list_transform(range(1, least(${Unigram.MaxPiece}, len(word) - s + 1) + 1),
       |      l -> substr(word, s, l))))) AS piece, freq
       |  FROM words),
       |g AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS piece_freq FROM subs GROUP BY piece),
       |tot AS (SELECT SUM(piece_freq) AS n FROM g)
       |SELECT piece, piece_freq,
       |  CAST(round(ln(CAST(piece_freq AS DOUBLE) / n) * 1e9) AS BIGINT) AS score_fp
       |FROM g, tot
       |ORDER BY piece_freq DESC, piece
       |LIMIT 100""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val g = Bpe.wordHistogram(Tables.documents(spark, dir))
      .select(explode(Unigram.allSubstrings($"word")).as("piece"), $"freq")
      .groupBy($"piece").agg(sum($"freq").cast("long").as("piece_freq"))
    val tot = g.agg(sum($"piece_freq").as("n"))
    g.crossJoin(broadcast(tot))
      .select($"piece", $"piece_freq",
        round(log($"piece_freq".cast("double") / $"n") * 1e9)
          .cast("long").as("score_fp"))
      .orderBy($"piece_freq".desc, $"piece")
      .limit(100)
  }

  /** Train the unigram vocabulary: seed from substring statistics, then
    * 3 hard-EM rounds (Viterbi counts, integer fixed-point scores) over
    * the word histogram. rowsOnly: the EM recurrence has no SQL
    * equivalent, but UnigramSpec asserts the result equals an independent
    * driver-side reference implementation on this corpus and is
    * partition-invariant, and tq37 oracle-checks the statistics the seed
    * is cut from — the tq29↔tq30 anchoring, applied to the second
    * tokenizer family. */
  val tq38UnigramTrain: QueryDef = rowsOnly("tq38_unigram_train") { (spark, dir) =>
    import spark.implicits._
    val hist = Bpe.wordHistogram(Tables.documents(spark, dir))
      .filter(length($"word") <= Unigram.MaxUnroll)
    val seed = Unigram.seedVocab(hist, seedSize = 60)
    val vocab = Unigram.trainEm(hist, seed, rounds = 3, targetVocab = 50,
      maxLen = Unigram.MaxUnroll)
    spark.createDataFrame(vocab)
      .select($"piece", $"scoreFp".as("score_fp"))
      .orderBy($"piece")
  }

  /** Viterbi-encode the corpus with the frozen published piece table
    * ([[Unigram.FixedPieces]], the unigram analogue of tq31): per lang,
    * exact token totals, the fixed-point corpus log-probability, and an
    * md5 digest over every distinct word's actual SEGMENTATION — so the
    * oracle hash proves DuckDB's replay of the unrolled DP lattice picks
    * the identical parse for every word, not merely the same counts.
    * Encode cost is bounded by VOCABULARY (each distinct word parsed
    * once, weighted by corpus freq — tq32's histogram shape); the DP is
    * ~12 codegen'd projections, no UDF anywhere. Words longer than the
    * unroll bound are excluded WITH accounting (zero here; the column
    * keeps the cap loud). */
  val tq39UnigramEncode: QueryDef = sqlChecked(
    "tq39_unigram_encode",
    s"""WITH w0 AS (SELECT lang, unnest(string_split_regex(text, '\\s+')) AS word FROM documents),
       |words0 AS (SELECT lang, word, COUNT(*) AS freq FROM w0 WHERE word <> '' GROUP BY lang, word),
       |longw AS (SELECT lang, CAST(COALESCE(SUM(CASE WHEN len(word) > ${Unigram.MaxUnroll}
       |    THEN freq END), 0) AS BIGINT) AS long_words_excluded
       |  FROM words0 GROUP BY lang),
       |words AS (SELECT * FROM words0 WHERE len(word) <= ${Unigram.MaxUnroll}),
       |${Unigram.viterbiSql(Unigram.FixedPieces, Unigram.MaxUnroll)},
       |x AS (SELECT lang, word, freq,
       |    CAST(substr(vit_key, 1, ${Unigram.KeyWidth}) AS BIGINT) - ${Unigram.KeyBias} AS sfp,
       |    substr(vit_key, ${Unigram.KeyWidth + 2}, 100000) AS seg
       |  FROM vit),
       |agg AS (SELECT lang,
       |    COUNT(*) AS distinct_words,
       |    CAST(SUM(freq) AS BIGINT) AS word_occurrences,
       |    CAST(SUM(len(string_split(seg, ' ')) * freq) AS BIGINT) AS token_count,
       |    CAST(SUM(sfp * freq) AS BIGINT) AS corpus_logprob_fp,
       |    md5(string_agg(word || ':' || seg, '|' ORDER BY word)) AS seg_digest
       |  FROM x GROUP BY lang)
       |SELECT a.lang, distinct_words, word_occurrences, token_count,
       |  corpus_logprob_fp, seg_digest,
       |  CAST(token_count AS DOUBLE) / word_occurrences AS tokens_per_word,
       |  long_words_excluded
       |FROM agg a JOIN longw l ON a.lang = l.lang
       |ORDER BY a.lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val words0 = Tables.documents(spark, dir)
      .select($"lang", explode(split($"text", "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"lang", $"word").agg(count(lit(1)).as("freq"))
    val longW = words0.groupBy($"lang")
      .agg(coalesce(sum(when(length($"word") > Unigram.MaxUnroll, $"freq")), lit(0L))
        .cast("long").as("long_words_excluded"))
    val vit = Unigram.viterbiFrame(
      words0.filter(length($"word") <= Unigram.MaxUnroll),
      Unigram.FixedPieces, Unigram.MaxUnroll)
    val x = vit.select($"lang", $"word", $"freq",
      Unigram.vitScoreFp($"vit_key").as("sfp"),
      Unigram.vitSeg($"vit_key").as("seg"))
    val agg = x.groupBy($"lang")
      .agg(
        count(lit(1)).as("distinct_words"),
        sum($"freq").cast("long").as("word_occurrences"),
        sum(size(split($"seg", " ")) * $"freq").cast("long").as("token_count"),
        sum($"sfp" * $"freq").cast("long").as("corpus_logprob_fp"),
        // sort by word (structs sort field-by-field; words are distinct per
        // lang group) to match the oracle's ORDER BY word — sorting the
        // concatenated 'word:seg' strings diverges when one word is a
        // proper prefix of another whose next char sorts below ':' (0x3a),
        // e.g. 'agg' vs 'agg1'.
        md5(concat_ws("|", transform(
          array_sort(collect_list(struct($"word", $"seg"))),
          e => concat(e("word"), lit(":"), e("seg"))))).as("seg_digest"))
    agg.join(longW, Seq("lang"))
      .withColumn("tokens_per_word",
        $"token_count".cast("double") / $"word_occurrences")
      .orderBy($"lang")
  }

  /** Head-to-head tokenizer evaluation: the frozen BPE merge table vs the
    * frozen unigram piece table on the SAME corpus, per lang — subword
    * totals, fertilities, and how many word occurrences each algorithm
    * parses shorter. This is the comparison a pipeline runs before
    * committing a vocabulary to a training run; both encoders execute
    * their full production path (20-replace chain; unrolled Viterbi
    * lattice) over the distinct (lang, word) histogram, so the cost is
    * vocab-bounded and the oracle replays BOTH codegen chains in one
    * query. All-integer aggregates + two exact final divisions. */
  val tq40TokenizerCompare: QueryDef = sqlChecked(
    "tq40_tokenizer_compare",
    s"""WITH w0 AS (SELECT lang, unnest(string_split_regex(text, '\\s+')) AS w FROM documents),
       |words AS (SELECT lang, w AS word, w AS norm, COUNT(*) AS freq
       |  FROM w0 WHERE w <> '' AND len(w) <= ${Unigram.MaxUnroll}
       |  GROUP BY lang, w),
       |${Unigram.viterbiSql(Unigram.FixedPieces, Unigram.MaxUnroll)},
       |b AS (SELECT lang, freq,
       |    len(string_split(substr(vit_key, ${Unigram.KeyWidth + 2}, 100000), ' ')) AS uni_n,
       |    ${Bpe.sqlEncode(Bpe.FixedMerges)} AS enc
       |  FROM vit),
       |f AS (SELECT lang, freq, uni_n,
       |    len(enc) - len(replace(enc, chr(1), '')) AS bpe_n FROM b)
       |SELECT lang,
       |  COUNT(*) AS distinct_words,
       |  CAST(SUM(freq) AS BIGINT) AS word_occurrences,
       |  CAST(SUM(bpe_n * freq) AS BIGINT) AS bpe_subwords,
       |  CAST(SUM(uni_n * freq) AS BIGINT) AS unigram_subwords,
       |  CAST(SUM(bpe_n * freq) AS DOUBLE) / SUM(freq) AS bpe_fertility,
       |  CAST(SUM(uni_n * freq) AS DOUBLE) / SUM(freq) AS unigram_fertility,
       |  CAST(SUM(CASE WHEN uni_n < bpe_n THEN freq ELSE 0 END) AS BIGINT) AS unigram_shorter_occ,
       |  CAST(SUM(CASE WHEN bpe_n < uni_n THEN freq ELSE 0 END) AS BIGINT) AS bpe_shorter_occ
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select($"lang", explode(split($"text", "\\s+")).as("w"))
      .filter($"w" =!= "" && length($"w") <= Unigram.MaxUnroll)
      .groupBy($"lang", $"w").agg(count(lit(1)).as("freq"))
      .select($"lang", $"w".as("word"), $"w".as("norm"), $"freq")
    val f = Unigram.viterbiFrame(words, Unigram.FixedPieces, Unigram.MaxUnroll)
      .withColumn("uni_n", Unigram.vitNPieces($"vit_key"))
      .withColumn("bpe_n",
        Bpe.subwordCount($"norm", Bpe.encode($"norm", Bpe.FixedMerges)))
    f.groupBy($"lang")
      .agg(
        count(lit(1)).as("distinct_words"),
        sum($"freq").cast("long").as("word_occurrences"),
        sum($"bpe_n" * $"freq").cast("long").as("bpe_subwords"),
        sum($"uni_n" * $"freq").cast("long").as("unigram_subwords"),
        (sum($"bpe_n" * $"freq").cast("double") / sum($"freq")).as("bpe_fertility"),
        (sum($"uni_n" * $"freq").cast("double") / sum($"freq")).as("unigram_fertility"),
        sum(when($"uni_n" < $"bpe_n", $"freq").otherwise(0L)).cast("long")
          .as("unigram_shorter_occ"),
        sum(when($"bpe_n" < $"uni_n", $"freq").otherwise(0L)).cast("long")
          .as("bpe_shorter_occ"))
      .orderBy($"lang")
  }

  /** WordPiece encode over the corpus — the THIRD production tokenizer
    * family (Wu et al. 2016; BERT's tokenizer) next to BPE (tq31) and
    * unigram-LM (tq39), completing the trilogy every pipeline picks
    * from: greedy longest-match-first against a frozen vocabulary with
    * a separate `##` continuation table. Same histogram compression as
    * the siblings (encode touches DISTINCT words only; clone-invariant),
    * same unroll move (≤ 12 codegen'd projections, each a literal-vocab
    * `greatest` argmax over exact integer match lengths — no join, no
    * UDF), and the oracle replays the identical unroll
    * ([[graft.tokenizer.WordPiece.greedySql]]) so per-lang token counts,
    * fertility, AND the md5 digest of every word's segmentation are
    * hash-checked. WordPieceSpec additionally proves the engine column
    * equals the plain-Scala greedy reference word for word. */
  val tq44WordpieceEncode: QueryDef = sqlChecked(
    "tq44_wordpiece_encode",
    s"""WITH w0 AS (SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
       |  FROM documents),
       |words0 AS (SELECT lang, word, COUNT(*) AS freq FROM w0 WHERE word <> ''
       |  GROUP BY lang, word),
       |longw AS (SELECT lang, CAST(COALESCE(SUM(CASE WHEN len(word) > ${WordPiece.MaxUnroll}
       |    THEN freq END), 0) AS BIGINT) AS long_words_excluded
       |  FROM words0 GROUP BY lang),
       |words AS (SELECT * FROM words0 WHERE len(word) <= ${WordPiece.MaxUnroll}),
       |${WordPiece.greedySql(WordPiece.FixedVocab, WordPiece.MaxUnroll)},
       |x AS (SELECT lang, word, freq,
       |    CAST(substr(wp, 3, 2) AS INT) AS n_pieces,
       |    substr(wp, 6, 100000) AS seg
       |  FROM wpz),
       |agg AS (SELECT lang,
       |    COUNT(*) AS distinct_words,
       |    CAST(SUM(freq) AS BIGINT) AS word_occurrences,
       |    CAST(SUM(n_pieces * freq) AS BIGINT) AS token_count,
       |    md5(string_agg(word || ':' || seg, '|' ORDER BY word)) AS seg_digest
       |  FROM x GROUP BY lang)
       |SELECT a.lang, distinct_words, word_occurrences, token_count,
       |  CAST(token_count AS DOUBLE) / word_occurrences AS tokens_per_word,
       |  seg_digest, long_words_excluded
       |FROM agg a JOIN longw l ON a.lang = l.lang
       |ORDER BY a.lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.tokenizer.WordPiece
    val words0 = Tables.documents(spark, dir)
      .select($"lang", explode(split(lower($"text"), "[^a-z0-9]+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"lang", $"word").agg(count(lit(1)).as("freq"))
    val longW = words0.groupBy($"lang")
      .agg(coalesce(sum(when(length($"word") > WordPiece.MaxUnroll, $"freq")), lit(0L))
        .cast("long").as("long_words_excluded"))
    val wp = WordPiece.greedyFrame(
      words0.filter(length($"word") <= WordPiece.MaxUnroll),
      WordPiece.FixedVocab, WordPiece.MaxUnroll)
    val x = wp.select($"lang", $"word", $"freq",
      WordPiece.wpNPieces($"wp").as("n_pieces"),
      WordPiece.wpSeg($"wp").as("seg"))
    val agg = x.groupBy($"lang")
      .agg(
        count(lit(1)).as("distinct_words"),
        sum($"freq").cast("long").as("word_occurrences"),
        sum($"n_pieces" * $"freq").cast("long").as("token_count"),
        // sort by word (structs sort field-by-field; words are distinct per
        // lang group) to match the oracle's ORDER BY word — sorting the
        // concatenated 'word:seg' strings diverges when one word is a
        // proper prefix of another whose next char sorts below ':' (0x3a),
        // e.g. 'agg' vs 'agg1'.
        md5(concat_ws("|", transform(
          array_sort(collect_list(struct($"word", $"seg"))),
          e => concat(e("word"), lit(":"), e("seg"))))).as("seg_digest"))
    agg.join(longW, Seq("lang"))
      .select($"lang", $"distinct_words", $"word_occurrences", $"token_count",
        ($"token_count".cast("double") / $"word_occurrences").as("tokens_per_word"),
        $"seg_digest", $"long_words_excluded")
      .orderBy($"lang")
  }

  /** tq47's `max_input_chars_per_word`: set BELOW the corpus's longest
    * words (max observed 8) so the [UNK] arm carries real weight — at
    * the unroll bound (12) the tail would be empty and the fallback
    * untested. The parameter is exactly what it is in production
    * (HuggingFace defaults it to 100 for BERT's vocab); the unroll
    * shrinks with it, so this arm is also the cheapest encoder. */
  private val MaxChars = 6

  /** WordPiece [UNK] fallback arm — what production BERT tokenization
    * actually does with the long-word tail tq44 excludes: any word over
    * max_input_chars_per_word (here 6, below the corpus max of 8, so the
    * tail genuinely exercises the arm) is emitted as ONE [UNK] token,
    * never segmented (Wu et al. 2016; HuggingFace
    * `max_input_chars_per_word`). One frame carries both arms per lang —
    * the greedy-encoded short words and the [UNK]-collapsed tail — and
    * reports the tail's size as a FRACTION of word occurrences plus the
    * resulting [UNK] token rate, the two numbers a pipeline checks
    * before freezing a vocab (a high long-word fraction means the
    * pre-tokenizer, not the vocab, is wrong). Histogram-compressed and
    * clone-invariant like its siblings; the oracle replays the full
    * greedy unroll and the fallback arithmetic. */
  val tq47WordpieceUnkFallback: QueryDef = sqlChecked(
    "tq47_wordpiece_unk_fallback",
    s"""WITH w0 AS (SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
       |  FROM documents),
       |words0 AS (SELECT lang, word, COUNT(*) AS freq FROM w0 WHERE word <> ''
       |  GROUP BY lang, word),
       |words AS (SELECT * FROM words0 WHERE len(word) <= $MaxChars),
       |${WordPiece.greedySql(WordPiece.FixedVocab, MaxChars)},
       |u AS (
       |  SELECT lang, freq, CAST(substr(wp, 3, 2) AS INT) AS n_pieces, 0 AS unk
       |  FROM wpz
       |  UNION ALL
       |  SELECT lang, freq, 1 AS n_pieces, 1 AS unk
       |  FROM words0 WHERE len(word) > $MaxChars)
       |SELECT lang,
       |  COUNT(*) AS distinct_words,
       |  CAST(SUM(freq) AS BIGINT) AS word_occurrences,
       |  CAST(SUM(unk * freq) AS BIGINT) AS unk_word_occurrences,
       |  CAST(SUM(unk * freq) AS DOUBLE) / SUM(freq) AS long_word_fraction,
       |  CAST(SUM(n_pieces * freq) AS BIGINT) AS token_count,
       |  CAST(SUM(unk * freq) AS DOUBLE) / SUM(n_pieces * freq) AS unk_rate,
       |  CAST(SUM(n_pieces * freq) AS DOUBLE) / SUM(freq) AS tokens_per_word
       |FROM u GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.tokenizer.WordPiece
    val words0 = Tables.documents(spark, dir)
      .select($"lang", explode(split(lower($"text"), "[^a-z0-9]+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"lang", $"word").agg(count(lit(1)).as("freq"))
    val wp = WordPiece.greedyFrame(
      words0.filter(length($"word") <= MaxChars),
      WordPiece.FixedVocab, MaxChars)
    val shortArm = wp.select($"lang", $"freq",
      WordPiece.wpNPieces($"wp").as("n_pieces"), lit(0).as("unk"))
    val unkArm = words0.filter(length($"word") > MaxChars)
      .select($"lang", $"freq", lit(1).as("n_pieces"), lit(1).as("unk"))
    shortArm.unionByName(unkArm)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("distinct_words"),
        sum($"freq").cast("long").as("word_occurrences"),
        sum($"unk" * $"freq").cast("long").as("unk_word_occurrences"),
        (sum($"unk" * $"freq").cast("double") / sum($"freq"))
          .as("long_word_fraction"),
        sum($"n_pieces" * $"freq").cast("long").as("token_count"),
        (sum($"unk" * $"freq").cast("double") / sum($"n_pieces" * $"freq"))
          .as("unk_rate"),
        (sum($"n_pieces" * $"freq").cast("double") / sum($"freq"))
          .as("tokens_per_word"))
      .orderBy($"lang")
  }

  /** Three-way tokenizer evaluation — the full production choice set
    * head-to-head on ONE word universe: BPE's replace chain (tq31),
    * unigram-LM's Viterbi lattice (tq39), and WordPiece's greedy
    * longest-match (tq44), each running its complete encode unroll over
    * the same [a-z0-9] distinct-word histogram, with per-lang subword
    * totals, fertilities, and strictly-shortest occurrence counts (which
    * algorithm wins on how much of the corpus). tq40 compares the first
    * two on the raw-token universe; this completes the trilogy on the
    * universe WordPiece's vocabulary covers. One frame carries all three
    * unrolls — the oracle replays every lattice/chain and the hash
    * checks the whole comparison. Vocab-bounded cost (histogram only,
    * clone-invariant like its siblings). */
  val tq46TokenizerTriple: QueryDef = sqlChecked(
    "tq46_tokenizer_triple",
    s"""WITH w0 AS (SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
       |  FROM documents),
       |words AS (SELECT lang, w AS word, w AS norm, COUNT(*) AS freq
       |  FROM w0 WHERE w <> '' AND len(w) <= ${Unigram.MaxUnroll}
       |  GROUP BY lang, w),
       |${Unigram.viterbiSql(Unigram.FixedPieces, Unigram.MaxUnroll)},
       |${WordPiece.greedySql(WordPiece.FixedVocab, WordPiece.MaxUnroll)},
       |b AS (SELECT vit.lang, vit.freq,
       |    len(string_split(substr(vit_key, ${Unigram.KeyWidth + 2}, 100000), ' ')) AS uni_n,
       |    ${Bpe.sqlEncode(Bpe.FixedMerges)} AS enc,
       |    CAST(substr(z.wp, 3, 2) AS INT) AS wp_n
       |  FROM vit JOIN wpz z ON vit.lang = z.lang AND vit.word = z.word),
       |f AS (SELECT lang, freq, uni_n, wp_n,
       |    len(enc) - len(replace(enc, chr(1), '')) AS bpe_n FROM b)
       |SELECT lang,
       |  COUNT(*) AS distinct_words,
       |  CAST(SUM(freq) AS BIGINT) AS word_occurrences,
       |  CAST(SUM(bpe_n * freq) AS BIGINT) AS bpe_subwords,
       |  CAST(SUM(uni_n * freq) AS BIGINT) AS unigram_subwords,
       |  CAST(SUM(wp_n * freq) AS BIGINT) AS wordpiece_subwords,
       |  CAST(SUM(bpe_n * freq) AS DOUBLE) / SUM(freq) AS bpe_fertility,
       |  CAST(SUM(uni_n * freq) AS DOUBLE) / SUM(freq) AS unigram_fertility,
       |  CAST(SUM(wp_n * freq) AS DOUBLE) / SUM(freq) AS wordpiece_fertility,
       |  CAST(SUM(CASE WHEN bpe_n < uni_n AND bpe_n < wp_n THEN freq ELSE 0 END) AS BIGINT)
       |    AS bpe_strictly_shortest_occ,
       |  CAST(SUM(CASE WHEN uni_n < bpe_n AND uni_n < wp_n THEN freq ELSE 0 END) AS BIGINT)
       |    AS unigram_strictly_shortest_occ,
       |  CAST(SUM(CASE WHEN wp_n < bpe_n AND wp_n < uni_n THEN freq ELSE 0 END) AS BIGINT)
       |    AS wordpiece_strictly_shortest_occ
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select($"lang", explode(split(lower($"text"), "[^a-z0-9]+")).as("w"))
      .filter($"w" =!= "" && length($"w") <= Unigram.MaxUnroll)
      .groupBy($"lang", $"w").agg(count(lit(1)).as("freq"))
      .select($"lang", $"w".as("word"), $"w".as("norm"), $"freq")
    val f = WordPiece.greedyFrame(
        Unigram.viterbiFrame(words, Unigram.FixedPieces, Unigram.MaxUnroll),
        WordPiece.FixedVocab, WordPiece.MaxUnroll)
      .withColumn("uni_n", Unigram.vitNPieces($"vit_key"))
      .withColumn("wp_n", WordPiece.wpNPieces($"wp"))
      .withColumn("bpe_n",
        Bpe.subwordCount($"norm", Bpe.encode($"norm", Bpe.FixedMerges)))
    f.groupBy($"lang")
      .agg(
        count(lit(1)).as("distinct_words"),
        sum($"freq").cast("long").as("word_occurrences"),
        sum($"bpe_n" * $"freq").cast("long").as("bpe_subwords"),
        sum($"uni_n" * $"freq").cast("long").as("unigram_subwords"),
        sum($"wp_n" * $"freq").cast("long").as("wordpiece_subwords"),
        (sum($"bpe_n" * $"freq").cast("double") / sum($"freq")).as("bpe_fertility"),
        (sum($"uni_n" * $"freq").cast("double") / sum($"freq")).as("unigram_fertility"),
        (sum($"wp_n" * $"freq").cast("double") / sum($"freq")).as("wordpiece_fertility"),
        sum(when($"bpe_n" < $"uni_n" && $"bpe_n" < $"wp_n", $"freq").otherwise(0L))
          .cast("long").as("bpe_strictly_shortest_occ"),
        sum(when($"uni_n" < $"bpe_n" && $"uni_n" < $"wp_n", $"freq").otherwise(0L))
          .cast("long").as("unigram_strictly_shortest_occ"),
        sum(when($"wp_n" < $"bpe_n" && $"wp_n" < $"uni_n", $"freq").otherwise(0L))
          .cast("long").as("wordpiece_strictly_shortest_occ"))
      .orderBy($"lang")
  }

  val all: Seq[QueryDef] =
    Seq(tq29BpePairCounts, tq30BpeMerges, tq31BpeEncode, tq32TokenizerFertility,
      tq34BpeDecode, tq37UnigramSeed, tq38UnigramTrain, tq39UnigramEncode,
      tq40TokenizerCompare, tq44WordpieceEncode, tq46TokenizerTriple,
      tq47WordpieceUnkFallback)
}
