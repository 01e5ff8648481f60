package graft.queries

import graft.QueryDef
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.sources.Tables
import graft.tokenizer.Bpe
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

  val all: Seq[QueryDef] =
    Seq(tq29BpePairCounts, tq30BpeMerges, tq31BpeEncode, tq32TokenizerFertility,
      tq34BpeDecode)
}
