package graft.queries

import graft.QueryDef
import graft.QueryDef.sqlChecked
import graft.sources.Tables
import graft.util.Num._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus filtering / cleaning battery — the quality-and-safety passes a
  * training-data pipeline runs between ingest and tokenization. All four
  * are single-scan, in-row computations (regex + array built-ins inside
  * whole-stage codegen) feeding one aggregation — the only shape that
  * survives a 100 TB corpus — and all are DuckDB-oracle-checked.
  */
object FilterQueries {

  /** Sensitive-term redaction: masks a term list with word-boundary
    * regexes and accounts for every replacement (the redaction machinery
    * of a PII pass — same regexp_replace/regexp-count plumbing, fixture-
    * visible pattern). Accounting rides the same scan as the rewrite. */
  val fq01TermRedaction: QueryDef = sqlChecked(
    "fq01_term_redaction",
    """SELECT lang,
      |  COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (len(regexp_extract_all(text, '\bcustomer\b')) > 0) AS n_docs_hit,
      |  CAST(SUM(len(regexp_extract_all(text, '\bcustomer\b'))) AS BIGINT) AS n_redactions,
      |  CAST(SUM(len(regexp_replace(text, '\bcustomer\b', '<REDACTED>', 'g'))
      |    - len(text)) AS BIGINT) AS added_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val hits = regexp_count($"text", lit("\\bcustomer\\b"))
    Tables.documents(spark, dir)
      .select($"lang", hits.as("hits"),
        (length(regexp_replace($"text", "\\bcustomer\\b", "<REDACTED>")) -
          length($"text")).as("delta"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when($"hits" > 0, 1)).as("n_docs_hit"),
        sum($"hits").cast("long").as("n_redactions"),
        sum($"delta").cast("long").as("added_chars"))
      .orderBy($"lang")
  }

  /** Quality-filter funnel (Gopher-rule shape): independent rule-failure
    * counts plus the survivors — funnel accounting tells you WHICH rule
    * is eating the corpus, and it all rides one scan. */
  val fq02FilterFunnel: QueryDef = sqlChecked(
    "fq02_filter_funnel",
    """WITH f AS (
      |  SELECT
      |    len(toks) AS n_tokens,
      |    CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
      |      / len(toks) AS mean_len,
      |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_frac,
      |    list_contains(toks, 'the') OR list_contains(toks, 'a') AS has_stopword
      |  FROM (SELECT string_split(text, ' ') AS toks FROM documents))
      |SELECT COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (n_tokens < 30) AS fail_too_short,
      |  COUNT(*) FILTER (mean_len < 2.0 OR mean_len > 8.0) AS fail_word_len,
      |  COUNT(*) FILTER (distinct_frac < 0.5) AS fail_repetitious,
      |  COUNT(*) FILTER (NOT has_stopword) AS fail_no_stopword,
      |  COUNT(*) FILTER (n_tokens >= 30 AND mean_len >= 2.0 AND mean_len <= 8.0
      |    AND distinct_frac >= 0.5 AND has_stopword) AS n_pass
      |FROM f""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val f = Tables.documents(spark, dir)
      .select(split($"text", " ").as("toks"))
      .select(
        size($"toks").as("n_tokens"),
        (aggregate($"toks", lit(0), (acc, x) => acc + length(x)).cast("double") /
          size($"toks")).as("mean_len"),
        (size(array_distinct($"toks")).cast("double") / size($"toks"))
          .as("distinct_frac"),
        (array_contains($"toks", "the") || array_contains($"toks", "a"))
          .as("has_stopword"))
    f.agg(
      count(lit(1)).as("n_docs"),
      count(when($"n_tokens" < 30, 1)).as("fail_too_short"),
      count(when($"mean_len" < 2.0 || $"mean_len" > 8.0, 1)).as("fail_word_len"),
      count(when($"distinct_frac" < 0.5, 1)).as("fail_repetitious"),
      count(when(!$"has_stopword", 1)).as("fail_no_stopword"),
      count(when($"n_tokens" >= 30 && $"mean_len" >= 2.0 && $"mean_len" <= 8.0 &&
        $"distinct_frac" >= 0.5 && $"has_stopword", 1)).as("n_pass"))
  }

  /** Repetition detection: duplicate-token and duplicate-bigram fractions
    * per document (the Gopher repetition filters), aggregated per lang —
    * all computed inside the row from the token array, no explode. */
  val fq03Repetition: QueryDef = sqlChecked(
    "fq03_repetition",
    s"""WITH r AS (
      |  SELECT lang,
      |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_tok_frac,
      |    1.0 - CAST(len(list_distinct(list_transform(range(len(toks) - 1),
      |        i -> concat(toks[i+1], ' ', toks[i+2])))) AS DOUBLE)
      |      / (len(toks) - 1) AS dup_bigram_frac
      |  FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 2)
      |SELECT lang,
      |  ${sqlDavg("dup_tok_frac")} AS avg_dup_tok,
      |  ${sqlDavg("dup_bigram_frac")} AS avg_dup_bigram,
      |  COUNT(*) FILTER (dup_bigram_frac > 0.2) AS n_flagged
      |FROM r
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val toksCol = split($"text", " ")
    val r = Tables.documents(spark, dir)
      .select($"lang", toksCol.as("toks"))
      .filter(size($"toks") >= 2)
      .select($"lang",
        (lit(1.0) - size(array_distinct($"toks")).cast("double") / size($"toks"))
          .as("dup_tok_frac"),
        (lit(1.0) - size(graft.dedup.Shingles.shinglesN($"toks", 2))
          .cast("double") / (size($"toks") - 1)).as("dup_bigram_frac"))
    r.groupBy($"lang")
      .agg(
        davg($"dup_tok_frac").as("avg_dup_tok"),
        davg($"dup_bigram_frac").as("avg_dup_bigram"),
        count(when($"dup_bigram_frac" > 0.2, 1)).as("n_flagged"))
      .orderBy($"lang")
  }

  /** Corpus mixing: given target language weights, compute the largest
    * total the available per-lang counts can serve at those proportions
    * (budget = min over langs of n_l / w_l), then draw each language's
    * share with the deterministic md5-threshold sample — reproducible on
    * any cluster layout, no shuffle beyond the count aggregation. */
  val fq04CorpusMixing: QueryDef = sqlChecked(
    "fq04_corpus_mixing",
    """WITH w(lang, wt) AS (VALUES ('en', 0.4), ('zh', 0.2), ('fr', 0.2), ('de', 0.1), ('es', 0.1)),
      |avail AS (SELECT lang, COUNT(*) AS n_avail FROM documents GROUP BY lang),
      |budget AS (SELECT min(n_avail / wt) AS b FROM avail JOIN w USING (lang)),
      |frac AS (
      |  SELECT lang, n_avail, wt, LEAST(1.0, wt * b / n_avail) AS f
      |  FROM avail JOIN w USING (lang), budget),
      |sampled AS (
      |  SELECT d.lang, COUNT(*) AS n_sampled
      |  FROM documents d JOIN frac ON d.lang = frac.lang
      |  WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    < CAST(FLOOR(frac.f * 4294967296.0) AS BIGINT)
      |  GROUP BY d.lang)
      |SELECT lang, n_avail, wt AS target_weight, n_sampled
      |FROM frac LEFT JOIN sampled USING (lang)
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val w = Seq(("en", 0.4), ("zh", 0.2), ("fr", 0.2), ("de", 0.1), ("es", 0.1))
      .toDF("lang", "wt")
    val avail = docs.groupBy($"lang").agg(count(lit(1)).as("n_avail"))
    // cache the per-lang summary (≤|langs| rows): it feeds the budget
    // scalar, the sampled draw, AND the final stitch — without it each DAG
    // reuse re-runs the corpus count aggregate (4 extra full scans at
    // 100 TB for a 5-row frame)
    val aw = avail.join(broadcast(w), "lang").cache()
    val frac = aw
      .crossJoin(broadcast(aw.agg(min($"n_avail" / $"wt").as("b"))))
      .select($"lang", $"n_avail", $"wt",
        least(lit(1.0), $"wt" * $"b" / $"n_avail").as("f"))
    val sampled = docs.join(broadcast(frac), "lang")
      .filter(
        conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long") <
          ($"f" * 4294967296.0).cast("long"))
      .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
    // both summaries are ≤|langs| rows — broadcast so the final stitch
    // never plans a sort-merge exchange
    frac.join(broadcast(sampled), Seq("lang"), "left")
      .select($"lang", $"n_avail", $"wt".as("target_weight"), $"n_sampled")
      .orderBy($"lang")
  }

  /** PII scrubbing battery — email / URL / phone detection and masking,
    * the safety pass every training corpus gets before tokenization. The
    * fixture text carries no PII, so both engines first APPEND identical
    * deterministic synthetic contacts to a doc_id-keyed subset (mod 7 /
    * 11 / 13) — the scrub is then exercised against known ground truth
    * instead of vacuously counting zeros. The regexes stay in the
    * portable subset (character classes + quantifiers, no lookaround) so
    * Java and DuckDB's RE2 agree; counting and masking ride one scan,
    * one codegen'd projection, one aggregate. */
  val fq05PiiScrub: QueryDef = sqlChecked(
    "fq05_pii_scrub",
    """WITH aug AS (
      |  SELECT lang, text
      |    || CASE WHEN doc_id % 7 = 0
      |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
      |         ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0
      |         THEN ' visit https://data.example.org/d/' || CAST(doc_id AS VARCHAR) || ' today'
      |         ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0
      |         THEN ' call +1 555 0' || CAST(doc_id % 100 AS VARCHAR) || ' ok'
      |         ELSE '' END AS t
      |  FROM documents)
      |SELECT lang,
      |  CAST(SUM(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
      |  CAST(SUM(len(regexp_extract_all(t, 'https?://[A-Za-z0-9./_-]+'))) AS BIGINT) AS n_urls,
      |  CAST(SUM(len(regexp_extract_all(t, '\+[0-9][0-9 ]{4,14}[0-9]'))) AS BIGINT) AS n_phones,
      |  CAST(SUM(len(regexp_replace(regexp_replace(regexp_replace(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<PII>', 'g'),
      |    'https?://[A-Za-z0-9./_-]+', '<PII>', 'g'),
      |    '\+[0-9][0-9 ]{4,14}[0-9]', '<PII>', 'g'))) AS BIGINT) AS clean_chars
      |FROM aug
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val urlRe = "https?://[A-Za-z0-9./_-]+"
    val phoneRe = "\\+[0-9][0-9 ]{4,14}[0-9]"
    val t = concat($"text",
      when(pmod($"doc_id", lit(7)) === 0,
        concat(lit(" contact user"), $"doc_id".cast("string"), lit("@example.com now")))
        .otherwise(lit("")),
      when(pmod($"doc_id", lit(11)) === 0,
        concat(lit(" visit https://data.example.org/d/"), $"doc_id".cast("string"), lit(" today")))
        .otherwise(lit("")),
      when(pmod($"doc_id", lit(13)) === 0,
        concat(lit(" call +1 555 0"), pmod($"doc_id", lit(100)).cast("string"), lit(" ok")))
        .otherwise(lit("")))
    Tables.documents(spark, dir)
      .select($"lang", t.as("t"))
      .select($"lang",
        regexp_count($"t", lit(emailRe)).as("ne"),
        regexp_count($"t", lit(urlRe)).as("nu"),
        regexp_count($"t", lit(phoneRe)).as("np"),
        length(regexp_replace(regexp_replace(regexp_replace($"t",
          emailRe, "<PII>"), urlRe, "<PII>"), phoneRe, "<PII>")).as("nc"))
      .groupBy($"lang")
      .agg(
        sum($"ne").cast("long").as("n_emails"),
        sum($"nu").cast("long").as("n_urls"),
        sum($"np").cast("long").as("n_phones"),
        sum($"nc").cast("long").as("clean_chars"))
      .orderBy($"lang")
  }

  /** Unicode NFC normalization over the corpus via the engine's native
    * `graft_nfc` expression (functions/NfcNormalize.scala — Spark has no
    * normalization built-in; DuckDB's independent `nfc_normalize` is the
    * oracle, so two separate UAX #15 implementations must agree byte for
    * byte). The synthetic fixture is ASCII, which would make the check
    * vacuous — like fq05, both engines append the SAME deterministic
    * marker of decomposed codepoints (e + combining acute U+0301, the
    * Angstrom-sign singleton U+212B, o + combining diaeresis U+0308, and
    * the ﬁ ligature U+FB01 which NFC must LEAVE alone) to every doc, so
    * every row genuinely exercises composition, singleton mapping, and
    * compatibility-exclusion. Row-level digests: md5 over the normalized
    * UTF-8 plus codepoint lengths before/after. Map-only — the 100 TB
    * shape is a straight scan, no shuffle before the output sort. */
  val fq06NfcNormalize: QueryDef = sqlChecked(
    "fq06_nfc_normalize",
    """WITH marked AS (
      |  SELECT doc_id,
      |    text || ' Cafe' || chr(769) || ' ' || chr(8491) || ' No' || chr(776)
      |         || 'e' || chr(769) || chr(64257) AS t
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id,
      |  CAST(length(t) AS BIGINT) AS chars_before,
      |  CAST(length(nfc_normalize(t)) AS BIGINT) AS chars_after,
      |  (t <> nfc_normalize(t)) AS changed,
      |  md5(nfc_normalize(t)) AS digest
      |FROM marked
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.functions.NfcNormalize.nfc
    // decomposed on purpose, spelled as escapes so no editor or
    // toolchain can silently NFC the source literal; must mirror the
    // oracle's chr() construction codepoint for codepoint
    val marker = " Cafe\u0301 \u212B No\u0308e\u0301\uFB01"
    val t = concat($"text", lit(marker))
    Tables.documents(spark, dir)
      .filter(pmod($"doc_id", lit(3)) === 0)
      .select($"doc_id",
        length(t).cast("long").as("chars_before"),
        length(nfc(t)).cast("long").as("chars_after"),
        (t =!= nfc(t)).as("changed"),
        md5(nfc(t).cast("binary")).as("digest"))
      .orderBy($"doc_id")
  }

  /** The rest of the Gopher quality battery (Rae et al. 2021, arXiv:
    * 2112.11446 §A1.1) — fq02 covers length / word-length / repetition /
    * any-stopword; this adds the remaining word-level rules at the
    * paper's thresholds, reported per lang so the breakdown shows WHERE
    * each rule bites (an English stopword rule nukes non-English text —
    * exactly what the per-lang funnel makes visible):
    *   - alpha rule: ≥ 80% of words must contain an alphabetic character;
    *   - symbol rule: (# + ellipsis) to word ratio ≤ 0.1;
    *   - stopword rule: ≥ 2 DISTINCT of the canonical 8 stopwords
    *     (the, be, to, of, and, that, have, with);
    *   - Gopher's word-count gate [50, 100k] (fq02 uses a looser 30).
    * Ratios are single exact int/int divisions compared to literal
    * thresholds — no float accumulation anywhere, deterministic under any
    * partitioning. One scan, all rules in-row, one tiny aggregate. */
  val fq07GopherBattery: QueryDef = sqlChecked(
    "fq07_gopher_battery",
    """WITH f AS (
      |  SELECT lang,
      |    len(toks) AS n_words,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      |      / len(toks) AS alpha_frac,
      |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
      |      / len(toks) AS symbol_ratio,
      |    list_contains(toks, 'the')::INT + list_contains(toks, 'be')::INT
      |      + list_contains(toks, 'to')::INT + list_contains(toks, 'of')::INT
      |      + list_contains(toks, 'and')::INT + list_contains(toks, 'that')::INT
      |      + list_contains(toks, 'have')::INT + list_contains(toks, 'with')::INT
      |      AS n_stopwords
      |  FROM (SELECT lang, text,
      |          list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
      |        FROM documents))
      |SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (n_words < 50 OR n_words > 100000) AS fail_word_count,
      |  COUNT(*) FILTER (alpha_frac < 0.8) AS fail_alpha,
      |  COUNT(*) FILTER (symbol_ratio > 0.1) AS fail_symbol,
      |  COUNT(*) FILTER (n_stopwords < 2) AS fail_stopwords,
      |  COUNT(*) FILTER (n_words >= 50 AND n_words <= 100000
      |    AND alpha_frac >= 0.8 AND symbol_ratio <= 0.1
      |    AND n_stopwords >= 2) AS n_pass
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val f = Tables.documents(spark, dir)
      .select($"lang", $"text",
        filter(split(lower($"text"), "\\s+"), x => x =!= "").as("toks"))
      .select($"lang",
        size($"toks").as("n_words"),
        (size(filter($"toks", x => x.rlike("[A-Za-z]"))).cast("double") /
          size($"toks")).as("alpha_frac"),
        (regexp_count($"text", lit("#|\\.\\.\\.")).cast("double") /
          size($"toks")).as("symbol_ratio"),
        stops.map(s => array_contains($"toks", s).cast("int"))
          .reduce(_ + _).as("n_stopwords"))
    f.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when($"n_words" < 50 || $"n_words" > 100000, 1)).as("fail_word_count"),
        count(when($"alpha_frac" < 0.8, 1)).as("fail_alpha"),
        count(when($"symbol_ratio" > 0.1, 1)).as("fail_symbol"),
        count(when($"n_stopwords" < 2, 1)).as("fail_stopwords"),
        count(when($"n_words" >= 50 && $"n_words" <= 100000 &&
          $"alpha_frac" >= 0.8 && $"symbol_ratio" <= 0.1 &&
          $"n_stopwords" >= 2, 1)).as("n_pass"))
      .orderBy($"lang")
  }

  /** C4's line/page cleaning battery (Raffel et al. 2020, arXiv:
    * 1910.10683 §2.2) over the shared webified corpus (WebCorpus):
    *   - line rules, counted independently so the funnel shows where
    *     each bites: keep only lines ending in terminal punctuation,
    *     with ≥ 5 words, and not mentioning javascript;
    *   - page rules: drop docs containing "lorem ipsum" or a curly
    *     brace, and docs with fewer than 3 surviving lines.
    * Everything is in-row (split/transform/filter HOFs inside codegen)
    * feeding one per-lang aggregate — a single scan with no shuffle of
    * text, the only shape that survives 100 TB. chars_kept is the size
    * of the actual cleaned output (kept lines of kept docs rejoined), so
    * the battery's REBUILD path is value-checked, not just its counts. */
  val fq08C4Battery: QueryDef = sqlChecked(
    "fq08_c4_battery",
    s"""WITH ${WebCorpus.linesSql},
       |per AS (
       |  SELECT lang,
       |    len(lines) AS lines_total,
       |    len(list_filter(lines, l -> NOT ends_with(l, '.'))) AS f_punct,
       |    len(list_filter(lines, l -> len(list_filter(string_split(l, ' '), x -> x <> '')) < 5)) AS f_words,
       |    len(list_filter(lines, l -> contains(l, 'javascript'))) AS f_js,
       |    list_filter(lines, l -> ends_with(l, '.')
       |      AND len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
       |      AND NOT contains(l, 'javascript')) AS kept,
       |    len(list_filter(lines, l -> contains(l, 'lorem ipsum'))) > 0 AS has_lorem,
       |    len(list_filter(lines, l -> contains(l, '{'))) > 0 AS has_brace
       |  FROM webl),
       |per2 AS (
       |  SELECT lang, lines_total, f_punct, f_words, f_js, has_lorem, has_brace,
       |    len(kept) AS n_kept,
       |    (NOT has_lorem AND NOT has_brace AND len(kept) >= 3) AS doc_kept,
       |    len(array_to_string(kept, chr(10))) AS kept_chars
       |  FROM per)
       |SELECT lang,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(lines_total) AS BIGINT) AS lines_total,
       |  CAST(SUM(f_punct) AS BIGINT) AS lines_fail_punct,
       |  CAST(SUM(f_words) AS BIGINT) AS lines_fail_words,
       |  CAST(SUM(f_js) AS BIGINT) AS lines_fail_js,
       |  CAST(SUM(n_kept) AS BIGINT) AS lines_kept,
       |  COUNT(*) FILTER (has_lorem) AS docs_lorem,
       |  COUNT(*) FILTER (has_brace) AS docs_brace,
       |  COUNT(*) FILTER (n_kept < 3) AS docs_minlines,
       |  COUNT(*) FILTER (doc_kept) AS n_docs_kept,
       |  CAST(SUM(CASE WHEN doc_kept THEN kept_chars ELSE 0 END) AS BIGINT) AS chars_kept
       |FROM per2 GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def nWords(l: Column) = size(filter(split(l, " "), x => x =!= ""))
    val lineKept = (l: Column) =>
      l.endsWith(".") && nWords(l) >= 5 && !l.contains("javascript")
    val per = Tables.documents(spark, dir)
      .select($"lang", WebCorpus.webLines($"doc_id", $"text").as("lines"))
      .select($"lang",
        size($"lines").as("lines_total"),
        size(filter($"lines", l => !l.endsWith("."))).as("f_punct"),
        size(filter($"lines", l => nWords(l) < 5)).as("f_words"),
        size(filter($"lines", l => l.contains("javascript"))).as("f_js"),
        filter($"lines", lineKept).as("kept"),
        (size(filter($"lines", l => l.contains("lorem ipsum"))) > 0).as("has_lorem"),
        (size(filter($"lines", l => l.contains("{"))) > 0).as("has_brace"))
      .withColumn("n_kept", size($"kept"))
      .withColumn("doc_kept", !$"has_lorem" && !$"has_brace" && $"n_kept" >= 3)
      .withColumn("kept_chars", length(concat_ws("\n", $"kept")))
    per.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"lines_total").cast("long").as("lines_total"),
        sum($"f_punct").cast("long").as("lines_fail_punct"),
        sum($"f_words").cast("long").as("lines_fail_words"),
        sum($"f_js").cast("long").as("lines_fail_js"),
        sum($"n_kept").cast("long").as("lines_kept"),
        count(when($"has_lorem", 1)).as("docs_lorem"),
        count(when($"has_brace", 1)).as("docs_brace"),
        count(when($"n_kept" < 3, 1)).as("docs_minlines"),
        count(when($"doc_kept", 1)).as("n_docs_kept"),
        sum(when($"doc_kept", $"kept_chars").otherwise(0)).cast("long").as("chars_kept"))
      .orderBy($"lang")
  }

  /** Unicode script-mix audit — the cleaning signal tq03's marker-word
    * LID can't see: documents mixing writing systems (Latin + CJK +
    * Cyrillic in one page) are a classic spam/cloaking/encoding-damage
    * marker in web corpora (CCNet and C4 both gate on it). Per document,
    * characters are counted per script via Unicode-range regex classes
    * (codegen'd `regexp_count` — no tokenization, no UDF); a doc is
    * mixed when it holds Latin AND any non-Latin script. The ASCII-only
    * fixture would make the audit vacuous, so BOTH engines append the
    * same CJK+Cyrillic suffix to every 7th doc — n_mixed_script must
    * count exactly the plants, and the per-lang non-Latin share is
    * decimal-exact in the hash.
    *
    * 100 TB: one scan, per-char work inside whole-stage codegen, tiny
    * per-lang aggregate. */
  val fq09ScriptMix: QueryDef = sqlChecked(
    "fq09_script_mix",
    """WITH u AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' 漢字測試 допис'
      |         ELSE text END AS text
      |  FROM documents),
      |c AS (
      |  SELECT lang,
      |    CAST(len(regexp_extract_all(text, '[一-鿿]')) AS BIGINT) AS n_cjk,
      |    CAST(len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS BIGINT) AS n_cyr,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_lat
      |  FROM u),
      |r AS (
      |  SELECT lang, n_cjk, n_cyr, n_lat,
      |    CASE WHEN (n_cjk > 0 OR n_cyr > 0) AND n_lat > 0 THEN 1 ELSE 0 END AS mixed,
      |    CASE WHEN n_cjk + n_cyr + n_lat > 0
      |      THEN round(CAST(n_cjk + n_cyr AS DOUBLE) / (n_cjk + n_cyr + n_lat), 6)
      |    END AS sh
      |  FROM c)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(mixed) AS BIGINT) AS n_mixed_script,
      |  CAST(COUNT(*) - SUM(mixed) AS BIGINT) AS n_single_script,
      |  CAST(SUM(n_cjk) AS BIGINT) AS cjk_chars,
      |  CAST(SUM(n_cyr) AS BIGINT) AS cyrillic_chars,
      |  CAST(SUM(CAST((sh) AS DECIMAL(30,6))) AS DOUBLE) / COUNT((sh)) AS avg_nonlatin_share
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val u = Tables.documents(spark, dir)
      .select($"lang",
        when($"doc_id" % 7 === 0, concat($"text", lit(" 漢字測試 допис")))
          .otherwise($"text").as("text"))
    val c = u.select($"lang",
      regexp_count($"text", lit("[一-鿿]")).as("n_cjk"),
      regexp_count($"text", lit("[Ѐ-ӿ]")).as("n_cyr"),
      regexp_count($"text", lit("[A-Za-z]")).as("n_lat"))
    val r = c.select($"lang", $"n_cjk", $"n_cyr", $"n_lat",
      when(($"n_cjk" > 0 || $"n_cyr" > 0) && $"n_lat" > 0, 1L).otherwise(0L)
        .as("mixed"),
      // guard the 0/0 case (digits/punct-only doc): Spark's IEEE division
      // would yield NaN where DuckDB nulls/errors — nullify instead, and
      // the null-skipping avg treats such docs benignly in both engines
      when($"n_cjk" + $"n_cyr" + $"n_lat" > 0,
        round(($"n_cjk" + $"n_cyr").cast("double") /
          ($"n_cjk" + $"n_cyr" + $"n_lat"), 6)).as("sh"))
    r.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"mixed").cast("long").as("n_mixed_script"),
        (count(lit(1)) - sum($"mixed")).cast("long").as("n_single_script"),
        sum($"n_cjk").cast("long").as("cjk_chars"),
        sum($"n_cyr").cast("long").as("cyrillic_chars"),
        davg($"sh").as("avg_nonlatin_share"))
      .orderBy($"lang")
  }

  /** HTML boilerplate extraction — the step BEFORE every web-corpus
    * filter battery (C4 and CCNet both start from WET/extracted text;
    * when you ingest raw HTML, tag-stripping + entity decoding + chrome
    * removal is the first pass). The fixture has clean text, so BOTH
    * engines wrap each document in the same deterministic page chrome —
    * head/style/script blocks, a nav list, a footer, with the body text
    * entity-ENCODED (& < > " ') and split into <p> paragraphs — then run
    * the extractor: drop script/style subtrees (non-greedy block
    * regexes), drop nav/footer chrome, strip residual tags, decode the
    * five core entities plus &nbsp;, collapse whitespace. Round-trip
    * accounting is exact: every document must come back CHARACTER-
    * IDENTICAL to the original text, and the per-lang hash carries the
    * recovered counts plus the boilerplate ratio (html chars vs text
    * chars — what the extractor saves downstream passes from scanning).
    *
    * 100 TB: one scan, all regex work in-row inside codegen, tiny
    * per-lang aggregate — the fq-battery shape. */
  val fq10HtmlExtract: QueryDef = sqlChecked(
    "fq10_html_extract",
    """WITH enc AS (
      |  SELECT lang, text,
      |    replace(replace(replace(replace(replace(text,
      |      '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'),
      |      '''', '&#39;') AS etext
      |  FROM documents),
      |page AS (
      |  SELECT lang, text,
      |    '<html><head><title>t</title><style>p{color:red}</style>' ||
      |    '<script>var x=1;</script></head><body>' ||
      |    '<nav><ul><li>Home</li><li>About</li></ul></nav>' ||
      |    '<p>' || replace(etext, '. ', '.</p> <p>') || '</p>' ||
      |    '<footer>&copy; corp</footer></body></html>' AS html
      |  FROM enc),
      |ext AS (
      |  SELECT lang, text, html,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(
      |              regexp_replace(
      |                regexp_replace(html, '<head.*?</head>', '', 'g'),
      |              '<script.*?</script>', '', 'g'),
      |            '<style.*?</style>', '', 'g'),
      |          '<nav.*?</nav>|<footer.*?</footer>', '', 'g'),
      |        '<[^>]*>', ' ', 'g'),
      |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |      '&#39;', ''''), '&amp;', '&'),
      |    '\s+', ' ', 'g')) AS rec
      |  FROM page),
      |per AS (
      |  SELECT lang,
      |    CASE WHEN rec = trim(regexp_replace(text, '\s+', ' ', 'g'))
      |      THEN 1 ELSE 0 END AS ok,
      |    len(html) AS html_len, len(text) AS text_len
      |  FROM ext)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(ok) AS BIGINT) AS n_recovered_exact,
      |  CAST(SUM(html_len) AS BIGINT) AS html_chars,
      |  CAST(SUM(text_len) AS BIGINT) AS text_chars,
      |  round(1.0 - CAST(SUM(text_len) AS DOUBLE) / SUM(html_len), 6)
      |    AS boilerplate_ratio
      |FROM per GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val enc = Tables.documents(spark, dir).select($"lang", $"text",
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace($"text", "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
        "\"", "&quot;"), "'", "&#39;").as("etext"))
    val page = enc.select($"lang", $"text",
      concat(
        lit("<html><head><title>t</title><style>p{color:red}</style>" +
          "<script>var x=1;</script></head><body>" +
          "<nav><ul><li>Home</li><li>About</li></ul></nav><p>"),
        regexp_replace($"etext", "\\. ", ".</p> <p>"),
        lit("</p><footer>&copy; corp</footer></body></html>")).as("html"))
    val strip = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace($"html", "<head.*?</head>", ""),
      "<script.*?</script>", ""), "<style.*?</style>", ""),
      "<nav.*?</nav>|<footer.*?</footer>", ""), "<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(strip,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&#39;", "'"), "&amp;", "&")
    val ext = page.select($"lang", $"text", $"html",
      trim(regexp_replace(decoded, "\\s+", " ")).as("rec"))
    val per = ext.select($"lang",
      when($"rec" === trim(regexp_replace($"text", "\\s+", " ")), 1L)
        .otherwise(0L).as("ok"),
      length($"html").as("html_len"), length($"text").as("text_len"))
    per.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"ok").cast("long").as("n_recovered_exact"),
        sum($"html_len").cast("long").as("html_chars"),
        sum($"text_len").cast("long").as("text_chars"),
        round(lit(1.0) - sum($"text_len").cast("double") / sum($"html_len"), 6)
          .as("boilerplate_ratio"))
      .orderBy($"lang")
  }

  /** Blocklist filtering as a TOKEN JOIN — the C4 "bad words / bad
    * domains" gate at the list size where regex dies: a 100k-entry
    * blocklist cannot be a regex union (the compiled automaton and the
    * per-row scan both blow up), but as a TABLE it broadcast-joins the
    * tokenized corpus — list size costs broadcast bytes, not per-row
    * time. fq01's regex redaction is the single-term shape; this is the
    * production-list shape. Per-doc hit counts come from the join,
    * verdicts (any-hit drop + a ≥3-distinct-hits hard-drop tier) and the
    * per-lang funnel ride one aggregation. Hash-green end to end. */
  val fq11BlocklistFilter: QueryDef = sqlChecked(
    "fq11_blocklist_filter",
    """WITH bl(term, tier) AS (VALUES
      |  ('customer', 1), ('salary', 1), ('spark', 2), ('window', 2),
      |  ('join', 2), ('stream', 2), ('batch', 2), ('fast', 2)),
      |toks AS (
      |  SELECT doc_id, lang, unnest(list_distinct(
      |    regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term
      |  FROM documents),
      |hits AS (
      |  SELECT t.doc_id, t.lang,
      |    COUNT(*) AS n_hit_terms,
      |    CAST(SUM(CASE WHEN b.tier = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tier1
      |  FROM toks t JOIN bl b ON t.term = b.term
      |  GROUP BY t.doc_id, t.lang),
      |docs AS (
      |  SELECT d.lang,
      |    COALESCE(h.n_hit_terms, 0) AS n_hit_terms,
      |    COALESCE(h.n_tier1, 0) AS n_tier1
      |  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id)
      |SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (n_tier1 > 0) AS n_tier1_drop,
      |  COUNT(*) FILTER (n_tier1 = 0 AND n_hit_terms >= 3) AS n_multi_hit_drop,
      |  COUNT(*) FILTER (n_tier1 = 0 AND n_hit_terms < 3) AS n_pass,
      |  CAST(SUM(n_hit_terms) AS BIGINT) AS total_hit_terms
      |FROM docs GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val bl = Seq(("customer", 1), ("salary", 1), ("spark", 2), ("window", 2),
      ("join", 2), ("stream", 2), ("batch", 2), ("fast", 2)).toDF("term", "tier")
    val docs = Tables.documents(spark, dir)
    val toks = docs.select($"doc_id", $"lang",
      explode(array_distinct(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)))).as("term"))
    val hits = toks.join(broadcast(bl), Seq("term"))
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_hit_terms"),
        sum(when($"tier" === 1, 1).otherwise(0)).cast("long").as("n_tier1"))
    docs.select($"doc_id", $"lang")
      .join(hits.drop("lang"), Seq("doc_id"), "left")
      .select($"lang",
        coalesce($"n_hit_terms", lit(0L)).as("n_hit_terms"),
        coalesce($"n_tier1", lit(0L)).as("n_tier1"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"n_tier1" > 0, 1)).as("n_tier1_drop"),
        count(when($"n_tier1" === 0 && $"n_hit_terms" >= 3, 1))
          .as("n_multi_hit_drop"),
        count(when($"n_tier1" === 0 && $"n_hit_terms" < 3, 1)).as("n_pass"),
        sum($"n_hit_terms").cast("long").as("total_hit_terms"))
      .orderBy($"lang")
  }

  /** Character-entropy quality signal — the gibberish/compression-noise
    * detector (low entropy = repeated filler, high entropy = binary
    * soup / encoding damage; both are drop signals in web-corpus
    * cleaning). Per document, Shannon entropy of the character
    * distribution from EXACT counts: H = log2(L) − (Σ c·log2 c)/L over
    * per-char counts c — computed in that form so the only float ops are
    * the final log2/divide over exact integers, rounded at 6 dp (the
    * fq09 shield). Shape: one explode to (doc, char) + two hash aggs;
    * per-lang summary with low/high flags at fixed thresholds. */
  val fq12CharEntropy: QueryDef = sqlChecked(
    "fq12_char_entropy",
    """WITH ch AS (
      |  SELECT doc_id, lang, unnest(string_split_regex(text, '')) AS c
      |  FROM documents WHERE len(text) > 0),
      |cc AS (
      |  SELECT doc_id, lang, c, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM ch WHERE c <> '' GROUP BY doc_id, lang, c),
      |ent AS (
      |  SELECT doc_id, lang,
      |    round(log2(CAST(SUM(n) AS DOUBLE)) -
      |      SUM(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE))) / SUM(n), 6) AS h
      |  FROM cc GROUP BY doc_id, lang)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST(h AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_entropy,
      |  MIN(h) AS min_entropy, MAX(h) AS max_entropy,
      |  COUNT(*) FILTER (h < 3.0) AS n_low_entropy,
      |  COUNT(*) FILTER (h > 4.8) AS n_high_entropy
      |FROM ent GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val cc = Tables.documents(spark, dir)
      .filter(length($"text") > 0)
      .select($"doc_id", $"lang", explode(split($"text", "")).as("c"))
      .filter($"c" =!= "")
      .groupBy($"doc_id", $"lang", $"c")
      .agg(count(lit(1)).as("n"))
    val ent = cc.groupBy($"doc_id", $"lang")
      .agg(round(log2(sum($"n").cast("double")) -
        sum($"n".cast("double") * log2($"n".cast("double"))) / sum($"n"), 6)
        .as("h"))
    ent.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        davg($"h").as("avg_entropy"),
        min($"h").as("min_entropy"),
        max($"h").as("max_entropy"),
        count(when($"h" < 3.0, 1)).as("n_low_entropy"),
        count(when($"h" > 4.8, 1)).as("n_high_entropy"))
      .orderBy($"lang")
  }

  val all: Seq[QueryDef] = Seq(
    fq01TermRedaction, fq02FilterFunnel, fq03Repetition, fq04CorpusMixing,
    fq05PiiScrub, fq06NfcNormalize, fq07GopherBattery, fq08C4Battery,
    fq09ScriptMix, fq10HtmlExtract, fq11BlocklistFilter, fq12CharEntropy)
}
