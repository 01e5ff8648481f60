package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared "webified corpus" construction for the line-level cleaning
  * operators (fq08 C4 battery, dq14 CCNet line dedup).
  *
  * The synthetic corpus is single-line space-separated text, so line
  * rules would be vacuous on it. Like fq05/fq06, BOTH engines apply the
  * SAME deterministic decoration so every rule genuinely bites:
  *   - tokens are chunked into 8-token lines (the tq13 chunk idiom);
  *   - ~25% of lines (md5-selected by CONTENT, so no index-lambda
  *     portability risk) are left without terminal punctuation;
  *   - deterministic doc_id-keyed boilerplate is appended: a newsletter
  *     line (25% of docs — the cross-doc boilerplate dq14 must catch), a
  *     "please enable javascript" line (20%), a lorem-ipsum line and a
  *     curly-brace code line (rare doc-kills for the C4 page rules).
  * Every decoration choice is a pure function of (doc_id, content), so
  * the DuckDB oracle reproduces the corpus byte for byte.
  */
object WebCorpus {

  val BoilerLine = "subscribe to our newsletter for updates today."
  val JsLine = "please enable javascript to continue viewing."
  val LoremLine = "lorem ipsum dolor sit amet."
  val BraceLine = "var cfg = { debug }."

  /** The decorated line array for one document row (Spark side).
    * Mirrors [[linesSql]] clause for clause. */
  def webLines(docId: Column, text: Column): Column = {
    val w = filter(split(text, " "), x => x =!= "")
    val nch = greatest(floor((size(w) + lit(7)) / lit(8)).cast("long"), lit(1L))
    val base = transform(sequence(lit(0L), nch - lit(1L)), i =>
      concat_ws(" ", slice(w, (i * lit(8L) + lit(1L)).cast("int"), lit(8))))
    val dec = transform(base, l =>
      when(substring(md5(l), 1, 1).between("0", "3"), l)
        .otherwise(concat(l, lit("."))))
    def inj(m: Int, s: String): Column =
      when(pmod(docId, lit(m)) === 0, array(lit(s)))
        .otherwise(array().cast("array<string>"))
    concat(dec, inj(4, BoilerLine), inj(5, JsLine), inj(41, LoremLine), inj(43, BraceLine))
  }

  /** DuckDB CTE chain ending in `webl(doc_id, lang, lines)`; embed as
    * the head of a WITH clause. Must mirror [[webLines]]. */
  val linesSql: String =
    s"""w0 AS (
       |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |w1 AS (SELECT doc_id, lang, w,
       |  GREATEST(CAST(FLOOR((len(w) + 7) / 8) AS BIGINT), 1) AS nch FROM w0),
       |rawl AS (SELECT doc_id, lang,
       |  list_transform(range(nch), i -> array_to_string(list_slice(w, i*8+1, i*8+8), ' ')) AS base
       |  FROM w1),
       |decl AS (SELECT doc_id, lang,
       |  list_transform(base, l -> CASE WHEN substr(md5(l),1,1) BETWEEN '0' AND '3'
       |    THEN l ELSE l || '.' END) AS dec FROM rawl),
       |webl AS (SELECT doc_id, lang,
       |  list_concat(list_concat(list_concat(list_concat(dec,
       |    CASE WHEN doc_id % 4 = 0 THEN ['$BoilerLine'] ELSE [] END),
       |    CASE WHEN doc_id % 5 = 0 THEN ['$JsLine'] ELSE [] END),
       |    CASE WHEN doc_id % 41 = 0 THEN ['$LoremLine'] ELSE [] END),
       |    CASE WHEN doc_id % 43 = 0 THEN ['$BraceLine'] ELSE [] END) AS lines
       |  FROM decl)""".stripMargin
}
