package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The fq08/dq14 oracles prove cross-engine agreement; this spec proves
  * the PROPERTIES — every C4 rule genuinely bites on the webified
  * corpus, the accounting is internally consistent, and the line-dedup
  * pass catches the planted cross-doc boilerplate. */
class WebCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fq08: every line and page rule bites; funnel arithmetic consistent") {
    val rows = FilterQueries.fq08C4Battery.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    def tot(col: String): Long = rows.map(r => r.getAs[Long](col)).sum
    // independently-counted line rules must each catch something: the
    // md5 decoration leaves ~25% of lines unpunctuated, last chunks run
    // short, and 1 doc in 5 carries the javascript line
    assert(tot("lines_fail_punct") > 0)
    assert(tot("lines_fail_words") > 0)
    assert(tot("lines_fail_js") > 0)
    // page rules: lorem/brace plants are sparse (doc_id % 41 / % 43) but
    // present at every SF because doc_id 0 matches both
    assert(tot("docs_lorem") > 0)
    assert(tot("docs_brace") > 0)
    // kept lines pass all three rules, so they can never exceed the
    // complement of any single rule's failures
    assert(tot("lines_kept") <= tot("lines_total") - tot("lines_fail_punct"))
    assert(tot("lines_kept") <= tot("lines_total") - tot("lines_fail_js"))
    assert(tot("n_docs_kept") < tot("n_docs"))
    assert(tot("n_docs_kept") > 0)
    assert(tot("chars_kept") > 0)
  }

  test("dq14: planted newsletter boilerplate is dropped from every carrier") {
    val rows = DedupQueries.dq14LineDedup.fn(spark, dir).collect()
    def tot(col: String): Long = rows.map(r => r.getAs[Long](col)).sum
    val nDocs = tot("n_docs")
    // 1 doc in 4 carries the planted line; at 50 docs that is 13
    // carriers >= the df-10 threshold, so every one of them is affected
    assert(tot("docs_affected") >= nDocs / 4)
    assert(tot("lines_dropped") >= nDocs / 4)
    assert(tot("chars_dropped") > 0)
    assert(tot("lines_kept") + tot("lines_dropped") == tot("lines_total"))
    // at least the planted line is identified as distinct boilerplate
    assert(rows.map(r => r.getAs[Long]("boiler_lines_distinct")).max >= 1)
  }
}
