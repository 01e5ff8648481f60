package graft.dedup

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Plants documents with KNOWN repeated substrings and asserts the
  * operator recovers the exact maximal spans — starts, ends, merging
  * behavior — not just counts. Token alphabets are disjoint between
  * cases so no accidental cross-case grams exist. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spanSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int)] =
    df.collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSet

  test("a shared 12-token run yields one maximal span in both docs") {
    // tokens a0..a11 shared; each doc pads with its own unique tokens
    val shared = (0 until 12).map(i => s"a$i").mkString(" ")
    val d = docs(
      1L -> s"x0 x1 x2 $shared x3 x4",
      2L -> s"y0 $shared y1 y2 y3 y4")
    val s = spanSet(SubstringDedup.spans(d, k = 8))
    // doc 1: span starts after 3 pad tokens, covers 12 tokens
    assert(s == Set((1L, 3, 14), (2L, 1, 12)), s"got $s")
  }

  test("spans shorter than k are not reported") {
    val shared = (0 until 7).map(i => s"b$i").mkString(" ") // 7 < k=8
    val d = docs(
      1L -> s"p0 p1 $shared p2 p3 p4 p5 p6 p7 p8",
      2L -> s"q0 q1 $shared q2 q3 q4 q5 q6 q7 q8")
    assert(SubstringDedup.spans(d, 8).count() == 0)
  }

  test("two repeats separated by > k unique tokens stay separate spans") {
    val r1 = (0 until 9).map(i => s"c$i").mkString(" ")
    val r2 = (0 until 9).map(i => s"d$i").mkString(" ")
    val gap = (0 until 10).map(i => s"u$i").mkString(" ") // unique gap
    val d = docs(
      1L -> s"$r1 $gap $r2",
      2L -> s"$r1 v0 v1 v2 v3 v4 v5 v6 v7 v8 v9 $r2")
    val s = spanSet(SubstringDedup.spans(d, 8))
    assert(s == Set((1L, 0, 8), (1L, 19, 27), (2L, 0, 8), (2L, 19, 27)),
      s"got $s")
  }

  test("within-document repetition is found (corpus frequency, not doc count)") {
    val run = (0 until 8).map(i => s"e$i").mkString(" ")
    val d = docs(1L -> s"$run w0 w1 w2 w3 w4 w5 w6 w7 w8 $run")
    val s = spanSet(SubstringDedup.spans(d, 8))
    assert(s == Set((1L, 0, 7), (1L, 17, 24)), s"got $s")
  }

  test("whole-document exact duplicate covers the full token range") {
    val body = (0 until 20).map(i => s"f$i").mkString(" ")
    val d = docs(1L -> body, 2L -> body)
    val s = spanSet(SubstringDedup.spans(d, 8))
    assert(s == Set((1L, 0, 19), (2L, 0, 19)), s"got $s")
    val pd = SubstringDedup.perDoc(d, 8).collect()
    assert(pd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 1L, 20L, 20L, 20L), (2L, 1L, 20L, 20L, 20L)))
  }

  test("overlapping repeats merge into one maximal span") {
    // doc3 contains g0..g9; doc1 repeats g0..g8, doc2 repeats g1..g9 —
    // in doc3 the two duplicated 9-runs overlap on g1..g8 and must merge
    val r = (0 until 10).map(i => s"g$i")
    val d = docs(
      1L -> (r.take(9).mkString(" ") + " m0 m1"),
      2L -> ("m2 m3 " + r.drop(1).mkString(" ")),
      3L -> ("m4 " + r.mkString(" ") + " m5"))
    val s = spanSet(SubstringDedup.spans(d, 8))
    assert(s.contains((3L, 1, 10)), s"doc3 merged span missing: $s")
    assert(s == Set((1L, 0, 8), (2L, 2, 10), (3L, 1, 10)), s"got $s")
  }
}
