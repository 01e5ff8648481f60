package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NFC normalization expression: composition semantics (UAX #15), the
  * already-normalized fast path, null propagation, and SQL registration.
  * All non-ASCII is spelled as \u escapes -- a raw decomposed glyph in
  * source is one editor-normalization away from a vacuous test.
  */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import NfcNormalize.nfc

  private def norm(s: String): String =
    Seq(s).toDF("t").select(nfc($"t")).as[String].head()

  test("composes combining sequences and singleton-maps, leaves ligatures") {
    // e + combining acute U+0301 -> precomposed U+00E9
    assert(norm("Cafe\u0301") == "Caf\u00E9")
    // Angstrom sign U+212B singleton -> U+00C5
    assert(norm("\u212B") == "\u00C5")
    // NFC must NOT decompose the U+FB01 compatibility ligature (that is NFKC)
    assert(norm("\uFB01le") == "\uFB01le")
    // already-NFC text is the identity
    assert(norm("plain ascii stays put") == "plain ascii stays put")
    assert(norm("Caf\u00E9") == "Caf\u00E9")
  }

  test("null in, null out; registered in SQL as graft_nfc") {
    val r = Seq[(Integer, String)]((1, "Cafe\u0301"), (2, null))
      .toDF("id", "t")
      .selectExpr("id", "graft_nfc(t) AS n")
      .orderBy($"id")
      .collect()
    assert(r(0).getString(1) == "Caf\u00E9")
    assert(r(1).isNullAt(1))
  }

  test("idempotent and length-reducing on decomposed input") {
    val decomposed = "No\u0308e\u0301l " * 50
    val once = norm(decomposed)
    assert(norm(once) == once)
    assert(once.length < decomposed.length)
  }
}
