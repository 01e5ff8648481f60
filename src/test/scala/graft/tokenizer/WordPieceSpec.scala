package graft.tokenizer

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece greedy encode: canonical cases, the greedy-longest-match
  * property, and ENGINE ≡ plain-Scala-reference equality over every
  * distinct corpus word (the BpeSpec/UnigramSpec independent-reference
  * pattern). */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("canonical segmentations: longest match wins, ## marks continuations") {
    assert(WordPiece.encodeScala("spark") == Seq("spark"))
    // start table has "spark"; continuation table matches the tail
    assert(WordPiece.encodeScala("sparks") == Seq("spark", "##s"))
    assert(WordPiece.encodeScala("sparking") == Seq("spark", "##ing"))
    // "table" start entry beats spelling t-a-b-l-e char by char
    assert(WordPiece.encodeScala("tables") == Seq("table", "##s"))
    // word-internal "tion" only exists in the continuation table
    assert(WordPiece.encodeScala("partition") ==
      Seq("part", "##i", "##tion"))
    // unmatched content falls back to single chars (full coverage)
    assert(WordPiece.encodeScala("zq7") == Seq("z", "##q", "##7"))
  }

  test("greedy property: every piece is the longest vocab match at its position") {
    val starts = WordPiece.FixedVocab.collect { case (t, false) => t }.toSet
    val conts = WordPiece.FixedVocab.collect { case (t, true) => t }.toSet
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    (1 to 300).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(WordPiece.MaxUnroll)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val pieces = WordPiece.encodeScala(w)
      assert(pieces.map(_.stripPrefix("##")).mkString == w, s"lossy parse of $w")
      var p = 0
      pieces.foreach { tok =>
        val raw = tok.stripPrefix("##")
        val table = if (p == 0) starts else conts
        // no LONGER entry may match here — that's greedy
        ((raw.length + 1) to (w.length - p)).foreach { l =>
          assert(!table.contains(w.substring(p, p + l)),
            s"$w@$p took $raw but ${w.substring(p, p + l)} matches")
        }
        p += raw.length
      }
    }
  }

  test("engine unroll equals the plain-Scala reference on every corpus word") {
    import spark.implicits._
    val words = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(lower($"text"), "[^a-z0-9]+")).as("word"))
      .filter($"word" =!= "" && length($"word") <= WordPiece.MaxUnroll)
      .distinct()
      .select(lit("x").as("lang"), $"word", lit(1L).as("freq"))
    val engine = WordPiece.greedyFrame(words, WordPiece.FixedVocab, WordPiece.MaxUnroll)
      .select($"word", WordPiece.wpSeg($"wp").as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(engine.nonEmpty)
    engine.foreach { case (w, seg) =>
      assert(seg == WordPiece.encodeScala(w).mkString(" "),
        s"engine diverged from reference on '$w'")
    }
  }
}
