package graft.tokenizer

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- independent driver-side reference implementation -----------------

  private def refMergePass(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var hist = words.iterator
      .filter(_._1.length >= 2)
      .map { case (w, f) => (w.map(_.toString).toVector, f) }
      .toVector
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- hist; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
        if (f < 2) done = true
        else {
          out += ((rank, l, r, f))
          hist = hist.map { case (s, fr) => (refMergePass(s, l, r), fr) }
            .filter(_._1.length >= 2)
          rank += 1
        }
      }
    }
    out.result()
  }

  private def trainedTuples(hist: DataFrame, n: Int): Seq[(Int, String, String, Long)] =
    Bpe.train(hist, n).map(m => (m.rank, m.left_sym, m.right_sym, m.pair_freq))

  // ---- unit pieces -------------------------------------------------------

  test("chars splits to characters with no trailing empty (DuckDB parity)") {
    import spark.implicits._
    val got = Seq("abc").toDF("w").select(Bpe.chars($"w")).head.getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }

  test("mergePair is left-to-right non-overlapping") {
    import spark.implicits._
    def run(syms: Seq[String], l: String, r: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("s").select(Bpe.mergePair($"s", l, r)).head.getSeq[String](0)
    assert(run(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(run(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(run(Seq("t", "h", "e"), "t", "h") == Seq("th", "e"))
    assert(run(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(run(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
  }

  test("train matches the reference implementation on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      "low low low low low",
      "lower lower newer newer newer newer newer newer",
      "newest newest newest widest widest widest").toDF("text")
    val hist = Bpe.wordHistogram(docs)
    val words = hist.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = trainedTuples(hist, 10)
    val want = refTrain(words, 10)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("train matches the reference on the sf0.001 documents corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = Bpe.wordHistogram(docs)
    val words = hist.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = trainedTuples(hist, 15)
    val want = refTrain(words, 15)
    assert(got == want)
    assert(got.size == 15) // corpus is big enough that no early stop fires
  }

  test("learned merges are partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      "aa ab aa ab ba", "aa aa bb ab", "cc aa cb aa ab bb",
      "the thin then than", "the the thin").toDF("text")
    val hist = Bpe.wordHistogram(docs)
    val a = trainedTuples(hist.repartition(1), 8)
    val b = trainedTuples(hist.repartition(7), 8)
    assert(a == b)
    assert(a.nonEmpty)
  }

  /** Decode the wrapped encoding "\u0001tok\u0002\u0001tok\u0002..." back
    * to its token sequence. */
  private def tokensOf(enc: String): Seq[String] =
    if (enc.isEmpty) Seq.empty
    else enc.stripPrefix("\u0001").stripSuffix("\u0002").split("\u0002\u0001", -1).toSeq

  test("fixed-merge encode segments 'the thin then' as canonical BPE") {
    import spark.implicits._
    // merges t+h, th+e, i+n (the FixedMerges prefix that touches this text)
    // give [the][ ][th][in][ ][the][n] -- 7 wrapped symbols, 2 are spaces
    val row = Seq("the  thin\nthen").toDF("text")
      .withColumn("norm", Bpe.normText(col("text")))
      .withColumn("enc", Bpe.encode(col("norm"), Bpe.FixedMerges))
      .select(col("enc"), Bpe.subwordCount(col("norm"), col("enc")).as("n"))
      .head
    assert(tokensOf(row.getString(0)) == Seq("the", " ", "th", "in", " ", "the", "n"))
    assert(row.getInt(1) == 5) // subword tokens exclude the two spaces
  }

  test("encode respects merge rank order (recursive merges: i+n then in+g)") {
    import spark.implicits._
    val enc = Seq("singing").toDF("text")
      .withColumn("norm", Bpe.normText(col("text")))
      .select(Bpe.encode(col("norm"), Bpe.FixedMerges))
      .head.getString(0)
    // s|i|n|g|i|n|g -> in@3 -> s|in|g|in|g -> ing@4 -> s|ing|ing
    assert(tokensOf(enc) == Seq("s", "ing", "ing"))
  }

  test("decode inverts encode on the corpus: lossless for every document") {
    import spark.implicits._
    // whole-corpus identity, plus targeted awkward strings (unicode,
    // merge-heavy, whitespace runs) — BPE merges only concatenate, so
    // decode is sentinel removal and the round trip must be exact
    val awkward = Seq("the thin then singing", "đà nẵng ✓ →λ", "a", "",
      "th th th the the", "  spaced   out  ")
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").select($"text")
      .unionByName(awkward.toDF("text"))
    val n = corpus
      .withColumn("norm", Bpe.normText($"text"))
      .withColumn("dec", Bpe.decode(Bpe.encode($"norm", Bpe.FixedMerges)))
      .filter($"dec" =!= $"norm")
      .count()
    assert(n == 0, s"$n documents failed the decode(encode(x)) == x round trip")
  }

  test("property: decode inverts encode for arbitrary unicode strings") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    // arbitrary printable-unicode strings (normText strips the two
    // sentinel code points first, so even hostile input is safe); one
    // Spark pass per trial batch, driver-side identity check
    val gen = Gen.listOfN(200, Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', 'đ', 'ẵ', '✓', 'λ', '\u0001', '\u0002')))
      .map(_.mkString))
    val prop = Prop.forAllNoShrink(gen) { texts =>
      val rows = texts.toDF("text")
        .withColumn("norm", Bpe.normText(col("text")))
        .withColumn("dec", Bpe.decode(Bpe.encode(col("norm"), Bpe.FixedMerges)))
        .select(col("norm"), col("dec")).collect()
      rows.forall(r => r.getString(0) == r.getString(1))
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("sentinel bytes in input are stripped; empty text yields zero tokens") {
    import spark.implicits._
    val df = Seq("a\u0001b\u0002c", "   ", "").toDF("text")
      .withColumn("norm", Bpe.normText(col("text")))
      .withColumn("enc", Bpe.encode(col("norm"), Bpe.FixedMerges))
      .select(Bpe.subwordCount(col("norm"), col("enc")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 0, 0))
  }
}
