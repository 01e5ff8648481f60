package graft.ml

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen TF-IDF replay (mq16): [[FrozenJobTfidf]]'s column
  * expressions must equal the spark.ml stages they replace — the
  * corpus-wide vector-exact proof lives in [[FreezeTfidf]] (run at
  * freeze time); these tests pin the ADVERSARIAL inputs a corpus pass
  * may never cover (tokenizer degenerate strings, hash tails of every
  * length, multi-byte UTF-8) so a regression fails here first. */
class FrozenTfidfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("MlMurmur3 equals HashingTF.indexOf on every tail length and multi-byte shape") {
    import spark.implicits._
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setNumFeatures(FrozenJobTfidf.numFeatures)
    val tokens = Seq(
      "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
      "job", "python,", "sql", "-", "/",
      "công", "nhân", "lương", "kỹ", "nghiệp", "đào", "tạo",
      "mô", "tả", "👍", "👍ok", "ạbcạ", "x" * 37)
    val got = tokens.toDF("t")
      .select($"t",
        pmod(graft.functions.MlMurmur3($"t"),
          lit(FrozenJobTfidf.numFeatures)).as("b"))
      .as[(String, Int)].collect().toMap
    tokens.foreach { t =>
      assert(got(t) == tf.indexOf(t),
        s"bucket mismatch for ${t.take(12)}: native ${got(t)} vs ml ${tf.indexOf(t)}")
    }
  }

  test("tokenizer replay matches spark.ml Tokenizer on degenerate inputs") {
    import spark.implicits._
    val inputs = Seq(
      "", " ", "   ", "a b", "a  b", " a b", "a b ", "a  b  ",
      "A\tB", "a\nb", "Giáo dục - Đào tạo", "x, y,  z,", "một  hai ba ")
    val tok = new org.apache.spark.ml.feature.Tokenizer()
      .setInputCol("s").setOutputCol("toks")
    val df = inputs.toDF("s")
    val expected = tok.transform(df)
      .select($"s", $"toks").as[(String, Seq[String])].collect().toMap
    val got = df.select($"s", FrozenJobTfidf.rawTokensCol($"s").as("r"))
      .as[(String, Seq[String])].collect().toMap
    inputs.foreach { s =>
      assert(got(s) == expected(s),
        s"tokenizer mismatch on ${s.replace("\n", "\\n").take(20)}: " +
          s"replay ${got(s)} vs ml ${expected(s)}")
    }
  }

  test("stop filter keeps duplicates and passes multi-word stop entries through") {
    import spark.implicits._
    val remover = new org.apache.spark.ml.feature.StopWordsRemover()
      .setInputCol("toks").setOutputCol("clean")
      .setStopWords(Pipelines.attractivenessStopWords)
    // "của" is a stop word; "nhân viên" is a MULTI-WORD stop entry that
    // a per-token remover can never match (the persisted model's quirk,
    // replicated); duplicates must survive (tf counts them)
    val toks = Seq(Seq("của", "nhân", "viên", "sql", "sql", "của", "x"))
    val df = toks.toDF("toks")
    val expected = remover.transform(df).select($"clean")
      .as[Seq[String]].head()
    val got = df
      .select(filter($"toks",
        t => !t.isInCollection(FrozenJobTfidf.stopWords)).as("r"))
      .as[Seq[String]].head()
    assert(got == expected, s"stop-filter replay $got vs ml $expected")
    assert(got == Seq("nhân", "viên", "sql", "sql", "x"))
  }

  test("published idf vector is the trained artifact: 3000 weights, all positive-or-zero") {
    assert(FrozenJobTfidf.idf.length == FrozenJobTfidf.numFeatures)
    assert(FrozenJobTfidf.idf.forall(w => w >= 0.0 && !w.isNaN),
      "idf weights must be finite and non-negative (log((m+1)/(df+1)), df <= m)")
    // log((m+1)/1) is the ceiling (unseen bucket); at least one bucket
    // must be unseen-or-rare and at least one common (a flat vector
    // would mean the freeze read a degenerate corpus)
    assert(FrozenJobTfidf.idf.distinct.length > 10,
      "idf vector is near-constant — freeze likely ran on degenerate text")
  }

  test("per-doc folds: norm2 and top term are order-pinned and match a hand computation") {
    import spark.implicits._
    // two tokens in one bucket, one in another: tf 2 and 1
    val idfW = Seq.tabulate(FrozenJobTfidf.numFeatures)(i => (i % 7 + 1).toDouble)
    val df = Seq(Seq(5, 5, 9), Seq.empty[Int]).toDF("buckets")
    val r = df.select(
        FrozenJobTfidf.termsCol($"buckets", idfW).as("terms"))
      .withColumn("n2", FrozenJobTfidf.norm2Col($"terms"))
      .withColumn("top", FrozenJobTfidf.topCol($"terms"))
      .select($"n2", $"top"("bucket"), $"top"("w"))
      .as[(Double, Int, Double)].collect()
    val w5 = 2.0 * idfW(5); val w9 = 1.0 * idfW(9)
    assert(r(0) == ((0.0 + w5 * w5 + w9 * w9, if (w5 >= w9) 5 else 9,
      math.max(w5, w9))))
    assert(r(1) == ((0.0, -1, -1.0)))
  }
}
