package graft.tokenizer

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed unigram tokenizer against an independent plain-Scala
  * reference: the unrolled column-expression Viterbi must pick exactly
  * the parse the textbook DP picks (score max, segmentation-string max
  * on ties), segmentation must be lossless, and the EM trainer must be
  * partition-invariant and reference-equal. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Textbook Viterbi, no Spark: best (scoreFp, seg) under the same
    * total order the packed keys encode. */
  private def refViterbi(word: String, vocab: Map[String, Long]): (Long, String) = {
    val ord = implicitly[Ordering[(Long, String)]]
    val dp = new Array[Option[(Long, String)]](word.length + 1)
    dp(0) = Some((0L, ""))
    for (i <- 1 to word.length) {
      var best: Option[(Long, String)] = None
      for (j <- math.max(0, i - Unigram.MaxPiece) until i; prev <- dp(j)) {
        val piece = word.substring(j, i)
        val s = vocab.get(piece)
          .orElse(if (piece.length == 1) Some(Unigram.UnkScoreFp) else None)
        for (sc <- s) {
          val seg = if (prev._2.isEmpty) piece else prev._2 + " " + piece
          val cand = (prev._1 + sc, seg)
          if (best.forall(b => ord.lt(b, cand))) best = Some(cand)
        }
      }
      dp(i) = best
    }
    dp(word.length).get
  }

  private def histogram() =
    Bpe.wordHistogram(Tables.documents(spark, dir))

  test("viterbiFrame equals the reference DP on every corpus word (FixedPieces)") {
    import spark.implicits._
    val vocabMap = Unigram.FixedPieces.map(p => p.piece -> p.scoreFp).toMap
    val vit = Unigram.viterbiFrame(histogram(), Unigram.FixedPieces, Unigram.MaxUnroll)
      .select($"word",
        Unigram.vitScoreFp($"vit_key").as("sfp"),
        Unigram.vitSeg($"vit_key").as("seg"))
      .as[(String, Long, String)].collect()
    assert(vit.nonEmpty)
    vit.foreach { case (word, sfp, seg) =>
      val (rs, rseg) = refViterbi(word, vocabMap)
      assert(sfp == rs, s"score mismatch for '$word': $sfp vs ref $rs")
      assert(seg == rseg, s"seg mismatch for '$word': '$seg' vs ref '$rseg'")
      // segmentation is lossless: pieces concatenate back to the word
      assert(seg.replace(" ", "") == word)
    }
    // the frozen vocab genuinely bites: at least one multi-char piece used
    assert(vit.exists(_._3.split(" ").exists(_.length > 1)))
  }

  test("unknown single chars get the UNK floor, never a hole in the lattice") {
    import spark.implicits._
    val words = Seq(("zq7#x", 1L), ("a", 1L), ("#", 1L))
      .toDF("word", "freq")
    val vit = Unigram.viterbiFrame(words, Unigram.FixedPieces, Unigram.MaxUnroll)
      .select($"word", Unigram.vitScoreFp($"vit_key"), Unigram.vitSeg($"vit_key"))
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val vocabMap = Unigram.FixedPieces.map(p => p.piece -> p.scoreFp).toMap
    for ((w, got) <- vit) assert(got == refViterbi(w, vocabMap))
    assert(vit("#")._1 == Unigram.UnkScoreFp)
  }

  test("trainEm is reference-equal and partition-invariant") {
    val hist = histogram().filter(length(col("word")) <= Unigram.MaxUnroll).cache()
    val seed = Unigram.seedVocab(hist, seedSize = 60)
    // reference EM entirely driver-side over the collected histogram
    val rows = hist.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    var refVocab = seed
    for (_ <- 1 to 3) {
      val vm = refVocab.map(p => p.piece -> p.scoreFp).toMap
      val usage = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- rows; piece <- refViterbi(w, vm)._2.split(" "))
        usage(piece) = usage.getOrElse(piece, 0L) + f
      val (single, multi) = refVocab.partition(_.piece.length == 1)
      val usedMulti = multi.map(p => p.piece -> usage.getOrElse(p.piece, 0L))
        .filter(_._2 > 0).sortBy { case (p, u) => (-u, p) }
      val keepN = math.max(50 - single.size,
        math.min(usedMulti.size, math.ceil(usedMulti.size * 0.75).toInt))
      val keptMulti = usedMulti.take(math.min(keepN, usedMulti.size))
      val tot = math.max(keptMulti.map(_._2).sum +
        single.map(p => usage.getOrElse(p.piece, 0L)).sum, 1L)
      refVocab = (single.map(p => Unigram.Piece(p.piece,
          Unigram.lnFp(math.max(usage.getOrElse(p.piece, 0L), 1L), tot))) ++
        keptMulti.map { case (p, u) => Unigram.Piece(p, Unigram.lnFp(u, tot)) })
        .sortBy(_.piece)
    }
    val trained = Unigram.trainEm(hist, seed, rounds = 3, targetVocab = 50,
      maxLen = Unigram.MaxUnroll)
    assert(trained == refVocab)
    val trained7 = Unigram.trainEm(hist.repartition(7), seed, rounds = 3,
      targetVocab = 50, maxLen = Unigram.MaxUnroll)
    assert(trained7 == trained)
    // the trained vocab still keeps full coverage and real subword units
    assert(trained.exists(_.piece.length > 1))
    assert("abcdefghijklmnopqrstuvwxyz".forall(c =>
      trained.exists(_.piece == c.toString) ||
        !rows.exists(_._1.contains(c))))
    hist.unpersist()
    ()
  }
}
