package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The audio energy/zero-crossing fingerprint: gain and header-rate
  * invariance (the transforms a re-mastered or re-encoded copy
  * applies), separation across distinct clips, graceful failure, and
  * the planted end-to-end proof through the registered query. */
class AudioFpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fingerprint survives gain change and declared-rate re-encode; clips separate") {
    val hashes = (0L until 30L).map { seed =>
      val h = AudioFp.fingerprint(AudioFp.encodeClip(seed)).get
      val gained = AudioFp.fingerprint(AudioFp.encodeClip(seed, gain = 0.55)).get
      val rerated = AudioFp.fingerprint(AudioFp.encodeClip(seed, sampleRate = 16000)).get
      assert(PHash.hamming(h, gained) <= PHash.MaxHamming,
        s"seed $seed: gain 0.55 moved the fingerprint past the band guarantee")
      assert(PHash.hamming(h, rerated) == 0,
        "identical samples under a different header must fingerprint identically")
      h
    }
    val cross = for {
      i <- hashes.indices; j <- hashes.indices if i < j
    } yield PHash.hamming(hashes(i), hashes(j))
    assert(cross.min > PHash.MaxHamming,
      s"distinct clips collided at hamming ${cross.min}")
    assert(cross.sum.toDouble / cross.size > 16)
  }

  test("non-audio payloads yield None, not an exception") {
    assert(AudioFp.fingerprint(Array[Byte](9, 9, 9)).isEmpty)
    assert(AudioFp.fingerprint(Array.emptyByteArray).isEmpty)
    // an 8-bit WAV is outside the 16-bit PCM contract
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val data = Array.fill[Byte](256)(3)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt8, 256L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(AudioFp.fingerprint(out.toByteArray).isEmpty)
  }

  test("tq45 planted proof: every re-mastered/re-encoded clip found, zero false positives") {
    val row = graft.queries.TextQueries.tq45AudioFpNearDup
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_dup_pairs_expected") > 50)
    assert(row.getAs[Long]("n_true_found") == row.getAs[Long]("n_dup_pairs_expected"),
      "a planted audio near-duplicate escaped the band join / verify")
    assert(row.getAs[Long]("n_false_positives") == 0L)
    val n = row.getAs[Long]("n_assets")
    assert(row.getAs[Long]("n_candidate_pairs") < n * (n - 1) / 2 / 4,
      "candidate join degenerated toward all-pairs")
  }
}
