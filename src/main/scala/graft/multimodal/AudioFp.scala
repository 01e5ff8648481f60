package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Perceptual audio fingerprinting — the WAV sibling of [[PHash]], the
  * energy-profile family (Shazam/Chromaprint-lite): decode 16-bit PCM,
  * split the sample stream into 33 equal windows, and take the SIGNS of
  * consecutive-window deltas of two amplitude-invariant statistics —
  * window energy (32 bits) and window zero-crossing count (32 bits) —
  * packed into one 64-bit fingerprint. A gain change scales every
  * energy by c² and leaves zero crossings untouched, so re-encoded /
  * re-mastered copies of the same recording land within a few Hamming
  * bits while different material lands ~32 apart; the byte-digest dedup
  * family (dq01) sees nothing once a single sample changes.
  *
  * Candidate generation reuses dq04/tq43's Hamming-band equi-join
  * verbatim (PHash.bands/hamming operate on the packed long), so the
  * audio near-dup query inherits the pigeonhole-complete d ≤ 7 property
  * and the never-all-pairs plan.
  *
  * 100 TB: one decode + one O(samples) pass per asset, map-side; only
  * (asset_id, 8-byte fingerprint) pairs shuffle. */
object AudioFp {

  val Windows = 33 // 32 deltas per statistic

  /** 64-bit fingerprint of a WAV payload; None when the payload does
    * not decode as 16-bit PCM (the AudioCodec sentinel contract). */
  def fingerprint(payload: Array[Byte]): Option[Long] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val data = in.readAllBytes()
        val n = data.length / 2
        if (n < Windows * 2) return None
        val energy = new Array[Double](Windows)
        val zc = new Array[Int](Windows)
        var prev = 0
        var i = 0
        while (i < n) {
          val lo = data(2 * i); val hi = data(2 * i + 1)
          val s =
            if (fmt.isBigEndian) (lo << 8) | (hi & 0xff)
            else (hi << 8) | (lo & 0xff)
          val w = (i.toLong * Windows / n).toInt
          energy(w) += s.toDouble * s
          if (i > 0 && ((s > 0 && prev <= 0) || (s < 0 && prev >= 0))) zc(w) += 1
          prev = s
          i += 1
        }
        var bits = 0L
        var k = 0
        while (k < 32) {
          if (energy(k) > energy(k + 1)) bits |= (1L << k)
          if (zc(k) > zc(k + 1)) bits |= (1L << (32 + k))
          k += 1
        }
        Some(bits)
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Deterministic structured test clip: [[Windows]]−1 segments, each a
    * square wave whose amplitude and period come from a seeded LCG
    * (java.util.Random — spec-fixed across JVMs). Varying amplitude
    * makes the energy profile informative; varying period makes the
    * zero-crossing profile informative — AudioCodec.encodeTone's single
    * fixed tone is the degenerate case (flat profiles, every clip would
    * fingerprint alike). `gain` scales every sample (a re-mastered
    * copy); `sampleRate` only relabels the header (the same samples at a
    * different declared rate — a container-level re-encode). */
  def encodeClip(seed: Long, framesPerSeg: Int = 64, gain: Double = 1.0,
      sampleRate: Int = 8000): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    val segs = Windows - 1
    val data = new Array[Byte](segs * framesPerSeg * 2)
    var idx = 0
    var s = 0
    while (s < segs) {
      val amp = 2000 + rnd.nextInt(26000)
      val halfPeriod = 1 + rnd.nextInt(12)
      var f = 0
      while (f < framesPerSeg) {
        val raw = if ((f / halfPeriod) % 2 == 0) amp else -amp
        val v = math.max(-32768, math.min(32767, math.round(raw * gain).toInt))
        data(2 * idx) = (v & 0xff).toByte
        data(2 * idx + 1) = ((v >> 8) & 0xff).toByte
        idx += 1
        f += 1
      }
      s += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, (segs * framesPerSeg).toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
