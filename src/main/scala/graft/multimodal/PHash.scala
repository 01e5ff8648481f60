package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Perceptual image hashing — DCT pHash (the pHash.org construction,
  * also the shape of Facebook's PDQ): decode → grayscale 32×32
  * (bilinear) → 2-D DCT-II → keep the top-left 8×8 low-frequency block →
  * threshold the 63 AC coefficients against their median (DC carries
  * overall brightness, not structure — its slot becomes an
  * orientation-sign bit from the two gentlest frequencies, so all 64
  * bits carry signal) → 64-bit fingerprint. Content-identical images that differ
  * in encoding, scale, or mild compression land within a few Hamming
  * bits; distinct content lands ~32 bits apart (random).
  *
  * The byte-digest dedup family (dq01) can't see these pairs — a resize
  * or re-encode changes every byte. pHash is the image-content analogue
  * of SimHash for text (dq04), and the CANDIDATE JOIN reuses exactly
  * dq04's Hamming-bucket move: split the 64 bits into 8 bands of 8 bits;
  * by pigeonhole any pair within Hamming distance 7 agrees exactly on at
  * least one band, so equality on (band_idx, band_bits) is a complete
  * candidate generator for d ≤ 7 — an equi-join, never all-pairs.
  *
  * 100 TB: hashing is map-side (one decode + 32·32·32·2 multiply-adds
  * per asset via the separable DCT); only (asset_id, 8-byte hash) pairs
  * shuffle through the band join; verification is one bit_count(xor) per
  * candidate. */
object PHash {

  val Size = 32
  val Block = 8
  val Bands = 8
  val BandBits = 64 / Bands
  /** Pigeonhole-complete verification threshold for [[Bands]] bands. */
  val MaxHamming = Bands - 1

  // DCT-II basis, row-separable: basis(u)(x) = cos(π(2x+1)u / 2N)
  private val basis = Array.tabulate(Size, Size)((u, x) =>
    math.cos(math.Pi * (2 * x + 1) * u / (2.0 * Size)))

  /** 64-bit DCT pHash of an encoded image payload; None when the payload
    * does not decode (callers map it to a sentinel, the ImageCodec
    * contract). */
  def phash(payload: Array[Byte]): Option[Long] = {
    try {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      if (src == null) return None
      // grayscale 32×32 via the same bilinear path as Decode.resizeImage
      val dst = new BufferedImage(Size, Size, BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      try {
        g2.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(src, 0, 0, Size, Size, null)
      } finally g2.dispose()
      val gray = Array.ofDim[Double](Size, Size)
      var y = 0
      while (y < Size) {
        var x = 0
        while (x < Size) {
          val rgb = dst.getRGB(x, y)
          gray(y)(x) = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      // separable 2-D DCT-II restricted to the Block×Block output we keep
      val rows = Array.ofDim[Double](Block, Size) // rows(v)(x) = Σ_y basis(v)(y)·gray(y)(x)
      var v = 0
      while (v < Block) {
        var x = 0
        while (x < Size) {
          var s = 0.0
          var yy = 0
          while (yy < Size) { s += basis(v)(yy) * gray(yy)(x); yy += 1 }
          rows(v)(x) = s
          x += 1
        }
        v += 1
      }
      val coef = new Array[Double](Block * Block)
      var u = 0
      while (u < Block) {
        var v2 = 0
        while (v2 < Block) {
          var s = 0.0
          var xx = 0
          while (xx < Size) { s += basis(u)(xx) * rows(v2)(xx); xx += 1 }
          coef(u * Block + v2) = s
          v2 += 1
        }
        u += 1
      }
      // median over the 63 AC coefficients (index 0 is DC)
      val ac = coef.drop(1).sorted
      val med = ac(ac.length / 2)
      var bits = 0L
      var k = 1
      while (k < 64) {
        if (coef(k) > med) bits |= (1L << k)
        k += 1
      }
      // DC (index 0) carries brightness, not structure, and always sits
      // far above the AC median — thresholding it would yield a constant
      // bit. Assign bit 0 from AC signal instead: the sign of the
      // difference between the two gentlest frequencies (vertical-1 vs
      // horizontal-1) — the orientation of the dominant structure.
      // Balanced-by-symmetry across images, yet stable under resize /
      // re-encode (both operands are the most codec-robust coefficients;
      // a higher-frequency extra coefficient here flips under JPEG and
      // breaks the d ≤ 7 band guarantee on real re-encodes).
      if (coef(1) > coef(Block)) bits |= 1L
      Some(bits)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** The [[Bands]] (band_idx, band_bits) keys of a hash — dq04's
    * Hamming-bucket candidate key, image edition. */
  def bands(h: Long): Seq[(Int, Int)] =
    (0 until Bands).map(b => (b, ((h >>> (b * BandBits)) & ((1L << BandBits) - 1)).toInt))

  /** Deterministic BROAD-SPECTRUM test image: an 8×6 grid of
    * seed-derived grays upscaled bilinearly — a smooth random
    * low-frequency field, which is exactly the domain pHash is built
    * for (natural images have 1/f spectra; every kept DCT coefficient
    * is substantial, so its sign survives resize/re-encode). Solid
    * grays (ImageCodec.encodeGray) are useless here — all-zero AC
    * spectrum — and pure sinusoids are the opposite failure: energy in
    * one coefficient, the other 62 near zero with codec-noise signs.
    * java.util.Random's LCG is spec-fixed, so payloads are
    * deterministic across JVMs. */
  def encodePattern(width: Int, height: Int, seed: Long,
      format: String = "png"): Array[Byte] = {
    val gw = 8; val gh = 6
    val rnd = new java.util.Random(seed)
    val grid = new BufferedImage(gw, gh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        val g = 32 + rnd.nextInt(192)
        grid.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(grid, 0, 0, width, height, null)
    } finally g2.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }
}
