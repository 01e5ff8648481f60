package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal decode: opaque binary payloads + typed metadata in, typed
  * features out, processed per-partition in bounded batches.
  *
  * The image modality is REAL: [[ImageCodec]] decodes PNG/JPEG bytes with
  * JDK-only `javax.imageio` (no native libraries) and extracts width,
  * height and mean-luminance brightness. Audio/video decoders would need
  * native libraries this container doesn't ship — [[FakeCodec]] is a
  * clearly-marked deterministic stand-in for those modalities only.
  * Everything AROUND the codecs is the engine surface DecodeSpec locks in:
  *   - schema: (asset_id, payload binary, modality) → typed
  *     [[AssetFeatures]] rows;
  *   - partitioning: mapPartitions keeps the codec call per-executor,
  *     zero driver involvement, arbitrary partition count;
  *   - batch shape: payloads are buffered into fixed-size batches inside
  *     each partition (codecs amortize setup per batch, memory stays
  *     bounded by batchSize × payload, not partition size).
  *
  * This is the Scala/Dataset analogue of a pandas mapInPandas decode
  * stage; swapping FakeCodec for a real audio/video codec changes no
  * plumbing — the image path proves it.
  */
object Decode {

  final case class Asset(asset_id: Long, payload: Array[Byte], modality: String)
  final case class AssetFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double)

  /** Real JDK image codec: PNG/JPEG (any `javax.imageio` reader) in,
    * (width, height, mean luminance ∈ [0,1]) out. Corrupt or undecodable
    * payloads yield a sentinel row (width=height=n_frames=0,
    * brightness=-1.0) instead of failing the job — at corpus scale a
    * handful of bad assets must not kill a 1000-executor stage; callers
    * filter `width > 0` for the clean subset. */
  object ImageCodec {
    // Executor-side: never spill decode scratch to a temp-file disk cache.
    ImageIO.setUseCache(false)

    def decode(a: Asset): AssetFeatures = {
      val img =
        try ImageIO.read(new ByteArrayInputStream(a.payload))
        catch { case _: java.io.IOException => null }
      if (img == null)
        AssetFeatures(a.asset_id, a.modality, a.payload.length, 0, 0, 0, -1.0)
      else {
        val w = img.getWidth
        val h = img.getHeight
        var lumSum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            lumSum += Math.round(0.299 * r + 0.587 * g + 0.114 * b)
            x += 1
          }
          y += 1
        }
        val brightness = lumSum.toDouble / (w.toLong * h) / 255.0
        AssetFeatures(a.asset_id, a.modality, a.payload.length, w, h, 1, brightness)
      }
    }

    /** Encode a solid-gray image — used by the fixtures/oracle to produce
      * payloads whose decoded (width, height, gray level) are known in
      * closed form. `format` is any ImageIO writer name ("png", "jpg"). */
    def encodeGray(width: Int, height: Int, gray: Int, format: String = "png"): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, format, out)
      out.toByteArray
    }
  }

  /** STUB codec for audio/video — deterministic fake features derived from
    * content bytes. Replace with the real audio/video libraries at
    * deployment; signature (batch in, batch out) is the contract. */
  object FakeCodec {
    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
      batch.map { a =>
        val h = java.util.Arrays.hashCode(a.payload)
        AssetFeatures(
          a.asset_id, a.modality, a.payload.length,
          width = math.abs(h % 1920) + 1,
          height = math.abs((h >> 8) % 1080) + 1,
          n_frames = if (a.modality == "video") math.abs(h % 300) + 1 else 1,
          brightness = math.abs((h % 1000) / 1000.0))
      }
  }

  /** Modality dispatch: image → real ImageIO decode; audio/video → stub. */
  private def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = {
    val (images, rest) = batch.partition(_.modality == "image")
    images.map(ImageCodec.decode) ++ FakeCodec.decodeBatch(rest)
  }

  /** Per-partition batched decode (batchSize bounds executor memory). */
  def decode(assets: Dataset[Asset], batchSize: Int = 64): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeBatch(b.toSeq))
    }
  }

  /** DataFrame adapter: (asset_id long, payload binary, modality string). */
  def decodeFrame(df: DataFrame, batchSize: Int = 64): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[Asset]
    decode(df.as[Asset], batchSize)
  }
}
