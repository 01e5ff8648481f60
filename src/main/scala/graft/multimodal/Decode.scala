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
  * height and mean-luminance brightness. The audio modality is REAL:
  * [[AudioCodec]] decodes WAV/PCM bytes with JDK-only
  * `javax.sound.sampled` and extracts sample rate, channel count, frame
  * count and RMS loudness. The animated-GIF video container is REAL:
  * [[VideoCodec]] multi-frame-decodes GIF bytes via `javax.imageio`
  * (frame count, dims, mean luminance across frames). Non-GIF video
  * containers (mp4/webm) would need native demuxers this container
  * doesn't ship — [[FakeCodec]] is a clearly-marked deterministic
  * stand-in for those only.
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
        // NonFatal, not just IOException: ImageIO plugins throw unchecked
        // types on hostile bytes (CMMException for malformed ICC profiles,
        // NegativeArraySizeException from corrupt headers) — any decode
        // failure must map to the sentinel, never kill the stage
        try ImageIO.read(new ByteArrayInputStream(a.payload))
        catch { case scala.util.control.NonFatal(_) => null }
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

  /** Bilinear resize — the standard vision-preprocessing step (every
    * image tower takes a fixed input size, e.g. 224×224; the corpus
    * arrives at arbitrary dims). Real JDK implementation: decode, one
    * Graphics2D pass with BILINEAR interpolation, re-encode. Returns
    * None for undecodable payloads (callers map that to the sentinel
    * row, same contract as decode). Solid-color images resize to the
    * same color exactly (interpolation of equal values), which is what
    * makes the operation oracle-checkable end to end. */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int,
      format: String = "png"): Option[Array[Byte]] = {
    try {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      if (src == null) return None
      val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(dst, format, out)
      Some(out.toByteArray)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Real JDK audio codec: WAV (any `javax.sound.sampled` reader, 16-bit
    * PCM) in, features out mapped onto the uniform feature slots:
    * width = sample rate (Hz), height = channel count, n_frames = sample
    * frames, brightness = RMS amplitude normalized to [0,1]. Corrupt or
    * unsupported payloads yield the same sentinel row as [[ImageCodec]]
    * (all-zero dims, brightness = -1.0). */
  object AudioCodec {
    /** Frame count resolution: trust a declared non-negative count;
      * stream-sourced WAVs can report NOT_SPECIFIED (-1) frames, in which
      * case derive from decoded bytes / frame size; None (→ sentinel row)
      * when the format declares neither, or when a declared count
      * exceeds Int.MaxValue (r8 ADVICE: .toInt used to wrap such a
      * header silently negative — a >2^31-frame declaration on an
      * in-memory payload is corrupt metadata, so it takes the sentinel
      * path rather than saturating). */
    def frameCount(declared: Long, frameSize: Int, dataLen: Int): Option[Int] =
      if (declared >= 0 && declared <= Int.MaxValue) Some(declared.toInt)
      else if (declared > Int.MaxValue) None
      else if (frameSize > 0) Some(dataLen / frameSize)
      else None

    def decode(a: Asset): AssetFeatures = {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(a.payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16)
            return AssetFeatures(a.asset_id, a.modality, a.payload.length, 0, 0, 0, -1.0)
          val data = in.readAllBytes()
          val frames = frameCount(in.getFrameLength, fmt.getFrameSize, data.length)
            .getOrElse(
              return AssetFeatures(a.asset_id, a.modality, a.payload.length, 0, 0, 0, -1.0))
          var sumSq = 0.0
          var n = 0
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (fmt.isBigEndian) (data(i) << 8) | (data(i + 1) & 0xff)
              else (data(i + 1) << 8) | (data(i) & 0xff)
            sumSq += s.toDouble * s
            n += 1
            i += 2
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0
          AssetFeatures(a.asset_id, a.modality, a.payload.length,
            width = fmt.getSampleRate.toInt, height = fmt.getChannels,
            n_frames = frames, brightness = rms)
        } finally in.close()
      } catch {
        // NonFatal for the same reason as ImageCodec: WAV parsers throw
        // unchecked types on truncated/hostile headers
        case scala.util.control.NonFatal(_) =>
          AssetFeatures(a.asset_id, a.modality, a.payload.length, 0, 0, 0, -1.0)
      }
    }

    /** Encode a ±amplitude square wave as 16-bit mono little-endian PCM
      * WAV — RMS of a square wave is exactly its amplitude, so decoded
      * loudness is known in closed form (amplitude/32768). */
    def encodeTone(sampleRate: Int, nFrames: Int, amplitude: Int): Array[Byte] = {
      require(amplitude >= 0 && amplitude < 32768, s"amplitude $amplitude out of int16")
      val data = new Array[Byte](nFrames * 2)
      var i = 0
      while (i < nFrames) {
        val v = if (i % 2 == 0) amplitude else -amplitude
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(data), fmt, nFrames.toLong)
      val out = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  /** Real JDK video codec for the animated-GIF container: multi-frame
    * decode via `javax.imageio`'s GIF reader — frame count, first-frame
    * dims, mean luminance across ALL frames. Solid-color frames survive
    * GIF's palette quantization exactly (one color → one palette entry),
    * which is what makes the tq23 oracle bit-exact. Non-GIF video
    * containers (mp4/webm) need native demuxers the JDK doesn't ship —
    * [[FakeCodec]] remains the marked stand-in for those, reached via
    * the `video` modality; `gif` routes here. */
  object VideoCodec {
    import javax.imageio.stream.MemoryCacheImageInputStream

    def decode(a: Asset): AssetFeatures = {
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext)
        return AssetFeatures(a.asset_id, a.modality, a.payload.length, 0, 0, 0, -1.0)
      val reader = readers.next()
      try {
        reader.setInput(new MemoryCacheImageInputStream(
          new ByteArrayInputStream(a.payload)), false, false)
        val n = reader.getNumImages(true)
        if (n <= 0)
          return AssetFeatures(a.asset_id, a.modality, a.payload.length, 0, 0, 0, -1.0)
        var lumSum = 0L
        var px = 0L
        var w = 0
        var h = 0
        var i = 0
        while (i < n) {
          val img = reader.read(i)
          if (i == 0) { w = img.getWidth; h = img.getHeight }
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              lumSum += Math.round(0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff))
              x += 1
            }
            y += 1
          }
          px += img.getWidth.toLong * img.getHeight
          i += 1
        }
        AssetFeatures(a.asset_id, a.modality, a.payload.length,
          width = w, height = h, n_frames = n,
          brightness = lumSum.toDouble / px / 255.0)
      } catch {
        // the GIF reader throws assorted unchecked types on truncated or
        // non-GIF bytes; any decode failure maps to the sentinel row
        case scala.util.control.NonFatal(_) =>
          AssetFeatures(a.asset_id, a.modality, a.payload.length, 0, 0, 0, -1.0)
      } finally reader.dispose()
    }

    /** Encode an animated GIF of `nFrames` solid-gray frames. */
    def encodeGrayFrames(width: Int, height: Int, gray: Int, nFrames: Int): Array[Byte] =
      encodeFrames(width, height, Seq.fill(nFrames)(gray))

    /** Encode an animated GIF with one solid frame PER gray value — the
      * per-frame-distinct fixture frame sampling needs (each frame gets
      * its own local color table, so grays round-trip exactly). */
    def encodeFrames(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        grays.foreach { gray =>
          val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
          val rgb = (gray << 16) | (gray << 8) | gray
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      out.toByteArray
    }

    /** Uniform frame sampling — a video tower never ingests every frame;
      * it takes k frames spread across the clip. Indices are the standard
      * round(i·(n−1)/(k−1)) lattice (first and last always included;
      * k ≥ n degenerates to all frames), deduplicated and ascending.
      * Returns (frame_idx, mean luminance ∈ [0,1]) per sampled frame;
      * empty for undecodable payloads. Only the SAMPLED frames are
      * decoded — at corpus scale that is the entire point. */
    def sampleFrames(payload: Array[Byte], k: Int): Seq[(Int, Double)] = {
      require(k >= 1, "k frames to sample")
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      try {
        reader.setInput(new MemoryCacheImageInputStream(
          new ByteArrayInputStream(payload)), false, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return Seq.empty
        val idxs =
          if (k == 1) Seq(0)
          else (0 until k).map(i => math.round(i.toDouble * (n - 1) / (k - 1)).toInt)
        idxs.distinct.sorted.map { i =>
          val img = reader.read(i)
          var lumSum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              lumSum += Math.round(0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff))
              x += 1
            }
            y += 1
          }
          (i, lumSum.toDouble / (img.getWidth.toLong * img.getHeight) / 255.0)
        }
      } catch {
        case scala.util.control.NonFatal(_) => Seq.empty
      } finally reader.dispose()
    }
  }

  /** STUB codec for non-GIF video containers — deterministic fake
    * features derived from content bytes. Replace with the real video
    * libraries at deployment; signature (batch in, batch out) is the
    * contract. */
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

  /** Modality dispatch: image → real ImageIO decode; audio → real
    * javax.sound decode; gif → real multi-frame GIF decode; video
    * (non-GIF containers) → stub. Order-preserving AND batch-preserving:
    * contiguous same-modality runs dispatch as one batch, so a real
    * native codec swapped in for the stub still amortizes its setup per
    * run instead of per asset, and per-partition row order survives
    * (zipWithIndex alignment downstream). */
  private def decodeBatch(batch: IndexedSeq[Asset]): Seq[AssetFeatures] = {
    val out = Seq.newBuilder[AssetFeatures]
    var i = 0
    while (i < batch.length) {
      val mod = batch(i).modality
      var j = i + 1
      while (j < batch.length && batch(j).modality == mod) j += 1
      val run = batch.slice(i, j)
      out ++= (mod match {
        case "image" => run.map(ImageCodec.decode)
        case "audio" => run.map(AudioCodec.decode)
        case "gif"   => run.map(VideoCodec.decode)
        case _       => FakeCodec.decodeBatch(run)
      })
      i = j
    }
    out.result()
  }

  /** Per-partition batched decode (batchSize bounds executor memory). */
  def decode(assets: Dataset[Asset], batchSize: Int = 64): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeBatch(b.toIndexedSeq))
    }
  }

  /** DataFrame adapter: (asset_id long, payload binary, modality string). */
  def decodeFrame(df: DataFrame, batchSize: Int = 64): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[Asset]
    decode(df.as[Asset], batchSize)
  }
}
