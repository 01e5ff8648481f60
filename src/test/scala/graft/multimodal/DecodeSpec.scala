package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode contract: a REAL javax.imageio path for images
  * (byte-exact on a hand-built PNG), the stubbed audio/video path, schema
  * in/out, per-partition batch processing, determinism, and
  * partition-count independence. */
class DecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // image modality carries REAL PNG payloads (solid gray, dims/level from
  // doc metadata); video keeps opaque text bytes for the stub path.
  private def assets = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Decode.Asset]
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"lang", $"n_chars")
      .as[(Long, String, String, Long)]
      .map { case (id, text, lang, nChars) =>
        if (lang == "en")
          Decode.Asset(
            id,
            Decode.ImageCodec.encodeGray(
              (id % 7 + 1).toInt, (id % 5 + 1).toInt, (nChars % 256).toInt),
            "image")
        else Decode.Asset(id, text.getBytes("UTF-8"), "video")
      }
  }

  test("hand-built 2x2 PNG decodes byte-exactly: dims and per-pixel luminance") {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000) // lum round(0.299*255) = 76
    img.setRGB(1, 0, 0x00FF00) // lum round(0.587*255) = 150
    img.setRGB(0, 1, 0x0000FF) // lum round(0.114*255) = 29
    img.setRGB(1, 1, 0xFFFFFF) // lum 255
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val bytes = out.toByteArray

    val f = Decode.ImageCodec.decode(Decode.Asset(7L, bytes, "image"))
    assert(f.width == 2 && f.height == 2 && f.n_frames == 1)
    assert(f.n_bytes == bytes.length)
    // (76 + 150 + 29 + 255) / 4 / 255 = 127.5 / 255 = 0.5 exactly
    assert(f.brightness == 0.5)
  }

  test("solid-gray PNG round-trip recovers dims and gray level exactly") {
    for (g <- Seq(0, 1, 127, 200, 255)) {
      val f = Decode.ImageCodec.decode(
        Decode.Asset(g.toLong, Decode.ImageCodec.encodeGray(3, 4, g), "image"))
      assert(f.width == 3 && f.height == 4)
      assert(Math.round(f.brightness * 255).toInt == g, s"gray $g")
    }
  }

  test("JPEG decodes with correct dims; lossy gray within tolerance") {
    val f = Decode.ImageCodec.decode(
      Decode.Asset(1L, Decode.ImageCodec.encodeGray(5, 3, 128, "jpg"), "image"))
    assert(f.width == 5 && f.height == 3)
    assert(math.abs(f.brightness * 255 - 128) < 8.0)
  }

  test("bilinear resize: dims land exactly; solid color is preserved; corrupt -> None") {
    val solid = Decode.ImageCodec.encodeGray(20, 14, 97, "png")
    val r = Decode.resizeImage(solid, 8, 8).get
    val f = Decode.ImageCodec.decode(Decode.Asset(1L, r, "image"))
    assert(f.width == 8 && f.height == 8)
    assert(Math.round(f.brightness * 255).toInt == 97,
      "solid color must survive interpolation exactly")
    // upscale too
    val up = Decode.resizeImage(solid, 64, 64).get
    val fu = Decode.ImageCodec.decode(Decode.Asset(2L, up, "image"))
    assert(fu.width == 64 && fu.height == 64)
    assert(Math.round(fu.brightness * 255).toInt == 97)
    assert(Decode.resizeImage("not an image".getBytes("UTF-8"), 8, 8).isEmpty)
  }

  test("frame sampling: lattice indices, k>=n degenerates to all frames, corrupt -> empty") {
    // frames at grays 10, 60, 110, 160 — distinct per frame
    val gif = Decode.VideoCodec.encodeFrames(4, 3, Seq(10, 60, 110, 160))
    def grays(k: Int) = Decode.VideoCodec.sampleFrames(gif, k)
      .map { case (i, l) => (i, Math.round(l * 255).toInt) }
    assert(grays(3) == Seq((0, 10), (2, 110), (3, 160)),
      "k=3 over 4 frames samples the round(i*(n-1)/(k-1)) lattice")
    assert(grays(1) == Seq((0, 10)), "k=1 takes the first frame")
    assert(grays(9) == Seq((0, 10), (1, 60), (2, 110), (3, 160)),
      "k >= n decodes every frame once")
    assert(Decode.VideoCodec.sampleFrames("junk".getBytes("UTF-8"), 3).isEmpty)
  }

  test("hand-built WAV decodes exactly: rate, channels, frames, RMS") {
    // ±8192 square wave: RMS = 8192 exactly → brightness = 8192/32768 = 0.25
    val bytes = Decode.AudioCodec.encodeTone(16000, 64, 8192)
    val f = Decode.AudioCodec.decode(Decode.Asset(3L, bytes, "audio"))
    assert(f.width == 16000, "sample rate")
    assert(f.height == 1, "mono")
    assert(f.n_frames == 64, "frame count")
    assert(f.n_bytes == bytes.length)
    assert(f.brightness == 0.25, s"RMS of a square wave is its amplitude: ${f.brightness}")
  }

  test("audio round-trip recovers amplitude exactly across the int16 range") {
    for (amp <- Seq(0, 1, 1000, 16384, 32767)) {
      val f = Decode.AudioCodec.decode(
        Decode.Asset(amp.toLong, Decode.AudioCodec.encodeTone(8000, 50, amp), "audio"))
      assert(Math.round(f.brightness * 32768).toInt == amp, s"amp $amp")
    }
  }

  test("frame-count resolution: declared wins; NOT_SPECIFIED derives from bytes; neither → sentinel") {
    // stream-sourced WAVs report getFrameLength == -1 (NOT_SPECIFIED)
    assert(Decode.AudioCodec.frameCount(64, 2, 999) == Some(64), "declared count wins")
    assert(Decode.AudioCodec.frameCount(-1, 2, 128) == Some(64), "-1 derives from data/frameSize")
    assert(Decode.AudioCodec.frameCount(-1, 4, 128) == Some(32), "stereo 16-bit frame size")
    assert(Decode.AudioCodec.frameCount(-1, -1, 128) == None, "no declared count, no frame size → sentinel")
    assert(Decode.AudioCodec.frameCount(0, 2, 0) == Some(0), "empty stream is valid, not sentinel")
    assert(Decode.AudioCodec.frameCount(Int.MaxValue.toLong + 1, 2, 128) == None,
      "a > 2^31 declared count is corrupt metadata → sentinel, never a negative wrap")
    assert(Decode.AudioCodec.frameCount(Int.MaxValue.toLong, 2, 128) == Some(Int.MaxValue),
      "the boundary itself still resolves")
  }

  test("corrupt audio payload yields sentinel row") {
    val f = Decode.AudioCodec.decode(
      Decode.Asset(9L, "definitely not a wav".getBytes("UTF-8"), "audio"))
    assert(f.width == 0 && f.height == 0 && f.n_frames == 0 && f.brightness == -1.0)
  }

  test("animated GIF decodes all frames: dims, count, cross-frame luminance") {
    val bytes = Decode.VideoCodec.encodeGrayFrames(4, 3, 200, 5)
    val f = Decode.VideoCodec.decode(Decode.Asset(11L, bytes, "gif"))
    assert(f.width == 4 && f.height == 3)
    assert(f.n_frames == 5, "all five frames found")
    assert(Math.round(f.brightness * 255).toInt == 200,
      s"solid gray survives palette quantization: ${f.brightness}")
  }

  test("corrupt GIF payload yields sentinel row") {
    val f = Decode.VideoCodec.decode(
      Decode.Asset(12L, "GIF89a-but-not-really".getBytes("UTF-8"), "gif"))
    assert(f.n_frames == 0 && f.brightness == -1.0)
  }

  test("corrupt payload yields sentinel row, not a job failure") {
    val f = Decode.ImageCodec.decode(
      Decode.Asset(9L, "not an image at all".getBytes("UTF-8"), "image"))
    assert(f.width == 0 && f.height == 0 && f.n_frames == 0)
    assert(f.brightness == -1.0)
    assert(f.n_bytes == 19)
  }

  test("batched mapPartitions decode produces one typed feature row per asset") {
    val out = Decode.decode(assets, batchSize = 16)
    assert(out.count() == assets.count())
    // every image asset really decoded: dims follow the closed form
    val imgs = out.filter($"modality" === "image")
      .select($"asset_id", $"width", $"height").collect()
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 7 + 1).toInt && r.getInt(2) == (id % 5 + 1).toInt)
    }
    // video modality fans frames via the stub, image is a single frame
    assert(out.filter($"modality" === "image" && $"n_frames" =!= 1).count() == 0)
  }

  test("decode runs unchanged under Structured Streaming (ingest-time shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Decode.Asset]
    val q = Decode.decode(stream.toDS(), batchSize = 4)
      .writeStream.format("memory").queryName("decoded_assets")
      .outputMode("append").start()
    stream.addData(
      Decode.Asset(1L, Decode.ImageCodec.encodeGray(3, 2, 100), "image"),
      Decode.Asset(2L, Decode.AudioCodec.encodeTone(8000, 20, 4096), "audio"),
      Decode.Asset(3L, Decode.VideoCodec.encodeGrayFrames(2, 2, 50, 3), "gif"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("decoded_assets")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(rows(1L) == ((3, 2, 1)), "image dims + single frame")
    assert(rows(2L)._1 == 8000 && rows(2L)._3 == 20, "audio rate + frames")
    assert(rows(3L) == ((2, 2, 3)), "gif dims + frame count")
  }

  test("decode is deterministic and partition-count independent") {
    val a = Decode.decode(assets.repartition(2), batchSize = 7)
      .collect().map(f => f.asset_id -> f).toMap
    val b = Decode.decode(assets.repartition(13), batchSize = 64)
      .collect().map(f => f.asset_id -> f).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, f) =>
      val g = b(id)
      assert(f.modality == g.modality && f.n_bytes == g.n_bytes &&
        f.width == g.width && f.height == g.height &&
        f.n_frames == g.n_frames && f.brightness == g.brightness, s"asset $id differs")
    }
  }
}
