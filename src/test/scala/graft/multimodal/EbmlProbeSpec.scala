package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class EbmlProbeSpec extends AnyFunSuite {

  test("round trip: probe recovers encoded dims, duration, track count") {
    val m = EbmlProbe.probe(EbmlProbe.encodeMeta(1280, 720, 90000L)).get
    assert(m == EbmlProbe.Meta(1280, 720, 90000L, 1))
  }

  test("non-default timestamp scale rescales duration to millis") {
    // 100 µs units: duration field = 10× the ms count
    val bytes = EbmlProbe.encodeMeta(640, 360, 2500L, timestampScaleNs = 100000L)
    assert(EbmlProbe.probe(bytes).get.durationMs == 2500L)
  }

  test("multi-byte VINT sizes survive: large dims and long duration") {
    // width needs a 2-byte uint; duration spans > 2^21 so the Segment
    // size VINT needs more than one byte of value
    val m = EbmlProbe.probe(EbmlProbe.encodeMeta(3840, 2160, 7200000L)).get
    assert(m.width == 3840 && m.height == 2160 && m.durationMs == 7200000L)
  }

  test("garbage, empty, and truncated payloads probe to None") {
    assert(EbmlProbe.probe("not an ebml stream".getBytes("UTF-8")).isEmpty)
    assert(EbmlProbe.probe(Array.emptyByteArray).isEmpty)
    val good = EbmlProbe.encodeMeta(320, 240, 5000L)
    // truncating mid-Segment loses Info/Duration → None, not a throw
    assert(EbmlProbe.probe(good.take(good.length / 3)).isEmpty)
  }

  test("mp4 bytes are not mistaken for ebml") {
    assert(EbmlProbe.probe(Mp4Probe.encodeMeta(320, 240, 5000L)).isEmpty)
  }

  test("block stats round trip: count, media bytes, keyframe density") {
    val bytes = EbmlProbe.encodeMetaWithBlocks(
      640, 360, durationMs = 4000L, frameBytes = 900, nFrames = 50, keyInterval = 12)
    // metadata probe still works on the spliced container
    val m = EbmlProbe.probe(bytes).get
    assert(m == EbmlProbe.Meta(640, 360, 4000L, 1))
    val s = EbmlProbe.probeBlocks(bytes).get
    assert(s.nBlocks == 50L)
    assert(s.mediaBytes == 50L * 900L)
    assert(s.nKeyframes == 5L, "keyframes at blocks 0,12,24,36,48")
  }

  test("block stats on a headers-only container is None, not a throw") {
    assert(EbmlProbe.probeBlocks(EbmlProbe.encodeMeta(320, 240, 1000L)).isEmpty)
    assert(EbmlProbe.probeBlocks("junk".getBytes("UTF-8")).isEmpty)
    val good = EbmlProbe.encodeMetaWithBlocks(320, 240, 1000L, 100, 10, 3)
    // truncating inside the Cluster must degrade, never throw
    assert(EbmlProbe.probeBlocks(good.take(good.length - 30)).toSeq
      .forall(_.nBlocks <= 10L))
  }
}
