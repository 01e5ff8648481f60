package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF metadata probe: exact round trip of dims/duration/tracks,
  * fixed-point width decoding, and malformed-input behavior. */
class Mp4ProbeSpec extends AnyFunSuite {

  test("encode→probe round trip recovers dims, duration, track count") {
    val bytes = Mp4Probe.encodeMeta(1920, 1080, 123456L)
    val m = Mp4Probe.probe(bytes).get
    assert(m.width == 1920 && m.height == 1080)
    assert(m.durationMs == 123456L)
    assert(m.nTracks == 1)
  }

  test("non-millisecond timescale still yields exact milliseconds") {
    // 90 kHz is the common video timescale; 2500 ms = 225000 units
    val m = Mp4Probe.probe(Mp4Probe.encodeMeta(640, 360, 2500L, timescale = 90000)).get
    assert(m.durationMs == 2500L)
  }

  test("hand-checked fixed point: tkhd stores width<<16") {
    val bytes = Mp4Probe.encodeMeta(33, 7, 1000L)
    // find tkhd and read its raw last-8 bytes
    val idx = bytes.sliding(4).indexWhere(_.sameElements("tkhd".getBytes("ISO-8859-1")))
    assert(idx > 0)
    val size = java.nio.ByteBuffer.wrap(bytes, idx - 4, 4).getInt
    val end = idx - 4 + size
    val w = java.nio.ByteBuffer.wrap(bytes, end - 8, 4).getInt
    assert(w == (33 << 16), "16.16 fixed-point width")
    assert(Mp4Probe.probe(bytes).get.width == 33)
  }

  test("an undersized tkhd box yields zero dims, never header bytes as garbage") {
    def box(name: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(name.getBytes("ISO-8859-1")).put(body)
      b.array()
    }
    // valid mvhd (timescale 1000, duration 2000) + trak holding an EMPTY
    // tkhd (body size 0): the last-8-bytes read would alias the header
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(2000)
      box("mvhd", b.array())
    }
    val bad = box("ftyp", "isom".getBytes("ISO-8859-1")) ++
      box("moov", mvhd ++ box("trak", box("tkhd", Array.emptyByteArray)))
    val m = Mp4Probe.probe(bad)
    assert(m.isDefined, "moov/mvhd are valid — meta exists")
    assert(m.get.width == 0 && m.get.height == 0,
      s"undersized tkhd must not produce dims: ${m.get}")
    assert(m.get.durationMs == 2000L && m.get.nTracks == 1)
  }

  test("malformed, truncated, and non-mp4 payloads probe to None") {
    assert(Mp4Probe.probe("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    assert(Mp4Probe.probe(Array.emptyByteArray).isEmpty)
    val good = Mp4Probe.encodeMeta(320, 240, 5000L)
    assert(Mp4Probe.probe(good.take(good.length / 2)).isEmpty,
      "moov truncated mid-box must not yield a meta")
  }

  test("v0 duration overflow fails loudly instead of truncating") {
    // ~6.6 h at 90 kHz exceeds the 32-bit mvhd duration field
    assertThrows[IllegalArgumentException] {
      Mp4Probe.encodeMeta(320, 240, 24L * 3600 * 1000, timescale = 90000)
    }
  }

  test("sample-table round trip: frames, media bytes, keyframes") {
    val bytes = Mp4Probe.encodeMetaWithSamples(
      320, 240, durationMs = 4000L, frameBytes = 1500, nFrames = 96, keyInterval = 12)
    // the spliced container still probes identically
    val meta = Mp4Probe.probe(bytes).get
    assert(meta.width == 320 && meta.height == 240 && meta.durationMs == 4000L)
    val s = Mp4Probe.probeSamples(bytes).get
    assert(s.nFrames == 96L)
    assert(s.mediaBytes == 96L * 1500L)
    assert(s.nKeyframes == 8L, "keyframes at 1, 13, ..., 85 = ceil(96/12)")
  }

  test("no stss box means every frame is a sync sample") {
    val withStss = Mp4Probe.encodeMetaWithSamples(64, 64, 1000L, 100, 10, 3)
    // strip the stss box: rebuild without its bytes and fix up lengths
    val idx = withStss.sliding(4).indexWhere(_.sameElements("stss".getBytes("ISO-8859-1")))
    assert(idx > 0)
    val stssPos = idx - 4
    val stssLen = java.nio.ByteBuffer.wrap(withStss, stssPos, 4).getInt
    val stripped = withStss.take(stssPos) ++ withStss.drop(stssPos + stssLen)
    // walk outer boxes whose span covered stss and shrink them
    val buf = java.nio.ByteBuffer.wrap(stripped)
    def shrink(pos: Int): Unit = if (pos + 8 <= stripped.length && pos < stssPos) {
      val size = buf.getInt(pos)
      if (pos + size > stssPos) { // box enclosed stss
        buf.putInt(pos, size - stssLen)
        shrink(pos + 8) // first child
      } else shrink(pos + size) // next sibling
    }
    shrink(0)
    val s = Mp4Probe.probeSamples(stripped).get
    assert(s.nFrames == 10L && s.nKeyframes == 10L)
  }

  test("sample probe on a container without stbl is None, not a throw") {
    assert(Mp4Probe.probeSamples(Mp4Probe.encodeMeta(320, 240, 1000L)).isEmpty)
    assert(Mp4Probe.probeSamples("junk".getBytes("UTF-8")).isEmpty)
  }
}
