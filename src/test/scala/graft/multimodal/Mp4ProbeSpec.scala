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

  test("malformed, truncated, and non-mp4 payloads probe to None") {
    assert(Mp4Probe.probe("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    assert(Mp4Probe.probe(Array.emptyByteArray).isEmpty)
    val good = Mp4Probe.encodeMeta(320, 240, 5000L)
    assert(Mp4Probe.probe(good.take(good.length / 2)).isEmpty,
      "moov truncated mid-box must not yield a meta")
  }
}
