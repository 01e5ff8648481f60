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
}
