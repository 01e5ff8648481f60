package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** MP4/ISO-BMFF metadata probe — pure byte parsing, no decoding.
  *
  * At corpus scale the FIRST video pass is never a frame decode: it is a
  * metadata probe that reads container headers (dimensions, duration,
  * track count) so the pipeline can filter/bucket/route assets before
  * paying for demux+decode. The ISO base-media box structure
  * (ISO/IEC 14496-12) is length-prefixed and self-describing, so this
  * needs no native library: walk top-level boxes, descend into
  * `moov` → `mvhd` (timescale + duration) and `moov` → `trak` → `tkhd`
  * (16.16 fixed-point width/height), count `trak` boxes.
  *
  * Malformed/truncated payloads return None — the caller maps that to
  * the same sentinel row the codecs use. Frame DECODE for mp4 remains
  * [[Decode.FakeCodec]]'s clearly-marked stub (needs a native demuxer);
  * this probe is the real half the JDK can deliver.
  */
object Mp4Probe {

  /** (width, height, durationMillis, nTracks) of the first video track. */
  final case class Meta(width: Int, height: Int, durationMs: Long, nTracks: Int)

  def probe(bytes: Array[Byte]): Option[Meta] = {
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      var timescale = 0L
      var duration = 0L
      var width = 0
      var height = 0
      var tracks = 0
      var sawMoov = false

      def walk(start: Int, end: Int, depth: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val size = buf.getInt(pos).toLong & 0xffffffffL
          val name = new String(bytes, pos + 4, 4, "ISO-8859-1")
          // size 1 = 64-bit extended size; size 0 = to-end-of-file
          val (boxSize, header) =
            if (size == 1 && pos + 16 <= end) (buf.getLong(pos + 8), 16)
            else if (size == 0) ((end - pos).toLong, 8)
            else (size, 8)
          if (boxSize < header || pos + boxSize > end) return // truncated
          val body = pos + header
          val bodyEnd = (pos + boxSize).toInt
          name match {
            case "moov" =>
              sawMoov = true
              walk(body, bodyEnd, depth + 1)
            case "trak" =>
              tracks += 1
              walk(body, bodyEnd, depth + 1)
            case "mvhd" if body + 4 <= bodyEnd =>
              val version = bytes(body) & 0xff
              if (version == 1 && body + 28 + 8 <= bodyEnd) {
                timescale = buf.getInt(body + 20).toLong & 0xffffffffL
                duration = buf.getLong(body + 24)
              } else if (body + 20 + 4 <= bodyEnd) {
                timescale = buf.getInt(body + 12).toLong & 0xffffffffL
                duration = buf.getInt(body + 16).toLong & 0xffffffffL
              }
            case "tkhd" if width == 0 && bodyEnd > body =>
              // a valid v0 tkhd body is 84 bytes (v1: 96); an undersized
              // box would alias the last-8-bytes read onto header bytes
              // and yield garbage dims — require the minimum body size
              val version = bytes(body) & 0xff
              val minBody = if (version == 1) 96 else 84
              if (version <= 1 && bodyEnd - body >= minBody) {
                // width/height are the LAST 8 bytes of the box, 16.16 fixed
                val w = buf.getInt(bodyEnd - 8)
                val h = buf.getInt(bodyEnd - 4)
                // audio tracks carry zero dims — keep the first video track
                if (w > 0 && h > 0) {
                  width = w >>> 16
                  height = h >>> 16
                }
              }
            case _ => () // ftyp, mdat, udta, free... skipped
          }
          pos = bodyEnd
        }
      }
      walk(0, bytes.length, 0)
      if (!sawMoov || timescale == 0) None
      else Some(Meta(width, height, duration * 1000L / timescale, tracks))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Build a minimal valid ftyp+moov container with the given first-track
    * dims and duration — the fixture/oracle side of the probe round trip
    * (headers only; no media data, exactly like a remote-range-read of
    * the first kilobytes of a real asset). */
  def encodeMeta(width: Int, height: Int, durationMs: Long,
      timescale: Int = 1000): Array[Byte] = {
    def box(name: String, body: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.BIG_ENDIAN)
      out.putInt(8 + body.length)
      out.put(name.getBytes("ISO-8859-1"))
      out.put(body)
      out.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 2, 0) ++ "isomiso2".getBytes("ISO-8859-1"))
    val mvhd = {
      val b = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)                                   // version 0 + flags
      b.putInt(0).putInt(0)                         // ctime, mtime
      b.putInt(timescale)
      b.putInt((durationMs * timescale / 1000L).toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      // reserved(10) + identity matrix(36) + predefined(24) + next_track_id
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0x00000007)                          // version 0, enabled flags
      b.putInt(0).putInt(0)                         // ctime, mtime
      b.putInt(1).putInt(0)                         // track id, reserved
      b.putInt((durationMs * timescale / 1000L).toInt)
      b.position(b.position() + 52)                 // reserved/layer/matrix
      b.putInt(width << 16)                         // 16.16 fixed
      b.putInt(height << 16)
      box("tkhd", b.array())
    }
    val trak = box("trak", tkhd)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }
}
