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

  /** Per-track sample-table statistics from `stbl` (first track carrying
    * an `stsz`): frame count, total media bytes, keyframe count. With
    * the mvhd duration this yields bitrate and keyframe density — the
    * route/filter signals a 100 TB video pass needs (e.g. "skip assets
    * under 200 kbps", "re-encode sparse-keyframe streams") without
    * touching a single media byte. */
  final case class SampleStats(nFrames: Long, mediaBytes: Long, nKeyframes: Long)

  /** Parse `stsz` (sample sizes), `stss` (sync samples) of the first
    * track that has a sample-size box. No `stss` box means every frame
    * is a sync frame (ISO 14496-12 §8.6.2). */
  def probeSamples(bytes: Array[Byte]): Option[SampleStats] = {
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      def u32(pos: Int): Long = buf.getInt(pos).toLong & 0xffffffffL
      /** child boxes of [start, end) as (name, bodyStart, boxEnd) */
      def children(start: Int, end: Int): Seq[(String, Int, Int)] = {
        val out = Seq.newBuilder[(String, Int, Int)]
        var pos = start
        while (pos + 8 <= end) {
          val size = u32(pos)
          val name = new String(bytes, pos + 4, 4, "ISO-8859-1")
          val (boxSize, header) =
            if (size == 1 && pos + 16 <= end) (buf.getLong(pos + 8), 16)
            else if (size == 0) ((end - pos).toLong, 8)
            else (size, 8)
          if (boxSize < header || pos + boxSize > end) return out.result()
          out += ((name, pos + header, (pos + boxSize).toInt))
          pos = (pos + boxSize).toInt
        }
        out.result()
      }
      def descend(start: Int, end: Int, name: String): Seq[(Int, Int)] =
        children(start, end).collect { case (`name`, b, e) => (b, e) }
      val stbls = for {
        (moovB, moovE) <- descend(0, bytes.length, "moov")
        (trakB, trakE) <- descend(moovB, moovE, "trak")
        (mdiaB, mdiaE) <- descend(trakB, trakE, "mdia")
        (minfB, minfE) <- descend(mdiaB, mdiaE, "minf")
        (stblB, stblE) <- descend(minfB, minfE, "stbl")
      } yield (stblB, stblE)
      stbls.iterator.flatMap { case (b, e) =>
        val boxes = children(b, e).map { case (n, bb, be) => n -> (bb, be) }.toMap
        boxes.get("stsz").flatMap { case (szB, szE) =>
          val sampleSize = if (szE - szB >= 12) u32(szB + 4) else -1L
          val count = if (szE - szB >= 12) u32(szB + 8) else -1L
          if (count < 0 ||
              (sampleSize == 0 && szB + 12 + count * 4 > szE)) None // truncated
          else {
            val mediaBytes =
              if (sampleSize != 0) sampleSize * count
              else (0L until count).map(i => u32(szB + 12 + i.toInt * 4)).sum
            val keyframes = boxes.get("stss") match {
              case Some((ssB, ssE)) if ssE - ssB >= 8 => u32(ssB + 4)
              case _ => count // no stss: every sample is a sync sample
            }
            Some(SampleStats(count, mediaBytes, keyframes))
          }
        }
      }.nextOption()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Build a minimal valid ftyp+moov container with the given first-track
    * dims and duration — the fixture/oracle side of the probe round trip
    * (headers only; no media data, exactly like a remote-range-read of
    * the first kilobytes of a real asset). */
  def encodeMeta(width: Int, height: Int, durationMs: Long,
      timescale: Int = 1000): Array[Byte] = {
    // v0 mvhd/tkhd carry 32-bit durations; a silent .toInt truncation
    // would make the fixture's probed duration disagree with the
    // requested one (~6.6 h at a 90 kHz timescale) — fail loudly instead
    require(durationMs * timescale / 1000L <= Int.MaxValue.toLong,
      s"duration $durationMs ms at timescale $timescale overflows the " +
        "32-bit v0 mvhd/tkhd duration field")
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

  private def box(name: String, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.BIG_ENDIAN)
    out.putInt(8 + body.length)
    out.put(name.getBytes("ISO-8859-1"))
    out.put(body)
    out.array()
  }

  /** [[encodeMeta]] plus a sample table: uniform `frameBytes`-sized
    * frames, one `stts` run, and an `stss` marking every
    * `keyInterval`-th frame as a keyframe — the fixture/oracle side of
    * the [[probeSamples]] round trip. */
  def encodeMetaWithSamples(width: Int, height: Int, durationMs: Long,
      frameBytes: Int, nFrames: Int, keyInterval: Int,
      timescale: Int = 1000): Array[Byte] = {
    require(nFrames > 0 && frameBytes > 0 && keyInterval > 0,
      "sample table needs positive frame count/size/key interval")
    val base = encodeMeta(width, height, durationMs, timescale)
    val stsz = {
      val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)          // version + flags
      b.putInt(frameBytes) // uniform sample size → no per-sample table
      b.putInt(nFrames)
      box("stsz", b.array())
    }
    val stts = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0).putInt(1) // version + flags, one run
      b.putInt(nFrames)
      b.putInt(((durationMs * timescale / 1000L) / nFrames).toInt.max(1))
      box("stts", b.array())
    }
    val syncs = 1 to nFrames by keyInterval
    val stss = {
      val b = ByteBuffer.allocate(8 + 4 * syncs.size).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0).putInt(syncs.size)
      syncs.foreach(b.putInt)
      box("stss", b.array())
    }
    val stbl = box("stbl", stsz ++ stts ++ stss)
    val mdia = box("mdia", box("minf", stbl))
    // splice mdia into the existing trak: rebuild trak = tkhd ++ mdia.
    // base layout is ftyp ++ moov(mvhd ++ trak(tkhd)); append mdia to the
    // trak body and fix up the two enclosing box lengths
    val buf = ByteBuffer.wrap(base).order(ByteOrder.BIG_ENDIAN)
    val ftypLen = buf.getInt(0)
    val moovPos = ftypLen
    val moovLen = buf.getInt(moovPos)
    val mvhdLen = buf.getInt(moovPos + 8)
    val trakPos = moovPos + 8 + mvhdLen
    val trakLen = buf.getInt(trakPos)
    val out = ByteBuffer
      .allocate(base.length + mdia.length).order(ByteOrder.BIG_ENDIAN)
    out.put(base, 0, base.length)
    out.putInt(moovPos, moovLen + mdia.length)
    out.putInt(trakPos, trakLen + mdia.length)
    out.position(base.length)
    out.put(mdia)
    out.array()
  }
}
