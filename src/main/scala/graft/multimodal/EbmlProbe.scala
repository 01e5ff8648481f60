package graft.multimodal

/** Matroska/WebM (EBML) metadata probe — pure byte parsing, no decoding;
  * the webm sibling of [[Mp4Probe]].
  *
  * EBML (RFC 8794) is a length-prefixed tree like ISO-BMFF, but both
  * element IDs and sizes are variable-length integers (VINTs): the
  * number of leading zero bits of the first byte encodes the field
  * width. The probe walks `Segment` → `Info` (TimestampScale +
  * Duration) and `Segment` → `Tracks` → `TrackEntry` → `Video`
  * (PixelWidth/PixelHeight), counting track entries — the same
  * route/filter-before-decode first pass tq24 runs for MP4, for the
  * other dominant web video container. Frame DECODE for webm stays
  * [[Decode.FakeCodec]]'s clearly-marked stub (VP8/VP9 needs a native
  * decoder); this probe is the real half the JDK can deliver.
  *
  * Malformed/truncated payloads return None — callers map that to the
  * standard sentinel row, never a failed stage.
  */
object EbmlProbe {

  // element IDs, marker bit included (RFC 8794 / Matroska spec)
  private val EbmlHeader = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackType = 0x83L
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Cluster = 0x1F43B675L
  private val ClusterTimestamp = 0xE7L
  private val SimpleBlock = 0xA3L

  /** (width, height, durationMillis, nTracks) of the first video track —
    * field-identical to [[Mp4Probe.Meta]] so downstream routing treats
    * both containers uniformly. */
  final case class Meta(width: Int, height: Int, durationMs: Long, nTracks: Int)

  /** Read a VINT at `pos`: (value, byteLength). IDs keep the marker bit
    * (Matroska convention); sizes strip it. A size with all value bits
    * set means "unknown" — mapped to -1 (stream to end). */
  private def vint(b: Array[Byte], pos: Int, keepMarker: Boolean): Option[(Long, Int)] = {
    if (pos >= b.length) return None
    val first = b(pos) & 0xff
    if (first == 0) return None // >8-byte VINT: not valid for IDs/sizes we read
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
    if (len > 8 || pos + len > b.length) return None
    var v: Long = if (keepMarker) first.toLong else (first & ((1 << (8 - len)) - 1)).toLong
    var allOnes = !keepMarker && (first & ((1 << (8 - len)) - 1)) == (1 << (8 - len)) - 1
    var i = 1
    while (i < len) {
      val byte = b(pos + i) & 0xff
      if (byte != 0xff) allOnes = false
      v = (v << 8) | byte
      i += 1
    }
    Some((if (allOnes) -1L else v, len))
  }

  private def uint(b: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(pos + i) & 0xff); i += 1 }
    v
  }

  private def float(b: Array[Byte], pos: Int, len: Int): Double = len match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, pos, 4).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, pos, 8))
    case _ => Double.NaN
  }

  def probe(bytes: Array[Byte]): Option[Meta] = {
    try {
      var sawEbml = false
      var timestampScaleNs = 1000000L // Matroska default: 1 ms
      var durationUnits = Double.NaN
      var width = 0
      var height = 0
      var tracks = 0

      // walk one element list [start, end); `inVideoTrack` tracks whether
      // the current TrackEntry declared TrackType video (type 1)
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos < end) {
          val (id, idLen) = vint(bytes, pos, keepMarker = true).getOrElse(return)
          val (sz, szLen) = vint(bytes, pos + idLen, keepMarker = false).getOrElse(return)
          val body = pos + idLen + szLen
          val bodyEnd = if (sz < 0) end else body + sz.toInt
          if (sz >= 0 && (sz > Int.MaxValue || bodyEnd > end)) return // truncated
          id match {
            case EbmlHeader => sawEbml = true
            case Segment | Info | Tracks | TrackEntry | Video =>
              if (id == TrackEntry) tracks += 1
              walk(body, bodyEnd)
            case TimestampScale => timestampScaleNs = uint(bytes, body, (bodyEnd - body).min(8))
            case Duration => durationUnits = float(bytes, body, bodyEnd - body)
            case PixelWidth if width == 0 => width = uint(bytes, body, (bodyEnd - body).min(8)).toInt
            case PixelHeight if height == 0 => height = uint(bytes, body, (bodyEnd - body).min(8)).toInt
            case _ => () // DocType, TrackType, Cluster, ... skipped
          }
          pos = bodyEnd
        }
      }
      walk(0, bytes.length)
      if (!sawEbml || durationUnits.isNaN || timestampScaleNs <= 0) None
      else Some(Meta(width, height,
        Math.round(durationUnits * timestampScaleNs / 1e6), tracks))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-block statistics from the Segment's Clusters (first video pass
    * signal, same role as [[Mp4Probe.probeSamples]]): SimpleBlock count,
    * total media payload bytes, keyframe count (bit 7 of the SimpleBlock
    * flags byte — RFC 9559 §9). */
  final case class BlockStats(nBlocks: Long, mediaBytes: Long, nKeyframes: Long)

  def probeBlocks(bytes: Array[Byte]): Option[BlockStats] = {
    try {
      var blocks = 0L
      var media = 0L
      var keys = 0L
      var sawCluster = false
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos < end) {
          val (id, idLen) = vint(bytes, pos, keepMarker = true).getOrElse(return)
          val (sz, szLen) = vint(bytes, pos + idLen, keepMarker = false).getOrElse(return)
          val body = pos + idLen + szLen
          val bodyEnd = if (sz < 0) end else body + sz.toInt
          if (sz >= 0 && (sz > Int.MaxValue || bodyEnd > end)) return // truncated
          id match {
            case Segment => walk(body, bodyEnd)
            case Cluster => sawCluster = true; walk(body, bodyEnd)
            case SimpleBlock =>
              // block layout: track VINT, s16 relative timestamp, flags,
              // then the frame payload
              vint(bytes, body, keepMarker = false) match {
                case Some((_, tLen)) if body + tLen + 3 <= bodyEnd =>
                  blocks += 1
                  media += bodyEnd - (body + tLen + 3)
                  if ((bytes(body + tLen + 2) & 0x80) != 0) keys += 1
                case _ => () // malformed block: skip, never throw
              }
            case _ => ()
          }
          pos = bodyEnd
        }
      }
      walk(0, bytes.length)
      if (!sawCluster) None else Some(BlockStats(blocks, media, keys))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- encoding helpers (fixture/oracle side) ----

  private def vintSize(n: Long): Array[Byte] = {
    // minimal-width size VINT: value must fit under the marker bit
    var len = 1
    while (len < 8 && n >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    var v = n | (1L << (7 * len)) // set marker
    var i = len - 1
    while (i >= 0) { out(i) = (v & 0xff).toByte; v >>>= 8; i -= 1 }
    out
  }
  private def idBytes(id: Long): Array[Byte] = {
    var len = 1
    while ((id >> (8 * len)) != 0) len += 1
    (1 to len).map(i => ((id >> (8 * (len - i))) & 0xff).toByte).toArray
  }
  private def el(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintSize(body.length.toLong) ++ body
  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while ((v >> (8 * len)) != 0) len += 1
    (1 to len).map(i => ((v >> (8 * (len - i))) & 0xff).toByte).toArray
  }

  /** Build a minimal valid EBML header + Segment{Info,Tracks} with the
    * given first-track dims and duration — the fixture/oracle side of
    * the probe round trip (headers only, no Clusters; exactly like a
    * remote-range-read of a real asset's first kilobytes). */
  def encodeMeta(width: Int, height: Int, durationMs: Long,
      timestampScaleNs: Long = 1000000L): Array[Byte] = {
    require(durationMs >= 0 && width > 0 && height > 0,
      "encodeMeta needs positive dims and a non-negative duration")
    val header = el(EbmlHeader,
      el(0x4282L, "webm".getBytes("ISO-8859-1"))) // DocType
    // duration is a float in timestamp-scale units; with the 1 ms default
    // an integer ms count is exactly representable in a float64
    val durUnits = durationMs.toDouble * 1000000.0 / timestampScaleNs
    val info = el(Info,
      el(TimestampScale, uintBytes(timestampScaleNs)) ++
        el(Duration, {
          val b = java.nio.ByteBuffer.allocate(8)
          b.putDouble(durUnits); b.array()
        }))
    val trackEntry = el(TrackEntry,
      el(TrackType, Array[Byte](1)) ++ // 1 = video
        el(Video,
          el(PixelWidth, uintBytes(width.toLong)) ++
            el(PixelHeight, uintBytes(height.toLong))))
    val segment = el(Segment, info ++ el(Tracks, trackEntry))
    header ++ segment
  }

  /** [[encodeMeta]] plus one Cluster of `nFrames` SimpleBlocks with
    * `frameBytes`-byte payloads, every `keyInterval`-th block flagged as
    * a keyframe — the fixture/oracle side of the [[probeBlocks]] round
    * trip (payload bytes are zeros: the probe never decodes them). */
  def encodeMetaWithBlocks(width: Int, height: Int, durationMs: Long,
      frameBytes: Int, nFrames: Int, keyInterval: Int,
      timestampScaleNs: Long = 1000000L): Array[Byte] = {
    require(nFrames > 0 && frameBytes > 0 && keyInterval > 0,
      "block run needs positive frame count/size/key interval")
    val base = encodeMeta(width, height, durationMs, timestampScaleNs)
    val blocks = (0 until nFrames).map { i =>
      val hdr = Array[Byte](
        0x81.toByte, // track 1 as a 1-byte VINT
        0, 0,        // s16 relative timestamp
        if (i % keyInterval == 0) 0x80.toByte else 0x00.toByte)
      el(SimpleBlock, hdr ++ new Array[Byte](frameBytes))
    }.reduce(_ ++ _)
    val cluster = el(Cluster, el(ClusterTimestamp, uintBytes(0L)) ++ blocks)
    // splice the Cluster into the Segment: the EBML header is the first
    // top-level element, the Segment the second — rebuild the Segment
    // element around (old body ++ cluster). Sizes are VINTs, so the
    // Segment length prefix may grow; re-emitting the element is simpler
    // and safer than patching bytes in place.
    val (hdrId, hdrIdLen) = vint(base, 0, keepMarker = true).get
    require(hdrId == EbmlHeader)
    val (hdrSz, hdrSzLen) = vint(base, hdrIdLen, keepMarker = false).get
    val segStart = hdrIdLen + hdrSzLen + hdrSz.toInt
    val (segId, segIdLen) = vint(base, segStart, keepMarker = true).get
    require(segId == Segment)
    val (_, segSzLen) = vint(base, segStart + segIdLen, keepMarker = false).get
    val segBody = base.drop(segStart + segIdLen + segSzLen)
    base.take(segStart) ++ el(Segment, segBody ++ cluster)
  }
}
