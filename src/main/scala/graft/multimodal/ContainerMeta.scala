package graft.multimodal

/** Pure-JVM metadata extraction for the two container families the
  * engine cannot frame-decode (no JDK codec): ISO BMFF (MP4) and
  * EBML/Matroska (WebM, MKV). This shrinks the explicit-empty video
  * gap WITHOUT faking frames — duration, dimensions and codec ids live
  * in the container's index structures (`moov` box tree / EBML header
  * elements), not in the coded bitstream, so they parse with plain
  * byte-walking and stay 100% honest: every populated field was read
  * from real bytes, and fields the prefix doesn't carry stay None.
  *
  * Reference behavior: the original engine ships video rows through
  * opaque-binary columns with no decode either
  * (`/root/reference/scripts/cluster.py` reads feature columns only);
  * the metadata surface is part of this repo's LLM-pipeline extension
  * (dataset-card media profile).
  *
  * Both walks are bounded by the byte-array length, allocate nothing
  * per element beyond the result, and never throw on malformed input —
  * truncated/garbage containers simply yield empty fields, which is
  * the behavior a 100 TB crawl needs (a corrupt row must not kill the
  * task that carries it).
  */
object ContainerMeta extends Serializable {

  /** Parsed container-level metadata. `durationMs` is exact when the
    * stored timescale divides the stored duration (the builders below
    * guarantee it; real files round). */
  final case class VideoMeta(
      format: String,              // "mp4" | "webm" | "matroska"
      brand: String,               // ftyp major brand / EBML DocType
      durationMs: Option[Long],
      width: Option[Int],
      height: Option[Int],
      codec: Option[String])       // stsd fourcc / Matroska CodecID

  /** Dispatch on magic bytes; None when the payload is neither family
    * (images/audio have their own REAL decode paths). */
  def parse(bytes: Array[Byte]): Option[VideoMeta] =
    Multimodal.containerFormat(bytes) match {
      case "mp4" => Some(parseMp4(bytes))
      case "webm" | "matroska" => Some(parseEbml(bytes))
      case _ => None
    }

  // ------------------------------------------------------------------
  // ISO BMFF (MP4)
  // ------------------------------------------------------------------

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Visit each box in [start, end): (type, payloadStart, payloadEnd).
    * Stops at the first malformed header (size running past `end`). */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size32 = u32(b, off)
      val typ = fourcc(b, off + 4)
      val (payload, boxEnd) =
        if (size32 == 1L && off + 16 <= end) {
          val s = u64(b, off + 8)
          (off + 16, if (s < 16 || off + s > end) return else off + s)
        } else if (size32 == 0L) (off + 8, end.toLong) // "to end of file"
        else if (size32 < 8 || off + size32 > end) return
        else (off + 8, off + size32)
      f(typ, payload, boxEnd.toInt)
      off = boxEnd.toInt
    }
  }

  /** MP4 metadata from the `ftyp`/`moov` box tree: mvhd duration +
    * timescale, the VIDEO trak's tkhd dimensions (the trak whose width
    * is nonzero — audio traks store 0×0), and that trak's first `stsd`
    * sample-entry fourcc as the codec. */
  def parseMp4(b: Array[Byte]): VideoMeta = {
    var brand = ""
    var durMs: Option[Long] = None
    var w: Option[Int] = None
    var h: Option[Int] = None
    var codec: Option[String] = None
    walkBoxes(b, 0, b.length) { (typ, p, e) =>
      typ match {
        case "ftyp" if e - p >= 4 => brand = fourcc(b, p).trim
        case "moov" =>
          walkBoxes(b, p, e) { (t2, p2, e2) =>
            t2 match {
              case "mvhd" if e2 - p2 >= 20 =>
                val v = b(p2) & 0xff
                val (ts, dur) =
                  if (v == 1 && e2 - p2 >= 32)
                    (u32(b, p2 + 20), u64(b, p2 + 24))
                  else (u32(b, p2 + 12), u32(b, p2 + 16))
                if (ts > 0) durMs = Some(dur * 1000L / ts)
              case "trak" =>
                var tw, th = 0
                var tc: Option[String] = None
                walkBoxes(b, p2, e2) { (t3, p3, e3) =>
                  t3 match {
                    case "tkhd" =>
                      val v = b(p3) & 0xff
                      // width/height: 16.16 fixed at the end of tkhd
                      val base = p3 + 4 + (if (v == 1) 32 else 20) + 52
                      if (base + 8 <= e3) {
                        tw = (u32(b, base) >> 16).toInt
                        th = (u32(b, base + 4) >> 16).toInt
                      }
                    case "mdia" =>
                      walkBoxes(b, p3, e3) { (t4, p4, e4) =>
                        if (t4 == "minf") walkBoxes(b, p4, e4) {
                          (t5, p5, e5) =>
                            if (t5 == "stbl") walkBoxes(b, p5, e5) {
                              (t6, p6, e6) =>
                                // stsd: ver/flags(4) count(4) then the
                                // first sample entry: size(4) format(4)
                                if (t6 == "stsd" && e6 - p6 >= 16)
                                  tc = Some(fourcc(b, p6 + 12))
                            }
                        }
                      }
                    case _ => ()
                  }
                }
                // prefer the video trak (nonzero tkhd dimensions)
                if (tw > 0 && w.isEmpty) {
                  w = Some(tw); h = Some(th); codec = tc.orElse(codec)
                } else if (codec.isEmpty) codec = tc
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    VideoMeta("mp4", brand, durMs, w, h, codec)
  }

  // ------------------------------------------------------------------
  // EBML / Matroska / WebM
  // ------------------------------------------------------------------

  /** Read an EBML element ID at `off` (marker bits KEPT, per spec) →
    * (id, bytesRead), or null-equivalent (-1, 0) on malformed. */
  private def readId(b: Array[Byte], off: Int): (Long, Int) = {
    if (off >= b.length) return (-1L, 0)
    val lead = b(off) & 0xff
    val n = Integer.numberOfLeadingZeros(lead) - 24 + 1
    if (n < 1 || n > 4 || off + n > b.length) return (-1L, 0)
    var v = lead.toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    (v, n)
  }

  /** Read an EBML size vint at `off` (marker bit STRIPPED) →
    * (value, bytesRead); all-ones payload means "unknown size" and is
    * returned as Long.MaxValue. */
  private def readSize(b: Array[Byte], off: Int): (Long, Int) = {
    if (off >= b.length) return (-1L, 0)
    val lead = b(off) & 0xff
    val n = Integer.numberOfLeadingZeros(lead) - 24 + 1
    if (n < 1 || n > 8 || off + n > b.length) return (-1L, 0)
    var v = (lead & (0xff >>> n)).toLong
    var allOnes = (lead & (0xff >>> n)) == (0xff >>> n)
    var i = 1
    while (i < n) {
      v = (v << 8) | (b(off + i) & 0xff)
      allOnes &&= (b(off + i) & 0xff) == 0xff
      i += 1
    }
    (if (allOnes) Long.MaxValue else v, n)
  }

  private def uintAt(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], off: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(uintAt(b, off, 4).toInt)
      .toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(b, off, 8))
    else 0.0

  /** Visit each EBML element in [start, end): (id, payloadStart,
    * payloadEnd). Unknown-size elements extend to `end` (the only
    * legal carrier is Segment, whose children we want anyway). */
  private def walkEbml(b: Array[Byte], start: Int, end: Int)(
      f: (Long, Int, Int) => Unit): Unit = {
    var off = start
    while (off < end) {
      val (id, idN) = readId(b, off)
      if (idN == 0) return
      val (sz, szN) = readSize(b, off + idN)
      if (szN == 0) return
      val p = off + idN + szN
      val e = if (sz == Long.MaxValue) end
        else if (p + sz > end) return else (p + sz).toInt
      f(id, p, e)
      off = e
    }
  }

  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL

  /** Matroska-family metadata from the EBML header + Segment Info and
    * Tracks: DocType (drives the format label), Duration scaled by
    * TimestampScale (default 1 ms/tick), and the first video
    * TrackEntry's CodecID + pixel dimensions. */
  def parseEbml(b: Array[Byte]): VideoMeta = {
    val docType = Multimodal.ebmlDocType(b) match {
      case "webm" => "webm"
      case _ => "matroska"
    }
    var tsScale = 1000000L // spec default: 1 ms in nanoseconds
    var durTicks: Option[Double] = None
    var w: Option[Int] = None
    var h: Option[Int] = None
    var codec: Option[String] = None
    walkEbml(b, 0, b.length) { (id, p, e) =>
      if (id == IdSegment) walkEbml(b, p, e) { (id2, p2, e2) =>
        if (id2 == IdInfo) walkEbml(b, p2, e2) { (id3, p3, e3) =>
          if (id3 == IdTimestampScale) tsScale = uintAt(b, p3, e3 - p3)
          else if (id3 == IdDuration)
            durTicks = Some(floatAt(b, p3, e3 - p3))
        }
        else if (id2 == IdTracks) walkEbml(b, p2, e2) { (id3, p3, e3) =>
          if (id3 == IdTrackEntry && w.isEmpty) {
            var tc: Option[String] = None
            var tw, th = 0
            walkEbml(b, p3, e3) { (id4, p4, e4) =>
              if (id4 == IdCodecId)
                tc = Some(new String(b, p4, e4 - p4,
                  java.nio.charset.StandardCharsets.US_ASCII))
              else if (id4 == IdVideo) walkEbml(b, p4, e4) {
                (id5, p5, e5) =>
                  if (id5 == IdPixelWidth) tw = uintAt(b, p5, e5 - p5).toInt
                  else if (id5 == IdPixelHeight)
                    th = uintAt(b, p5, e5 - p5).toInt
              }
            }
            if (tw > 0) { w = Some(tw); h = Some(th); codec = tc }
            else if (codec.isEmpty) codec = tc
          }
        }
      }
    }
    val durMs = durTicks.map(t => math.round(t * tsScale / 1e6))
    VideoMeta(docType, docType, durMs, w, h, codec)
  }

  // ------------------------------------------------------------------
  // Deterministic fixture builders — REAL spec-conformant bytes, used
  // by the spec and the oracled registry exhibit (build → parse must
  // round-trip the exact field values an ANSI oracle recomputes).
  // ------------------------------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++
      typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload

  /** Minimal valid MP4 (`ftyp` + `moov[mvhd, trak[tkhd, mdia[minf[stbl[
    * stsd]]]]]`, no media data): timescale 1000 so `durationMs` is
    * stored exactly. */
  def buildMp4(durationMs: Long, width: Int, height: Int,
      codec: String): Array[Byte] = {
    require(codec.length == 4, "fourcc")
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(durationMs) ++
        Array.fill[Byte](80)(0))
    val tkhd = box("tkhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(0) ++
        Array.fill[Byte](52)(0) ++
        be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val stsd = box("stsd",
      be32(0) ++ be32(1) ++
        box(codec, Array.fill[Byte](8)(0)))
    val trak = box("trak",
      tkhd ++ box("mdia", box("minf", box("stbl", stsd))))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  private def ebmlEl(id: Long, payload: Array[Byte]): Array[Byte] = {
    val idBytes = {
      var n = 1
      while (n < 4 && (id >>> (8 * n)) != 0) n += 1
      (0 until n).reverse.map(i => ((id >>> (8 * i)) & 0xff).toByte)
        .toArray
    }
    require(payload.length < 0x7f, "fixture payloads are small")
    idBytes ++ Array((0x80 | payload.length).toByte) ++ payload
  }

  private def ebmlUint(id: Long, v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    ebmlEl(id, (0 until n).reverse
      .map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray)
  }

  private def ebmlFloat8(id: Long, v: Double): Array[Byte] =
    ebmlEl(id, {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).reverse.map(i => ((bits >>> (8 * i)) & 0xff).toByte)
        .toArray
    })

  private def ebmlString(id: Long, s: String): Array[Byte] =
    ebmlEl(id, s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Minimal valid WebM/Matroska (EBML header + Segment[Info,
    * Tracks[TrackEntry[CodecID, Video[PixelWidth, PixelHeight]]]]):
    * TimestampScale 1e6 (1 ms ticks) so `durationMs` round-trips
    * exactly. `docType` "webm" or "matroska". */
  def buildEbml(docType: String, durationMs: Long, width: Int,
      height: Int, codec: String): Array[Byte] = {
    val header = ebmlEl(0x1a45dfa3L,
      ebmlUint(0x4286L, 1) ++ ebmlUint(0x42f7L, 1) ++
        ebmlString(0x4282L, docType) ++ ebmlUint(0x4287L, 2))
    val info = ebmlEl(IdInfo,
      ebmlUint(IdTimestampScale, 1000000L) ++
        ebmlFloat8(IdDuration, durationMs.toDouble))
    val video = ebmlEl(IdVideo,
      ebmlUint(IdPixelWidth, width.toLong) ++
        ebmlUint(IdPixelHeight, height.toLong))
    val track = ebmlEl(IdTracks,
      ebmlEl(IdTrackEntry, ebmlString(IdCodecId, codec) ++ video))
    header ++ ebmlEl(IdSegment, info ++ track)
  }
}
