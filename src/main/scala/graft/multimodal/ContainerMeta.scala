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

  // package-visible bridges so the MJPEG-MP4 frame decoder
  // ([[Multimodal.decodeMjpegMp4Frames]]) reuses THIS box walk and
  // byte readers instead of growing a second ISO-BMFF parser to drift
  private[multimodal] def walkBoxesOf(b: Array[Byte])(
      f: (String, Int, Int) => Unit): Unit = walkBoxes(b, 0, b.length)(f)
  private[multimodal] def walkBoxesIn(b: Array[Byte], start: Int,
      end: Int)(f: (String, Int, Int) => Unit): Unit =
    walkBoxes(b, start, end)(f)
  private[multimodal] def be32At(b: Array[Byte], off: Int): Long =
    u32(b, off)
  private[multimodal] def be64At(b: Array[Byte], off: Int): Long =
    u64(b, off)

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
  // Audio containers without a JDK codec: FLAC / MP3 / Ogg. Frame
  // payloads stay undecodable by policy; the header fields below are
  // parsed structure, never synthesized.
  // ------------------------------------------------------------------

  /** Parsed audio-container metadata. `durationMs` is exact for FLAC
    * (total-samples / rate from STREAMINFO) and Ogg (last-page granule
    * position / rate); for MP3 it is the CBR estimate from the first
    * frame's bitrate — real parsed structure plus arithmetic, flagged
    * by `durationExact = false`. */
  final case class AudioMeta(
      format: String,             // "flac" | "mp3" | "ogg"
      codec: Option[String],      // "flac" / "mpeg1-layer3" / "vorbis" / "opus"
      durationMs: Option[Long],
      durationExact: Boolean,
      sampleRate: Option[Int],
      channels: Option[Int])

  /** Dispatch on magic bytes for the audio families. */
  def parseAudio(bytes: Array[Byte]): Option[AudioMeta] =
    Multimodal.containerFormat(bytes) match {
      case "flac" => Some(parseFlac(bytes))
      case "mp3" => Some(parseMp3(bytes))
      case "ogg" => Some(parseOgg(bytes))
      case _ => None
    }

  /** FLAC STREAMINFO: "fLaC", then metadata blocks (1-byte last+type
    * header, 3-byte big-endian length); block type 0 packs sample rate
    * (20 bits), channels−1 (3 bits), bits-per-sample−1 (5 bits) and
    * total samples (36 bits) after the four block/frame-size fields.
    * Duration is EXACT: totalSamples · 1000 / rate. */
  def parseFlac(b: Array[Byte]): AudioMeta = {
    var off = 4
    while (off + 4 <= b.length) {
      val last = (b(off) & 0x80) != 0
      val typ = b(off) & 0x7f
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      val p = off + 4
      if (typ == 0 && len >= 18 && p + 18 <= b.length) {
        // STREAMINFO: minBlock(2) maxBlock(2) minFrame(3) maxFrame(3),
        // then the packed 64-bit rate/channels/bps/samples field
        val q = p + 10
        val rate = ((b(q) & 0xff) << 12) | ((b(q + 1) & 0xff) << 4) |
          ((b(q + 2) & 0xff) >>> 4)
        val ch = ((b(q + 2) >>> 1) & 0x07) + 1
        val samples = ((b(q + 3) & 0x0fL) << 32) |
          ((b(q + 4) & 0xffL) << 24) | ((b(q + 5) & 0xffL) << 16) |
          ((b(q + 6) & 0xffL) << 8) | (b(q + 7) & 0xffL)
        val dur = if (rate > 0 && samples > 0)
          Some(samples * 1000L / rate) else None
        return AudioMeta("flac", Some("flac"), dur, durationExact = true,
          if (rate > 0) Some(rate) else None, Some(ch))
      }
      if (last || len <= 0) return AudioMeta("flac", Some("flac"), None,
        durationExact = true, None, None)
      off = p + len
    }
    AudioMeta("flac", Some("flac"), None, durationExact = true, None, None)
  }

  private val Mp3Bitrates = // MPEG-1 Layer III, kbit/s, index 1-14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3Rates = Array(44100, 48000, 32000, 0)

  /** MP3: skip an ID3v2 tag (syncsafe 28-bit size), find the first
    * 0xFFEx frame sync, read the MPEG-1 Layer III header's bitrate and
    * sample-rate indices. Duration is the CBR ESTIMATE
    * `(audioBytes · 8) / bitrate` — honest for constant-bitrate files,
    * a lower-confidence figure for VBR, so `durationExact = false`
    * always (a VBR file cannot be told from its first frame). */
  def parseMp3(b: Array[Byte]): AudioMeta = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + size
    }
    val limit = math.min(b.length - 4, off + 4096) // sync must be near
    var i = off
    while (i >= 0 && i <= limit) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xe0) == 0xe0) {
        val version = (b(i + 1) >>> 3) & 0x03 // 3 = MPEG-1
        val layer = (b(i + 1) >>> 1) & 0x03   // 1 = Layer III
        val brIdx = (b(i + 2) >>> 4) & 0x0f
        val srIdx = (b(i + 2) >>> 2) & 0x03
        if (version == 3 && layer == 1 && brIdx >= 1 && brIdx <= 14 &&
          srIdx < 3) {
          val kbps = Mp3Bitrates(brIdx)
          val rate = Mp3Rates(srIdx)
          val mono = ((b(i + 3) >>> 6) & 0x03) == 3
          val audioBytes = (b.length - i).toLong
          val durMs = audioBytes * 8L / kbps // bytes·8 / (kbit/s) = ms
          return AudioMeta("mp3", Some("mpeg1-layer3"), Some(durMs),
            durationExact = false, Some(rate), Some(if (mono) 1 else 2))
        }
      }
      i += 1
    }
    AudioMeta("mp3", Some("mpeg1-layer3"), None, durationExact = false,
      None, None)
  }

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Ogg: the first page carries the codec id header ("vorbis" →
    * channels u8 + rate u32le at +11; "OpusHead" → channels u8 at +9,
    * pre-skip u16le, input rate u32le at +12). Duration comes from the
    * LAST page's granule position (samples at the codec rate — 48 kHz
    * for Opus regardless of input rate): EXACT, the same field every
    * player seeks by. */
  def parseOgg(b: Array[Byte]): AudioMeta = {
    def ascii(off: Int, s: String): Boolean =
      b.length >= off + s.length &&
        s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
    // first page payload starts after the 27-byte header + segment table
    if (b.length < 28) return AudioMeta("ogg", None, None,
      durationExact = true, None, None)
    val nSegs = b(26) & 0xff
    val p = 27 + nSegs
    var codec: Option[String] = None
    var rate = 0
    var gRate = 0 // the rate granule positions tick at
    var ch = 0
    if (ascii(p, "vorbis") && p + 16 <= b.length) {
      codec = Some("vorbis")
      ch = b(p + 11) & 0xff
      rate = leU32(b, p + 12).toInt
      gRate = rate
    } else if (ascii(p, "OpusHead") && p + 16 <= b.length) {
      codec = Some("opus")
      ch = b(p + 9) & 0xff
      rate = leU32(b, p + 12).toInt // original input rate (informative)
      gRate = 48000                 // Opus granules always tick at 48 kHz
    }
    // last page: scan backward for the final "OggS" capture pattern
    var last = -1
    var i = b.length - 14
    while (i >= 0 && last < 0) {
      if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
        b(i + 3) == 'S') last = i
      else i -= 1
    }
    val dur =
      if (last >= 0 && last + 14 <= b.length && gRate > 0) {
        val granule = leU32(b, last + 6) | (leU32(b, last + 10) << 32)
        if (granule > 0) Some(granule * 1000L / gRate) else None
      } else None
    AudioMeta("ogg", codec, dur, durationExact = true,
      if (rate > 0) Some(rate) else None, if (ch > 0) Some(ch) else None)
  }

  // ------------------------------------------------------------------
  // Deterministic fixture builders — REAL spec-conformant bytes, used
  // by the spec and the oracled registry exhibit (build → parse must
  // round-trip the exact field values an ANSI oracle recomputes).
  // ------------------------------------------------------------------

  /** Minimal valid FLAC (magic + lone STREAMINFO block): duration is
    * exact when rate divides samples·1000. */
  def buildFlac(sampleRate: Int, channels: Int,
      totalSamples: Long): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && sampleRate > 0 &&
      sampleRate < (1 << 20) && totalSamples >= 0 &&
      totalSamples < (1L << 36))
    val info = new Array[Byte](18) // only the packed field matters here
    info(10) = ((sampleRate >>> 12) & 0xff).toByte
    info(11) = ((sampleRate >>> 4) & 0xff).toByte
    info(12) = (((sampleRate & 0x0f) << 4) | ((channels - 1) << 1)).toByte
    info(13) = (((15 << 4) | ((totalSamples >>> 32) & 0x0f)).toByte) // 16-bit bps
    info(14) = ((totalSamples >>> 24) & 0xff).toByte
    info(15) = ((totalSamples >>> 16) & 0xff).toByte
    info(16) = ((totalSamples >>> 8) & 0xff).toByte
    info(17) = (totalSamples & 0xff).toByte
    "fLaC".getBytes("US-ASCII") ++
      Array((0x80).toByte, 0.toByte, 0.toByte, 18.toByte) ++ info
  }

  /** Minimal MP3: one MPEG-1 Layer III frame header + `padBytes` of
    * payload; CBR duration estimate = (4 + padBytes)·8 / kbps ms. */
  def buildMp3(bitrateIdx: Int, sampleRateIdx: Int,
      padBytes: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && sampleRateIdx < 3)
    Array(0xff.toByte, 0xfb.toByte, // MPEG-1 Layer III, no CRC
      ((bitrateIdx << 4) | (sampleRateIdx << 2)).toByte, 0.toByte) ++
      Array.fill[Byte](padBytes)(0x55)
  }

  /** Minimal Ogg/Opus: an id-header page plus a final page whose
    * granule position encodes the duration at 48 kHz. */
  def buildOggOpus(channels: Int, inputRate: Int,
      granule: Long): Array[Byte] = {
    def page(granulePos: Long, payload: Array[Byte],
        seq: Int): Array[Byte] = {
      require(payload.length < 255)
      val h = new Array[Byte](27)
      h(0) = 'O'; h(1) = 'g'; h(2) = 'g'; h(3) = 'S'
      var i = 0
      while (i < 8) { h(6 + i) = ((granulePos >>> (8 * i)) & 0xff).toByte
        i += 1 }
      h(18) = seq.toByte
      h(26) = 1 // one segment
      h ++ Array(payload.length.toByte) ++ payload
    }
    val head = "OpusHead".getBytes("US-ASCII") ++
      Array(1.toByte, channels.toByte, 0.toByte, 0.toByte) ++
      (0 until 4).map(i => ((inputRate >>> (8 * i)) & 0xff).toByte)
        .toArray ++ Array(0.toByte, 0.toByte, 0.toByte)
    page(0L, head, 0) ++ page(granule, Array[Byte](0), 1)
  }

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

  /** Minimal PLAYABLE MJPEG-in-MP4: ftyp + mdat (concatenated JPEG
    * samples) + moov(mvhd, trak(tkhd, mdia(minf(stbl(stsd(`codec`),
    * stsz, stsc, stco))))) — absolute stco offsets point into the mdat
    * payload, one chunk holds all samples. Built byte-by-byte so
    * [[graft.multimodal.Multimodal.decodeMjpegMp4Frames]] is tested
    * against the ISO-BMFF spec, not against itself. */
  def buildMjpegMp4(jpegs: Seq[Array[Byte]], width: Int, height: Int,
      durationMs: Long = 1000L, codec: String = "jpeg"): Array[Byte] = {
    require(codec.length == 4, "fourcc")
    require(jpegs.nonEmpty, "need >= 1 sample")
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", jpegs.toArray.flatten)
    val firstSample = ftyp.length + 8L // skip the mdat header
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(durationMs) ++
        Array.fill[Byte](80)(0))
    val tkhd = box("tkhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(0) ++
        Array.fill[Byte](52)(0) ++
        be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val stbl = box("stbl",
      box("stsd", be32(0) ++ be32(1) ++
        box(codec, Array.fill[Byte](8)(0))) ++
      box("stsz", be32(0) ++ be32(0) ++ be32(jpegs.length) ++
        jpegs.toArray.flatMap(j => be32(j.length))) ++
      box("stsc", be32(0) ++ be32(1) ++
        be32(1) ++ be32(jpegs.length) ++ be32(1)) ++
      box("stco", be32(0) ++ be32(1) ++ be32(firstSample)))
    val trak = box("trak",
      tkhd ++ box("mdia", box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
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
