package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.ContainerMeta

/** Adversarial robustness for the container byte-walks, closing the
  * build→parse loop critique two ways:
  *
  *  1. MUTATION: every fixture is truncated at every byte boundary and
  *     point-mutated at every offset — parse must never throw, and a
  *     truncated container must never FABRICATE a field (any populated
  *     field equals the full container's value; exceptions below are
  *     fields DEFINED as functions of the byte length).
  *  2. NON-BUILDER FIXTURES: an ISO-BMFF file hand-assembled field by
  *     field from the published box layouts (full 100-byte mvhd v0,
  *     84-byte tkhd v0 with the unity matrix, mdhd/hdlr siblings, a
  *     78-byte VisualSampleEntry) and the canonical real-world MP3
  *     frame header `FF FB 90 00` — neither touches the builders, so a
  *     shared builder/parser offset mistake fails here.
  *
  * Structural edge cases the walks must survive and still read fields
  * through: size32=0 ("box extends to end of file"), size32=1 + 64-bit
  * size, unknown sibling boxes, and an unknown-size (all-ones vint)
  * EBML Segment.
  */
class ContainerMetaFuzzSpec extends AnyFunSuite {

  private val mp4 = ContainerMeta.buildMp4(90500L, 1920, 1080, "avc1")
  private val webm = ContainerMeta.buildEbml("webm", 42000L, 640, 360, "V_VP9")
  private val mkv =
    ContainerMeta.buildEbml("matroska", 1500L, 320, 240, "V_MPEG4/ISO/AVC")
  private val flac = ContainerMeta.buildFlac(44100, 2, 441000L)
  private val mp3 = ContainerMeta.buildMp3(9, 0, 412)
  private val ogg = ContainerMeta.buildOggOpus(2, 48000, 96000L)

  private def parseAny(b: Array[Byte]): Unit = {
    // both dispatchers: a mutated magic can land a video payload in the
    // audio walk and vice versa — neither may throw
    ContainerMeta.parse(b)
    ContainerMeta.parseAudio(b)
  }

  // truncated video fields must be absent-or-equal, never invented
  private def videoSubset(b: Array[Byte],
      full: ContainerMeta.VideoMeta): Unit =
    ContainerMeta.parse(b).foreach { m =>
      m.durationMs.foreach(d => assert(full.durationMs.contains(d)))
      m.width.foreach(w => assert(full.width.contains(w)))
      m.height.foreach(h => assert(full.height.contains(h)))
      m.codec.foreach(c => assert(full.codec.contains(c)))
    }

  test("truncation at every byte boundary: no throw, no fabricated field") {
    val fullMp4 = ContainerMeta.parse(mp4).get
    val fullWebm = ContainerMeta.parse(webm).get
    val fullMkv = ContainerMeta.parse(mkv).get
    val fullFlac = ContainerMeta.parseAudio(flac).get
    for (n <- 0 to mp4.length) videoSubset(mp4.take(n), fullMp4)
    for (n <- 0 to webm.length) videoSubset(webm.take(n), fullWebm)
    for (n <- 0 to mkv.length) videoSubset(mkv.take(n), fullMkv)
    for (n <- 0 to flac.length) ContainerMeta.parseAudio(flac.take(n))
      .foreach { m =>
        m.sampleRate.foreach(r => assert(fullFlac.sampleRate.contains(r)))
        m.channels.foreach(c => assert(fullFlac.channels.contains(c)))
        m.durationMs.foreach(d => assert(fullFlac.durationMs.contains(d)))
      }
    // mp3 durationMs is DEFINED as the CBR estimate over the byte
    // length, so truncation legitimately shrinks it — rate/channels
    // must still never be invented
    val fullMp3 = ContainerMeta.parseAudio(mp3).get
    for (n <- 0 to mp3.length) ContainerMeta.parseAudio(mp3.take(n))
      .foreach { m =>
        m.sampleRate.foreach(r => assert(fullMp3.sampleRate.contains(r)))
        m.channels.foreach(c => assert(fullMp3.channels.contains(c)))
      }
    // ogg duration comes from the last COMPLETE page's granule — a
    // truncated tail may surface an earlier page's smaller granule but
    // never a larger one
    val fullOgg = ContainerMeta.parseAudio(ogg).get
    for (n <- 0 to ogg.length) ContainerMeta.parseAudio(ogg.take(n))
      .foreach { m =>
        m.durationMs.foreach(d => assert(d <= fullOgg.durationMs.get))
        m.channels.foreach(c => assert(fullOgg.channels.contains(c)))
      }
  }

  test("point mutation at every offset x {0x00, 0x01, 0xff}: no throw") {
    for (fixture <- Seq(mp4, webm, mkv, flac, mp3, ogg);
        i <- fixture.indices; v <- Seq(0x00, 0x01, 0xff)) {
      val b = fixture.clone()
      b(i) = v.toByte
      parseAny(b)
    }
  }

  test("mp4: size32=0 on the last top-level box (extends to end)") {
    val moovAt = {
      // top-level moov box starts 4 bytes before its fourcc
      var i = -1
      for (o <- 0 until mp4.length - 4 if i < 0)
        if (mp4(o + 4) == 'm' && mp4(o + 5) == 'o' && mp4(o + 6) == 'o' &&
          mp4(o + 7) == 'v') i = o
      i
    }
    assert(moovAt > 0)
    val b = mp4.clone()
    b(moovAt) = 0; b(moovAt + 1) = 0; b(moovAt + 2) = 0; b(moovAt + 3) = 0
    val m = ContainerMeta.parseMp4(b)
    assert(m.durationMs === Some(90500L))
    assert(m.width === Some(1920))
    assert(m.codec === Some("avc1"))
  }

  test("mp4: size32=1 + 64-bit largesize on moov still parses") {
    val moovAt = mp4.indexOfSlice("moov".getBytes("US-ASCII")) - 4
    assert(moovAt > 0)
    val payload = mp4.drop(moovAt + 8) // original moov payload
    val large = payload.length + 16L
    val b64 = Array[Byte](0, 0, 0, 1) ++ "moov".getBytes("US-ASCII") ++
      Array((large >>> 56).toByte, (large >>> 48).toByte,
        (large >>> 40).toByte, (large >>> 32).toByte,
        (large >>> 24).toByte, (large >>> 16).toByte,
        (large >>> 8).toByte, large.toByte) ++ payload
    val m = ContainerMeta.parseMp4(mp4.take(moovAt) ++ b64)
    assert(m.durationMs === Some(90500L))
    assert(m.width === Some(1920))
    assert(m.height === Some(1080))
    assert(m.codec === Some("avc1"))
  }

  test("mp4: unknown sibling boxes are skipped, not tripped over") {
    def boxOf(typ: String, payload: Array[Byte]): Array[Byte] =
      Array(((payload.length + 8) >>> 24).toByte,
        ((payload.length + 8) >>> 16).toByte,
        ((payload.length + 8) >>> 8).toByte, (payload.length + 8).toByte) ++
        typ.getBytes("US-ASCII") ++ payload
    val junk = boxOf("free", Array.fill[Byte](37)(0x7e))
    val moovAt = mp4.indexOfSlice("moov".getBytes("US-ASCII")) - 4
    // junk between ftyp and moov AND junk prepended inside moov
    val withJunk = mp4.take(moovAt) ++ junk ++ {
      val size = ((mp4(moovAt) & 0xff) << 24) |
        ((mp4(moovAt + 1) & 0xff) << 16) |
        ((mp4(moovAt + 2) & 0xff) << 8) | (mp4(moovAt + 3) & 0xff)
      val payload = mp4.slice(moovAt + 8, moovAt + size)
      boxOf("moov", junk ++ payload)
    }
    val m = ContainerMeta.parseMp4(withJunk)
    assert(m.durationMs === Some(90500L))
    assert(m.width === Some(1920))
    assert(m.codec === Some("avc1"))
  }

  test("ebml: unknown-size (all-ones vint) Segment still yields fields") {
    val segId = Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte)
    val at = webm.indexOfSlice(segId)
    assert(at > 0)
    // builder emits a 1-byte size vint right after the 4-byte id;
    // 0xFF = all-ones = "unknown size, extends to end"
    val b = webm.clone()
    b(at + 4) = 0xff.toByte
    val m = ContainerMeta.parseEbml(b)
    assert(m.durationMs === Some(42000L))
    assert(m.width === Some(640))
    assert(m.height === Some(360))
    assert(m.codec === Some("V_VP9"))
  }

  // ---------------------------------------------------------------
  // Non-builder fixtures
  // ---------------------------------------------------------------

  test("hand-assembled ISO-BMFF (published field layouts) parses " +
      "without the builders") {
    def b32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def b16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    def boxOf(typ: String, payload: Array[Byte]): Array[Byte] =
      b32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
    // unity transform matrix: 0x10000, 0, 0 / 0, 0x10000, 0 / 0, 0, 0x40000000
    val matrix = b32(0x10000) ++ b32(0) ++ b32(0) ++
      b32(0) ++ b32(0x10000) ++ b32(0) ++
      b32(0) ++ b32(0) ++ b32(0x40000000L)
    // mvhd v0, 100-byte payload: timescale 600 (the QuickTime default,
    // NOT the builder's 1000), duration 1200 ticks = 2000 ms
    val mvhd = boxOf("mvhd",
      b32(0) ++ b32(3_600_000) ++ b32(3_600_001) ++ b32(600) ++ b32(1200) ++
        b32(0x10000) ++ b16(0x0100) ++ b16(0) ++ b32(0) ++ b32(0) ++
        matrix ++ Array.fill[Byte](24)(0) ++ b32(2))
    assert(mvhd.length === 108)
    // tkhd v0, 84-byte payload: flags=7 (enabled), track 1, 320x240 16.16
    val tkhd = boxOf("tkhd",
      b32(7) ++ b32(3_600_000) ++ b32(3_600_001) ++ b32(1) ++ b32(0) ++
        b32(1200) ++ b32(0) ++ b32(0) ++ b16(0) ++ b16(0) ++ b16(0) ++
        b16(0) ++ matrix ++ b32(320L << 16) ++ b32(240L << 16))
    assert(tkhd.length === 92)
    // realistic mdia: mdhd + hdlr('vide') siblings ahead of minf
    val mdhd = boxOf("mdhd", b32(0) ++ b32(0) ++ b32(0) ++ b32(600) ++
      b32(1200) ++ b16(0x55c4) ++ b16(0))
    val hdlr = boxOf("hdlr", b32(0) ++ b32(0) ++
      "vide".getBytes("US-ASCII") ++ Array.fill[Byte](12)(0) ++
      Array[Byte](0))
    // stsd with a 78-byte-body VisualSampleEntry 'avc1'
    val entry = boxOf("avc1", Array.fill[Byte](78)(0))
    val stsd = boxOf("stsd", b32(0) ++ b32(1) ++ entry)
    val minf = boxOf("minf", boxOf("stbl", stsd))
    val trak = boxOf("trak", tkhd ++ boxOf("mdia", mdhd ++ hdlr ++ minf))
    val ftyp = boxOf("ftyp", "isom".getBytes("US-ASCII") ++ b32(0x200) ++
      "isomavc1".getBytes("US-ASCII"))
    val file = ftyp ++ boxOf("moov", mvhd ++ trak)
    val m = ContainerMeta.parse(file).get
    assert(m.format === "mp4")
    assert(m.brand === "isom")
    assert(m.durationMs === Some(2000L)) // 1200 ticks at timescale 600
    assert(m.width === Some(320))
    assert(m.height === Some(240))
    assert(m.codec === Some("avc1"))
  }

  test("real-world MP3 frame header FF FB 90 00 (128 kbps, 44.1 kHz)") {
    // the most common header bytes in the wild: MPEG-1 Layer III
    // no-CRC, bitrate index 9 = 128 kbps, rate index 0 = 44100, stereo
    val b = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte) ++
      Array.fill[Byte](1596)(0x41)
    val m = ContainerMeta.parseAudio(b).get
    assert(m.format === "mp3")
    assert(m.codec === Some("mpeg1-layer3"))
    assert(m.sampleRate === Some(44100))
    assert(m.channels === Some(2))
    assert(!m.durationExact)
    assert(m.durationMs === Some(1600L * 8 / 128)) // 100 ms CBR estimate
  }
}
