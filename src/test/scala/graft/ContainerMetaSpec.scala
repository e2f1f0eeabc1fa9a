package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{ContainerMeta, Multimodal}

/** Pure-JVM MP4 box walk + Matroska EBML parse: field round-trips
  * through spec-conformant fixture bytes, malformed-input robustness,
  * and the dataset-card media fields the metadata feeds. */
class ContainerMetaSpec extends GraftSuite {
  import spark.implicits._

  test("mp4: built boxes parse back to the exact planted fields") {
    val b = ContainerMeta.buildMp4(90500L, 1920, 1080, "avc1")
    assert(Multimodal.containerFormat(b) === "mp4")
    val m = ContainerMeta.parse(b).get
    assert(m.format === "mp4")
    assert(m.brand === "isom")
    assert(m.durationMs === Some(90500L))
    assert(m.width === Some(1920))
    assert(m.height === Some(1080))
    assert(m.codec === Some("avc1"))
  }

  test("mp4: version-1 mvhd (64-bit duration) parses") {
    // hand-built v1 mvhd: ver=1, creation/modification are 64-bit
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def box(t: String, p: Array[Byte]) =
      be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    val mvhd = box("mvhd",
      Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++ // ver 1 + flags
        Array.fill[Byte](16)(0) ++     // creation + modification (8+8)
        be32(90000) ++                 // timescale
        be32(0) ++ be32(123456789L) ++ // duration u64 = 123456789 ticks
        Array.fill[Byte](80)(0))
    val m = ContainerMeta.parseMp4(box("moov", mvhd))
    assert(m.durationMs === Some(123456789L * 1000 / 90000))
  }

  test("ebml: webm and matroska round-trip, DocType drives the label") {
    val w = ContainerMeta.parse(
      ContainerMeta.buildEbml("webm", 42000L, 640, 360, "V_VP9")).get
    assert(w.format === "webm" && w.brand === "webm")
    assert(w.durationMs === Some(42000L))
    assert(w.width === Some(640) && w.height === Some(360))
    assert(w.codec === Some("V_VP9"))
    val k = ContainerMeta.parse(ContainerMeta.buildEbml("matroska",
      7L, 3840, 2160, "V_MPEG4/ISO/AVC")).get
    assert(k.format === "matroska")
    assert(k.durationMs === Some(7L))
    assert(k.codec === Some("V_MPEG4/ISO/AVC"))
  }

  test("malformed input: every truncation parses without throwing") {
    // a corrupt row must never kill the task that carries it — walk
    // every prefix of both container families and demand quiet
    // degradation (fields absent, no exception)
    val mp4 = ContainerMeta.buildMp4(5000L, 320, 240, "hev1")
    val ebm = ContainerMeta.buildEbml("webm", 5000L, 320, 240, "V_VP8")
    (0 to mp4.length).foreach { n =>
      ContainerMeta.parseMp4(mp4.take(n)) // must not throw
    }
    (0 to ebm.length).foreach { n =>
      ContainerMeta.parseEbml(ebm.take(n)) // must not throw
    }
    // full-length parses still intact after the sweep
    assert(ContainerMeta.parseMp4(mp4).durationMs === Some(5000L))
    assert(ContainerMeta.parseEbml(ebm).width === Some(320))
    // non-container bytes dispatch to None, not to a bogus parse
    assert(ContainerMeta.parse("plain text".getBytes("UTF-8")) === None)
    assert(ContainerMeta.parse(Array.empty[Byte]) === None)
  }

  test("flac: STREAMINFO bit unpacking round-trips exactly") {
    val m = ContainerMeta.parseFlac(
      ContainerMeta.buildFlac(44100, 2, 44100L * 17))
    assert(m.format === "flac" && m.codec === Some("flac"))
    assert(m.durationMs === Some(17000L))
    assert(m.durationExact)
    assert(m.sampleRate === Some(44100) && m.channels === Some(2))
    // odd rate that doesn't divide: floor semantics
    val odd = ContainerMeta.parseFlac(ContainerMeta.buildFlac(22050, 1, 1000))
    assert(odd.durationMs === Some(1000L * 1000 / 22050))
  }

  test("mp3: ID3 skip + frame-sync header fields, CBR duration estimate") {
    val bare = ContainerMeta.buildMp3(bitrateIdx = 9, sampleRateIdx = 0,
      padBytes = 1596) // 1600 bytes at 128 kbps -> 100 ms
    val m = ContainerMeta.parseMp3(bare)
    assert(m.format === "mp3" && m.codec === Some("mpeg1-layer3"))
    assert(m.durationMs === Some(100L))
    assert(!m.durationExact) // first-frame CBR estimate, flagged
    assert(m.sampleRate === Some(44100) && m.channels === Some(2))
    // an ID3v2 tag before the sync is skipped, not parsed as audio
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      Array.fill[Byte](10)(0x41) ++ bare
    val withTag = ContainerMeta.parseMp3(id3)
    assert(Multimodal.containerFormat(id3) === "mp3")
    assert(withTag.sampleRate === Some(44100))
  }

  test("ogg: id-header fields + last-page granule duration") {
    val m = ContainerMeta.parseOgg(
      ContainerMeta.buildOggOpus(channels = 2, inputRate = 48000,
        granule = 48L * 2500)) // 2.5 s at the 48 kHz granule clock
    assert(m.format === "ogg" && m.codec === Some("opus"))
    assert(m.durationMs === Some(2500L))
    assert(m.durationExact)
    assert(m.sampleRate === Some(48000) && m.channels === Some(2))
  }

  test("audio malformed input: every truncation parses without throwing") {
    val fixtures = Seq(
      ContainerMeta.buildFlac(16000, 1, 16000L * 3),
      ContainerMeta.buildMp3(5, 1, 200),
      ContainerMeta.buildOggOpus(1, 48000, 4800L))
    fixtures.foreach { f =>
      (0 to f.length).foreach { n =>
        ContainerMeta.parseAudio(f.take(n)) // must not throw
      }
    }
    assert(ContainerMeta.parseAudio("plain text".getBytes("UTF-8")) === None)
  }

  test("videoMeta column frame + card media fields carry parsed " +
      "duration for undecodable containers") {
    val rows = Seq(
      (1L, ContainerMeta.buildMp4(10000L, 640, 480, "avc1")),
      (2L, ContainerMeta.buildMp4(30000L, 1280, 720, "hev1")),
      (3L, ContainerMeta.buildEbml("webm", 20000L, 640, 360, "V_VP9")),
      (4L, "not a container".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val vm = Multimodal.videoMeta(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(vm(1L).getAs[Long]("duration_ms") === 10000L)
    assert(vm(2L).getAs[Int]("width") === 1280)
    assert(vm(3L).getAs[String]("codec") === "V_VP9")
    assert(vm(3L).getAs[String]("format") === "webm")
    assert(vm(4L).isNullAt(vm(4L).fieldIndex("duration_ms")))
    // the card: undecodable mp4 rows now carry with_meta + duration
    val docs = Seq((1L, "words for the card")).toDF("doc_id", "text")
    val card = graft.operators.CorpusReport.report(docs,
      media = Some(rows))
    assert(card.contains(
      """"mp4":{"n":2,"undecodable":2,"with_meta":2,""" +
        """"mean_duration_ms":20000,"total_duration_ms":40000,""" +
        """"codecs":{"avc1":1,"hev1":1}}"""), card)
    assert(card.contains(
      """"webm":{"n":1,"undecodable":1,"with_meta":1,""" +
        """"mean_duration_ms":20000,"total_duration_ms":20000,""" +
        """"codecs":{"V_VP9":1}}"""), card)
  }
}
