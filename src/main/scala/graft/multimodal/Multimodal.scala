package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition so a real codec drops in without
  * touching the pipeline shape.
  *
  * IMAGE and AUDIO decode are REAL, JDK-native: [[decodeImage]] uses
  * `javax.imageio` (PNG/JPEG/GIF/BMP) for true dimensions + Rec.601
  * luma; [[decodeAudio]] uses `javax.sound.sampled` (WAV/AIFF/AU PCM)
  * for true sample rate / channels / frames + RMS amplitude. Payloads
  * with no JDK codec (video, compressed audio) fall back to
  * [[fakeDecode]]'s deterministic byte-derived pseudo-features, clearly
  * marked as such.
  */
object Multimodal extends Serializable {

  /** Typed media metadata carried alongside the payload. */
  final case class MediaMeta(mime: String, n_bytes: Long)

  final case class MediaFeatures(
      doc_id: Long,
      width: Int, height: Int,          // real for images; derived otherwise
      byte_entropy: Double,             // real: Shannon entropy of bytes
      luma_mean: Double)                // real Rec.601 for images; mean byte otherwise

  /** Attach a binary payload column + metadata struct. In this testbed the
    * "media" bytes are the document text encoded UTF-8; in production this
    * column comes straight from the source (parquet/delta binary). */
  def attachBinary(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(textCol).cast("binary").as("content"))
      .withColumn("meta", struct(lit("application/octet-stream").as("mime"),
        length(col("content")).cast("long").as("n_bytes")))

  /** Deterministic synthetic PNG for doc `docId` — the q167 fixture
    * corpus, shared with the multimodal scale sweep (`--mm`): 9×8
    * blocks of luma from the full murmur3 fmix64 of (docId, block)
    * (the 2-round variant left a low-bit period that planted spurious
    * Hamming-0 pairs — BASELINE.md r8), and every docId ≡ 1 (mod 40)
    * carries a REPLICA of its predecessor's image at 2× resolution,
    * +4 brightness, ±1 checkerboard dither — the perturbations dHash
    * must absorb. Block values are multiples of 16, so the dither can
    * never flip a gradient. */
  def syntheticPng(docId: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // idempotent, JVM-wide
    val base = if (docId % 40 == 1 && docId > 0) docId - 1 else docId
    val twin = base != docId
    val k = if (twin) 8 else 4 // replica at 2x resolution
    val img = new java.awt.image.BufferedImage(9 * k, 8 * k,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until 8; c <- 0 until 9) {
      var h = base * 1000003L + r * 9 + c
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
      val v0 = ((h & 0xf) * 16).toInt
      for (y <- r * k until (r + 1) * k; x <- c * k until (c + 1) * k) {
        val dither = if (twin) 4 + (if ((x + y) % 2 == 0) 1 else -1)
          else 0
        val v = math.min(255, v0 + dither)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PCM WAV for doc `docId` — the q170 fixture
    * corpus (audio mirror of [[syntheticPng]]): a 65-segment square-
    * wave envelope with segment amplitudes from fmix64(docId, seg);
    * docId ≡ 1 (mod 40) carries its predecessor's clip at HALF volume
    * and DOUBLE sample rate — the transforms the energy-contour hash
    * absorbs (square carrier ⇒ window RMS = amplitude at any rate). */
  def syntheticWav(docId: Long): Array[Byte] = {
    val base = if (docId % 40 == 1 && docId > 0) docId - 1 else docId
    val twin = base != docId
    val rate = if (twin) 16000f else 8000f
    val perSeg = if (twin) 320 else 160
    val vol = if (twin) 0.5 else 1.0
    val pcm = new Array[Byte](65 * perSeg * 2)
    for (seg <- 0 until 65) {
      var h = base * 9176213L + seg
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
      val amp = ((h & 0xf) * 0.05 + 0.05) * vol
      for (j <- 0 until perSeg) {
        val i = seg * perSeg + j
        val sign = if (i % 2 == 0) 1 else -1
        val sample = (sign * amp * 32767).toInt.toShort
        pcm(2 * i) = (sample & 0xff).toByte
        pcm(2 * i + 1) = ((sample >> 8) & 0xff).toByte
      }
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, (65 * perSeg).toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Shannon entropy (bits/byte) of a payload — needs only the bytes,
    * shared by the real and fallback decode paths. */
  def byteEntropy(bytes: Array[Byte]): Double = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val n = math.max(1, bytes.length)
    var ent = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; ent -= p * math.log(p) / math.log(2) }
    }
    ent
  }

  /** True when the payload starts with a PNG/JPEG/GIF/BMP signature —
    * the cheap gate that keeps `ImageIO.read` (reader-SPI probing) off
    * the overwhelmingly-non-image rows of a mixed corpus. */
  def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && {
      val b0 = bytes(0) & 0xff
      val b1 = bytes(1) & 0xff
      (b0 == 0x89 && b1 == 'P') ||                  // PNG
      (b0 == 0xff && b1 == 0xd8) ||                 // JPEG
      (b0 == 'G' && b1 == 'I' && bytes(2) == 'F') || // GIF
      (b0 == 'B' && b1 == 'M')                      // BMP
    }

  /** REAL image decode via the JDK's `javax.imageio` readers: true
    * width/height and mean Rec.601 luma (0.299R + 0.587G + 0.114B) over
    * the decoded raster. Returns None when the bytes are not an image the
    * JDK can decode — [[looksLikeImage]] rejects non-images on 4 bytes
    * before any reader runs, and the in-memory stream cache avoids
    * ImageIO's default temp-FILE-per-read, so calling this on every
    * payload of a mixed corpus is safe. */
  def decodeImage(id: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    if (!looksLikeImage(bytes)) return None
    javax.imageio.ImageIO.setUseCache(false) // idempotent, JVM-wide
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else Some(MediaFeatures(id, img.getWidth, img.getHeight,
      byteEntropy(bytes), lumaMean(img)))
  }

  /** Fallback for payloads with no JDK codec (audio/video, opaque blobs):
    * deterministic pseudo-features — dimensions from a rolling byte hash,
    * luma = mean byte value. Byte entropy is computed for real. */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 1125899906842597L
    var i = 0
    var sum = 0L
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      sum += bytes(i) & 0xff
      i += 1
    }
    val n = math.max(1, bytes.length)
    MediaFeatures(id,
      width = 64 + (math.abs(h) % 1024).toInt,
      height = 64 + (math.abs(h >> 10) % 1024).toInt,
      byte_entropy = byteEntropy(bytes),
      luma_mean = sum.toDouble / n)
  }

  /** Image payloads decode for real; everything else degrades to the
    * deterministic fallback. */
  def decode(id: Long, bytes: Array[Byte]): MediaFeatures =
    decodeImage(id, bytes).getOrElse(fakeDecode(id, bytes))

  /** 64-bit difference hash (dHash) of an image payload: the decoded
    * raster is area-averaged down to a 9×8 luma grid and bit r·8+c is
    * set when grid(r,c+1) > grid(r,c) — 64 horizontal gradient signs.
    * Comparing ADJACENT cells makes the hash invariant under global
    * brightness/contrast shifts and stable under resizing and
    * re-encoding — the standard perceptual near-dup key for image
    * corpora (near-dup ⇔ small Hamming distance, pair discovery via
    * [[graft.operators.Dedup.hammingNearDups]]'s pigeonhole banding —
    * never a pixel-level pair scan). None when the payload is not a
    * JDK-decodable image. */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    if (!looksLikeImage(bytes)) return None
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val (gw, gh) = (9, 8)
      val grid = Array.ofDim[Double](gh, gw)
      val (w, h) = (img.getWidth, img.getHeight)
      var r = 0
      while (r < gh) {
        val y0 = r * h / gh
        val y1 = math.max(y0 + 1, (r + 1) * h / gh)
        var c = 0
        while (c < gw) {
          val x0 = c * w / gw
          val x1 = math.max(x0 + 1, (c + 1) * w / gw)
          var sum = 0.0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          grid(r)(c) = sum / ((y1 - y0) * (x1 - x0))
          c += 1
        }
        r += 1
      }
      var sig = 0L
      r = 0
      while (r < gh) {
        var c = 0
        while (c < gw - 1) {
          if (grid(r)(c + 1) > grid(r)(c)) sig |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(sig)
    }
  }

  private val dHashUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else dHash64(bytes))

  /** 64-bit perceptual audio fingerprint — the audio twin of
    * [[dHash64]]: the decoded PCM stream is cut into 65 equal TIME
    * windows, and bit r is set when window r+1 carries more energy
    * (mean square) than window r. Comparing ADJACENT windows makes
    * the hash invariant under global volume scaling, and the
    * proportional window binning under resampling — the two
    * transforms audio re-encoding pipelines apply. Same codec
    * envelope as [[decodeAudio]] (JDK PCM_SIGNED 16-bit WAV/AIFF/AU);
    * None for anything else or for clips shorter than 65 samples. */
  def audioHash64(bytes: Array[Byte]): Option[Long] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val data = in.readAllBytes()
          val nS = data.length / 2
          if (nS < 65) None
          else {
            val sumSq = new Array[Double](65)
            val cnt = new Array[Long](65)
            val bigEndian = fmt.isBigEndian
            var i = 0
            while (i + 1 < data.length) {
              val w = ((i / 2).toLong * 65 / nS).toInt
              val s =
                if (bigEndian) (data(i) << 8) | (data(i + 1) & 0xff)
                else (data(i + 1) << 8) | (data(i) & 0xff)
              val x = s / 32768.0
              sumSq(w) += x * x
              cnt(w) += 1
              i += 2
            }
            var sig = 0L
            var r = 0
            while (r < 64) {
              if (sumSq(r + 1) / cnt(r + 1) > sumSq(r) / cnt(r))
                sig |= 1L << r
              r += 1
            }
            Some(sig)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  private val audioHashUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else audioHash64(bytes))

  /** Perceptual signatures for every decodable audio payload — (id,
    * sig) rows for [[graft.operators.Dedup.hammingNearDups]], the
    * audio mirror of [[imageDHashes]]. */
  def audioFingerprints(withBinary: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame =
    withBinary
      .select(col(idCol).as("id"), audioHashUdf(col(contentCol)).as("sig"))
      .filter(col("sig").isNotNull)

  /** Perceptual signatures for every decodable image payload: (id,
    * sig) rows ready for [[graft.operators.Dedup.hammingNearDups]].
    * Non-image and undecodable payloads are dropped (they have no
    * perceptual identity — byte-exact dedup already covers them via
    * sha-keyed groupBy). One scan, one per-row decode, no shuffle. */
  def imageDHashes(withBinary: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame =
    withBinary
      .select(col(idCol).as("id"), dHashUdf(col(contentCol)).as("sig"))
      .filter(col("sig").isNotNull)

  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Double, channels: Int, n_frames: Long,
      duration_s: Double,
      rms: Double) // root-mean-square amplitude in [0, 1]

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM readers ship with the JDK): true sample rate / channel count /
    * frame count, and RMS amplitude over 16-bit PCM samples. Returns
    * None for payloads the JDK cannot parse as audio (MP3/OGG need
    * external codecs and stay out of scope), and ALSO for formats whose
    * features would be wrong rather than missing: NOT_SPECIFIED (-1)
    * frame geometry would yield negative durations, and non-16-bit or
    * non-signed-PCM encodings (e.g. PCM_UNSIGNED, ULAW) would decode to
    * a bogus RMS — undecodable beats silently wrong. */
  def decodeAudio(id: Long, bytes: Array[Byte]): Option[AudioFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames < 0 || fmt.getFrameRate <= 0 ||
            fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val data = in.readAllBytes()
          var sumSq = 0.0
          var n = 0
          val bigEndian = fmt.isBigEndian
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (bigEndian) (data(i) << 8) | (data(i + 1) & 0xff)
              else (data(i + 1) << 8) | (data(i) & 0xff)
            val x = s / 32768.0
            sumSq += x * x
            n += 1
            i += 2
          }
          Some(AudioFeatures(id, fmt.getSampleRate.toDouble,
            fmt.getChannels, frames,
            frames / fmt.getFrameRate.toDouble,
            if (n > 0) math.sqrt(sumSq / n) else 0.0))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Per-partition audio feature extraction: decodable rows yield
    * features, the rest are dropped (a mixed corpus filters itself). */
  def extractAudioFeatures(withBinary: DataFrame): Dataset[AudioFeatures] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeAudio(id, bytes) })
  }

  /** Per-partition feature extraction over (id, content) — the decode
    * batches by partition, so a vectorized/codec-backed implementation
    * slots in without replanning. */
  def extractFeatures(withBinary: DataFrame): Dataset[MediaFeatures] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decode(id, bytes) })
  }

  final case class FrameFeatures(
      doc_id: Long,
      frame_index: Int,   // index of the sampled frame in the container
      n_frames: Int,      // total frames stored in the container
      width: Int, height: Int,
      luma_mean: Double)  // real Rec.601 luma of the decoded frame

  /** Mean Rec.601 luma over a decoded raster — shared by the
    * single-image and per-frame decode paths. */
  private def lumaMean(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum / (w.toLong * h)
  }

  /** Attribute of a named child node in an IIOMetadata tree, if present.
    */
  private def metaAttr(root: org.w3c.dom.Node, nodeName: String,
      attr: String): Option[Int] = {
    var c = root.getFirstChild
    while (c != null) {
      if (c.getNodeName == nodeName) {
        val a = c.getAttributes.getNamedItem(attr)
        if (a != null) return scala.util.Try(a.getNodeValue.toInt).toOption
      }
      c = c.getNextSibling
    }
    None
  }

  /** REAL multi-frame decode — animated GIF is the one multi-frame
    * container the JDK reads natively, so "video" frame sampling is
    * genuine for it. Frames are COMPOSITED in order onto the logical
    * canvas (frame-optimized GIFs store later frames as dirty-rect
    * deltas at an (x, y) offset — reading them raw would report the
    * patch, not the picture), and up to `maxFrames` canvas snapshots
    * are sampled EVENLY across the timeline (indices ⌊i·n/take⌋ — the
    * first frame always included). Each sampled frame reports the
    * canvas dimensions and the composited Rec.601 luma. Disposal is
    * draw-over (the none/doNotDispose modes that dominate real files;
    * restore-to-background/previous frames composite over the previous
    * canvas instead of clearing — the accepted approximation). Returns
    * None for anything that is not a decodable multi-frame GIF
    * (single-frame GIFs are [[decodeImage]] territory) — callers fall
    * back to the byte-slice stub, the honest stand-in for containers
    * with no JDK codec (MP4/WebM). */
  def decodeGifFrames(id: Long, bytes: Array[Byte],
      maxFrames: Int = 4): Option[Seq[FrameFeatures]] = {
    val isGif = bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F'
    if (!isGif) return None
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        if (n < 2) return None // single-frame: decodeImage territory
        val take = math.min(maxFrames, n)
        val wanted = (0 until take).map(i => (i.toLong * n / take).toInt)
          .toSet
        // canvas = logical screen descriptor; frame-0 extent fallback
        val (cw, ch) = (for {
          sm <- Option(reader.getStreamMetadata)
          root = sm.getAsTree("javax_imageio_gif_stream_1.0")
          w <- metaAttr(root, "LogicalScreenDescriptor",
            "logicalScreenWidth")
          h <- metaAttr(root, "LogicalScreenDescriptor",
            "logicalScreenHeight")
        } yield (w, h)).getOrElse((reader.getWidth(0), reader.getHeight(0)))
        val canvas = new java.awt.image.BufferedImage(cw, ch,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          val out = Seq.newBuilder[FrameFeatures]
          val maxIdx = wanted.max
          var fi = 0
          while (fi <= maxIdx) {
            val img = reader.read(fi)
            val root = reader.getImageMetadata(fi)
              .getAsTree("javax_imageio_gif_image_1.0")
            g.drawImage(img,
              metaAttr(root, "ImageDescriptor", "imageLeftPosition")
                .getOrElse(0),
              metaAttr(root, "ImageDescriptor", "imageTopPosition")
                .getOrElse(0), null)
            if (wanted(fi))
              out += FrameFeatures(id, fi, n, cw, ch, lumaMean(canvas))
            fi += 1
          }
          Some(out.result())
        } finally g.dispose()
      } catch { case _: Exception => None }
      finally reader.dispose()
    } finally iis.close()
  }

  /** Decode frames from an MJPEG-in-AVI byte stream — REAL video frame
    * decode for the one video container a pure JVM can handle: a RIFF
    * chunk walk collects the `##dc`/`##db` JPEG payloads from the
    * `movi` list (unknown chunks — headers, index, audio — are
    * skipped), then ImageIO decodes an even-timeline sample of
    * `maxFrames`. MJPEG frames are standalone JPEGs, so no compositing
    * is needed (unlike GIF deltas). Returns None for non-AVI bytes, an
    * AVI with no JPEG video chunks, or a corrupt chunk tree — the
    * undecodable-beats-silently-wrong policy. */
  def decodeMjpegAviFrames(id: Long, bytes: Array[Byte],
      maxFrames: Int = 4): Option[Seq[FrameFeatures]] = {
    val isAvi = bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' &&
      bytes(10) == 'I' && bytes(11) == ' '
    if (!isAvi) return None
    def le32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      var ok = true
      while (ok && p + 8 <= end) {
        val cc = new String(bytes, p, 4, "US-ASCII")
        // size stays a Long: a hostile size field near Int.MaxValue must
        // trip the corruption guard, not wrap p negative and crash the
        // walk outside the decode try/catch
        val sz = le32(p + 4)
        if (p + 8 + sz > end) ok = false // corrupt → stop
        else {
          val szi = sz.toInt
          if (cc == "LIST" && szi >= 4) walk(p + 12, p + 8 + szi)
          else if ((cc.endsWith("dc") || cc.endsWith("db")) && szi >= 2 &&
              (bytes(p + 8) & 0xff) == 0xff &&
              (bytes(p + 9) & 0xff) == 0xd8)
            frames += ((p + 8, szi))
          p += 8 + szi + (szi & 1) // chunks pad to even size
        }
      }
    }
    walk(12, math.min(bytes.length.toLong, 8L + le32(4)).toInt)
    val n = frames.length
    if (n == 0) return None
    val take = math.min(maxFrames, n)
    javax.imageio.ImageIO.setUseCache(false)
    try {
      Some((0 until take).map { i =>
        val fi = (i.toLong * n / take).toInt
        val (off, len) = frames(fi)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len))
        if (img == null) return None
        FrameFeatures(id, fi, n, img.getWidth, img.getHeight,
          lumaMean(img))
      })
    } catch { case _: Exception => None }
  }

  /** Decode frames from an MJPEG-in-MP4 (ISO-BMFF) byte stream — the
    * AVI machinery generalized to the one MP4 codec class a pure JVM
    * can handle: the `moov` sample tables of the video trak whose
    * `stsd` entry is a JPEG-family fourcc (`jpeg`/`mjpa`/`MJPG`, or
    * `mp4v` — some muxers store MJPEG under it) are walked — `stsz`
    * sample sizes, `stco`/`co64` chunk offsets, `stsc` sample-to-chunk
    * runs — into absolute sample extents, and each sampled payload is
    * ImageIO-decoded. Every taken sample must start with the JPEG SOI
    * marker: a true MPEG-4-Visual bitstream under `mp4v` fails that
    * check and returns None — undecodable beats silently wrong, and
    * real codec'd MP4s keep their explicit-empty policy. */
  def decodeMjpegMp4Frames(id: Long, bytes: Array[Byte],
      maxFrames: Int = 4): Option[Seq[FrameFeatures]] = {
    if (containerFormat(bytes) != "mp4") return None
    val JpegCodecs = Set("jpeg", "mjpa", "MJPG", "mp4v")
    var samples: Option[Array[(Long, Long)]] = None // (absOff, size)
    ContainerMeta.walkBoxesOf(bytes) { (typ, p, e) =>
      if (typ == "moov") ContainerMeta.walkBoxesIn(bytes, p, e) {
        (t2, p2, e2) =>
          if (t2 == "trak" && samples.isEmpty) {
            var codec = ""
            var sizes = Array.empty[Long]
            var chunkOffs = Array.empty[Long]
            var stsc = Array.empty[(Long, Long)] // (firstChunk, perChunk)
            ContainerMeta.walkBoxesIn(bytes, p2, e2) { (t3, p3, e3) =>
              if (t3 == "mdia") ContainerMeta.walkBoxesIn(bytes, p3, e3) {
                (t4, p4, e4) =>
                  if (t4 == "minf")
                    ContainerMeta.walkBoxesIn(bytes, p4, e4) {
                      (t5, p5, e5) =>
                        if (t5 == "stbl")
                          ContainerMeta.walkBoxesIn(bytes, p5, e5) {
                            (t6, p6, e6) => t6 match {
                              case "stsd" if e6 - p6 >= 16 =>
                                codec = new String(bytes, p6 + 12, 4,
                                  "US-ASCII")
                              case "stsz" if e6 - p6 >= 12 =>
                                val fixed = ContainerMeta.be32At(bytes,
                                  p6 + 4)
                                val n = ContainerMeta.be32At(bytes,
                                  p6 + 8).toInt
                                // fixed-size branch: n comes straight
                                // off untrusted bytes, so bound it like
                                // the variable/stco/stsc branches do —
                                // n samples of `fixed` bytes can't
                                // exceed the file, else a declared
                                // sample_count ~2^31 allocates GBs
                                // outside the try/catch (OOM Error)
                                sizes =
                                  if (fixed != 0) {
                                    if (n > 0 && fixed > 0 &&
                                        fixed * n.toLong <= bytes.length)
                                      Array.fill(n)(fixed)
                                    else Array.empty
                                  }
                                  else if (p6 + 12 + 4L * n <= e6 && n >= 0)
                                    Array.tabulate(n)(i => ContainerMeta
                                      .be32At(bytes, p6 + 12 + 4 * i))
                                  else Array.empty
                              case "stco" if e6 - p6 >= 8 =>
                                val n = ContainerMeta.be32At(bytes,
                                  p6 + 4).toInt
                                if (p6 + 8 + 4L * n <= e6)
                                  chunkOffs = Array.tabulate(n)(i =>
                                    ContainerMeta.be32At(bytes,
                                      p6 + 8 + 4 * i))
                              case "co64" if e6 - p6 >= 8 =>
                                val n = ContainerMeta.be32At(bytes,
                                  p6 + 4).toInt
                                if (p6 + 8 + 8L * n <= e6)
                                  chunkOffs = Array.tabulate(n)(i =>
                                    ContainerMeta.be64At(bytes,
                                      p6 + 8 + 8 * i))
                              case "stsc" if e6 - p6 >= 8 =>
                                val n = ContainerMeta.be32At(bytes,
                                  p6 + 4).toInt
                                if (p6 + 8 + 12L * n <= e6)
                                  stsc = Array.tabulate(n)(i => (
                                    ContainerMeta.be32At(bytes,
                                      p6 + 8 + 12 * i),
                                    ContainerMeta.be32At(bytes,
                                      p6 + 12 + 12 * i)))
                              case _ => ()
                            }
                          }
                    }
              }
            }
            if (JpegCodecs(codec) && sizes.nonEmpty &&
                chunkOffs.nonEmpty && stsc.nonEmpty) {
              // expand sample-to-chunk runs into absolute extents
              val out = Array.newBuilder[(Long, Long)]
              var si = 0
              var ci = 0
              while (ci < chunkOffs.length && si < sizes.length) {
                // samples-per-chunk = the stsc entry with the largest
                // first_chunk <= this (1-based) chunk
                val perChunk = stsc.takeWhile(_._1 <= ci + 1)
                  .lastOption.map(_._2).getOrElse(0L).toInt
                var off = chunkOffs(ci)
                var s = 0
                while (s < perChunk && si < sizes.length) {
                  out += ((off, sizes(si)))
                  off += sizes(si)
                  si += 1; s += 1
                }
                ci += 1
              }
              val ext = out.result()
              if (ext.nonEmpty) samples = Some(ext)
            }
          }
      }
    }
    val ext = samples.getOrElse(return None)
    val n = ext.length
    val take = math.min(maxFrames, n)
    javax.imageio.ImageIO.setUseCache(false)
    try {
      Some((0 until take).map { i =>
        val fi = (i.toLong * n / take).toInt
        val (off, len) = ext(fi)
        // bounds + JPEG SOI check per taken sample
        if (off < 0 || len < 2 || off + len > bytes.length ||
            (bytes(off.toInt) & 0xff) != 0xff ||
            (bytes(off.toInt + 1) & 0xff) != 0xd8) return None
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off.toInt, len.toInt))
        if (img == null) return None
        FrameFeatures(id, fi, n, img.getWidth, img.getHeight,
          lumaMean(img))
      })
    } catch { case _: Exception => None }
  }

  /** Per-partition frame feature extraction over (id, content): animated
    * GIFs ([[decodeGifFrames]]), MJPEG AVIs ([[decodeMjpegAviFrames]])
    * and MJPEG MP4s ([[decodeMjpegMp4Frames]]) decode for REAL;
    * everything else is skipped (no fake frames in the typed output —
    * the byte-slice stub below keeps the shape-only pipeline covered
    * for codec'd containers like H.264 MP4 / VP9 WebM). */
  def extractFrames(withBinary: DataFrame,
      maxFrames: Int = 4): Dataset[FrameFeatures] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeGifFrames(id, bytes, maxFrames)
          .orElse(decodeMjpegAviFrames(id, bytes, maxFrames))
          .orElse(decodeMjpegMp4Frames(id, bytes, maxFrames))
          .getOrElse(Seq.empty)
      })
  }

  /** Cheap container-format classification from magic bytes — no
    * decoder runs. Recognizes the image/audio/video containers a
    * training-data pipeline meets; anything else is `unknown`. */
  def containerFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) return "unknown"
    def ascii(off: Int, s: String): Boolean =
      bytes.length >= off + s.length &&
        s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    val b0 = bytes(0) & 0xff
    val b1 = bytes(1) & 0xff
    if (b0 == 0x89 && b1 == 'P') "png"
    else if (b0 == 0xff && b1 == 0xd8) "jpeg"
    else if (ascii(0, "GIF8")) "gif"
    else if (b0 == 'B' && b1 == 'M') "bmp"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else if (ascii(0, "RIFF") && ascii(8, "AVI ")) "avi"
    else if (ascii(0, "FORM") && ascii(8, "AIFF")) "aiff"
    else if (ascii(0, ".snd")) "au"
    else if (ascii(4, "ftyp")) "mp4"
    else if (b0 == 0x1a && b1 == 0x45 &&
      (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3)
      ebmlDocType(bytes)
    else if (ascii(0, "fLaC")) "flac"
    else if (ascii(0, "OggS")) "ogg"
    else if (ascii(0, "ID3") ||
      (b0 == 0xff && (b1 & 0xe0) == 0xe0)) "mp3"
    else "unknown"
  }

  /** Resolve an EBML container's real family: the 0x1A45DFA3 magic is
    * shared by ALL Matroska-family containers, so labelling every hit
    * "webm" would report .mkv rows under the webm bucket of the
    * dataset card. The DocType element (id 0x4282) inside the EBML
    * header names the family; "webm" stays webm, anything else (mkv's
    * "matroska", divergent strings, or an unparseable header) is
    * "matroska". Scans only the first 64 bytes — DocType sits in the
    * EBML header, which leads the file. */
  private[multimodal] def ebmlDocType(bytes: Array[Byte]): String = {
    val limit = math.min(bytes.length - 2, 64)
    var i = 4
    while (i < limit) {
      if ((bytes(i) & 0xff) == 0x42 && (bytes(i + 1) & 0xff) == 0x82) {
        val lead = bytes(i + 2) & 0xff
        val len = Integer.numberOfLeadingZeros(lead) - 24 + 1
        if (len >= 1 && len <= 4 && i + 2 + len <= bytes.length) {
          var size = (lead & (0xff >>> len)).toLong
          var j = 1
          while (j < len) { size = (size << 8) | (bytes(i + 2 + j) & 0xff); j += 1 }
          val start = i + 2 + len
          if (size >= 1 && size <= 16 && start + size <= bytes.length) {
            val s = new String(bytes, start, size.toInt,
              java.nio.charset.StandardCharsets.US_ASCII)
            return if (s == "webm") "webm" else "matroska"
          }
        }
        return "matroska"
      }
      i += 1
    }
    "matroska"
  }

  /** True when one of the engine's REAL decode paths extracts typed
    * features from the payload. Codec'd MP4 (H.264 etc.) and WebM and
    * unknown blobs are false by POLICY (explicit-empty, never
    * synthetic) — this predicate is what makes that gap measurable
    * instead of silent. MJPEG-in-MP4 decodes for real as of round 9. */
  def decodable(bytes: Array[Byte]): Boolean = containerFormat(bytes) match {
    case "png" | "jpeg" | "bmp" => decodeImage(0L, bytes).isDefined
    case "gif" => decodeImage(0L, bytes).isDefined ||
      decodeGifFrames(0L, bytes, 1).isDefined
    case "avi" => decodeMjpegAviFrames(0L, bytes, 1).isDefined
    case "mp4" => decodeMjpegMp4Frames(0L, bytes, 1).isDefined
    case "wav" | "aiff" | "au" => decodeAudio(0L, bytes).isDefined
    case _ => false
  }

  /** Per-container-format decodability profile over a binary column:
    * (format, n, n_undecodable) — the dataset-card exhibit that turns
    * the codec-less-container policy into a NUMBER a consumer can see
    * ("3,000 mp4 rows shipped with zero decoded frames") rather than an
    * empty array they must notice. One scan + one tiny groupBy; the
    * decode attempt per row is the same work [[extractFeatures]] /
    * [[frameSample]] would spend anyway. */
  def mediaProfile(withBinary: DataFrame,
      contentCol: String = "content"): DataFrame = {
    // ONE UDF, one binary-payload deserialization per row (three
    // separate UDFs each copy the byte array across the codegen
    // boundary — at 100 TB the copies dwarf the parsing). Container
    // metadata (MP4 box walk / EBML parse / FLAC-MP3-Ogg headers)
    // rides the same pass: even where the frame payload stays
    // undecodable by policy, duration is real parsed structure, so the
    // card reports how many undecodable rows still carry usable
    // metadata.
    val info = udf((b: Array[Byte]) => {
      val fmt = containerFormat(b)
      val dur = ContainerMeta.parse(b).flatMap(_.durationMs)
        .orElse(ContainerMeta.parseAudio(b).flatMap(_.durationMs))
      (fmt, decodable(b), dur)
    })
    withBinary
      .select(info(col(contentCol)).as("i"))
      .select(col("i._1").as("format"), col("i._2").as("ok"),
        col("i._3").as("dur"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_undecodable"),
        count(col("dur")).as("n_with_meta"),
        avg(col("dur")).as("mean_duration_ms"))
      .orderBy(col("format"))
  }

  /** Per-(format, codec) media profile — the dataset card's ONE-SCAN
    * media source: decodability counts ride with the container-parsed
    * codec id and duration, so the card reports both the format rollup
    * AND what the corpus's media actually contains (codec mix, total
    * playtime) without a second pass over the binary payloads. Codec is
    * "" where the container carries none (decodable image formats,
    * unparseable payloads); duration is the same parsed-structure field
    * [[mediaProfile]] reports. */
  def mediaCodecProfile(withBinary: DataFrame,
      contentCol: String = "content"): DataFrame = {
    val info = udf((b: Array[Byte]) => {
      val fmt = containerFormat(b)
      val video = ContainerMeta.parse(b)
      val audio = if (video.isEmpty) ContainerMeta.parseAudio(b) else None
      (fmt, decodable(b),
        video.flatMap(_.codec).orElse(audio.flatMap(_.codec)).getOrElse(""),
        video.flatMap(_.durationMs).orElse(audio.flatMap(_.durationMs)))
    })
    withBinary
      .select(info(col(contentCol)).as("i"))
      .select(col("i._1").as("format"), col("i._2").as("ok"),
        col("i._3").as("codec"), col("i._4").as("dur"))
      .groupBy(col("format"), col("codec"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_undecodable"),
        count(col("dur")).as("n_with_meta"),
        sum(col("dur")).as("total_duration_ms"))
      .orderBy(col("format"), col("codec"))
  }

  /** Container-level metadata as a column frame: (id, format, brand,
    * duration_ms, width, height, codec) for every row whose payload is
    * an ISO-BMFF or EBML container ([[ContainerMeta]]); rows of other
    * formats keep nulls (their REAL decode paths carry their typed
    * features). One projection, no shuffle — the 100 TB shape is a
    * map-side scan exactly like [[extractFeatures]]. */
  def videoMeta(withBinary: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ContainerMeta.parse(bytes) match {
          case Some(m) => (id, m.format, m.brand, m.durationMs,
            m.width, m.height, m.codec)
          case None => (id, containerFormat(bytes), null.asInstanceOf[String],
            None: Option[Long], None: Option[Int], None: Option[Int],
            None: Option[String])
        }
      })
      .toDF(idCol, "format", "brand", "duration_ms", "width", "height",
        "codec")
  }

  /** Fixed-count frame sampling as a COLUMN (the wide-row shape a
    * multimodal pipeline joins on, vs [[extractFrames]]'s long-form
    * Dataset): each row gains a `frames` array of real decoded frame
    * features — animated GIF and MJPEG-AVI, the containers a pure JVM
    * decodes — and `n_frames` = how many were sampled.
    *
    * Containers with no JDK codec (MP4, WebM, …) get an EXPLICIT empty
    * array / n_frames = 0, never synthetic frames: the same
    * undecodable-beats-silently-wrong policy as the audio PCM_SIGNED
    * gate. (Rounds ≤4 emitted equal-width byte slices as stand-in
    * "frames" here; a downstream consumer could not tell those from
    * decoded content, which is exactly the failure mode the policy
    * exists to prevent.) */
  def frameSample(withBinary: DataFrame, nFrames: Int = 4): DataFrame = {
    // the decoder id param only feeds FrameFeatures rows that are
    // discarded here (the caller's own id columns stay on the row), so
    // a constant keeps this working on ANY binary frame — no doc_id
    // column or castable-id precondition
    val sampler = udf { (bytes: Array[Byte]) =>
      decodeGifFrames(0L, bytes, nFrames)
        .orElse(decodeMjpegAviFrames(0L, bytes, nFrames))
        .map(_.map(f =>
          (f.frame_index, f.width, f.height, f.luma_mean)))
        .getOrElse(Seq.empty)
    }
    withBinary
      .withColumn("frames",
        sampler(col("content"))
          .cast("array<struct<frame_index:int,width:int,height:int," +
            "luma_mean:double>>"))
      .withColumn("n_frames", size(col("frames")))
  }
}
