package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition so a real codec drops in without
  * touching the pipeline shape.
  *
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * [[fakeDecode]] derives deterministic pseudo-features from the bytes
  * (documented below). Everything around it — schema, batching,
  * partition-level execution, feature join-back — is the real Spark
  * plumbing and is tested.
  */
object Multimodal extends Serializable {

  /** Typed media metadata carried alongside the payload. */
  final case class MediaMeta(mime: String, n_bytes: Long)

  final case class MediaFeatures(
      doc_id: Long,
      width: Int, height: Int,          // stub: derived, not decoded
      byte_entropy: Double,             // real: Shannon entropy of bytes
      luma_mean: Double)                // stub: mean byte as fake luma

  /** Attach a binary payload column + metadata struct. In this testbed the
    * "media" bytes are the document text encoded UTF-8; in production this
    * column comes straight from the source (parquet/delta binary). */
  def attachBinary(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(textCol).cast("binary").as("content"))
      .withColumn("meta", struct(lit("application/octet-stream").as("mime"),
        length(col("content")).cast("long").as("n_bytes")))

  /** ??? — REAL DECODER GOES HERE. Deterministic fake: dimensions from a
    * rolling byte hash, luma = mean byte value. Byte entropy is computed
    * for real (it only needs the bytes). */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 1125899906842597L
    var i = 0
    var sum = 0L
    val hist = new Array[Long](256)
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      sum += bytes(i) & 0xff
      hist(bytes(i) & 0xff) += 1
      i += 1
    }
    val n = math.max(1, bytes.length)
    var ent = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; ent -= p * math.log(p) / math.log(2) }
    }
    MediaFeatures(id,
      width = 64 + (math.abs(h) % 1024).toInt,
      height = 64 + (math.abs(h >> 10) % 1024).toInt,
      byte_entropy = ent,
      luma_mean = sum.toDouble / n)
  }

  /** Per-partition feature extraction over (id, content) — the decode
    * batches by partition, so a vectorized/codec-backed implementation
    * slots in without replanning. */
  def extractFeatures(withBinary: DataFrame): Dataset[MediaFeatures] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
  }

  /** Fixed-count frame sampling from a byte stream (stub: equal-width byte
    * slices standing in for decoded frames; shape + determinism are what
    * the pipeline tests). */
  def frameSample(withBinary: DataFrame, nFrames: Int = 4): DataFrame = {
    val slicer = udf { (bytes: Array[Byte]) =>
      val step = math.max(1, bytes.length / nFrames)
      (0 until nFrames).map { f =>
        val from = math.min(f * step, math.max(0, bytes.length - 1))
        val until = math.min(from + 16, bytes.length)
        java.util.Arrays.copyOfRange(bytes, from, until)
      }
    }
    withBinary.withColumn("frames", slicer(col("content")))
      .withColumn("n_frames", size(col("frames")))
  }
}
