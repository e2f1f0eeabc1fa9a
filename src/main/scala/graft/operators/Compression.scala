package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: deflate(text) / |text| — the
  * classic repetition detector for pretraining corpora (boilerplate,
  * looped spam and template farms compress far below natural prose;
  * random/encrypted blobs refuse to compress at all). One number per
  * document, one linear pass, no model to fit — the cheap companion to
  * the n-gram repetition profile (q97) and the Gopher gates (q121).
  *
  * Determinism: Deflater output is a pure function of (bytes, level,
  * strategy) for a given zlib build, so the signal is
  * partitioning/replay-stable but engine-specific → rows-only at the
  * gate (no SQL engine deflates), same class as the SimHash family.
  */
object Compression extends Serializable {

  /** Deflated byte count of a payload (raw deflate, no gzip header —
    * headers would put a floor under tiny docs). */
  def deflateLen(bytes: Array[Byte], level: Int = 6): Long = {
    if (bytes.isEmpty) return 0L
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** compressed/raw ratio of the UTF-8 text; 1.0 for empty docs (an
    * empty doc carries no repetition evidence either way). */
  def ratio(text: String, level: Int = 6): Double = {
    if (text == null || text.isEmpty) return 1.0
    val bytes = text.getBytes("UTF-8")
    deflateLen(bytes, level).toDouble / bytes.length
  }

  /** Per-document compression profile: (idCol, n_bytes, ratio, keep)
    * with `keep` the band gate [lo, hi] — below lo is degenerate
    * repetition, above hi is non-text noise. Ratio rounded to 4 dp so
    * the row set is hash-stable. One scan, no shuffle. */
  def profile(docs: DataFrame, idCol: String, textCol: String,
      lo: Double = 0.25, hi: Double = 0.95): DataFrame = {
    val r = udf((text: String) => ratio(text))
    docs
      .select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        round(r(col(textCol)), 4).as("ratio"))
      .withColumn("keep", col("ratio").between(lo, hi))
  }
}
