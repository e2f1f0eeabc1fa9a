package graft

import org.apache.spark.sql.functions._

import graft.expressions.NfcNormalize

/** The native NFC normalization expression: Unicode-standard parity
  * with java.text.Normalizer, null handling, SQL registration, and the
  * dedup-key use case it exists for. */
class NfcNormalizeSpec extends GraftSuite {
  import spark.implicits._

  // same visible text, different bytes: NFD (base + combining mark)
  // vs NFC (precomposed) - built from explicit escapes so no editor
  // normalization can silently merge them
  private val decomposed = "cafe\u0301 a\u0301 e\u0308"
  private val composed = "caf\u00e9 \u00e1 \u00eb"

  test("decomposed text composes to the NFC form; normalized text " +
      "passes through unchanged") {
    val out = Seq(decomposed, composed, "plain ascii", "")
      .toDF("s").select(NfcNormalize($"s").as("n"))
      .as[String].collect().toSeq
    assert(out(0) === composed)
    assert(out(1) === composed)
    assert(out(2) === "plain ascii")
    assert(out(3) === "")
    // parity with the reference implementation on every case
    out.zip(Seq(decomposed, composed, "plain ascii", "")).foreach {
      case (got, in) =>
        assert(got === java.text.Normalizer.normalize(in,
          java.text.Normalizer.Form.NFC))
    }
  }

  test("null in, null out; SQL registration serves the same kernel") {
    val df = Seq(Some(decomposed), None).toDF("s")
    val viaCol = df.select(NfcNormalize($"s").as("n")).collect()
    assert(viaCol(0).getString(0) === composed)
    assert(viaCol(1).isNullAt(0))
    NfcNormalize.register(spark)
    df.createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql("SELECT nfc_normalize(s) AS n FROM nfc_in")
      .collect()
    assert(viaSql(0).getString(0) === composed)
    assert(viaSql(1).isNullAt(0))
  }

  test("the use case: hash-dedup keys agree across composed and " +
      "decomposed inputs only AFTER normalization") {
    val docs = Seq((1L, decomposed), (2L, composed)).toDF("doc_id", "text")
    val rawKeys = docs.select(sha2($"text".cast("binary"), 256))
      .distinct().count()
    assert(rawKeys === 2L) // same visible text, different bytes
    val normKeys = docs
      .select(sha2(NfcNormalize($"text").cast("binary"), 256))
      .distinct().count()
    assert(normKeys === 1L) // normalization closes the dedup miss
  }

  test("non-BMP text (surrogate pairs) survives normalization intact") {
    val emoji = "mixed 😀 text énd"
    val out = Seq(emoji).toDF("s")
      .select(NfcNormalize($"s")).as[String].head()
    assert(out === java.text.Normalizer.normalize(emoji,
      java.text.Normalizer.Form.NFC))
    assert(out.contains("😀"))
  }
}
