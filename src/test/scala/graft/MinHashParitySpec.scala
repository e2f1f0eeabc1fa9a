package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The native [[graft.expressions.MinHashSignature]] kernel must be
  * BIT-IDENTICAL to the composed built-in formulation
  * `min(xxhash64(xxhash64(sh), i))` it replaced — persisted LSH indexes
  * were written under that hash family, and a silent drift would
  * orphan every index on disk while the banded joins kept "working"
  * against freshly-signed batches. */
class MinHashParitySpec extends GraftSuite {
  import spark.implicits._

  /** The pre-kernel formulation, verbatim: explode → 32 min-aggregates. */
  private def composedSignatures(numHashes: Int): Map[Long, Seq[Long]] = {
    val docs = Tables.documents(spark, sf)
    val exploded = docs.select($"doc_id".as("id"),
        explode(Dedup.shingles($"text", 3)).as("sh"))
      .select($"id", xxhash64($"sh").as("h"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64($"h", lit(i.toLong))).as(s"h$i"))
    exploded.groupBy($"id")
      .agg(mins.head, mins.tail: _*)
      .select($"id",
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
  }

  test("native kernel == composed formulation, bit for bit, every doc") {
    val native = Dedup
      .minhashSignatures(Tables.documents(spark, sf), "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    val composed = composedSignatures(32)
    assert(native.keySet === composed.keySet)
    native.foreach { case (id, sig) =>
      assert(sig === composed(id), s"signature drift on doc $id") }
  }

  test("short and empty docs still index through the whole-text " +
      "fallback shingle, exactly as the exploded form did") {
    // shingles() emits >= 1 shingle for ANY text (greatest(1, ...)), so
    // the exploded form never dropped a doc; the kernel must not either
    val docs = Seq((1L, "one two three four"), (2L, ""), (3L, "a b"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(docs, "doc_id", "text")
    assert(idx.select($"id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    // and their signatures match the composed formulation too
    val composed = docs.select($"doc_id".as("id"),
        explode(Dedup.shingles($"text", 3)).as("sh"))
      .select($"id", xxhash64($"sh").as("h"))
      .groupBy($"id")
      .agg(array((0 until 32).map(i =>
        min(xxhash64($"h", lit(i.toLong)))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    idx.select($"id", $"signature").as[(Long, Seq[Long])].collect()
      .foreach { case (id, sig) => assert(sig === composed(id)) }
  }

  test("signatures-only path and the index agree doc by doc — a batch " +
      "signed by the kernel joins a persisted aggregate-form index") {
    val docs = Tables.documents(spark, sf).limit(200)
    val viaKernel = Dedup.minhashSignatures(docs, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    val viaIndex = Dedup.minhashIndex(docs, "doc_id", "text")
      .select($"id", $"signature")
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel === viaIndex)
  }
}
