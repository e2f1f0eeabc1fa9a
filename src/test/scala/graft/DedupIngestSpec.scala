package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The production ingest loop: each batch dedups against the GROWING
  * persisted index — batch 2 must catch its clones of batch-1 documents
  * from the index alone (batch-1 text is never re-read), survivors
  * append, and the geometry guard rejects a mismatched banding. */
class DedupIngestSpec extends GraftSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  test("two-batch ingest: cross dups caught from the index, not the text") {
    val indexDir = Files.createTempDirectory("graft_ing_idx").toString + "/idx"
    val out1 = Files.createTempDirectory("graft_ing_o1").toString
    val out2 = Files.createTempDirectory("graft_ing_o2").toString

    val batch1 = docs.filter($"doc_id" < 40)
    val (c1, _, k1) = Dedup.ingest(spark, batch1, indexDir, out1,
      threshold = 0.5)
    assert(c1 === 0L) // bootstrap: no index yet, so no cross pairs
    assert(k1 > 0L)
    val keptIds1 = spark.read.parquet(s"$out1/kept")
      .select($"doc_id").as[Long].collect().toSet

    // batch 2: 5 exact clones of batch-1 SURVIVORS (new ids) + fresh docs
    val cloneSrc = docs.filter($"doc_id".isin(
      keptIds1.toSeq.sorted.take(5).map(Long.box): _*))
    val clones = cloneSrc.select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val fresh = docs.filter($"doc_id" >= 40 && $"doc_id" < 60)
    val batch2 = clones.unionAll(fresh)
    val (c2, _, k2) = Dedup.ingest(spark, batch2, indexDir, out2,
      threshold = 0.5)
    // every clone is caught against the PERSISTED index — no batch-1 text
    // is an input to ingest() here, only indexDir
    val crossNewIds = spark.read.parquet(s"$out2/cross_pairs")
      .select($"new_id").as[Long].collect().toSet
    assert(keptIds1.toSeq.sorted.take(5).map(_ + 100000L).toSet
      .subsetOf(crossNewIds), s"clones not caught: $crossNewIds")
    assert(c2 >= 5L)
    // clones are dropped from kept; fresh docs survive
    val keptIds2 = spark.read.parquet(s"$out2/kept")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptIds2.forall(_ < 100000L))
    assert(k2 === keptIds2.size.toLong)

    // the index grew append-only: batch-1 survivors + batch-2 survivors
    val idx = Dedup.readIndex(spark, indexDir)
    assert(idx.count() === k1 + k2)

    // RETRY idempotence (redelivery / crash between index append and a
    // streaming checkpoint commit): re-ingesting batch 2 must not match
    // docs against their own now-indexed signatures (which would empty
    // kept) and must not double their signatures in the index
    val out2b = Files.createTempDirectory("graft_ing_o2b").toString
    val (_, _, k2b) = Dedup.ingest(spark, batch2, indexDir, out2b,
      threshold = 0.5)
    assert(k2b === k2) // same survivors, not zero
    assert(spark.read.parquet(s"$out2b/kept").select($"doc_id")
      .as[Long].collect().toSet === keptIds2)
    assert(Dedup.readIndex(spark, indexDir).count() === k1 + k2) // no dupes

    // geometry guard: a third ingest with mismatched numHashes refuses
    val out3 = Files.createTempDirectory("graft_ing_o3").toString
    val e = intercept[IllegalArgumentException] {
      Dedup.ingest(spark, fresh, indexDir, out3, numHashes = 16)
    }
    assert(e.getMessage.contains("geometry"))
  }
}
