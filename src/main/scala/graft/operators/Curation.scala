package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The nightly corpus build as ONE composition — the q143 pipeline
  * carried through to artifacts: Gopher gate → exact-dedup
  * keep-canonical → content-keyed split → per-split SHUFFLED SHARDS +
  * integrity manifests + the dataset card. Pure composition of the
  * engine's lifecycle operators; `graft.Main curate` is a thin wrapper.
  *
  * Determinism: every stage is a pure function of the input bytes
  * (gate = expressions, dedup = min-id per text, split = sha2, shard
  * order = xxhash64(id, seed)), so a re-run over the same corpus
  * rebuilds byte-identical shard CONTENT — the manifests' checksums
  * prove it without row-by-row comparison. */
object Curation {

  /** Run the build. Output layout: `outDir/split=<s>/` shards,
    * `outDir/manifest_<s>/` manifests, `outDir/card.json`. Returns the
    * per-split kept-document counts.
    *
    * The card carries TWO explicitly-keyed profiles: `input_profile`
    * (the raw corpus as handed in — what the build consumed) and
    * `curated_profile` (the gated+deduped frame the shards were
    * written from — what the directory actually ships). A single
    * raw-corpus card next to curated shards would let a consumer
    * mistake pre-gate stats (n_docs, dup rates, splits) for the
    * shipped dataset's; the curated profile's `splits` agree with the
    * shard manifests beside it by construction (split is a pure
    * function of text, recomputed over the same curated rows). */
  /** The build's admission gate + exact-dedup canonicalization + split
    * assignment — shared verbatim by the full build and the append
    * path, so an appended document faces the IDENTICAL pipeline a
    * full rebuild would apply. */
  private[graft] def gateDedupSplit(docs: DataFrame): DataFrame = {
    val gated = docs
      .withColumn("g", TextFunctions.gopherFlags(
        col("text"), minWords = 40, maxWords = 100000,
        stopwords = Seq("the", "a"), minStopHits = 2))
      .filter(col("g.keep")).drop("g")
    val canonical = Dedup.exact(gated, "doc_id", "text")
      .select(col("doc_id"))
    Sampling.contentSplit(gated.join(canonical, "doc_id"), "text")
  }

  private def writeSplits(spark: SparkSession, split: DataFrame,
      outDir: String, rowsPerShard: Long, seed: Long,
      append: Boolean): Map[String, Long] = {
    val counts = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.toSeq.sortBy(_._1).foreach { case (sp, n) =>
      val dir = s"$outDir/split=$sp"
      Sampling.writeShuffledShards(
        split.filter(col("split") === sp).drop("split"),
        "doc_id", dir, seed = seed, rowsPerShard = rowsPerShard,
        expectedRows = n, append = append)
      graft.io.Sinks.writeParquet(
        Sampling.shardManifest(spark, dir, "doc_id"),
        s"$outDir/manifest_$sp")
    }
    counts
  }

  private def writeCard(input: DataFrame, curated: DataFrame,
      outDir: String, nBatches: Long, lastBatchAdded: Long): Unit = {
    // growth provenance: how many curate/append batches built this
    // directory and how many documents the LAST one admitted — the
    // audit fields that distinguish "one clean rebuild" from "a year
    // of increments" on otherwise content-identical corpora
    val card =
      s"""{"input_profile":${CorpusReport.report(input)},""" +
        s""""curated_profile":${CorpusReport.report(curated)},""" +
        s""""provenance":{"n_batches":$nBatches,""" +
        s""""last_batch_added":$lastBatchAdded}}"""
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/card.json"), card + "\n")
  }

  /** Batch count recorded in an existing card, if any: 0 for a fresh
    * directory; a pre-provenance card (older layout) counts as 1
    * completed batch. */
  private def priorBatches(outDir: String): Long = {
    val p = java.nio.file.Paths.get(s"$outDir/card.json")
    if (!java.nio.file.Files.exists(p)) 0L
    else """"n_batches":(\d+)""".r
      .findFirstMatchIn(java.nio.file.Files.readString(p))
      .map(_.group(1).toLong).getOrElse(1L)
  }

  /** The curated corpus as shipped: every existing split directory read
    * back as one frame. */
  private def readShipped(spark: SparkSession,
      outDir: String): Option[DataFrame] = {
    val dirs = Seq("train", "val", "test")
      .map(sp => s"$outDir/split=$sp")
      .filter(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  def curate(spark: SparkSession, docs: DataFrame, outDir: String,
      rowsPerShard: Long, seed: Long = 42L): Map[String, Long] = {
    val split = gateDedupSplit(docs).persist()
    val counts = writeSplits(spark, split, outDir, rowsPerShard, seed,
      append = false)
    writeCard(docs, split.drop("split"), outDir, nBatches = 1L,
      lastBatchAdded = counts.values.sum)
    split.unpersist()
    counts
  }

  /** Incremental build: grow a curated directory with ONLY the
    * new-content documents of a fresh snapshot (or batch), never
    * rescanning or rewriting what's already shipped. The persisted
    * state IS the shard directories: [[Dedup.snapshotDiff]] against
    * their text column classifies every incoming row, and only
    * `added` content (bytes unseen in the curated state) proceeds
    * through the SAME gate → dedup → split pipeline, landing as
    * additional shard files (existing shards are immutable;
    * manifests and the dataset card are recomputed over the grown
    * directory). Grow-only: content that disappeared from the new
    * snapshot stays shipped — removal is a rebuild, not an append.
    *
    * Cost at 100 TB: one hash-join of the batch against the curated
    * DISTINCT content hashes plus the batch-sized pipeline — the
    * history is read once for its hash column (a pruned single-column
    * scan), never re-gated, re-deduped, or re-written. The curated
    * RESULT is content-identical to a full rebuild over the grown
    * corpus (same gate, same content-keyed dedup and split), which is
    * exactly what the append-vs-rebuild card equality in CurationSpec
    * proves; only doc-id choices among exact duplicates may differ
    * (append keeps the incumbent canonical, a rebuild may pick a
    * lower-id newcomer). Returns the per-split counts of APPENDED
    * documents. */
  def curateAppend(spark: SparkSession, newDocs: DataFrame,
      outDir: String, rowsPerShard: Long,
      seed: Long = 42L): Map[String, Long] = {
    val shipped = readShipped(spark, outDir).getOrElse(
      return curate(spark, newDocs, outDir, rowsPerShard, seed))
    val batches = priorBatches(outDir)
    val added = Dedup.snapshotDiff(shipped, newDocs, "text")
      .filter(col("diff_status") === "added").drop("diff_status")
    val split = gateDedupSplit(added).persist()
    val counts = writeSplits(spark, split, outDir, rowsPerShard, seed,
      append = true)
    split.unpersist()
    val grown = readShipped(spark, outDir).get
    writeCard(newDocs, grown, outDir, nBatches = batches + 1L,
      lastBatchAdded = counts.values.sum)
    counts
  }
}
