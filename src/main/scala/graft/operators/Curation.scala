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
  def curate(spark: SparkSession, docs: DataFrame, outDir: String,
      rowsPerShard: Long, seed: Long = 42L): Map[String, Long] = {
    val gated = docs
      .withColumn("g", TextFunctions.gopherFlags(
        col("text"), minWords = 40, maxWords = 100000,
        stopwords = Seq("the", "a"), minStopHits = 2))
      .filter(col("g.keep")).drop("g")
    val canonical = Dedup.exact(gated, "doc_id", "text")
      .select(col("doc_id"))
    val split = Sampling
      .contentSplit(gated.join(canonical, "doc_id"), "text")
      .persist()
    val counts = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.toSeq.sortBy(_._1).foreach { case (sp, n) =>
      val dir = s"$outDir/split=$sp"
      Sampling.writeShuffledShards(
        split.filter(col("split") === sp).drop("split"),
        "doc_id", dir, seed = seed, rowsPerShard = rowsPerShard,
        expectedRows = n)
      graft.io.Sinks.writeParquet(
        Sampling.shardManifest(spark, dir, "doc_id"),
        s"$outDir/manifest_$sp")
    }
    val card = s"""{"input_profile":${CorpusReport.report(docs)},""" +
      s""""curated_profile":${CorpusReport.report(split.drop("split"))}}"""
    split.unpersist()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/card.json"), card + "\n")
    counts
  }
}
