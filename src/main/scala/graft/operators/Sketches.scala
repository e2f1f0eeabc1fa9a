package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distinct-count sketches with a persisted, APPEND-ONLY artifact
  * lifecycle — the cardinality companion of the PCA moments artifact
  * (`ml/Pca.scala`): each ingested batch contributes one tiny row of
  * per-group DataSketches-HLL binaries, and "how many distinct keys has
  * this corpus ever seen" is answered from the artifact alone — never by
  * rescanning 100 TB of history.
  *
  * Accuracy semantics: HLL union never double-counts a key (registers
  * combine by max), so re-ingesting a batch cannot inflate the estimate
  * beyond sketch error. The DataSketches binary does carry sparse→dense
  * mode state, so the ESTIMATE is only stable within the sketch's error
  * bound under different union shapes — not bit-identical (measured:
  * 500 true distinct → 491 vs 499 across union multiplicities). That is
  * why the registry-gated query (q134) uses Spark's built-in
  * `approx_count_distinct` (dense-register HLL++, elementwise-max merge
  * — bit-invariant to partitioning) and THIS artifact surface is gated
  * by tolerance specs instead. approx_percentile's merge-order-sensitive
  * Greenwald-Khanna summaries are deliberately not registered at all.
  */
object Sketches extends Serializable {

  /** Per-group HLL sketch of `keyCol`: one binary sketch row per group.
    * `lgK` trades size for accuracy (2^lgK registers; 12 → ~1.6 kB,
    * ~2.5% standard error). One shuffle on the group key; the output is
    * #groups rows regardless of input size. */
  def groupSketches(df: DataFrame, groupCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol).as("group"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Append one batch's per-group sketches to the artifact at `path`,
    * as the Hive-style partition directory `batch_id=<id>` — written
    * with OVERWRITE on that directory, so the append is IDEMPOTENT per
    * batch id: a foreachBatch replay after a crash between the write
    * and the checkpoint commit (streaming's at-least-once window)
    * replaces the batch's rows instead of duplicating them, which
    * keeps [[estimateFromArtifact]]'s exact `n_rows` sum honest (the
    * HLL estimates tolerate duplicates anyway — union is register-max).
    * The artifact only ever grows by batch directories; nothing is
    * read back during ingest. */
  def appendSketches(df: DataFrame, groupCol: String, keyCol: String,
      path: String, batchId: Long, lgK: Int = 12): Unit =
    groupSketches(df, groupCol, keyCol, lgK)
      .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Distinct-count estimates from the artifact alone: union every
    * batch's sketch per group (register-max — order never matters) and
    * estimate. Reading cost is O(batches × groups) tiny rows. */
  def estimateFromArtifact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("group"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("distinct_estimate"),
        sum(col("n_rows")).as("n_rows"),
        countDistinct(col("batch_id")).as("n_batches"))

  /** Corpus-wide estimate across ALL groups from the artifact (one
    * union over every stored sketch — group splits don't double-count
    * shared keys because union is idempotent per key). */
  def globalEstimate(spark: SparkSession, path: String): Long =
    spark.read.parquet(path)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))))
      .head().getLong(0)
}
