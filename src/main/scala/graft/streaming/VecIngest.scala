package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.operators.{IvfIndex, PqIndex}

/** STREAMING vector ingest: embedding files arriving in a directory are
  * appended to the persisted ANN indexes per micro-batch — the vector
  * twin of [[DocIngest]]. Each batch is bucket-assigned under the
  * STORED IVF centroids and encoded under the STORED PQ codebook
  * ([[IvfIndex.appendVectors]] / [[PqIndex.appendVectors]]): O(batch)
  * work, no retraining, the indexed corpus is never re-read, and the
  * checkpoint makes file delivery effectively-once, so a restarted
  * query resumes appending exactly where it stopped.
  *
  * Serving continues from the same artifacts between batches — an
  * `ann-query` against the index simply sees more candidates after the
  * next batch commits. Centroid/codebook drift is the standard IVF/PQ
  * trade: retrain (`ann-index`) when recall floors degrade.
  *
  * IDEMPOTENCY under streaming's at-least-once window (crash after the
  * append, before the checkpoint commit → the batch is redelivered):
  * both appends anti-join the batch against the index's pruned id
  * column, so a replayed batch appends nothing (DocIngestSpec replays a
  * batch through a deleted commit marker and proves cardinality and
  * served top-k unchanged). This is the id-keyed equivalent of
  * [[SketchIngest]]'s batch_id-partition overwrite; the batch-directory
  * form was evaluated and rejected HERE because these artifacts are
  * already partition-structured (`buckets/bucket=N`) — nesting a
  * `batch_id=` level inside them changes the on-disk layout, breaks
  * partition discovery against every existing index, and costs a
  * legacy-migration path, while the anti-join reads one pruned id
  * column (~8 B/row encoded) per micro-batch and keeps the layout. */
object VecIngest {

  /** Start the ingest stream over `srcDir` (parquet embedding files
    * with (idCol, vecCol) columns; globally unique ids). Appends each
    * batch to whichever persisted indexes exist under `indexDir`
    * (`ivf/`, `ivf_l2/`, `pq/` — the layout `ann-index` writes). */
  def start(spark: SparkSession, srcDir: String, indexDir: String,
      checkpointDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding",
      oneFilePerBatch: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir), spark.sparkContext.hadoopConfiguration)
    def has(sub: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/$sub"))
    // Fail fast BEFORE the query starts: with no index present the
    // foreachBatch body would do nothing while the checkpoint still
    // marks the files consumed — a mistyped indexDir would silently
    // lose every batch from every index, unrecoverably.
    require(has("ivf") || has("ivf_l2") || has("pq"),
      s"no index found under $indexDir (expected ivf/, ivf_l2/ or pq/ " +
        "— run ann-index first)")
    FileIngest.stream(spark, srcDir, checkpointDir, oneFilePerBatch) {
      (batch, batchId) =>
        if (has("ivf"))
          IvfIndex.appendVectors(spark, s"$indexDir/ivf", batch,
            idCol, vecCol)
        if (has("ivf_l2"))
          IvfIndex.appendVectors(spark, s"$indexDir/ivf_l2", batch,
            idCol, vecCol)
        if (has("pq"))
          PqIndex.appendVectors(spark, s"$indexDir/pq", batch,
            idCol, vecCol)
        org.slf4j.LoggerFactory.getLogger(getClass)
          .info(s"[vec-ingest] batch=$batchId appended")
    }
  }

  /** Drain the current backlog and stop ([[Trigger.AvailableNow]]) —
    * the replay/backfill harness; production keeps the query running. */
  def runToCompletion(spark: SparkSession, srcDir: String,
      indexDir: String, checkpointDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      oneFilePerBatch: Boolean = true): Unit =
    FileIngest.drain(start(spark, srcDir, indexDir, checkpointDir,
      idCol, vecCol, oneFilePerBatch = oneFilePerBatch))
}
