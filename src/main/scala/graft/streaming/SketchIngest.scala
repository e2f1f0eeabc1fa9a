package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Sketches

/** STREAMING cardinality monitor: document files land in a directory;
  * each micro-batch appends one tiny per-group HLL sketch row to the
  * persisted artifact ([[Sketches.appendSketches]]), and "how many
  * distinct keys has this corpus ever seen" is answered from the
  * artifact alone at any moment — never by rescanning ingested data.
  *
  * Same design stance as [[DocIngest]]: the mutable state is the
  * PERSISTED APPEND-ONLY ARTIFACT, not Spark's state store —
  * `foreachBatch` because the sketch must outlive the query, be
  * shared with batch jobs (`graft.Main sketch-ingest` drives the same
  * append), and cost O(groups) rows per batch regardless of batch
  * size. foreachBatch is AT-LEAST-ONCE: a crash after the artifact
  * write but before the checkpoint commit replays the batch on
  * restart. The append absorbs that — each batch writes its own
  * `batch_id=<id>` partition directory with overwrite, so a replay
  * REPLACES the batch's rows rather than duplicating them (exact
  * `n_rows` sums stay honest, and the spec replays this). HLL
  * estimates tolerate re-ingest regardless — union never
  * double-counts — so even a checkpoint loss degrades to sketch-error
  * noise, not corruption. */
object SketchIngest {

  /** Start the sketch stream over `srcDir` (parquet files with
    * (groupCol, keyCol) columns). The streaming batch id is the
    * artifact's batch_id. */
  def start(spark: SparkSession, srcDir: String, sketchDir: String,
      checkpointDir: String, groupCol: String = "source",
      keyCol: String = "doc_id", lgK: Int = 12,
      oneFilePerBatch: Boolean = false): StreamingQuery =
    FileIngest.stream(spark, srcDir, checkpointDir, oneFilePerBatch) {
      (batch, batchId) =>
        Sketches.appendSketches(batch, groupCol, keyCol, sketchDir,
          batchId, lgK)
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"[sketch-ingest] batch=$batchId -> $sketchDir")
    }

  /** Drain the current backlog and stop (replay/backfill harness). */
  def runToCompletion(spark: SparkSession, srcDir: String,
      sketchDir: String, checkpointDir: String,
      groupCol: String = "source", keyCol: String = "doc_id",
      oneFilePerBatch: Boolean = true): Unit =
    FileIngest.drain(start(spark, srcDir, sketchDir, checkpointDir,
      groupCol, keyCol, oneFilePerBatch = oneFilePerBatch))
}
