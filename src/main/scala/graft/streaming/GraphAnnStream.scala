package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.GraphAnnIndex

/** STREAMING graph-ANN ingest (VERDICT r15 #7 — the last index family
  * without a streaming face): embedding batch files land in a
  * directory and every micro-batch is search-then-link appended into
  * the persisted graph-ANN index
  * ([[GraphAnnIndex.ingestBatch]] — the q240 protocol: entry-frame
  * routing, beam-search placement, reverse-link merge, serving-layout
  * refresh), exactly what `ann-ingest`'s streaming twins (DocIngest /
  * VecIngest) do for the dedup and IVF/PQ families. Per arriving
  * batch the cost is the append face's: entryCand entry scores +
  * hops·beam·k stored edges per new vector + one keyed merge —
  * independent of how large the already-indexed corpus has grown.
  *
  * Idempotence: foreachBatch is at-least-once, and this sink MUTATES
  * the index rather than writing batch-keyed partition dirs, so the
  * replay key is the data itself — batch ids are disjoint from the
  * corpus by the ingest contract, so a replayed batch whose ids are
  * ALL already indexed is recognized as committed and skipped (the
  * same observable end state as never replaying). A PARTIALLY present
  * batch can only mean a crash inside the multi-artifact swap
  * sequence — state the strict contract cannot repair — and fails
  * fast with that diagnosis instead of double-linking the remainder
  * (GraphAnnCliSpec pins skip, equality to sequential batch ingests,
  * and checkpoint-replay no-ops). */
object GraphAnnStream {

  def runToCompletion(spark: SparkSession, srcDir: String,
      indexDir: String, checkpointDir: String, beam: Int = 4,
      hops: Int = 4, refreshEntries: Boolean = false,
      oneFilePerBatch: Boolean = true): Unit = {
    // fail fast BEFORE draining if no index exists — an absent index
    // would otherwise fail inside the first micro-batch with the
    // checkpoint already holding its offset
    GraphAnnIndex.readMeta(spark, indexDir)
    FileIngest.drain(
      FileIngest.stream(spark, srcDir, checkpointDir, oneFilePerBatch) {
        (batch, batchId) =>
          val ids = batch.select(col("vec_id").cast("long").as("id"))
            .persist()
          val nBatch = ids.count()
          val nPresent = ids.join(
            spark.read.parquet(s"$indexDir/vectors").select(col("id")),
            Seq("id"), "left_semi").count()
          if (nPresent == nBatch && nBatch > 0L)
            // at-least-once replay of a committed batch: every id is
            // already indexed — skipping reproduces exactly the
            // no-replay end state
            System.err.println(s"[graph-ann-stream] batch $batchId " +
              s"already applied ($nBatch ids) — skipped")
          else {
            require(nPresent == 0L,
              s"batch $batchId is PARTIALLY indexed ($nPresent of " +
                s"$nBatch ids) — a crash inside a previous apply's " +
                "artifact-swap sequence; rebuild the index " +
                "(graph-ann-build) before resuming the stream")
            val (nNew, _) = GraphAnnIndex.ingestBatch(spark, batch,
              indexDir, beam, hops, refreshEntries)
            System.err.println(s"[graph-ann-stream] batch $batchId " +
              s"appended $nNew vectors")
          }
          ids.unpersist()
      })
  }

  /** The grown index's corpus copy — the quick "what has the stream
    * indexed so far" read. */
  def indexedVectors(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/vectors")
}
