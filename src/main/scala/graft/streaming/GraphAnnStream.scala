package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.GraphAnnIndex

/** STREAMING graph-ANN ingest (VERDICT r15 #7 — the last index family
  * without a streaming face): embedding batch files land in a
  * directory and every micro-batch is search-then-link appended into
  * the persisted graph-ANN index
  * ([[GraphAnnIndex.ingestOutcome]] — the q240 protocol: entry-frame
  * routing, beam-search placement, reverse-link merge, serving-layout
  * refresh), exactly what `ann-ingest`'s streaming twins (DocIngest /
  * VecIngest) do for the dedup and IVF/PQ families. Per-batch COMPUTE
  * is the append face's — entryCand entry scores + hops·beam·k stored
  * edges per new vector + one keyed merge, independent of corpus
  * size — but the ARTIFACT REWRITE is not: each drained batch
  * rewrites the corpus copy, the merged edge list and the pre-joined
  * adjacency (O(N·k) parquet I/O), so micro-batches must be sized to
  * amortize it — at a large indexed corpus, drain accumulated files
  * per trigger rather than one-file-per-batch (`oneFilePerBatch`
  * exists for deterministic replay in specs, not as the production
  * cadence).
  *
  * Idempotence: foreachBatch is at-least-once, and this sink MUTATES
  * the index rather than writing batch-keyed partition dirs, so the
  * replay key is the data itself, adjudicated by
  * [[GraphAnnIndex.ingestOutcome]]'s commit protocol (adj is the
  * commit marker; presence is monotone down the swap chain): a
  * committed batch is SKIPPED (the no-replay end state), a
  * crash-interrupted apply is COMPLETED from the already-swapped
  * prefix without re-running the walk (re-running would double-link
  * the reverse edges), and genuinely partial id overlap — state the
  * protocol cannot produce — fails fast with the diagnosis
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
          GraphAnnIndex.ingestOutcome(spark, batch, indexDir, beam,
              hops, refreshEntries) match {
            case GraphAnnIndex.AlreadyApplied(n) =>
              System.err.println(s"[graph-ann-stream] batch $batchId " +
                s"already applied ($n ids) — skipped")
            case GraphAnnIndex.Completed(n, r) =>
              System.err.println(s"[graph-ann-stream] batch $batchId " +
                s"completed a crash-interrupted apply ($n vectors, " +
                s"$r refreshed old lists)")
            case GraphAnnIndex.Appended(n, _) =>
              System.err.println(s"[graph-ann-stream] batch $batchId " +
                s"appended $n vectors")
          }
      })
  }

  /** The grown index's corpus copy — the quick "what has the stream
    * indexed so far" read. */
  def indexedVectors(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/vectors")
}
