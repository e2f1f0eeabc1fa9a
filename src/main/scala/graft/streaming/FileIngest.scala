package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Shared scaffold for file-arrival ingest streams ([[DocIngest]],
  * [[VecIngest]]): schema inference from the files already present,
  * optional file-granularity micro-batches, AvailableNow draining, and
  * the empty-batch guard. Keeping it in one place means a fix to the
  * source setup or trigger policy applies to every ingest loop. */
private[streaming] object FileIngest {

  /** Start a foreachBatch query over the parquet files in `srcDir`;
    * `body` runs once per non-empty micro-batch. */
  def stream(spark: SparkSession, srcDir: String, checkpointDir: String,
      oneFilePerBatch: Boolean)(
      body: (DataFrame, Long) => Unit): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    val reader = spark.readStream.schema(schema)
    val src =
      (if (oneFilePerBatch) reader.option("maxFilesPerTrigger", 1)
       else reader)
        .parquet(srcDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) body(batch, batchId)
      }
      .start()
  }

  /** Drain the backlog and stop — the replay/backfill harness. */
  def drain(q: StreamingQuery): Unit =
    try q.awaitTermination() finally if (q.isActive) q.stop()

  /** Exactly-once batch output for foreachBatch sinks: foreachBatch is
    * only at-least-once (a crash between the sink write and the
    * checkpoint offset commit replays the batch), so a blind append
    * duplicates rows on restart. Writing each batch to its own
    * `batch_id=<id>` partition directory with OVERWRITE makes the
    * replay land on top of its previous output instead — the same
    * contract [[graft.operators.Sketches.upsertHllBatch]] and the
    * other sketch upserts key their artifacts by. */
  def writeBatchExactlyOnce(batch: DataFrame, outDir: String,
      batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Read an output directory written by [[writeBatchExactlyOnce]],
    * dropping the partition-layout column so consumers see exactly the
    * per-batch schema. */
  def readBatchedOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch_id")
}
