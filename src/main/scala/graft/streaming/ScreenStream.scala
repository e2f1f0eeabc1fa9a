package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.operators.PiiRedact

/** STREAMING PII screen: document files land in a directory and each
  * micro-batch flows through the SAME [[PiiRedact.redact]] expression
  * the batch pipeline uses, appending the audited redactions per
  * batch. The operator is stateless per row, so exactly-once comes
  * free from the file-source checkpoint (no state store) and the
  * stream's union must equal the batch run over the same files — the
  * q41/q102 replay contract, gated by the q198 oracle hash-match.
  *
  * At 100 TB: per micro-batch cost is three codegen'd regex passes per
  * row, no shuffle — the screen keeps up with arrival rate by
  * construction. */
object ScreenStream {

  def runToCompletion(spark: SparkSession, srcDir: String,
      outDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      oneFilePerBatch: Boolean = true): Unit =
    FileIngest.drain(
      FileIngest.stream(spark, srcDir, checkpointDir, oneFilePerBatch) {
        (batch, _) =>
          PiiRedact.redact(batch, idCol, textCol)
            .write.mode("append").parquet(outDir)
      })
}
