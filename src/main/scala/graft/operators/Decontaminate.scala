package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram overlap screen every serious
  * training corpus runs against its evaluation sets (the GPT-3 appendix
  * C / PaLM treatment): a training document is CONTAMINATED when it
  * shares at least one `w`-token gram with any eval-set document, and
  * the artifact records per-document evidence (how many distinct grams
  * overlap, with how many eval docs) rather than a bare drop list, so
  * the filter decision is auditable.
  *
  * Grams travel as plain token strings, so the whole screen is
  * replayable in ANSI SQL (q193). 100 TB shape: the EVAL side is
  * benchmark-sized (thousands of docs, not billions) — its distinct
  * gram set builds once and BROADCASTS; the training side streams
  * one gram explode through a broadcast-hash semi-join and re-groups
  * by doc, one shuffle keyed on doc_id. At larger eval sets, hash the
  * gram to 8 bytes first (xxhash64) — same plan, smaller build side.
  */
object Decontaminate {

  /** `w`-token gram strings of a text column (let-bound against the
    * HOF-CSE re-evaluation term). Documents shorter than `w` tokens
    * emit no grams. */
  private[graft] def gramsOf(textCol: Column, w: Int): Column =
    graft.functions.TextFunctions.bound(split(textCol, " ")) { toks =>
      when(size(toks) >= w,
        transform(sequence(lit(1), size(toks) - (w - 1)),
          i => concat_ws(" ", slice(toks, i, lit(w)))))
        .otherwise(array().cast("array<string>"))
    }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * gram screen (SemDedup's insight applied to eval-set leakage:
    * paraphrased benchmark items share no 8-gram but sit at cosine
    * ≈ 1): every (train, eval) pair with cosine ≥ `tau` is reported
    * with its score. Exact and replayable (q197): the eval side is
    * benchmark-sized, so it BROADCASTS and the scan is linear in the
    * training corpus — no LSH recall risk on the compliance path; at
    * extreme eval sizes the IVF-pruned SemDedup machinery takes over. */
  def semanticOverlap(train: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    val t = train.select(col(idCol).cast("long").as("train_id"),
      Similarity.asDouble(col(vecCol)).as("tv"))
    val e = evalSet.select(col(idCol).cast("long").as("eval_id"),
      Similarity.asDouble(col(vecCol)).as("ev"))
    t.crossJoin(broadcast(e))
      .select(col("train_id"), col("eval_id"),
        Similarity.cosine(col("tv"), col("ev")).as("cos_raw"))
      .filter(col("cos_raw") >= tau)
      .select(col("train_id"), col("eval_id"),
        round(col("cos_raw"), 6).as("cos"))
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** Per-training-document overlap report against the eval set:
    * (doc_id, n_shared_grams — distinct grams also present in ANY eval
    * doc, n_eval_docs — distinct eval documents sharing at least one
    * gram). Only contaminated documents appear; downstream filters
    * with an anti-join. */
  def overlapReport(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, w: Int = 8): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"),
        explode(gramsOf(col(textCol), w)).as("gram"))
      .distinct()
    val evalGrams = grams(evalSet)
      .select(col("gram"), col("doc_id").as("eval_id"))
    grams(train)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy(col("doc_id"))
  }
}
