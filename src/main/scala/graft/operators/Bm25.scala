package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval over the corpus (north-star extension): rank
  * documents for a term query with the probabilistic-IR scoring function
  * every training-data pipeline reaches for when it needs lexical
  * retrieval — benchmark decontamination lookups, DSIR-style target
  * matching, nearest-neighbour text audits — without an embedding model
  * in the loop.
  *
  * Scale shape (what survives 100 TB):
  *  - the posting list is FILTERED TO THE QUERY'S TERMS immediately
  *    after tokenization, before any shuffle — per-query cost scales
  *    with the query terms' postings, never the corpus vocabulary;
  *  - corpus stats (N, avgdl) are ONE aggregation of per-doc lengths,
  *    attached by broadcast;
  *  - per-term document frequencies come from the already-filtered
  *    postings (≤ |query| rows after the aggregate) and are broadcast
  *    back — no global df table is ever materialized;
  *  - the final top-k is an order-by-limit, which Spark executes as
  *    TakeOrderedAndProject (per-partition heaps + a k-row driver
  *    merge), not a global sort.
  *
  * Determinism contract (q160's oracle face): idf = ln(1 + (N − df +
  * 0.5)/(df + 0.5)) — the standard "plus one" form, strictly positive —
  * and each (doc, term) partial score is re-quantized to 6 dp BEFORE
  * the per-doc sum (the q158 boundary-vs-wobble rule: the one
  * order-sensitive reduction consumes identical doubles on both
  * engines), with the ranking key re-rounded to 4 dp and ties broken on
  * doc_id.
  */
object Bm25 {

  /** Top-`k` documents for `queryTerms` by BM25 score.
    * Output: (doc_id, score, rk) — score at 4 dp, rank dense in rk. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, "k must be >= 1")
    val toks = split(col(textCol), " ")
    // one row per (doc, token) restricted to query terms pre-shuffle
    val tf = docs
      .select(col(idCol).as("doc_id"),
        size(toks).cast("double").as("dl"),
        explode(toks).as("t"))
      .filter(col("t").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"),
        first(col("dl")).as("dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(size(split(col(textCol), " "))).as("avgdl"))
    val dfreq = tf.groupBy(col("t"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val partial = round(
      idf * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))), 6)
    tf.join(broadcast(dfreq), "t")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), partial.as("ps"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("ps")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))))
  }
}
