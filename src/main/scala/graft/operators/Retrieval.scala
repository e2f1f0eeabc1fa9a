package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical ranking (BM25, [[Bm25.topK]]) with
  * a semantic ranking (exact cosine over the embedding column) by
  * Reciprocal Rank Fusion — `rrf(d) = Σ_legs 1/(c + rank_leg(d))`
  * (Cormack, Clarke & Buettcher, SIGIR'09), the standard zero-tuning
  * fusion for RAG / retrieval-augmented training-data pipelines.
  *
  * Everything is rank arithmetic on two small top-k lists, so the
  * fusion is exactly replayable in SQL (q192): both legs are already
  * oracled shapes (q160 BM25, q153 cosine top-k), ranks are ints, and
  * the RRF sum is two IEEE terms added in a fixed order. 100 TB shape:
  * each leg prunes to its own top-k before the fuse — the full-outer
  * join runs on ≤ 2k rows regardless of corpus size, and the semantic
  * leg scales via the ANN index stack (IVF/PQ) when brute cosine
  * stops being the right tool.
  */
object Retrieval {

  /** RRF-fuse two (doc_id, rk) rankings; missing legs contribute 0.
    * Returns (doc_id, rrf, rk) — top `k` by (rrf DESC, doc_id). */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int,
      c: Int = 60): DataFrame = {
    val fused = lex.select(col("doc_id"), col("rk").as("rk_lex"))
      .join(sem.select(col("doc_id"), col("rk").as("rk_sem")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(c.toDouble) + col("rk_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("rk_sem")), lit(0.0)))
          .as("rrf"))
    fused
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("doc_id"), round(col("rrf"), 6).as("rrf"), col("rk"))
      .orderBy(col("rk"))
  }

  /** The full hybrid query: BM25 top-`legK` for `queryTerms` fused with
    * cosine top-`legK` around the embedding of `queryVecId` (the query
    * document itself is excluded from the semantic leg). */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int,
      legK: Int = 20): DataFrame =
    hybridParts(docs, embeddings, queryTerms, queryVecId, k, legK)._1

  /** [[hybridTopK]]'s internals, shared with [[rerankTopK]] so the
    * rerank stage reuses the vector frames stage 1 already built
    * instead of re-deriving them (one embeddings projection + one
    * query-vector lookup per call, not two). Returns
    * (fused candidates, (doc_id, v) vectors, 1-row query vector). */
  private def hybridParts(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int,
      legK: Int): (DataFrame, DataFrame, DataFrame) = {
    val lex = Bm25.topK(docs, "doc_id", "text", queryTerms, legK)
    val vecs = embeddings.select(col("vec_id").cast("long").as("doc_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val qv = vecs.filter(col("doc_id") === queryVecId)
      .select(col("v").as("qv"))
    // a missing query vector would SILENTLY degrade the fuse to
    // lex-only (empty cross join) — fail loudly instead
    require(qv.count() == 1,
      s"query vector $queryVecId not found in the embedding table")
    val sem = vecs.filter(col("doc_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("doc_id"),
        Similarity.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))))
      .filter(col("rk") <= legK)
    (rrfFuse(lex, sem, k), vecs, qv)
  }

  /** Two-stage retrieve → rerank, closing the retrieval stack
    * end-to-end: [[hybridTopK]] is the RECALL stage (cheap, rank
    * arithmetic over pruned legs), then every surviving (query,
    * candidate) pair is re-scored from the STORED embeddings — the
    * replayable stand-in for a cross-encoder pass: a pairwise
    * interaction over the full vectors of both sides, not the
    * retrieval ranks that produced the candidate. rerank_score =
    * round(qv·cv, 6) (6-dp pin before the order-sensitive ranking,
    * the q158 rule), final order (rerank_score DESC, doc_id).
    *
    * Returns (doc_id, rrf, rrf_rk, rerank_score, rerank_rk) so the
    * stage-1 and stage-2 orders are both in the hashed row — rank
    * MOVEMENT is the evidence the rerank did something. A candidate
    * with no stored embedding cannot be pair-scored and is DROPPED
    * (inner join — e.g. lexical-leg docs beyond the embedded id range
    * at sf0.1), exactly as a cross-encoder stage would skip a
    * candidate whose content it cannot fetch.
    *
    * 100 TB shape: the candidate frame is k rows — broadcast into the
    * embeddings scan, so stage 2 reads k stored vectors however large
    * the corpus; a real cross-encoder swaps the dot for a model call
    * over the same k-row frame. */
  def rerankTopK(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int,
      legK: Int = 20): DataFrame = {
    val (cands, vecs, qv) = hybridParts(docs, embeddings, queryTerms,
      queryVecId, k, legK)
    vecs.join(broadcast(cands), Seq("doc_id"))
      .crossJoin(broadcast(qv))
      .select(col("doc_id"), col("rrf"), col("rk").as("rrf_rk"),
        round(Similarity.dot(col("v"), col("qv")), 6).as("rerank_score"))
      .withColumn("rerank_rk", row_number().over(
        Window.orderBy(col("rerank_score").desc, col("doc_id"))))
      .orderBy(col("rerank_rk"))
  }
}
