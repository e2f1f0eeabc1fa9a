package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunker, IvfIndex, SemDedup}
import graft.streaming.EventStream

/** Training-data pipeline queries: exactly-once stream restoration,
  * sliding-window chunking, concat-and-chunk sequence packing. All
  * deterministic and ANSI-expressible — every query here is oracled. */
object PipelineQueries {

  def all: Seq[GraftQuery] =
    Seq(q102ExactlyOnce, q103Chunk, q104Pack, q105SemDedup, q106Pipeline,
      q107TokenQuantiles, q108PackSharded, q112MixtureSample,
      q162TokenBudget)

  /** Token-budgeted mixture ([[graft.operators.Sampling
    * .tokenBudgetTake]]): the q112 mixture re-specified in TOKENS —
    * each source keeps its greedy prefix in portable sha-bucket order
    * until a per-source token budget (800 for even-numbered sources,
    * 400 for odd) overflows. Doc-level output (id, source, n_tok,
    * cum_tok) so the oracle re-derives the ORDER and the running sum,
    * not just the kept counts; cum_tok is strictly increasing per
    * source, making (source, cum_tok) a total order. */
  val q162TokenBudget: GraftQuery = GraftQuery(
    "q162_token_budget",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source",
          size(split($"text", " ")).cast("long").as("n_tok"),
          when(substring($"source", 4, 10).cast("int") % 2 === 0,
            lit(800L)).otherwise(lit(400L)).as("budget"))
      graft.operators.Sampling
        .tokenBudgetTake(docs, "doc_id", "source", "n_tok", "budget",
          seed = 162L)
        .select($"doc_id", $"source", $"n_tok", $"cum_tok")
        .orderBy($"source", $"cum_tok")
    },
    Some(
      "WITH d AS (SELECT doc_id, source, " +
        "len(string_split(text,' '))::BIGINT AS n_tok, " +
        "CASE WHEN substr(source, 4)::INT % 2 = 0 THEN 800 ELSE 400 " +
        "END AS budget, " +
        "substr(sha256(doc_id::VARCHAR || ':162'), 1, 4) AS bkt " +
        "FROM documents), " +
        // ::BIGINT — DuckDB sum(BIGINT) widens to HUGEINT (the q116
        // dtype-kind lesson)
        "c AS (SELECT *, sum(n_tok) OVER (PARTITION BY source " +
        "ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING)::BIGINT " +
        "AS cum_tok FROM d) " +
        "SELECT doc_id, source, n_tok, cum_tok FROM c " +
        "WHERE cum_tok <= budget ORDER BY source, cum_tok"))

  /** Exactly-once restoration of at-least-once delivery: two independent
    * file sources redeliver every event, a keyed streaming dedup drops
    * the replays, and the result must equal the batch table — the
    * canonical ingest front-door of a streaming pipeline
    * ([[EventStream.runExactlyOnce]]). */
  val q102ExactlyOnce: GraftQuery = GraftQuery(
    "q102_stream_dedup",
    (s, d) => {
      import s.implicits._
      EventStream.runExactlyOnce(s, d, queryName = "graft_q102")
        .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
          $"event_type", $"value")
        .orderBy($"event_id")
    },
    Some(
      "SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, " +
        "event_type, value FROM events ORDER BY event_id"))

  /** Sliding-window chunking ([[Chunker.chunk]]): 32-token windows every
    * 24 tokens (8-token overlap) over every document — the
    * context-window shaping step of a pretraining pipeline. No shuffle:
    * one projection + one explode per document. */
  val q103Chunk: GraftQuery = GraftQuery(
    "q103_chunk_docs",
    (s, d) => {
      import s.implicits._
      Chunker.chunk(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
          $"start_tok".cast("long").as("start_tok"),
          $"n_tok".cast("long").as("n_tok"), $"chunk")
        .orderBy($"doc_id", $"chunk_id")
    },
    Some(
      "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "e AS (SELECT doc_id, toks, len(toks) AS n, " +
        "unnest(generate_series(0, greatest(len(toks) - 9, 0), 24)) " +
        "AS start_tok FROM t) " +
        "SELECT doc_id, start_tok // 24 AS chunk_id, start_tok, " +
        "least(n - start_tok, 32) AS n_tok, " +
        "array_to_string(toks[start_tok + 1 : start_tok + 32], ' ') " +
        "AS chunk FROM e ORDER BY doc_id, chunk_id"))

  /** Concat-and-chunk sequence packing ([[Chunker.packSequences]]):
    * per-source token streams sliced into 512-token training sequences;
    * reports per-sequence document occupancy and boundary straddlers. */
  val q104Pack: GraftQuery = GraftQuery(
    "q104_pack_sequences",
    (s, d) => {
      import s.implicits._
      Chunker.packSequences(Tables.documents(s, d), "doc_id", "text",
          "source", seqLen = 512)
        .select($"source", $"seq_id", $"n_docs", $"n_tokens",
          $"n_straddle".cast("long").as("n_straddle"))
        .orderBy($"source", $"seq_id")
    },
    Some(
      "WITH t AS (SELECT source, doc_id, " +
        "len(string_split(text, ' ')) AS n_tok FROM documents), " +
        "o AS (SELECT source, doc_id, n_tok, " +
        "sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) - n_tok AS tok_off FROM t), " +
        "m AS (SELECT source, n_tok, " +
        "floor(tok_off / 512)::BIGINT AS seq_id, " +
        "(floor((tok_off + n_tok - 1) / 512) > floor(tok_off / 512))" +
        "::INT AS straddles FROM o) " +
        "SELECT source, seq_id, count(*) AS n_docs, " +
        "sum(n_tok)::BIGINT AS n_tokens, " +
        "sum(straddles)::BIGINT AS n_straddle " +
        "FROM m GROUP BY 1, 2 ORDER BY source, seq_id"))

  /** Semantic dedup (SemDeDup): the embeddings table + planted
    * near-identical clones (every 20th vector, one coordinate nudged,
    * id offset by 1e6) → coarse k-means clusters → within-cluster cosine
    * pairs → keep-one. Per-cluster report; rows-only (k-means is not
    * DuckDB-expressible) but a pure function of (data, seed) — the
    * planted-clone recovery is asserted in SemDedupSpec. */
  val q105SemDedup: GraftQuery = GraftQuery(
    "q105_semdedup",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
        .select($"vec_id", $"embedding")
      val clones = e.filter($"vec_id" % 20 === 0)
        .select(($"vec_id" + 1000000L).as("vec_id"),
          transform($"embedding",
            (x, i) => x + when(i === 0, lit(0.05f)).otherwise(lit(0.0f)))
            .as("embedding"))
      val corpus = e.unionByName(clones)
      val centroids = IvfIndex.trainCentroids(corpus, "vec_id",
        "embedding", nlist = 8, seed = 42L)
      val assigned = SemDedup.assignClusters(corpus, "vec_id",
        "embedding", centroids)
      val pairs = SemDedup.pairsWithin(assigned, "vec_id",
        tau = 0.95, maxCluster = 1000)
      val kept = SemDedup.keep(corpus, "vec_id", pairs)
      val nVecs = assigned.groupBy($"cluster")
        .agg(count(lit(1)).as("n_vecs"))
      val nPairs = pairs.groupBy($"cluster")
        .agg(count(lit(1)).as("n_pairs"))
      val nRemoved = assigned
        .join(kept.select($"vec_id"), Seq("vec_id"), "left_anti")
        .groupBy($"cluster").agg(count(lit(1)).as("n_removed"))
      nVecs
        .join(nPairs, Seq("cluster"), "left_outer")
        .join(nRemoved, Seq("cluster"), "left_outer")
        .select($"cluster", $"n_vecs",
          coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"n_removed", lit(0L)).as("n_removed"))
        .orderBy($"cluster")
    })

  /** The END-TO-END pretraining shaping pipeline in one composition,
    * hash-checked as a whole: quality filter (composite score ≥ 0.6) →
    * exact dedup (keep min doc_id per identical text) → per-source
    * concat-and-chunk packing into 512-token sequences → per-source
    * occupancy report. Each stage is individually oracled elsewhere
    * (q49, q21, q104); this query proves the COMPOSITION matches DuckDB
    * end-to-end — the whole-pipeline guarantee a data team actually
    * needs. */
  val q106Pipeline: GraftQuery = GraftQuery(
    "q106_shaping_pipeline",
    (s, d) => {
      import s.implicits._
      val good = Tables.documents(s, d)
        .select($"doc_id", $"text", $"source",
          graft.functions.TextFunctions.qualityScore($"text").as("q"))
        .filter($"q" >= 0.6)
      val dedup = good.groupBy($"text")
        .agg(min($"doc_id").as("doc_id"),
          expr("min_by(source, doc_id)").as("source"))
      val packed = Chunker.packSequences(dedup, "doc_id", "text",
        "source", seqLen = 512)
      packed.groupBy($"source")
        .agg((max($"seq_id") + 1).as("n_seqs"),
          sum($"n_docs").as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          sum($"n_straddle").cast("long").as("n_straddle"))
        .orderBy($"source")
    },
    Some(
      "WITH s AS (SELECT doc_id, text, source, " +
        "round(least(n_tok / 64.0, 1.0) * 0.4 + " +
        "(n_distinct / n_tok) * 0.4 + " +
        "(CASE WHEN (n_chars - n_tok + 1.0) / n_tok BETWEEN 3.0 AND 9.0 " +
        "THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS q FROM (" +
        "SELECT doc_id, text, source, " +
        "len(string_split(text, ' '))::DOUBLE AS n_tok, " +
        "len(list_distinct(string_split(lower(text), ' ')))::DOUBLE " +
        "AS n_distinct, length(text)::DOUBLE AS n_chars " +
        "FROM documents)), " +
        "g AS (SELECT * FROM s WHERE q >= 0.6), " +
        "dd AS (SELECT text, min(doc_id) AS doc_id, " +
        "arg_min(source, doc_id) AS source FROM g GROUP BY text), " +
        "t AS (SELECT source, doc_id, " +
        "len(string_split(text, ' ')) AS n_tok FROM dd), " +
        "o AS (SELECT source, doc_id, n_tok, " +
        "sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) - n_tok AS tok_off FROM t), " +
        "m AS (SELECT source, n_tok, " +
        "floor(tok_off / 512)::BIGINT AS seq_id, " +
        "(floor((tok_off + n_tok - 1) / 512) > floor(tok_off / 512))" +
        "::INT AS straddles FROM o) " +
        "SELECT source, max(seq_id) + 1 AS n_seqs, " +
        "count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens, " +
        "sum(straddles)::BIGINT AS n_straddle " +
        "FROM m GROUP BY 1 ORDER BY source"))

  /** Per-source token-length EXACT quantiles (p50/p90/p99, linear
    * interpolation) — the corpus-profile report that sizes chunking and
    * packing budgets. Spark's `percentile` and DuckDB's `quantile_cont`
    * share the rank = p·(n-1) interpolation, so the whole profile is
    * hash-checked. (At 100 TB swap in `approx_percentile` — same query
    * shape, sketch-mergeable; the exact form is the oracle-able
    * verifier.) */
  val q107TokenQuantiles: GraftQuery = GraftQuery(
    "q107_token_quantiles",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"source",
          size(split($"text", " ")).cast("double").as("n_tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(n_tok, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_tok, 0.9)"), 6).as("p90"),
          round(expr("percentile(n_tok, 0.99)"), 6).as("p99"))
        .orderBy($"source")
    },
    Some(
      "SELECT source, count(*) AS n_docs, " +
        "round(quantile_cont(n_tok, 0.5), 6) AS p50, " +
        "round(quantile_cont(n_tok, 0.9), 6) AS p90, " +
        "round(quantile_cont(n_tok, 0.99), 6) AS p99 FROM (" +
        "SELECT source, len(string_split(text, ' '))::DOUBLE AS n_tok " +
        "FROM documents) GROUP BY source ORDER BY source"))

  /** PARALLEL sequence packing, hash-checked: the subShards path splits
    * each source into 4 independent sub-streams (shard = doc_id % 4 —
    * id-keyed so DuckDB replays it exactly; production defaults to the
    * hash key) with interleaved sequence-id spaces. This is the shape
    * that removes the mega-group window straggler at 100 TB, and the
    * oracle proves the sharded occupancy report is still exact. */
  val q108PackSharded: GraftQuery = GraftQuery(
    "q108_pack_sharded",
    (s, d) => {
      import s.implicits._
      Chunker.packSequences(Tables.documents(s, d), "doc_id", "text",
          "source", seqLen = 512, subShards = 4,
          shardKey = Some($"doc_id"))
        .select($"source", $"seq_id", $"n_docs", $"n_tokens",
          $"n_straddle".cast("long").as("n_straddle"))
        .orderBy($"source", $"seq_id")
    },
    Some(
      "WITH t AS (SELECT source, doc_id, doc_id % 4 AS shard, " +
        "len(string_split(text, ' ')) AS n_tok FROM documents), " +
        "o AS (SELECT source, shard, doc_id, n_tok, " +
        "sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) - n_tok AS tok_off FROM t), " +
        "m AS (SELECT source, n_tok, " +
        "(floor(tok_off / 512)::BIGINT * 4 + shard) AS seq_id, " +
        "(floor((tok_off + n_tok - 1) / 512) > floor(tok_off / 512))" +
        "::INT AS straddles FROM o) " +
        "SELECT source, seq_id, count(*) AS n_docs, " +
        "sum(n_tok)::BIGINT AS n_tokens, " +
        "sum(straddles)::BIGINT AS n_straddle " +
        "FROM m GROUP BY 1, 2 ORDER BY source, seq_id"))

  /** Training-mix construction ([[Sampling.mixtureRates]] +
    * [[Sampling.sampleByMixtureSha]]): rebalance the corpus to a target
    * language mixture. Rates come from one tiny count aggregate (driver
    * math); membership is the portable sha256 bucket of (doc_id, seed)
    * against each language's hex cut — a pure function of (id, seed,
    * rates) at any partitioning/cluster size, AND replayable by DuckDB,
    * so the sample itself is oracle-verified. The target weights are
    * exact binary fractions (1/2, 1/8×4) so every rate computation —
    * the weight sum, shares, the binding min, t·w/c — is
    * order-independent IEEE arithmetic both engines reproduce
    * bit-for-bit; the 6-dp pre-cut rounding in [[Sampling.shaCut]]
    * absorbs any residual ulp. MixtureSpec still checks proportions +
    * the no-upsample guarantee (binding language kept whole). */
  val q112MixtureSample: GraftQuery = GraftQuery(
    "q112_mixture_sample",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val weights = Map("en" -> 0.5, "de" -> 0.125, "fr" -> 0.125,
        "es" -> 0.125, "zh" -> 0.125)
      val counts = docs.groupBy($"lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rates = graft.operators.Sampling.mixtureRates(counts, weights)
      val kept = graft.operators.Sampling.sampleByMixtureSha(
        docs, "doc_id", "lang", rates, seed = 42L)
      val rateMap = typedLit(rates)
      kept.groupBy($"lang").agg(count(lit(1)).as("n_kept"))
        .withColumn("rate", round(element_at(rateMap, $"lang"), 6))
        .orderBy($"lang")
    },
    Some(
      // mirrors mixtureRates exactly: totalW = 1.0 (exact binary
      // weights), share = wt, t = min(cnt/wt), rate = (t*wt)/cnt
      "WITH c AS (SELECT lang, count(*)::BIGINT AS cnt " +
        "FROM documents GROUP BY 1), " +
        "w AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.125), " +
        "('fr', 0.125), ('es', 0.125), ('zh', 0.125)) AS t(lang, wt)), " +
        "j AS (SELECT c.lang, c.cnt, w.wt::DOUBLE AS wt " +
        "FROM c JOIN w USING (lang)), " +
        "tv AS (SELECT min(cnt / wt) AS t FROM j), " +
        "r AS (SELECT lang, cnt, least(1.0::DOUBLE, " +
        "(SELECT t FROM tv) * wt / cnt) AS rate FROM j), " +
        "k AS (SELECT d.lang FROM documents d JOIN r USING (lang) " +
        "WHERE r.rate >= 1.0::DOUBLE - 1e-6 " +
        "OR substr(sha256(d.doc_id::VARCHAR || ':42'), 1, 4) < " +
        "lower(lpad(hex(floor(round(r.rate, 6) * 65536)::BIGINT), " +
        "4, '0'))) " +
        "SELECT k.lang, count(*) AS n_kept, round(r.rate, 6) AS rate " +
        "FROM k JOIN r USING (lang) GROUP BY k.lang, r.rate " +
        "ORDER BY k.lang"))
}
