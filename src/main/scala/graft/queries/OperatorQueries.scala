package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.multimodal.{ContainerMeta, Multimodal}
import graft.operators.{AsOfJoin, Dedup, Similarity}
import graft.streaming.EventStream

/** North-star operator queries: as-of join, streaming, multimodal,
  * dedup (MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  * ANN similarity, text analysis. Oracle-checked wherever DuckDB can
  * express identical semantics; hash-family-dependent ops are rows-only
  * but seed-deterministic.
  */
object OperatorQueries {

  def all: Seq[GraftQuery] = Seq(q40AsOf, q41StreamHourly, q42Multimodal,
    q43NgramJaccard, q44MinhashNearDups, q45SimhashNearDups,
    q46EmbeddingNearDups, q47AnnRecall, q48LangId, q49QualityScore,
    q50Fingerprint, q51SubwordCount, q63SaltedJoin, q64AnnTopK,
    q65ApproxStats, q66IvfRecall, q73AsOfForward, q80SampleSplit,
    q82Upsert, q83TopKAggKnn, q84Normalize, q85DedupComponents,
    q86Histogram, q88AsOfNative, q89StreamIntervalJoin, q90PipelineFilter,
    q91HeavyHitters, q92BigramCounts, q93PqRecall, q94IvfPqTopK,
    q95Sessionize, q99DedupKeep, q100GroupCap, q101SessionizeFlush,
    q109DupSpans, q113ExciseSpans, q117StreamStaticJoin, q120PageRank,
    q152ContainerMeta, q155AudioMeta, q156ExactStats, q161PrefixJaccard,
    q163PrefixJaccardIngest, q166TriangleCount, q167ImageNearDups,
    q168LabelPropagation, q170AudioNearDups, q172PersonalizedPageRank,
    q173ContainmentJoin, q174KeepBest, q175Winnowing, q176LshOracled,
    q178SimhashOracled, q179AnnOracled, q203StreamNearDup)

  /** Backward as-of join via union+window (one shuffle, no range-join
    * blowup); oracle = DuckDB's native ASOF LEFT JOIN. */
  val q40AsOf: GraftQuery = GraftQuery(
    "q40_asof_join",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts")
      AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts")
        .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
          unix_millis($"ts_asof").as("click_ms"))
        .orderBy($"event_id")
    },
    Some(
      "WITH purch AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "clicks AS (SELECT user_id, ts FROM events " +
        "WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, " +
        "epoch_ms(c.ts) AS click_ms " +
        "FROM purch p ASOF LEFT JOIN clicks c " +
        "ON p.user_id = c.user_id AND c.ts <= p.ts " +
        "ORDER BY p.event_id"))

  /** The same backward as-of join through the PLAN-LEVEL operator
    * ([[graft.plans.NativeAsOf]]: custom LogicalPlan + SparkStrategy +
    * sorted-merge AsOfJoinExec) — the custom physical operator must
    * hash-match DuckDB's native ASOF LEFT JOIN, same oracle family as
    * q40's union+window realization. */
  val q88AsOfNative: GraftQuery = GraftQuery(
    "q88_asof_native",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"))
      graft.plans.NativeAsOf.join(purchases, clicks, Seq("user_id"),
        "ts", "c_ts")
        .select($"event_id", unix_millis($"ts").as("ts_ms"),
          unix_millis($"c_ts").as("click_ms"))
        .orderBy($"event_id")
    },
    Some(
      "WITH purch AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "clicks AS (SELECT user_id, ts FROM events " +
        "WHERE event_type = 'click') " +
        "SELECT p.event_id, epoch_ms(p.ts) AS ts_ms, " +
        "epoch_ms(c.ts) AS click_ms " +
        "FROM purch p ASOF LEFT JOIN clicks c " +
        "ON p.user_id = c.user_id AND c.ts <= p.ts " +
        "ORDER BY p.event_id"))

  /** End-to-end training-data FILTER PIPELINE in one plan: language-ID →
    * quality score → keep confident English docs → exact dedup (min
    * doc_id per identical text, source via min_by) → per-source corpus
    * stats. Every stage is the same library operator its standalone
    * query uses (q48/q49/q21); the oracle replays the whole pipeline in
    * SQL, so the composition — not just the pieces — is hash-checked. */
  val q90PipelineFilter: GraftQuery = GraftQuery(
    "q90_pipeline_filter",
    (s, d) => {
      import s.implicits._
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, d)
      val scored = docs.select($"doc_id", $"source", $"text",
        TextFunctions.langId($"text").as("lang_pred"),
        round(TextFunctions.qualityScore($"text"), 6).as("quality"))
      val kept = scored.filter($"lang_pred" === "en" && $"quality" >= 0.5)
      val dedup = kept.groupBy($"text")
        .agg(min($"doc_id").as("doc_id"),
          expr("min_by(source, doc_id)").as("source"),
          min($"quality").as("quality"))
      // avg over exact micro-units: quality is a 6-decimal value, so
      // sum(round(q·10^6)) is an exact integer and ONE double division
      // yields a bit-identical avg in both engines — round(avg(q), 6)
      // could land on an exact half tie (sum/2^k groups), where Spark
      // HALF_UP and DuckDB disagree in the last digit (seen at sf0.001)
      dedup.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          (sum(round($"quality" * 1e6).cast("long")).cast("double") /
            (count(lit(1)) * lit(1000000.0))).as("avg_quality"))
        .orderBy($"source")
    },
    Some(
      "WITH base AS (SELECT doc_id, source, text, " +
        "len(string_split(text, ' '))::DOUBLE AS n_tok, " +
        "len(list_distinct(string_split(lower(text), ' ')))::DOUBLE " +
        "AS n_distinct, " +
        "length(text)::DOUBLE AS n_chars, " +
        "len(list_filter(string_split(lower(text), ' '), w -> w IN " +
        "('the', 'and', 'of', 'to', 'a', 'in', 'is', 'that', 'it', 'for')))" +
        "::DOUBLE / len(string_split(lower(text), ' ')) AS s_en, " +
        "len(list_filter(string_split(lower(text), ' '), w -> w IN " +
        "('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein', 'zu', 'mit', " +
        "'den')))::DOUBLE / len(string_split(lower(text), ' ')) AS s_de, " +
        "len(list_filter(string_split(lower(text), ' '), w -> w IN " +
        "('el', 'la', 'de', 'que', 'y', 'en', 'un', 'es', 'no', 'por')))" +
        "::DOUBLE / len(string_split(lower(text), ' ')) AS s_es, " +
        "len(list_filter(string_split(lower(text), ' '), w -> w IN " +
        "('le', 'la', 'de', 'et', 'un', 'est', 'pas', 'que', 'pour', " +
        "'dans')))::DOUBLE / len(string_split(lower(text), ' ')) AS s_fr " +
        "FROM documents), " +
        "feats AS (SELECT doc_id, source, text, " +
        "CASE WHEN s_en >= 0.02 AND s_en = greatest(s_en, s_de, s_es, s_fr) " +
        "THEN 'en' WHEN s_de >= 0.02 AND s_de = greatest(s_en, s_de, s_es, " +
        "s_fr) THEN 'de' WHEN s_es >= 0.02 AND s_es = greatest(s_en, s_de, " +
        "s_es, s_fr) THEN 'es' WHEN s_fr >= 0.02 AND s_fr = greatest(s_en, " +
        "s_de, s_es, s_fr) THEN 'fr' ELSE 'und' END AS lang_pred, " +
        "round(least(n_tok / 64.0, 1.0) * 0.4 + (n_distinct / n_tok) * 0.4 " +
        "+ (CASE WHEN (n_chars - n_tok + 1.0) / n_tok BETWEEN 3.0 AND 9.0 " +
        "THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality FROM base), " +
        "kept AS (SELECT * FROM feats " +
        "WHERE lang_pred = 'en' AND quality >= 0.5), " +
        "dedup AS (SELECT min(doc_id) AS doc_id, " +
        "arg_min(source, doc_id) AS source, min(quality) AS quality " +
        "FROM kept GROUP BY text) " +
        "SELECT source, count(*) AS n_docs, " +
        "sum(round(quality * 1000000)::BIGINT)::DOUBLE / " +
        "(count(*) * 1000000.0) AS avg_quality " +
        "FROM dedup GROUP BY 1 ORDER BY source"))

  /** Product-quantization ANN: per-query ADC recall@10 against the
    * exact squared-L2 top-10 (PqIndex: 8 subspaces x 16-centroid
    * codebooks = 32x compression; seeded + first-min tie-breaks ->
    * deterministic, but the fit is iterative -> rows-only). The
    * quantized side serves from the PERSISTED codebook + codes
    * ([[AnnIndexes.pq]]) — no per-execution training. */
  val q93PqRecall: GraftQuery = GraftQuery(
    "q93_pq_recall",
    (s, d) => {
      val (cb, codes) = AnnIndexes.pq(s, d)
      graft.operators.Similarity.assertRecallFloor(
        graft.operators.PqIndex.recallAgainstIndex(s,
          Tables.embeddings(s, d), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), cb, codes, topK = 10),
        floor = Similarity.RecallFloors.floor("q93", d))
    })

  /** IVF-PQ composed search: coarse buckets prune candidates, PQ/ADC
    * scores the survivors (rows-only; fully seed-deterministic). Served
    * from the persisted L2-IVF + PQ artifact pair ([[AnnIndexes.ivfL2]]
    * / [[AnnIndexes.pq]]) with explicit bucket-partition pruning —
    * identical results to the in-query-training form (PqSpec parity). */
  val q94IvfPqTopK: GraftQuery = GraftQuery(
    "q94_ivfpq_topk",
    (s, d) => {
      import s.implicits._
      val (centroids, buckets) = AnnIndexes.ivfL2(s, d)
      val (cb, codes) = AnnIndexes.pq(s, d)
      val queries = Tables.embeddings(s, d)
        .select($"vec_id".cast("long").as("id"),
          graft.operators.Similarity.asDouble($"embedding").as("v"))
        .filter($"id".isin(0L, 1L, 2L, 3L, 4L)).collect()
        .map(r => r.getLong(0) ->
          r.getAs[scala.collection.Seq[Double]]("v").toArray)
        .toSeq.sortBy(_._1)
      graft.operators.PqIndex.ivfPqTopKAgainstIndex(s, queries,
        centroids, buckets, cb, codes, nprobe = 4, topK = 10)
        .select($"query_id", $"cand_id", round($"adc_dist", 6).as("adc_dist"),
          $"rk")
        .orderBy($"query_id", $"rk")
    })

  /** Skew diagnosis: the top-10 heaviest event users with counts and
    * corpus share ([[graft.operators.SkewJoin.keyProfile]]) — the
    * measurement that picks salting factors / AQE thresholds. */
  val q91HeavyHitters: GraftQuery = GraftQuery(
    "q91_heavy_hitters",
    (s, d) => graft.operators.SkewJoin.keyProfile(
      Tables.events(s, d), "user_id", topK = 10),
    Some(
      "WITH counts AS (SELECT user_id, count(*) AS n FROM events " +
        "GROUP BY 1), t AS (SELECT sum(n) AS total FROM counts) " +
        "SELECT user_id, n, round(n / total * 100.0, 4) AS pct " +
        "FROM counts, t ORDER BY n DESC, user_id LIMIT 10"))

  /** Word-bigram counts over the corpus (top 20) — n-gram language-model
    * statistics from the same shingling kernel the dedup path uses. */
  val q92BigramCounts: GraftQuery = GraftQuery(
    "q92_bigram_counts",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(Dedup.shingles(lower($"text"), 2)).as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bigram").limit(20)
    },
    Some(
      "WITH grams AS (SELECT unnest(list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(lower(text), ' ')) " +
        "- 1)), i -> array_to_string(list_slice(string_split(lower(text), " +
        "' '), i, i+1), ' ')))) AS bigram FROM documents) " +
        "SELECT bigram, count(*) AS n FROM grams " +
        "GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20"))

  /** Stream-stream interval join (purchases × same-user clicks within the
    * preceding hour), replayed through Structured Streaming with
    * watermarks on both sides — must equal the BATCH oracle (plain SQL
    * range join in DuckDB). */
  val q89StreamIntervalJoin: GraftQuery = GraftQuery(
    "q89_stream_interval_join",
    (s, d) => {
      val name = s"graft_ssj_${System.nanoTime()}"
      EventStream.runAppend(s, d, EventStream.purchaseClickPairs, name)
        .orderBy(col("p_event_id"), col("c_ms"))
    },
    Some(
      "SELECT p.event_id AS p_event_id, p.user_id AS p_user, " +
        "epoch_ms(p.ts) AS p_ms, epoch_ms(c.ts) AS c_ms " +
        "FROM (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase') p " +
        "JOIN (SELECT user_id, ts FROM events " +
        "WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts " +
        "ORDER BY p_event_id, c_ms"))

  /** Structured Streaming replay of the hourly aggregation — must equal
    * the BATCH oracle (same SQL as q15): streaming and batch agree on a
    * complete replay. */
  val q41StreamHourly: GraftQuery = GraftQuery(
    "q41_stream_hourly",
    (s, d) => {
      val name = s"graft_stream_${System.nanoTime()}"
      EventStream.runToCompletion(s, d, EventStream.hourlyCounts, name)
        .orderBy(col("hr_ms"), col("event_type"))
    },
    Some(
      "SELECT epoch_ms(date_trunc('hour', ts)) AS hr_ms, event_type, " +
        "count(*) AS n, round(sum(value),2) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY hr_ms, event_type"))

  /** STREAM-STATIC join ([[EventStream.enrichedSegmentStats]]): the
    * event stream enriched per micro-batch with the broadcast customer
    * dimension, aggregated by market segment. A complete replay must
    * equal the batch join — which is exactly what the oracle computes. */
  val q117StreamStaticJoin: GraftQuery = GraftQuery(
    "q117_stream_static_join",
    (s, d) => {
      val name = s"graft_stream_${System.nanoTime()}"
      val customers = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      EventStream.runToCompletion(s, d,
          ev => EventStream.enrichedSegmentStats(ev, customers), name)
        .orderBy(col("c_mktsegment"), col("event_type"))
    },
    Some(
      "SELECT c_mktsegment, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS sum_value " +
        "FROM events e JOIN customer c ON e.user_id = c.c_custkey " +
        "GROUP BY 1, 2 ORDER BY c_mktsegment, event_type"))

  /** Binary-column plumbing + per-partition decode (text corpus → every
    * row takes the deterministic byte-derived fallback). ORACLED: the
    * fallback features are pure integer/float math over the UTF-8 bytes,
    * so DuckDB replays them — the rolling 31· hash in wrapping 64-bit
    * (HUGEINT mod 2^64 with a signed reinterpretation), the byte
    * histogram entropy with the same ascending-code fold order, and
    * luma = exact integer byte sum / n (bit-identical division, left
    * unrounded). The corpus is ASCII, so char codes ARE the bytes. */
  val q42Multimodal: GraftQuery = GraftQuery(
    "q42_multimodal_features",
    (s, d) => {
      val withBin = Multimodal.attachBinary(Tables.documents(s, d))
      Multimodal.extractFeatures(withBin).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          round(col("byte_entropy"), 4).as("byte_entropy"),
          col("luma_mean"))
        .orderBy(col("doc_id"))
    },
    Some(
      "WITH codes AS (SELECT doc_id, " +
        "list_transform(range(1, length(text) + 1), " +
        "i -> ord(substr(text, i::INT, 1))) AS cs, " +
        "greatest(1, length(text)) AS n FROM documents), " +
        "roll AS (SELECT doc_id, n, cs, " +
        "list_reduce(list_prepend(1125899906842597::HUGEINT, cs), " +
        "(a, b) -> (31 * a + b) % 18446744073709551616::HUGEINT) AS h " +
        "FROM codes), " +
        "dims AS (SELECT doc_id, n, cs, " +
        "(64 + abs(CASE WHEN h >= 9223372036854775808::HUGEINT " +
        "THEN h - 18446744073709551616::HUGEINT ELSE h END) % 1024)" +
        "::INTEGER AS width, " +
        "(64 + abs((h // 1024) - CASE WHEN h >= 9223372036854775808::HUGEINT " +
        "THEN 18014398509481984::HUGEINT ELSE 0::HUGEINT END) % 1024)" +
        "::INTEGER AS height, " +
        "(list_sum(cs)::DOUBLE / n) AS luma_mean FROM roll), " +
        "hist AS (SELECT doc_id, code, count(*) AS cnt FROM (" +
        "SELECT doc_id, unnest(cs) AS code FROM codes) GROUP BY 1, 2), " +
        "ent AS (SELECT hist.doc_id, " +
        "list_reduce(list_prepend(0.0, " +
        "list((cnt::DOUBLE / n) * ln(cnt::DOUBLE / n) / ln(2) " +
        "ORDER BY code)), (a, b) -> a - b) AS entropy " +
        "FROM hist JOIN codes ON hist.doc_id = codes.doc_id " +
        "GROUP BY hist.doc_id, codes.n) " +
        "SELECT d.doc_id, d.width, d.height, " +
        "round(coalesce(e.entropy, 0.0), 4) AS byte_entropy, d.luma_mean " +
        "FROM dims d LEFT JOIN ent e ON d.doc_id = e.doc_id " +
        "ORDER BY d.doc_id"))

  /** Exact n-gram Jaccard, all pairs of a bounded slice (the quadratic
    * baseline the LSH path approximates). */
  val q43NgramJaccard: GraftQuery = GraftQuery(
    "q43_ngram_jaccard",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).filter($"doc_id" < 30)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text")
        .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    },
    Some(
      "WITH sh AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))) " +
        "AS shingles FROM documents WHERE doc_id < 30) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "round(len(list_intersect(a.shingles, b.shingles))::DOUBLE / " +
        "len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id ORDER BY id_a, id_b"))

  /** EXACT whole-corpus Jaccard self-join
    * ([[Dedup.prefixFilterJaccardPairs]], AllPairs prefix filtering):
    * every pair at shingle Jaccard ≥ 0.5 with NO all-pairs term and no
    * LSH false negatives — the deterministic scale path q43 (bounded
    * quadratic baseline) and q44 (probabilistic MinHash) bracket. The
    * whole algorithm is relational (df ranking, per-doc prefix window,
    * inverted-index join on df-minimal shingles, candidate-constrained
    * intersection count), so unlike q44 this one carries a FULL DuckDB
    * oracle; DedupIngestSpec-style parity with the quadratic baseline
    * lives in OperatorsSpec (a same-algorithm oracle cannot see an
    * algorithmic false negative — the baseline check can). */
  val q161PrefixJaccard: GraftQuery = GraftQuery(
    "q161_prefix_jaccard",
    (s, d) => {
      import s.implicits._
      Dedup.prefixFilterJaccardPairs(Tables.documents(s, d), "doc_id",
          "text", threshold = 0.5)
        .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    },
    Some(
      "WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), " +
        "' ')))) AS t FROM documents), " +
        "sized AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id), " +
        "freq AS (SELECT t, count(*) AS tdf FROM sh GROUP BY t), " +
        "ranked AS (SELECT s.doc_id, s.t, z.m, row_number() OVER " +
        "(PARTITION BY s.doc_id ORDER BY f.tdf, s.t) AS pos " +
        "FROM sh s JOIN freq f USING (t) JOIN sized z USING (doc_id)), " +
        "pfx AS (SELECT * FROM ranked " +
        "WHERE pos <= m - ceil(m * 0.5) + 1), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "a.m AS m_a, b.m AS m_b " +
        "FROM pfx a JOIN pfx b ON a.t = b.t AND a.doc_id < b.doc_id " +
        "WHERE least(a.m, b.m)::DOUBLE >= greatest(a.m, b.m) * 0.5), " +
        "iv AS (SELECT c.id_a, c.id_b, c.m_a, c.m_b, count(*) AS i " +
        "FROM cand c JOIN sh x ON x.doc_id = c.id_a " +
        "JOIN sh y ON y.doc_id = c.id_b AND y.t = x.t " +
        "GROUP BY 1, 2, 3, 4) " +
        "SELECT id_a, id_b, round(i::DOUBLE / (m_a + m_b - i), 4) " +
        "AS jaccard FROM iv " +
        "WHERE i::DOUBLE / (m_a + m_b - i) >= 0.5 " +
        "ORDER BY id_a, id_b"))

  /** Ingest-time exact near-dup screen
    * ([[Dedup.prefixFilterJaccardAgainst]]): an incoming batch
    * (doc_id ≡ 7 mod 10) admission-checked against the corpus (the
    * rest) — every straddling pair at Jaccard ≥ 0.5, batch-internal
    * pairs excluded, canonical order from corpus df alone so the
    * corpus side could be a persisted index. The oracle replays the
    * prefix algorithm over STRING shingles with string tie-breaks
    * (Spark ties on xxhash64) — the candidate supersets differ, the
    * exact-verified answer cannot (a quadratic DuckDB cross join was
    * measured 3m+ at sf0.1; the independent quadratic parity check
    * lives in DedupSpec instead, Scala-side at sf0.001). */
  val q163PrefixJaccardIngest: GraftQuery = GraftQuery(
    "q163_prefix_jaccard_ingest",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      Dedup.prefixFilterJaccardAgainst(
          docs.filter($"doc_id" % 10 =!= 7),
          docs.filter($"doc_id" % 10 === 7),
          "doc_id", "text", threshold = 0.5)
        .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    },
    Some(
      "WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), " +
        "' ')))) AS t FROM documents), " +
        "c AS (SELECT * FROM sh WHERE doc_id % 10 != 7), " +
        "b AS (SELECT * FROM sh WHERE doc_id % 10 = 7), " +
        "freq AS (SELECT t, count(*) AS tdf FROM c GROUP BY t), " +
        "szc AS (SELECT doc_id, count(*) AS m FROM c GROUP BY doc_id), " +
        "szb AS (SELECT doc_id, count(*) AS m FROM b GROUP BY doc_id), " +
        "rc AS (SELECT s.doc_id, s.t, z.m, row_number() OVER " +
        "(PARTITION BY s.doc_id ORDER BY f.tdf, s.t) AS pos " +
        "FROM c s JOIN freq f USING (t) JOIN szc z USING (doc_id)), " +
        "rb AS (SELECT s.doc_id, s.t, z.m, row_number() OVER " +
        "(PARTITION BY s.doc_id ORDER BY coalesce(f.tdf, 0), s.t) AS pos " +
        "FROM b s LEFT JOIN freq f USING (t) JOIN szb z USING (doc_id)), " +
        "pc AS (SELECT * FROM rc WHERE pos <= m - ceil(m * 0.5) + 1), " +
        "pb AS (SELECT * FROM rb WHERE pos <= m - ceil(m * 0.5) + 1), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, " +
        "a.m AS m_a, b2.m AS m_b FROM pc a JOIN pb b2 ON a.t = b2.t " +
        "WHERE least(a.m, b2.m)::DOUBLE >= greatest(a.m, b2.m) * 0.5), " +
        "iv AS (SELECT cd.id_a, cd.id_b, cd.m_a, cd.m_b, count(*) AS i " +
        "FROM cand cd JOIN c x ON x.doc_id = cd.id_a " +
        "JOIN b y ON y.doc_id = cd.id_b AND y.t = x.t " +
        "GROUP BY 1, 2, 3, 4) " +
        "SELECT id_a, id_b, round(i::DOUBLE / (m_a + m_b - i), 4) " +
        "AS jaccard FROM iv " +
        "WHERE i::DOUBLE / (m_a + m_b - i) >= 0.5 " +
        "ORDER BY id_a, id_b"))

  /** EXACT containment join ([[Dedup.containmentPairs]]): every
    * DIRECTED pair where ≥80% of A's shingles land inside B — the
    * asymmetric near-dup (quotes, wrapped articles, doc-in-template)
    * that symmetric Jaccard can't see. Prefix only on the probe side
    * (the overlap bound t·|A| depends on A alone), full postings
    * right. The oracle replays the algorithm over string shingles
    * (candidate supersets may differ on tie order — the exact verified
    * answer cannot); the quadratic parity check lives in DedupSpec. */
  val q173ContainmentJoin: GraftQuery = GraftQuery(
    "q173_containment_join",
    (s, d) => {
      import s.implicits._
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.8)
        .select($"id_a", $"id_b",
          round($"containment", 4).as("containment"))
        .orderBy($"id_a", $"id_b")
    },
    Some(
      "WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), " +
        "' ')))) AS t FROM documents), " +
        "sz AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id), " +
        "freq AS (SELECT t, count(*) AS tdf FROM sh GROUP BY t), " +
        "pref AS (SELECT s.doc_id, s.t, z.m, row_number() OVER " +
        "(PARTITION BY s.doc_id ORDER BY f.tdf, s.t) AS pos " +
        "FROM sh s JOIN freq f USING (t) JOIN sz z USING (doc_id)), " +
        "pp AS (SELECT * FROM pref WHERE pos <= m - ceil(m * 0.8) + 1), " +
        "cand AS (SELECT DISTINCT p.doc_id AS id_a, s.doc_id AS id_b, " +
        "p.m AS m_a FROM pp p JOIN sh s ON s.t = p.t " +
        "AND s.doc_id != p.doc_id), " +
        "cs AS (SELECT c.id_a, c.id_b, c.m_a FROM cand c " +
        "JOIN sz z ON z.doc_id = c.id_b " +
        "WHERE z.m >= ceil(c.m_a * 0.8)), " +
        "iv AS (SELECT c.id_a, c.id_b, c.m_a, count(*) AS i FROM cs c " +
        "JOIN sh x ON x.doc_id = c.id_a " +
        "JOIN sh y ON y.doc_id = c.id_b AND y.t = x.t " +
        "GROUP BY 1, 2, 3) " +
        "SELECT id_a, id_b, round(i::DOUBLE / m_a, 4) AS containment " +
        "FROM iv WHERE i::DOUBLE / m_a >= 0.8 " +
        "ORDER BY id_a, id_b"))

  /** Span-level exact substring dedup ([[Dedup.duplicateSpans]]): every
    * maximal 8-token-window span appearing verbatim in ≥2 documents —
    * doc-level near-dup misses these when the rest of the doc differs.
    * Linear shape (aggregate + self-join on the gram key, no pair
    * enumeration); oracle replays the full gaps-and-islands merge. */
  val q109DupSpans: GraftQuery = GraftQuery(
    "q109_dup_spans",
    (s, d) => {
      import s.implicits._
      // the shared span artifact groups/joins on xxhash64(gram), the
      // 100 TB shuffle key — span VALUES are identical to string keying
      // (2^-64 collisions), which the string-keyed DuckDB oracle checks;
      // built once per JVM, also q113's identification input
      AnnIndexes.dupSpans(s, d)
        .select($"id".as("doc_id"), $"span_start", $"span_end",
          $"span_tokens")
        .orderBy($"doc_id", $"span_start")
    },
    Some(
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS toks " +
        "FROM documents), " +
        "win AS (SELECT doc_id, i AS pos, " +
        "array_to_string(toks[i : i + 7], ' ') AS gram " +
        "FROM t, unnest(generate_series(1, len(toks) - 7)) AS s(i)), " +
        "dup AS (SELECT gram FROM win GROUP BY gram " +
        "HAVING count(DISTINCT doc_id) >= 2), " +
        "mk AS (SELECT w.doc_id, w.pos FROM win w JOIN dup USING (gram)), " +
        "g AS (SELECT doc_id, pos, CASE WHEN pos - coalesce(lag(pos) " +
        "OVER (PARTITION BY doc_id ORDER BY pos), pos) > 8 " +
        "THEN 1 ELSE 0 END AS gap FROM mk), " +
        "isl AS (SELECT doc_id, pos, sum(gap) OVER (PARTITION BY doc_id " +
        "ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM g) " +
        "SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end, " +
        "max(pos) + 7 - min(pos) + 1 AS span_tokens FROM isl " +
        "GROUP BY doc_id, island ORDER BY doc_id, span_start"))

  /** Span excision ([[Dedup.exciseDuplicateSpans]]): the corpus with
    * every duplicated 8-token span stripped — q109's identify step
    * completed by the decontamination rewrite. The oracle replays
    * identification AND the positional token rebuild. */
  val q113ExciseSpans: GraftQuery = GraftQuery(
    "q113_excise_spans",
    (s, d) => {
      import s.implicits._
      // identification is served from the shared span artifact (built
      // once, also q109's source); only the excision rewrite runs here —
      // the production split (dedup-spans CLI artifact → rewrite pass)
      Dedup.exciseSpans(Tables.documents(s, d), "doc_id", "text",
          AnnIndexes.dupSpans(s, d))
        .select($"doc_id", $"n_removed".cast("long").as("n_removed"),
          $"clean_text")
        .orderBy($"doc_id")
    },
    Some(
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS toks " +
        "FROM documents), " +
        "win AS (SELECT doc_id, i AS pos, " +
        "array_to_string(toks[i : i + 7], ' ') AS gram " +
        "FROM t, unnest(generate_series(1, len(toks) - 7)) AS s(i)), " +
        "dup AS (SELECT gram FROM win GROUP BY gram " +
        "HAVING count(DISTINCT doc_id) >= 2), " +
        "mk AS (SELECT w.doc_id, w.pos FROM win w JOIN dup USING (gram)), " +
        "g AS (SELECT doc_id, pos, CASE WHEN pos - coalesce(lag(pos) " +
        "OVER (PARTITION BY doc_id ORDER BY pos), pos) > 8 " +
        "THEN 1 ELSE 0 END AS gap FROM mk), " +
        "isl AS (SELECT doc_id, pos, sum(gap) OVER (PARTITION BY doc_id " +
        "ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM g), " +
        "sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e " +
        "FROM isl GROUP BY doc_id, island), " +
        "tok AS (SELECT doc_id, unnest(toks) AS tk, " +
        "unnest(generate_series(1, len(toks))) AS p FROM t), " +
        "keep AS (SELECT k.doc_id, k.tk, k.p FROM tok k " +
        "WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = k.doc_id " +
        "AND k.p BETWEEN sp.s AND sp.e)) " +
        "SELECT d.doc_id, " +
        "len(string_split(d.text,' ')) - coalesce(k.n_kept, 0) " +
        "AS n_removed, coalesce(k.txt, '') AS clean_text " +
        "FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n_kept, " +
        "string_agg(tk, ' ' ORDER BY p) AS txt FROM keep GROUP BY doc_id) " +
        "k USING (doc_id) ORDER BY d.doc_id"))

  /** PageRank over the part–supplier bipartite graph
    * ([[graft.operators.Graph.pageRankUndirected]]): parts and
    * suppliers as disjoint node spaces (2·part / 2·supp+1), one edge
    * per distinct sourcing pair, 10 fixed power-iteration rounds. The
    * oracle UNROLLS the identical ten rounds as chained CTEs — every
    * rank hash-checked, not just the shape. */
  val q120PageRank: GraftQuery = GraftQuery(
    "q120_pagerank",
    (s, d) => {
      import s.implicits._
      val edges = Tables.lineitem(s, d)
        .select(($"l_partkey" * 2).as("id_a"),
          ($"l_suppkey" * 2 + 1).as("id_b"))
        .distinct()
      graft.operators.Graph.pageRankUndirected(edges, "id_a", "id_b")
        .select($"id", round($"rank", 8).as("rank"))
        .orderBy($"id")
    },
    Some {
      val base =
        "WITH e AS (SELECT DISTINCT l_partkey * 2 AS src, " +
          "l_suppkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS (SELECT src, dst FROM e " +
          "UNION ALL SELECT dst, src FROM e), " +
          "deg AS (SELECT src AS id, count(*) AS deg FROM und " +
          "GROUP BY src), " +
          "nn AS (SELECT count(*)::DOUBLE AS n FROM deg), " +
          "pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM deg)"
      val rounds = (1 to 10).map { i =>
        s", pr$i AS (SELECT d.id, 0.15 / (SELECT n FROM nn) + " +
          "0.85 * coalesce(s.c, 0) AS rank FROM deg d LEFT JOIN " +
          "(SELECT u.dst AS id, sum(p.rank / dg.deg) AS c FROM und u " +
          s"JOIN pr${i - 1} p ON u.src = p.id " +
          "JOIN deg dg ON dg.id = u.src GROUP BY u.dst) s USING (id))"
      }.mkString
      base + rounds +
        " SELECT id, round(rank, 8) AS rank FROM pr10 ORDER BY id"
    })

  /** Per-node triangle counts + local clustering coefficient
    * ([[graft.operators.Graph.triangleCounts]]) over the part
    * co-purchase graph (parts sharing an order). The Spark side
    * enumerates each triangle ONCE via degree-oriented wedges (the
    * O(m^1.5) bound); the oracle counts the identical triangle set
    * with an unoriented three-way self-join — same corners, different
    * plan, every count and coefficient hash-checked. */
  val q166TriangleCount: GraftQuery = GraftQuery(
    "q166_triangle_count",
    (s, d) => {
      import s.implicits._
      // the shared per-JVM co-purchase edge artifact (per-order part
      // sets → in-core pair expansion, persisted once): groups are
      // bounded (≤7 lineitems/order), so the expansion replaces a
      // whole shuffle round vs a pe×pe self-join (measured ~2 s at
      // sf0.1), and q168 reruns nothing — the oracle's self-join
      // formulation yields the same edges
      val pairs = AnnIndexes.coPurchasePairs(s, d)
        .select($"id_a", $"id_b")
      graft.operators.Graph.triangleCounts(pairs, "id_a", "id_b")
        .orderBy($"id")
    },
    Some(
      "WITH pe AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
        "FROM lineitem), " +
        "e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM pe x " +
        "JOIN pe y ON x.o = y.o AND x.p < y.p), " +
        "und AS (SELECT a AS id, b AS nb FROM e " +
        "UNION ALL SELECT b AS id, a AS nb FROM e), " +
        "deg AS (SELECT id, count(*) AS deg FROM und GROUP BY id), " +
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 " +
        "JOIN e e2 ON e2.a = e1.b " +
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), " +
        "corners AS (SELECT x AS id FROM tri " +
        "UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri), " +
        "per AS (SELECT id, count(*) AS n_tri FROM corners GROUP BY id) " +
        "SELECT d.id, d.deg, coalesce(p.n_tri, 0) AS n_tri, " +
        "round((CASE WHEN d.deg >= 2 THEN " +
        "(2 * coalesce(p.n_tri, 0))::DOUBLE / (d.deg * (d.deg - 1)) " +
        "ELSE 0 END)::DOUBLE, 6) AS lcc " +
        "FROM deg d LEFT JOIN per p USING (id) ORDER BY d.id"))

  /** PERSONALIZED PageRank
    * ([[graft.operators.Graph.personalizedPageRank]]) on the q120
    * part–supplier graph, restart mass on three seed parts — ranks
    * measure sourcing proximity to the seed set (the canonical-doc /
    * related-item primitive). The oracle unrolls the identical ten
    * rounds with the seed-indicator teleport as a CASE — every rank
    * hash-checked at 8 dp. */
  val q172PersonalizedPageRank: GraftQuery = GraftQuery(
    "q172_personalized_pagerank",
    (s, d) => {
      import s.implicits._
      val edges = Tables.lineitem(s, d)
        .select(($"l_partkey" * 2).as("id_a"),
          ($"l_suppkey" * 2 + 1).as("id_b"))
        .distinct()
      graft.operators.Graph.personalizedPageRank(edges, "id_a", "id_b",
          seeds = Seq(14L, 22L, 26L))
        .select($"id", round($"rank", 8).as("rank"))
        .orderBy($"id")
    },
    Some {
      val seedsIn = "(14, 22, 26)"
      val base =
        "WITH e AS (SELECT DISTINCT l_partkey * 2 AS src, " +
          "l_suppkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS (SELECT src, dst FROM e " +
          "UNION ALL SELECT dst, src FROM e), " +
          "deg AS (SELECT src AS id, count(*) AS deg FROM und " +
          "GROUP BY src), " +
          // teleport replayed as the IDENTICAL IEEE ops Spark runs:
          // (1 - 0.85) in doubles is 0.15000000000000002, one ulp OFF
          // the decimal literal 0.15 — spelled 1::DOUBLE - 0.85::DOUBLE
          // so ten amplified rounds can't drift a rank across an 8-dp
          // rounding boundary (the q156 midpoint lesson, fp edition)
          "pr0 AS (SELECT id, CASE WHEN id IN " + seedsIn +
          " THEN 1::DOUBLE/3 ELSE 0 END AS rank FROM deg)"
      val rounds = (1 to 10).map { i =>
        s", pr$i AS (SELECT d.id, (CASE WHEN d.id IN $seedsIn " +
          "THEN (1::DOUBLE - 0.85::DOUBLE)/3 ELSE 0 END) + " +
          "0.85 * coalesce(s.c, 0) AS rank FROM deg d LEFT JOIN " +
          "(SELECT u.dst AS id, sum(p.rank / dg.deg) AS c FROM und u " +
          s"JOIN pr${i - 1} p ON u.src = p.id " +
          "JOIN deg dg ON dg.id = u.src GROUP BY u.dst) s USING (id))"
      }.mkString
      base + rounds +
        " SELECT id, round(rank, 8) AS rank FROM pr10 ORDER BY id"
    })

  /** Community detection by deterministic synchronous label
    * propagation ([[graft.operators.Graph.labelPropagation]]) over the
    * REPEAT co-purchase graph (part pairs sharing ≥2 orders — the
    * ≥2 support prunes 97% of incidental co-occurrence edges and
    * leaves real communities). Four fixed rounds, ties to the smallest
    * label; the oracle unrolls the identical four rounds as chained
    * CTEs with the same (count DESC, label ASC) argmax — every final
    * label hash-checked. */
  val q168LabelPropagation: GraftQuery = GraftQuery(
    "q168_label_propagation",
    (s, d) => {
      import s.implicits._
      val pairs = AnnIndexes.coPurchasePairs(s, d)
        .filter($"n" >= 2).select($"id_a", $"id_b")
      graft.operators.Graph.labelPropagation(pairs, "id_a", "id_b")
        .orderBy($"id")
    },
    Some {
      val base =
        "WITH pe AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem), " +
          "e AS (SELECT x.p AS a, y.p AS b FROM pe x " +
          "JOIN pe y ON x.o = y.o AND x.p < y.p " +
          "GROUP BY 1, 2 HAVING count(*) >= 2), " +
          "und AS (SELECT a AS src, b AS dst FROM e " +
          "UNION ALL SELECT b AS src, a AS dst FROM e), " +
          "l0 AS (SELECT DISTINCT src AS id, src AS lab FROM und)"
      val rounds = (1 to 4).map { i =>
        s", c$i AS (SELECT u.dst AS id, l.lab, count(*) AS c " +
          s"FROM und u JOIN l${i - 1} l ON u.src = l.id GROUP BY 1, 2), " +
          s"l$i AS (SELECT id, lab FROM (SELECT id, lab, row_number() " +
          "OVER (PARTITION BY id ORDER BY c DESC, lab) AS rn " +
          s"FROM c$i) WHERE rn = 1)"
      }.mkString
      base + rounds + " SELECT id, lab FROM l4 ORDER BY id"
    })

  /** Perceptual image near-dup detection ([[Multimodal.dHash64]] +
    * [[Dedup.hammingNearDups]]): every doc carries a real PNG (derived
    * deterministically from its doc_id — block luma from a seeded
    * hash), and docs with doc_id ≡ 1 (mod 40) carry a REPLICA of their
    * predecessor's image at 2× resolution, +4 global brightness, and a
    * ±1 checkerboard dither — the resize/re-encode/brightness
    * perturbations dHash is built to absorb. The pipeline (decode →
    * 64-bit signature → pigeonhole-banded pairing) must recover
    * exactly the planted replica pairs at Hamming 0 and nothing else.
    * Rows-only: no SQL engine decodes PNGs — determinism is pinned by
    * the seeded synthesis and OperatorsSpec's invariance tests. */
  val q167ImageNearDups: GraftQuery = GraftQuery(
    "q167_image_neardups",
    (s, d) => {
      import s.implicits._
      // synthesis shared with the --mm scale sweep (see
      // [[Multimodal.syntheticPng]] for the fmix64 + twin contract);
      // materialized once per JVM so repeats measure the pipeline
      val imgs = AnnIndexes.syntheticImages(s, d)
      val sigs = Multimodal.imageDHashes(imgs)
      graft.operators.Dedup.hammingNearDups(sigs, maxHamming = 2)
        .select($"id_a", $"id_b", $"hamming")
        .orderBy($"id_a", $"id_b")
    })

  /** Perceptual AUDIO near-dup detection ([[Multimodal.audioHash64]] +
    * [[Dedup.hammingNearDups]]) — the audio mirror of q167: every doc
    * carries a real PCM WAV (65-segment square-wave envelope, segment
    * amplitudes from the seeded fmix64 hash), and docs ≡ 1 (mod 40)
    * carry their predecessor's clip at HALF volume and DOUBLE sample
    * rate — the volume/resample transforms the energy-contour hash is
    * built to absorb (square carrier ⇒ window RMS = amplitude exactly,
    * at any rate). Must recover exactly the planted replica pairs at
    * Hamming 0. Rows-only: no SQL engine decodes WAV. */
  val q170AudioNearDups: GraftQuery = GraftQuery(
    "q170_audio_neardups",
    (s, d) => {
      import s.implicits._
      // synthesis shared with the --mm scale sweep (see
      // [[Multimodal.syntheticWav]] for the fmix64 + twin contract);
      // materialized once per JVM so repeats measure the pipeline
      val clips = AnnIndexes.syntheticAudio(s, d)
      val sigs = Multimodal.audioFingerprints(clips)
      graft.operators.Dedup.hammingNearDups(sigs, maxHamming = 2)
        .select($"id_a", $"id_b", $"hamming")
        .orderBy($"id_a", $"id_b")
    })

  /** MinHash + LSH banding near-dup detection (finds the corpus's planted
    * near-dup pairs); hash family is engine-side → rows-only. */
  val q44MinhashNearDups: GraftQuery = GraftQuery(
    "q44_minhash_neardups",
    (s, d) => {
      import s.implicits._
      Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.5)
        .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    })

  /** MinHash-LSH with the md5 hash family
    * ([[Dedup.minhashNearDupsReplayable]]) — the ORACLED face of q44:
    * for the first time the banded candidate generation itself is
    * replayed in SQL (8 signatures = lexicographic mins of salted md5,
    * 4 bands of 2), not just a verified answer. The production path
    * (q44) keeps xxhash64 longs for shuffle width and stays
    * rows-only; both must find the same planted near-dup structure. */
  val q176LshOracled: GraftQuery = GraftQuery(
    "q176_lsh_oracled",
    (s, d) => {
      import s.implicits._
      Dedup.minhashNearDupsReplayable(Tables.documents(s, d),
          "doc_id", "text")
        .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    },
    Some {
      val mins = (0 until 8).map(j =>
        s"list_min(list_transform(sh, s -> md5('$j|' || s))) AS s$j")
        .mkString(", ")
      val bandRows = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, s${2 * b} || '#' || s${2 * b + 1} " +
          "AS key FROM sig").mkString(" UNION ALL ")
      "WITH t AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), " +
        "' '))) AS sh FROM documents), " +
        s"sig AS (SELECT doc_id, $mins FROM t), " +
        s"b AS ($bandRows), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b " +
        "FROM b a JOIN b c ON a.band = c.band AND a.key = c.key " +
        "AND a.doc_id < c.doc_id), " +
        "v AS (SELECT cd.id_a, cd.id_b, " +
        "len(list_intersect(x.sh, y.sh)) AS i, " +
        "len(x.sh) AS ma, len(y.sh) AS mb FROM cand cd " +
        "JOIN t x ON x.doc_id = cd.id_a JOIN t y ON y.doc_id = cd.id_b) " +
        "SELECT id_a, id_b, round(i::DOUBLE / (ma + mb - i), 4) " +
        "AS jaccard FROM v WHERE i::DOUBLE / (ma + mb - i) >= 0.5 " +
        "ORDER BY id_a, id_b"
    })

  /** The STREAMING near-dup screen ([[graft.streaming.NearDupStream]]):
    * the odd-id half of the corpus is indexed once
    * ([[Dedup.writeReplayableIndex]] — md5 band keys + shingle sets),
    * the even-id half arrives as four parquet files, and every
    * micro-batch LSH-screens itself against the persisted index. The
    * whole screen — signatures, banding, the stream-static candidate
    * join, exact-Jaccard verification — replays in DuckDB (the q176
    * family restricted to cross pairs), so the appended union
    * hash-matches an ANSI oracle: q202's contract applied to dedup.
    * The production ingest loop (q163/`dedup-ingest`, xxhash64, index
    * growth) stays rows-only; this is its oracled verification twin. */
  val q203StreamNearDup: GraftQuery = GraftQuery(
    "q203_stream_neardup",
    (s, d) => {
      import s.implicits._
      // index + backlog are pure functions of sfDir: built once per
      // JVM; each execution replays the stream against them through a
      // fresh checkpoint (the measured pipeline)
      val idx = AnnIndexes.prepared("q203idx", d) { p =>
        Dedup.writeReplayableIndex(
          Tables.documents(s, d).filter($"doc_id" % 2 === 1),
          "doc_id", "text", p)
      }
      val src = AnnIndexes.prepared("q203src", d) { p =>
        Tables.documents(s, d).filter($"doc_id" % 2 === 0)
          .repartition(4)
          .write.mode("overwrite").parquet(p)
      }
      val root = Scratch.dir("graft_q203")
      graft.streaming.NearDupStream.runToCompletion(s, src,
        idx, s"$root/out", s"$root/chk")
      graft.streaming.NearDupStream.readOutput(s, s"$root/out")
        .select($"new_id", $"corpus_id", round($"jaccard", 4).as("jaccard"))
        .orderBy($"new_id", $"corpus_id")
    },
    Some {
      val mins = (0 until 8).map(j =>
        s"list_min(list_transform(sh, s -> md5('$j|' || s))) AS s$j")
        .mkString(", ")
      val bandRows = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, s${2 * b} || '#' || s${2 * b + 1} " +
          "AS key FROM sig").mkString(" UNION ALL ")
      "WITH t AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), " +
        "' '))) AS sh FROM documents), " +
        s"sig AS (SELECT doc_id, $mins FROM t), " +
        s"b AS ($bandRows), " +
        "cand AS (SELECT DISTINCT a.doc_id AS new_id, c.doc_id " +
        "AS corpus_id FROM b a JOIN b c ON a.band = c.band " +
        "AND a.key = c.key WHERE a.doc_id % 2 = 0 AND c.doc_id % 2 = 1), " +
        "v AS (SELECT cd.new_id, cd.corpus_id, " +
        "len(list_intersect(x.sh, y.sh)) AS i, " +
        "len(x.sh) AS ma, len(y.sh) AS mb FROM cand cd " +
        "JOIN t x ON x.doc_id = cd.new_id " +
        "JOIN t y ON y.doc_id = cd.corpus_id) " +
        "SELECT new_id, corpus_id, round(i::DOUBLE / (ma + mb - i), 4) " +
        "AS jaccard FROM v WHERE i::DOUBLE / (ma + mb - i) >= 0.5 " +
        "ORDER BY new_id, corpus_id"
    })

  /** SimHash near-dup candidates (Hamming ≤ 6 over 64-bit signatures,
    * pigeonhole-banded). */
  val q45SimhashNearDups: GraftQuery = GraftQuery(
    "q45_simhash_neardups",
    (s, d) => {
      import s.implicits._
      Dedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 6)
        .orderBy($"id_a", $"id_b")
    })

  /** SimHash with the md5 bit family
    * ([[Dedup.simhashNearDupsReplayable]]) — the ORACLED face of q45,
    * completing the replayable trilogy (q176 LSH, q177 DSIR): every
    * stage — per-token bits from md5 hex nibbles, per-bit votes,
    * signatures, pigeonhole chunk keys, Hamming distances — is
    * recomputed by DuckDB from the identical md5 strings and
    * hash-checked. Production q45 keeps the FNV family (pure JVM
    * arithmetic, no digest allocation per token). */
  val q178SimhashOracled: GraftQuery = GraftQuery(
    "q178_simhash_oracled",
    (s, d) => {
      import s.implicits._
      Dedup.simhashNearDupsReplayable(Tables.documents(s, d),
          "doc_id", "text", maxHamming = 3)
        .orderBy($"id_a", $"id_b")
    },
    Some(
      "WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok " +
        "FROM documents), " +
        "h AS (SELECT doc_id, substr(md5(tok), 1, 16) AS hx FROM t), " +
        "bits AS (SELECT doc_id, (p - 1) * 4 + b AS bit, " +
        "CASE WHEN (('0x' || substr(hx, p, 1))::INT >> b) & 1 = 1 " +
        "THEN 1 ELSE -1 END AS v FROM h, " +
        "generate_series(1, 16) AS s(p), " +
        "generate_series(0, 3) AS s2(b)), " +
        "sig AS (SELECT doc_id, bit, CASE WHEN sum(v) > 0 THEN '1' " +
        "ELSE '0' END AS sb FROM bits GROUP BY 1, 2), " +
        "ss AS (SELECT doc_id, string_agg(sb, '' ORDER BY bit) AS s " +
        "FROM sig GROUP BY doc_id), " +
        "bd AS (SELECT doc_id, s, c, substr(s, c * 16 + 1, 16) AS key " +
        "FROM ss, generate_series(0, 3) AS g(c)), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, " +
        "a.s AS sa, b2.s AS sb FROM bd a JOIN bd b2 ON a.c = b2.c " +
        "AND a.key = b2.key AND a.doc_id < b2.doc_id), " +
        "hm AS (SELECT id_a, id_b, len(list_filter(" +
        "generate_series(1, 64), i -> substr(sa, i, 1) != " +
        "substr(sb, i, 1))) AS hamming FROM cand) " +
        "SELECT id_a, id_b, hamming::INT AS hamming FROM hm " +
        "WHERE hamming <= 3 ORDER BY id_a, id_b"))

  /** Embedding-cosine near-dup pairs above a threshold, BLOCKED on the
    * label column: exact scoring only within blocks, so pair count scales
    * with Σ|block|² instead of n² — the shape that survives a large
    * corpus (an unblocked all-pairs version of this query took 100+s at
    * sf0.1; blocked it is ~25× cheaper with identical within-block
    * results). Oracle-checked: DuckDB computes the same blocked join with
    * identical double accumulation. */
  val q46EmbeddingNearDups: GraftQuery = GraftQuery(
    "q46_embedding_neardups",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val a = e.select($"label", $"vec_id".as("id_a"), $"embedding".as("va"))
      val b = e.select($"label", $"vec_id".as("id_b"), $"embedding".as("vb"))
      a.join(b, Seq("label")).filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", Similarity.cosine($"va", $"vb").as("c"))
        .filter($"c" >= 0.4)
        .select($"id_a", $"id_b", round($"c", 6).as("cos"))
        .orderBy($"id_a", $"id_b")
    },
    Some(
      "SELECT id_a, id_b, round(c, 6) AS cos FROM (" +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * " +
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c " +
        "FROM embeddings a JOIN embeddings b " +
        "ON a.label = b.label AND a.vec_id < b.vec_id) " +
        "WHERE c >= 0.4 ORDER BY id_a, id_b"))

  /** Recall@10 of the sign-LSH ANN path vs exact top-10 per query —
    * deterministic given the seed; rows-only. The exact baseline comes
    * from the shared per-JVM cache ([[AnnIndexes.exactCosineTopK]]) so
    * q47 and q66 grade against ONE brute-force computation. */
  val q47AnnRecall: GraftQuery = GraftQuery(
    "q47_ann_recall",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val c = e.select($"vec_id", $"embedding".as("cv"))
      Similarity.assertRecallFloor(
        Similarity.annRecall(q, c, "query_id", "qv", "vec_id", "cv",
          k = 10, bits = 4, seed = 42L,
          exact = Some(AnnIndexes.exactCosineTopK(s, d, 10))),
        floor = Similarity.RecallFloors.floor("q47", d))
        .select($"query_id", round($"recall", 2).as("recall"),
          $"min_recall")
        .orderBy($"query_id")
    })

  /** Heuristic language ID (stopword-profile argmax), oracle-checked. */
  val q48LangId: GraftQuery = GraftQuery(
    "q48_langid",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", TextFunctions.langId($"text").as("lang_pred"))
        .orderBy($"doc_id")
    },
    Some {
      val ratios = TextFunctions.stopwordProfiles.map { case (lang, words) =>
        val set = words.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(string_split(lower(text), ' '), " +
          s"w -> w IN ($set)))::DOUBLE / len(string_split(lower(text), ' ')) AS s_$lang"
      }.mkString(", ")
      val langs = TextFunctions.stopwordProfiles.map(_._1)
      val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val cases = langs.map(l =>
        s"WHEN s_$l >= 0.02 AND s_$l = $best THEN '$l'").mkString(" ")
      s"SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred FROM " +
        s"(SELECT doc_id, $ratios FROM documents) ORDER BY doc_id"
    })

  /** Composite quality score, oracle-checked. */
  val q49QualityScore: GraftQuery = GraftQuery(
    "q49_quality_score",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", TextFunctions.qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, round(" +
        "least(n_tok / 64.0, 1.0) * 0.4 + " +
        "(n_distinct / n_tok) * 0.4 + " +
        "(CASE WHEN (n_chars - n_tok + 1.0) / n_tok BETWEEN 3.0 AND 9.0 " +
        "THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality FROM (" +
        "SELECT doc_id, " +
        "len(string_split(text, ' '))::DOUBLE AS n_tok, " +
        "len(list_distinct(string_split(lower(text), ' ')))::DOUBLE AS n_distinct, " +
        "length(text)::DOUBLE AS n_chars FROM documents) ORDER BY doc_id"))

  /** Order-sensitive polynomial fingerprint of the token stream,
    * oracle-checked (mod-every-step keeps both engines in exact-integer
    * range). */
  val q50Fingerprint: GraftQuery = GraftQuery(
    "q50_fingerprint",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", TextFunctions.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, list_reduce(list_prepend(7, " +
        "list_transform(string_split(text, ' '), " +
        "t -> (length(t) + ascii(t))::BIGINT)), " +
        "(acc, t) -> (acc * 31 + t) % 1000000007) AS fp " +
        "FROM documents ORDER BY doc_id"))

  /** BPE-ish subword count estimate, oracle-checked. */
  val q51SubwordCount: GraftQuery = GraftQuery(
    "q51_subword_count",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          TextFunctions.subwordCountEstimate($"text").as("n_subwords"),
          TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, list_reduce(list_prepend(0, " +
        "list_transform(string_split(text, ' '), " +
        "t -> 1 + (length(t) - 1) // 4)), (acc, t) -> acc + t)::BIGINT " +
        "AS n_subwords, " +
        "len(string_split(text, ' '))::BIGINT AS n_tokens " +
        "FROM documents ORDER BY doc_id"))

  /** Salted skew join — semantics-preserving, so it's oracle-checked
    * against the PLAIN join: revenue per order-priority via
    * lineitem⋈orders with the join key salted 8 ways. */
  val q63SaltedJoin: GraftQuery = GraftQuery(
    "q63_salted_join",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val o = Tables.orders(s, d)
        .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
      graft.operators.SkewJoin.saltedInnerJoin(li, o, "l_orderkey", salts = 8)
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy($"o_orderpriority")
    },
    Some(
      "SELECT o_orderpriority, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY o_orderpriority"))

  /** ANN top-k per query via the sign-LSH bucket index (rows-only:
    * approximate by construction, deterministic given the seed). */
  val q64AnnTopK: GraftQuery = GraftQuery(
    "q64_ann_topk",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val c = e.select($"vec_id", $"embedding".as("cv"))
      graft.operators.Similarity.annTopK(q, c, "query_id", "qv", "vec_id",
        "cv", k = 5, bits = 4, seed = 42L)
        .select($"query_id", $"vec_id", round($"cos", 6).as("cos"), $"rk")
        .orderBy($"query_id", $"rk")
    })

  /** Sign-LSH ANN with the md5 hyperplane family
    * ([[graft.operators.Similarity.annTopKReplayable]]) — the ORACLED
    * face of q64, extending the replayable trilogy to the ANN index
    * stack: hyperplane signs are md5-nibble parities, bucket bits are
    * decided over EXACT integer arithmetic (vectors quantized to
    * round(x·10⁶) longs, ±1 weights — no float-order wobble can flip a
    * bucket between engines), and the within-bucket cosine ranking is
    * the q153-proven list-kernel parity. Production q64 keeps seeded
    * Gaussian hyperplanes and stays rows-only. */
  val q179AnnOracled: GraftQuery = GraftQuery(
    "q179_ann_oracled",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val c = e.select($"vec_id", $"embedding".as("cv"))
      graft.operators.Similarity.annTopKReplayable(q, c, "query_id",
          "qv", "vec_id", "cv", k = 5, bits = 4)
        .select($"query_id", $"vec_id", round($"cos", 6).as("cos"), $"rk")
        .orderBy($"query_id", $"rk")
    },
    Some(
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
        "list_transform(embedding::DOUBLE[], " +
        "x -> round(x * 1000000)::BIGINT) AS qv FROM embeddings), " +
        "pl AS (SELECT j, list_transform(generate_series(0, 63), " +
        "i -> CASE WHEN ('0x' || substr(md5(j::VARCHAR || '|' || " +
        "i::VARCHAR), 1, 1))::INT % 2 = 1 THEN 1::BIGINT " +
        "ELSE (-1)::BIGINT END) AS w " +
        "FROM generate_series(0, 3) AS g(j)), " +
        "bj AS (SELECT e.vec_id, pl.j, list_sum(list_transform(" +
        "range(1, 65), k -> e.qv[k] * pl.w[k])) AS d FROM e, pl), " +
        "bk AS (SELECT vec_id, sum(CASE WHEN d > 0 THEN (1 << j) " +
        "ELSE 0 END)::INT AS bucket FROM bj GROUP BY vec_id), " +
        "q AS (SELECT e.vec_id AS query_id, e.v AS qvec, bk.bucket " +
        "FROM e JOIN bk USING (vec_id) WHERE vec_id < 5), " +
        "c AS (SELECT e.vec_id AS cand_id, e.v AS cvec, bk.bucket " +
        "FROM e JOIN bk USING (vec_id)), " +
        "sc AS (SELECT q.query_id, c.cand_id, " +
        "list_dot_product(q.qvec, c.cvec) / " +
        "(sqrt(list_dot_product(q.qvec, q.qvec)) * " +
        "sqrt(list_dot_product(c.cvec, c.cvec))) AS cos_raw " +
        "FROM q JOIN c USING (bucket) WHERE c.cand_id != q.query_id) " +
        "SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rk FROM (" +
        "SELECT query_id, cand_id AS vec_id, cos_raw, row_number() " +
        "OVER (PARTITION BY query_id ORDER BY cos_raw DESC, cand_id) " +
        "AS rk FROM sc) WHERE rk <= 5 ORDER BY query_id, rk"))

  /** Sketch-based approximate aggregates (HLL distinct + t-digest-style
    * quantile): the 100 TB substitutes for exact countDistinct /
    * percentile when a 1-2% error is acceptable. Deterministic
    * (merge-order-independent sketches) but engine-specific → rows-only. */
  val q65ApproxStats: GraftQuery = GraftQuery(
    "q65_approx_stats",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          round(element_at(percentile_approx($"l_extendedprice",
            typedLit(Seq(0.5)), lit(1000)), 1), 2).as("approx_median"))
        .orderBy($"l_returnflag")
    })

  /** The EXACT half of q65's approx-vs-exact pair, split out as its own
    * oracled row (the q153/q154 component-split pattern): exact distinct
    * part count and exact interpolated median price per return flag,
    * hash-matched against DuckDB. q65 stays rows-only because the HLL /
    * t-digest estimates are engine-specific — this row pins the ground
    * truth those estimates are judged against, so a q65 drift can be
    * attributed to the sketch side alone.
    *
    * Rounding pin (an oracle trap caught at sf0.001): on an even count
    * the interpolated median is the midpoint of two 2-dp prices — an
    * exact multiple of 0.005 — but Spark computes it as 0.5·a + 0.5·b
    * while DuckDB computes a + 0.5·(b − a), which differ by ~1 ulp. A
    * 2-dp round puts its boundary EXACTLY on that midpoint and the ulp
    * decides the flip; a 3-dp round's boundaries are 0.0005 away — far
    * beyond any ulp wobble — so both engines land on the same 3-dp grid
    * point. */
  val q156ExactStats: GraftQuery = GraftQuery(
    "q156_exact_stats",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("exact_parts"),
          round(percentile($"l_extendedprice", lit(0.5)), 3)
            .as("exact_median"))
        .orderBy($"l_returnflag")
    },
    Some("SELECT l_returnflag, " +
      "count(DISTINCT l_partkey) AS exact_parts, " +
      "round(quantile_cont(l_extendedprice, 0.5), 3) AS exact_median " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))

  /** Recall@10 of the IVF coarse-quantization ANN path (16 lists, probe
    * 4) vs exact top-10 — the scale path for similarity search: per-query
    * candidate cost ~nprobe/nlist of the corpus. Deterministic (seeded
    * LocalKMeans centroids); rows-only. Served from the PERSISTED index
    * ([[AnnIndexes.ivfCosine]]): built once per JVM, probed via explicit
    * bucket-partition pruning, centroids never retrained per execution;
    * the exact baseline is the shared cached one. */
  val q66IvfRecall: GraftQuery = GraftQuery(
    "q66_ivf_recall",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val (centroids, buckets) = AnnIndexes.ivfCosine(s, d)
      Similarity.assertRecallFloor(
        graft.operators.IvfIndex.recallAgainstIndex(q, centroids, buckets,
          "query_id", "qv", k = 10, nprobe = 4,
          exact = Some(AnnIndexes.exactCosineTopK(s, d, 10))),
        floor = Similarity.RecallFloors.floor("q66", d))
        .select($"query_id", round($"recall", 2).as("recall"),
          $"min_recall")
        .orderBy($"query_id")
    })

  /** Forward as-of join (earliest right row at/after the left ts) —
    * oracle = DuckDB ASOF with the inequality flipped. */
  val q73AsOfForward: GraftQuery = GraftQuery(
    "q73_asof_forward",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts")
      AsOfJoin.forward(purchases, clicks, Seq("user_id"), "ts", "ts")
        .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
          unix_millis($"ts_asof").as("next_click_ms"))
        .orderBy($"event_id")
    },
    Some(
      "WITH purch AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "clicks AS (SELECT user_id, ts FROM events " +
        "WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, " +
        "epoch_ms(c.ts) AS next_click_ms " +
        "FROM purch p ASOF LEFT JOIN clicks c " +
        "ON p.user_id = c.user_id AND c.ts >= p.ts " +
        "ORDER BY p.event_id"))

  /** Hash-keyed train/val split summary ([[Sampling.splitBySha]]):
    * membership is the first 4 hex chars of sha256("doc_id:42")
    * against the 0.8 cut (floor(0.8·65536) = 0xcccc) — a pure
    * function of (id, seed) that DuckDB replays bit-for-bit, so the
    * split itself (not just its determinism) is oracle-verified. */
  val q80SampleSplit: GraftQuery = GraftQuery(
    "q80_sample_split",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val (tr, va) = graft.operators.Sampling.splitBySha(docs, "doc_id",
        0.8, seed = 42L)
      val trainStats = tr.groupBy($"lang")
        .agg(count(lit(1)).as("n_train"))
      val valStats = va.groupBy($"lang").agg(count(lit(1)).as("n_val"))
      trainStats.join(valStats, Seq("lang"), "full_outer")
        .select($"lang", coalesce($"n_train", lit(0L)).as("n_train"),
          coalesce($"n_val", lit(0L)).as("n_val"))
        .orderBy($"lang")
    },
    Some(
      "WITH b AS (SELECT lang, " +
        "substr(sha256(doc_id::VARCHAR || ':42'), 1, 4) AS bk " +
        "FROM documents) " +
        "SELECT lang, " +
        "sum(CASE WHEN bk < 'cccc' THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_train, " +
        "sum(CASE WHEN bk >= 'cccc' THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_val " +
        "FROM b GROUP BY lang ORDER BY lang"))

  /** MERGE-style upsert (anti-join + union): low-id docs replaced by
    * updated rows, the rest untouched; oracle replays the same merge in
    * SQL. */
  val q82Upsert: GraftQuery = GraftQuery(
    "q82_upsert",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val updates = docs.filter($"doc_id" < 10)
        .withColumn("text", lit("UPDATED"))
      val merged = graft.io.Sinks.upsertByKey(docs, updates, Seq("doc_id"))
      merged.groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          sum(when($"text" === "UPDATED", 1).otherwise(0)).as("n_updated"))
        .orderBy($"lang")
    },
    Some(
      "WITH updates AS (SELECT doc_id, 'UPDATED' AS text, lang, source, " +
        "n_chars FROM documents WHERE doc_id < 10), " +
        "merged AS (SELECT * FROM documents " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM updates) " +
        "UNION ALL SELECT * FROM updates) " +
        "SELECT lang, count(*) AS n, " +
        // ::BIGINT — DuckDB's integer sum() is HUGEINT (INT128); Spark's is
        // BIGINT. Round 1's driver gate flagged exactly this as a hash
        // mismatch (rows/schema ok). Every other sum() oracle is double.
        "sum(CASE WHEN text = 'UPDATED' THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_updated " +
        "FROM merged GROUP BY 1 ORDER BY lang"))

  /** k-NN via the heap aggregator path — same oracle as the window
    * formulation (results are identical by construction). */
  val q83TopKAggKnn: GraftQuery = GraftQuery(
    "q83_topk_agg_knn",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val c = e.select($"vec_id", $"embedding".as("cv"))
      graft.operators.Similarity.bruteForceTopKAgg(q, c, "query_id", "qv",
        "vec_id", "cv", 5)
        .select($"query_id", $"vec_id", round($"cos", 6).as("cos"), $"rk")
        .orderBy($"query_id", $"rk")
    },
    Some(
      "WITH scored AS (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS vec_id, " +
        "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) / " +
        "(sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) * " +
        "sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos_raw " +
        "FROM embeddings q, embeddings c " +
        "WHERE q.vec_id < 5 AND c.vec_id != q.vec_id) " +
        "SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rk FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos_raw DESC, vec_id) AS rk FROM scored) " +
        "WHERE rk <= 5 ORDER BY query_id, rk"))

  /** Text normalization pipeline: lowercase, strip punctuation, squeeze
    * whitespace — the canonicalization step before exact dedup. */
  val q84Normalize: GraftQuery = GraftQuery(
    "q84_normalize",
    (s, d) => {
      import s.implicits._
      val norm = trim(regexp_replace(
        regexp_replace(lower($"text"), "[.,!?;:]", " "),
        " +", " "))
      Tables.documents(s, d)
        .select($"doc_id", substring(norm, 1, 60).as("norm_prefix"),
          length(norm).as("norm_len"))
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, substr(norm, 1, 60) AS norm_prefix, " +
        "length(norm) AS norm_len FROM (" +
        "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), " +
        "'[.,!?;:]', ' ', 'g'), ' +', ' ', 'g')) AS norm FROM documents) " +
        "ORDER BY doc_id"))

  /** Duplicate FAMILIES: connected components over near-dup pair edges;
    * one row per family with size and canonical (min) id. The edge list
    * here is exact n-gram Jaccard ≥ 0.5 over a bounded doc slice so the
    * WHOLE query — edges AND the transitive CC labeling — is oracled
    * (DuckDB: recursive CTE min-label closure). The slice bounds the
    * all-pairs edge generation the oracle needs; at corpus scale the SAME
    * [[graft.operators.Dedup.connectedComponents]] operator consumes the
    * banded LSH pair set instead (q44's path, spec-gated). */
  val q85DedupComponents: GraftQuery = GraftQuery(
    "q85_dedup_components",
    (s, d) => {
      import s.implicits._
      // shared per-JVM edge artifact (AnnIndexes.jaccardEdges): q85 and
      // q99 consume the SAME exact-Jaccard edge list, so it is computed
      // once and served from cache — recompute-per-query was the r5
      // bench's per-query-isolation cost on this family. The underlying
      // pair join keeps its minJaccard size prefilter (exact result).
      val pairs = AnnIndexes.jaccardEdges(s, d)
      graft.operators.Dedup.connectedComponents(pairs)
        .groupBy($"component")
        .agg(count(lit(1)).as("family_size"),
          min($"id").as("canonical_id"))
        .orderBy($"component")
    },
    Some(
      "WITH RECURSIVE sh AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))) " +
        "AS shingles FROM documents WHERE doc_id < 300), " +
        "edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE / " +
        "len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5), " +
        "bidir AS (SELECT id_a AS src, id_b AS dst FROM edges " +
        "UNION SELECT id_b, id_a FROM edges), " +
        "reach(id, lbl) AS (SELECT src, src FROM bidir " +
        "UNION SELECT b.dst, r.lbl FROM reach r JOIN bidir b ON b.src = r.id) " +
        "SELECT component, count(*) AS family_size, min(id) AS canonical_id " +
        "FROM (SELECT id, min(lbl) AS component FROM reach GROUP BY id) " +
        "GROUP BY component ORDER BY component"))

  /** Winnowing fingerprint candidates ([[Dedup.winnowCandidates]],
    * the MOSS algorithm): pairs sharing ≥2 window-minimum grams —
    * guaranteed to include every pair sharing a ≥ w+k−1 = 11-token
    * run, while indexing only ~1/w of grams. FULLY ORACLED (rare for
    * a fingerprint family): the gram hash is md5-hex and the window
    * min is lexicographic, so DuckDB replays the identical selection. */
  val q175Winnowing: GraftQuery = GraftQuery(
    "q175_winnowing",
    (s, d) => {
      import s.implicits._
      Dedup.winnowCandidates(Tables.documents(s, d), "doc_id", "text",
          k = 4, w = 8, minShared = 2)
        .orderBy($"id_a", $"id_b")
    },
    Some(
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS toks " +
        "FROM documents), " +
        "g AS (SELECT doc_id, list_transform(generate_series(1, " +
        "greatest(1, len(toks) - 3)), i -> md5(array_to_string(" +
        "list_slice(toks, i, i+3), ' '))) AS gs FROM t), " +
        "f AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(gs) - 7)), " +
        "i -> list_min(list_slice(gs, i, i+7))))) AS fp FROM g), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "count(*) AS n_shared FROM f a " +
        "JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT id_a, id_b, n_shared FROM p WHERE n_shared >= 2 " +
        "ORDER BY id_a, id_b"))

  /** Score-aware dedup finalization ([[Dedup.keepBest]]): keep the
    * LONGEST member of each exact-Jaccard duplicate family (argmax
    * n_chars, ties to min id) — the policy real curation wants once a
    * quality signal exists, vs q99's blind min-id keep. Same shared
    * edge artifact and doc_id < 300 slice as q85/q99; the oracle
    * replays components with a recursive CTE and the identical
    * (score DESC, id) argmax. */
  val q174KeepBest: GraftQuery = GraftQuery(
    "q174_keep_best",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).filter($"doc_id" < 300)
      graft.operators.Dedup.keepBest(docs, "doc_id",
          AnnIndexes.jaccardEdges(s, d), "n_chars")
        .select($"doc_id", $"n_chars")
        .orderBy($"doc_id")
    },
    Some(
      "WITH RECURSIVE sh AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))) " +
        "AS shingles FROM documents WHERE doc_id < 300), " +
        "edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE / " +
        "len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5), " +
        "bidir AS (SELECT id_a AS src, id_b AS dst FROM edges " +
        "UNION SELECT id_b, id_a FROM edges), " +
        "reach(id, lbl) AS (SELECT src, src FROM bidir " +
        "UNION SELECT b.dst, r.lbl FROM reach r JOIN bidir b ON b.src = r.id), " +
        "comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id), " +
        "scored AS (SELECT c.id, c.component, d.n_chars FROM comp c " +
        "JOIN documents d ON d.doc_id = c.id), " +
        "vict AS (SELECT id FROM (SELECT id, row_number() OVER " +
        "(PARTITION BY component ORDER BY n_chars DESC, id) AS rn " +
        "FROM scored) WHERE rn != 1) " +
        "SELECT doc_id, n_chars FROM documents " +
        "WHERE doc_id < 300 AND doc_id NOT IN (SELECT id FROM vict) " +
        "ORDER BY doc_id"))

  /** STREAMING sessionization parity: replay the events file through the
    * stateful `flatMapGroupsWithState` sessionizer
    * ([[graft.streaming.EventStream.sessionize]]) and hash-match its
    * closed sessions against a DuckDB gaps-and-islands oracle. Append
    * semantics: a session is emitted when an in-data gap > 30 min closes
    * it, so each user's final (dangling) session is excluded on both
    * sides — the oracle drops each user's max session id. Note the
    * boundary differs from q53's `session_window`: the custom state keeps
    * a gap of EXACTLY 30 min in-session (`<= gap`), so the oracle splits
    * strictly on `> INTERVAL 30 MINUTE`. */
  val q95Sessionize: GraftQuery = GraftQuery(
    "q95_sessionize",
    (s, d) => {
      import s.implicits._
      graft.streaming.EventStream.runSessionize(s, d, gapMinutes = 30,
          queryName = "graft_sessions_q95")
        .select($"user_id", unix_millis($"session_start").as("start_ms"),
          unix_millis($"session_end").as("end_ms"), $"n_events",
          round($"total_value", 2).as("total_value"))
        .orderBy($"user_id", $"start_ms")
    },
    Some(
      "WITH o AS (SELECT user_id, ts, event_id, value, CASE WHEN " +
        "lag(ts) OVER w IS NULL OR " +
        "ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END " +
        "AS new_s FROM events WINDOW w AS " +
        "(PARTITION BY user_id ORDER BY ts, event_id)), " +
        // the cumulative sum must use the SAME total order as the lag
        // window ((ts, event_id)) — ordering ties by new_s would assign a
        // tied boundary row to the previous session
        "g AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sess FROM o), " +
        "a AS (SELECT user_id, sess, epoch_ms(min(ts)) AS start_ms, " +
        "epoch_ms(max(ts)) AS end_ms, count(*) AS n_events, " +
        "round(sum(value), 2) AS total_value " +
        "FROM g GROUP BY user_id, sess), " +
        "m AS (SELECT *, max(sess) OVER (PARTITION BY user_id) AS last_sess " +
        "FROM a) " +
        "SELECT user_id, start_ms, end_ms, n_events, total_value " +
        "FROM m WHERE sess < last_sess ORDER BY user_id, start_ms"))

  /** COMPLETE streaming sessionization: the event-time-timeout variant —
    * a far-future sentinel advances the watermark after the replay
    * drains, so the stateful sessionizer flushes every dangling session
    * too. Oracle = the FULL gaps-and-islands session set (q95's oracle
    * without the last-session drop): append-mode streaming with
    * watermark flush reproduces the batch answer exactly. */
  val q101SessionizeFlush: GraftQuery = GraftQuery(
    "q101_sessionize_flush",
    (s, d) => {
      import s.implicits._
      graft.streaming.EventStream.runSessionizeFlush(s, d,
          gapMinutes = 30, queryName = "graft_sessions_q101")
        .select($"user_id", unix_millis($"session_start").as("start_ms"),
          unix_millis($"session_end").as("end_ms"), $"n_events",
          round($"total_value", 2).as("total_value"))
        .orderBy($"user_id", $"start_ms")
    },
    Some(
      "WITH o AS (SELECT user_id, ts, event_id, value, CASE WHEN " +
        "lag(ts) OVER w IS NULL OR " +
        "ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END " +
        "AS new_s FROM events WINDOW w AS " +
        "(PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sess FROM o) " +
        "SELECT user_id, epoch_ms(min(ts)) AS start_ms, " +
        "epoch_ms(max(ts)) AS end_ms, count(*) AS n_events, " +
        "round(sum(value), 2) AS total_value " +
        "FROM g GROUP BY user_id, sess ORDER BY user_id, start_ms"))

  /** Deduplicated-corpus materialization ([[graft.operators.Dedup
    * .keepCanonical]]): the final step of the dedup pipeline — drop every
    * non-canonical member of a duplicate family, keep everything else.
    * Same deterministic edge list as q85, so the oracle extends q85's
    * recursive-CTE closure with the keep-side anti-join. */
  val q99DedupKeep: GraftQuery = GraftQuery(
    "q99_dedup_keep",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).filter($"doc_id" < 300)
      val pairs = AnnIndexes.jaccardEdges(s, d)
      graft.operators.Dedup.keepCanonical(docs, "doc_id", pairs)
        .select($"doc_id", length($"text").as("len_chars"))
        .orderBy($"doc_id")
    },
    Some(
      "WITH RECURSIVE sh AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))) " +
        "AS shingles FROM documents WHERE doc_id < 300), " +
        "edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE / " +
        "len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5), " +
        "bidir AS (SELECT id_a AS src, id_b AS dst FROM edges " +
        "UNION SELECT id_b, id_a FROM edges), " +
        "reach(id, lbl) AS (SELECT src, src FROM bidir " +
        "UNION SELECT b.dst, r.lbl FROM reach r JOIN bidir b ON b.src = r.id), " +
        "victims AS (SELECT id FROM (SELECT id, min(lbl) AS component " +
        "FROM reach GROUP BY id) WHERE id != component) " +
        "SELECT doc_id, length(text) AS len_chars FROM documents " +
        "WHERE doc_id < 300 AND doc_id NOT IN (SELECT id FROM victims) " +
        "ORDER BY doc_id"))

  /** Per-group quota cap ([[graft.operators.Sampling.capPerGroup]]): at
    * most 50 documents per language, deterministic doc_id ranking — the
    * per-domain rebalancing step of a corpus pipeline, oracled as a
    * ranking-window query. */
  val q100GroupCap: GraftQuery = GraftQuery(
    "q100_group_cap",
    (s, d) => {
      import s.implicits._
      graft.operators.Sampling.capPerGroup(
        Tables.documents(s, d), "lang", "doc_id", 50)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, lang FROM (SELECT doc_id, lang, row_number() OVER " +
        "(PARTITION BY lang ORDER BY doc_id) AS rn FROM documents) " +
        "WHERE rn <= 50 ORDER BY doc_id"))

  /** Fixed-width histogram with an explicit bucket formula (identical in
    * both engines — no width_bucket semantics drift). */
  val q86Histogram: GraftQuery = GraftQuery(
    "q86_histogram",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val bounds = o.agg(min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"))
      o.crossJoin(broadcast(bounds))
        .select(least(lit(9), floor(($"o_totalprice" - $"lo") /
          (($"hi" - $"lo") / 10.0)).cast("int")).as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    },
    Some(
      "WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi " +
        "FROM orders) " +
        "SELECT least(9, floor((o_totalprice - lo) / ((hi - lo) / 10.0))::INT) " +
        "AS bucket, count(*) AS n FROM orders, b " +
        "GROUP BY 1 ORDER BY bucket"))

  /** Container-metadata extraction ([[graft.multimodal.ContainerMeta]]):
    * every row synthesizes a spec-conformant MP4 / WebM / Matroska
    * container whose stored fields derive from `doc_id`, then the
    * engine's pure-JVM box/EBML walk parses them BACK from the bytes.
    * The oracle recomputes the planted fields from `doc_id` arithmetic
    * alone, so a hash match proves the full build→parse byte round
    * trip: box sizes, fixed-point tkhd dims, EBML vints, float
    * durations. (The frame payload of these containers remains
    * undecodable by policy — metadata is parsed structure, not
    * synthesized content.) Distributed as one projection, no shuffle. */
  val q152ContainerMeta: GraftQuery = GraftQuery(
    "q152_container_meta",
    (s, d) => {
      import s.implicits._
      val build = udf { (id: Long) =>
        val dur = 1000L + id % 600000L
        val w = (16 * (1 + id % 120)).toInt
        val h = (16 * (1 + id % 68)).toInt
        val bytes = (id % 3) match {
          case 0 => graft.multimodal.ContainerMeta.buildMp4(dur, w, h,
            if (id % 2 == 0) "avc1" else "hev1")
          case 1 => graft.multimodal.ContainerMeta.buildEbml("webm",
            dur, w, h, if (id % 2 == 0) "V_VP9" else "V_VP8")
          case _ => graft.multimodal.ContainerMeta.buildEbml("matroska",
            dur, w, h, "V_MPEG4/ISO/AVC")
        }
        val m = graft.multimodal.ContainerMeta.parse(bytes).get
        (m.format, m.brand, m.durationMs.get, m.width.get, m.height.get,
          m.codec.get)
      }
      Tables.documents(s, d)
        .select($"doc_id", build($"doc_id").as("m"))
        .select($"doc_id", $"m._1".as("format"), $"m._2".as("brand"),
          $"m._3".as("duration_ms"), $"m._4".as("width"),
          $"m._5".as("height"), $"m._6".as("codec"))
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'mp4' WHEN 1 THEN 'webm' " +
        "ELSE 'matroska' END AS format, " +
        "CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'webm' " +
        "ELSE 'matroska' END AS brand, " +
        "(1000 + doc_id % 600000)::BIGINT AS duration_ms, " +
        "(16 * (1 + doc_id % 120))::INTEGER AS width, " +
        "(16 * (1 + doc_id % 68))::INTEGER AS height, " +
        "CASE WHEN doc_id % 3 = 0 THEN " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END) " +
        "WHEN doc_id % 3 = 1 THEN " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'V_VP9' ELSE 'V_VP8' END) " +
        "ELSE 'V_MPEG4/ISO/AVC' END AS codec " +
        "FROM documents ORDER BY doc_id"))

  /** Audio-container metadata (q152's audio sibling): every row
    * synthesizes a spec-conformant FLAC / MP3 / Ogg-Opus container
    * from `doc_id`-derived parameters, and the engine's header walks
    * ([[graft.multimodal.ContainerMeta]].parseFlac/parseMp3/parseOgg)
    * must read the exact planted fields back — STREAMINFO bit packing,
    * ID3-skip + frame-sync bitrate tables, Ogg granule positions. The
    * oracle recomputes the fields from arithmetic alone. MP3 duration
    * is the CBR estimate (flagged inexact); FLAC/Ogg durations are
    * exact by construction. */
  val q155AudioMeta: GraftQuery = GraftQuery(
    "q155_audio_meta",
    (s, d) => {
      import s.implicits._
      val build = udf { (id: Long) =>
        val k = id / 3
        val m = ContainerMeta.parseAudio((id % 3) match {
          case 0 => ContainerMeta.buildFlac(
            sampleRate = 8000 + (k % 8).toInt * 4000,
            channels = 1 + (id % 2).toInt,
            totalSamples = (8000L + (k % 8) * 4000L) * (1L + id % 30))
          case 1 => ContainerMeta.buildMp3(
            bitrateIdx = 1 + (k % 14).toInt,
            sampleRateIdx = (k % 3).toInt,
            padBytes = 100 + (id % 900).toInt)
          case _ => ContainerMeta.buildOggOpus(
            channels = 1 + (id % 2).toInt, inputRate = 48000,
            granule = 48L * (500L + k % 10000))
        }).get
        (m.format, m.codec.get, m.durationMs.get, m.durationExact,
          m.sampleRate.get, m.channels.get)
      }
      Tables.documents(s, d)
        .select($"doc_id", build($"doc_id").as("m"))
        .select($"doc_id", $"m._1".as("format"), $"m._2".as("codec"),
          $"m._3".as("duration_ms"), $"m._4".as("duration_exact"),
          $"m._5".as("sample_rate"), $"m._6".as("channels"))
        .orderBy($"doc_id")
    },
    Some(
      "WITH p AS (SELECT doc_id, doc_id // 3 AS k FROM documents) " +
        "SELECT doc_id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'flac' WHEN 1 THEN 'mp3' " +
        "ELSE 'ogg' END AS format, " +
        "CASE doc_id % 3 WHEN 0 THEN 'flac' WHEN 1 THEN 'mpeg1-layer3' " +
        "ELSE 'opus' END AS codec, " +
        "(CASE doc_id % 3 " +
        "WHEN 0 THEN (1 + doc_id % 30) * 1000 " +
        "WHEN 1 THEN ((104 + doc_id % 900) * 8) // " +
        "(CASE 1 + k % 14 WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 " +
        "WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 " +
        "WHEN 8 THEN 112 WHEN 9 THEN 128 WHEN 10 THEN 160 " +
        "WHEN 11 THEN 192 WHEN 12 THEN 224 WHEN 13 THEN 256 " +
        "ELSE 320 END) " +
        "ELSE 500 + k % 10000 END)::BIGINT AS duration_ms, " +
        "(doc_id % 3 != 1) AS duration_exact, " +
        "(CASE doc_id % 3 " +
        "WHEN 0 THEN 8000 + (k % 8) * 4000 " +
        "WHEN 1 THEN (CASE k % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 " +
        "ELSE 32000 END) " +
        "ELSE 48000 END)::INTEGER AS sample_rate, " +
        "(CASE doc_id % 3 WHEN 1 THEN 2 " +
        "ELSE (1 + doc_id % 2)::INTEGER END)::INTEGER AS channels " +
        "FROM p ORDER BY doc_id"))
}
