package graft

import org.apache.spark.sql.functions._

import graft.ml.QualityClassifier
import graft.operators.{Curation, Dedup, Dsir, Sampling}

/** Late round-5 shaping surface: content-keyed leakage-safe splits, the
  * passage-granularity duplication profile, DSIR importance resampling,
  * and sketch-based cardinality accuracy. q131/q132 are fully
  * DuckDB-oracled (SHA-256 is the one hash with portable reference
  * values, and block chopping is plain list slicing on both engines);
  * q133/q134 are deterministic rows-only (xxhash64 bucketing and
  * DataSketches HLL have no DuckDB twin). */
object SplitQueries {

  def all: Seq[GraftQuery] = Seq(q131ContentSplit, q132BlockDupProfile,
    q133DsirResample, q134SketchAccuracy, q135QualityClassifier, q177DsirOracled,
    q136SnapshotDiff, q143GatedCuration, q144Decontaminate,
    q151IncrementalCuration, q157ExactDistinct, q164CmsFrequency,
    q165WeightedSample, q183CmsOracled, q187LogregOracled, q209HllOracled,
    q210BloomOracled, q211HllStreamOracled, q212BloomStreamOracled,
    q213CmsStreamOracled, q214HllOverlapOracled, q215HllProfileOracled,
    q216OverlapMatrixOracled, q217HistQuantilesOracled,
    q218BloomJoinOracled, q219F2SketchOracled, q220JoinSizeOracled,
    q221DailyUsersOracled, q222HistStreamOracled,
    q223SketchJaccardOracled, q225WatermarkLateOracled,
    q226SlidingLateOracled, q227SessionLateOracled,
    q228UpdateModeOracled, q233StreamJoinLateOracled,
    q235OuterJoinLateOracled, q236FullOuterJoinLateOracled,
    q238RightOuterJoinLateOracled, q241StreamDensityOracled,
    q242StreamDensity2dOracled)

  /** Frequency-sketch accuracy ([[graft.operators.Sketches
    * .countMinSketchOf]]) — the count-min twin of q134's HLL pair:
    * exact token counts vs the sketch's estimates for a fixed probe
    * set, with the eps·N overcount bound checked per probe (count-min
    * never undercounts). Rows-only: the sketch binary has no DuckDB
    * twin — but unlike the DataSketches HLL the estimate IS
    * deterministic at any partitioning (commutative adds, seeded hash
    * family), so the row is replay-stable; the exact half is already
    * oracled through the q20/q91 token surfaces. */
  val q164CmsFrequency: GraftQuery = GraftQuery(
    "q164_cms_frequency",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("t"))
      val (cms, n) = graft.operators.Sketches.countMinSketchOf(
        toks, "t", eps = 0.001, confidence = 0.99, seed = 164)
      val probes = Seq("customer", "vector", "window", "merge", "the")
      val exact = toks.filter($"t".isin(probes: _*)).groupBy($"t")
        .agg(count(lit(1)).as("exact")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bound = math.ceil(0.001 * n).toLong
      probes.sorted.map { p =>
        val e = exact.getOrElse(p, 0L)
        val est = cms.estimateCount(p)
        (p, e, est, est >= e && est - e <= bound)
      }.toDF("t", "exact", "est", "bound_ok").orderBy($"t")
    },
    None)

  /** Count-min sketch with the md5 hash family — the ORACLED face of
    * q164 (which stays rows-only on Spark's own CountMinSketch
    * implementation): d=4 rows × w=512 buckets, bucket(j, t) =
    * md5("j|t") first-8-hex mod w (the q176 replayable-hash trick
    * applied to frequency sketching). DuckDB rebuilds the whole sketch
    * table and replays every probe's min-over-rows estimate; the
    * admissible flag (est ≥ exact — CMS never underestimates) is part
    * of the hashed output. Pure integer arithmetic end-to-end. */
  val q183CmsOracled: GraftQuery = GraftQuery(
    "q183_cms_oracled",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("t"))
      val js = broadcast(s.range(4).select($"id".cast("int").as("j")))
      def bucket(j: org.apache.spark.sql.Column,
          t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        pmod(conv(substring(md5(concat(j.cast("string"), lit("|"), t)
          .cast("binary")), 1, 8), 16, 10).cast("long"), lit(512L))
      val cms = toks.crossJoin(js)
        .groupBy($"j", bucket($"j", $"t").as("bucket"))
        .agg(count(lit(1)).as("c"))
      val probes = Seq("customer", "vector", "window", "merge", "the")
      val pj = broadcast(probes.toDF("t")).crossJoin(js)
        .select($"t", $"j", bucket($"j", $"t").as("bucket"))
      val est = pj.join(cms, Seq("j", "bucket"), "left")
        .groupBy($"t").agg(min(coalesce($"c", lit(0L))).as("est"))
      val exact = toks.filter($"t".isin(probes: _*))
        .groupBy($"t").agg(count(lit(1)).as("exact"))
      probes.toDF("t")
        .join(exact, Seq("t"), "left")
        .join(est, Seq("t"))
        .select($"t", coalesce($"exact", lit(0L)).as("exact"), $"est",
          ($"est" >= coalesce($"exact", lit(0L))).as("admissible"))
        .orderBy($"t")
    },
    Some(
      "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t " +
        "FROM documents), " +
        "js AS (SELECT unnest(generate_series(0, 3)) AS j), " +
        "cms AS MATERIALIZED (SELECT j, " +
        "('0x' || substr(md5(j::VARCHAR || '|' || t), 1, 8))::BIGINT " +
        "% 512 AS bucket, count(*)::BIGINT AS c " +
        "FROM tok, js GROUP BY 1, 2), " +
        "pr AS (SELECT * FROM (VALUES ('customer'), ('vector'), " +
        "('window'), ('merge'), ('the')) AS x(t)), " +
        "pj AS (SELECT pr.t, js.j, ('0x' || substr(md5(js.j::VARCHAR " +
        "|| '|' || pr.t), 1, 8))::BIGINT % 512 AS bucket FROM pr, js), " +
        "est AS (SELECT t, min(coalesce(cms.c, 0))::BIGINT AS est " +
        "FROM pj LEFT JOIN cms USING (j, bucket) GROUP BY t), " +
        "ex AS (SELECT t, count(*)::BIGINT AS exact FROM tok " +
        "WHERE t IN ('customer','vector','window','merge','the') " +
        "GROUP BY t) " +
        "SELECT pr.t, coalesce(ex.exact, 0)::BIGINT AS exact, est.est, " +
        "est.est >= coalesce(ex.exact, 0) AS admissible " +
        "FROM pr LEFT JOIN ex USING (t) JOIN est USING (t) " +
        "ORDER BY t"))

  /** Portable HyperLogLog, fully ORACLED ([[graft.operators.Sketches
    * .hllRegisters]]/[[graft.operators.Sketches.hllEstimate]]) — the
    * distinct-count twin of q183's count-min face, closing the last
    * engine-hash sketch asymmetry: q65/q134's built-in HLL++ estimates
    * are deterministic but engine-internal; HERE the whole sketch is
    * the md5 hash family plus integer arithmetic, so DuckDB rebuilds
    * the identical 256 registers from the same parquet and replays
    * the estimate — registers, scaled inverse-power sum (an exact
    * BIGINT), branch choice (linear counting vs raw) and the relative
    * error against the exact distinct are ALL in the hashed row.
    * Cardinality target: o_orderkey (1.5k/15k/150k distinct across
    * the SFs — the raw-estimate branch with ~1.04/sqrt(256) ≈ 6.5%
    * expected error; the spec gates the error, the oracle gates the
    * bits). */
  val q209HllOracled: GraftQuery = GraftQuery(
    "q209_hll_oracled",
    (s, d) => {
      import s.implicits._
      val keys = Tables.orders(s, d).select($"o_orderkey")
      val regs = graft.operators.Sketches.hllRegisters(keys, "o_orderkey")
      val summary = graft.operators.Sketches.hllEstimate(regs)
      val exact = keys.agg(
        countDistinct($"o_orderkey").as("exact"))
      summary.crossJoin(exact)
        .select($"m", $"zero_regs", $"max_register", $"sum_scaled",
          $"raw_est", $"lc_used", $"est", $"exact",
          round(($"est" - $"exact") / $"exact", 4).as("rel_err"))
    },
    Some(
      "WITH h AS (SELECT " +
        "('0x' || substr(md5(o_orderkey::VARCHAR), 1, 2))::BIGINT " +
        "AS bucket, " +
        "('0x' || substr(md5(o_orderkey::VARCHAR), 3, 8))::BIGINT " +
        "AS w FROM orders), " +
        "r AS (SELECT bucket, max(CASE WHEN w = 0 THEN 33 " +
        "ELSE 33 - length(bin(w)) END) AS register FROM h GROUP BY 1), " +
        "a AS (SELECT count(*)::BIGINT AS nonzero, " +
        "sum(1::BIGINT << (33 - register))::BIGINT AS nz_scaled, " +
        "max(register) AS max_register FROM r), " +
        "s AS (SELECT 256::BIGINT AS m, " +
        "(256 - nonzero)::BIGINT AS zero_regs, " +
        "(nz_scaled + (256 - nonzero) * 8589934592)::BIGINT " +
        "AS sum_scaled, max_register::INT AS max_register FROM a), " +
        "e AS (SELECT *, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 256.0::DOUBLE) * 256.0::DOUBLE * 256.0::DOUBLE) " +
        "/ (sum_scaled / 8589934592.0::DOUBLE) AS raw FROM s), " +
        "f AS (SELECT m, zero_regs, max_register, sum_scaled, " +
        "round(raw, 4) AS raw_est, " +
        "(zero_regs > 0 AND raw <= 640.0::DOUBLE) AS lc_used, " +
        "CASE WHEN zero_regs > 0 AND raw <= 640.0::DOUBLE " +
        "THEN round(256.0::DOUBLE * ln(256.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est FROM e), " +
        "x AS (SELECT count(DISTINCT o_orderkey)::BIGINT AS exact " +
        "FROM orders) " +
        "SELECT f.m, f.zero_regs, f.max_register, f.sum_scaled, " +
        "f.raw_est, f.lc_used, f.est, x.exact, " +
        "round((f.est - x.exact) / x.exact, 4) AS rel_err FROM f, x"),
  )

  /** Portable Bloom-filter screen, fully ORACLED
    * ([[graft.operators.Sketches.bloomBits]]/[[graft.operators
    * .Sketches.bloomScreen]]) — the MEMBERSHIP sketch completing the
    * md5 family (q209 HLL = how many distinct, q183 CMS = how often,
    * HERE = have we seen this): an eval slice of the corpus
    * (doc_id % 17 = 0) builds a 4096-bit, k=3 filter over its text;
    * every document whose text hits all three positions is flagged and
    * graded against the exact text semi-join. Zero false negatives by
    * construction (the spec gates the FPR; the oracle gates the bits —
    * DuckDB rebuilds the identical bit set and screen from the same
    * parquet). The 100 TB decontamination pre-screen: the bits
    * broadcast (≤ mBits rows however large the eval set), the corpus
    * never shuffles against the reference, and the exact check runs
    * only on the flagged sliver. */
  val q210BloomOracled: GraftQuery = GraftQuery(
    "q210_bloom_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val eval = docs.filter($"doc_id" % 17 === 0)
      val bits = graft.operators.Sketches.bloomBits(
        eval.select($"text"), "text")
      val flagged = graft.operators.Sketches.bloomScreen(
          docs, "doc_id", "text", bits)
        .select($"id".as("doc_id"))
      val exact = docs
        .join(eval.select($"text").distinct(), Seq("text"), "left_semi")
        .select($"doc_id", lit(true).as("exact_hit"))
      flagged.join(exact, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"exact_hit", lit(false)).as("exact_hit"))
        .orderBy($"doc_id")
    },
    Some(
      "WITH ev AS (SELECT DISTINCT text FROM documents " +
        "WHERE doc_id % 17 = 0), " +
        "bits AS (SELECT DISTINCT " +
        "('0x' || substr(md5(j::VARCHAR || ':' || text), 1, 12))" +
        "::BIGINT % 4096 AS pos " +
        "FROM ev, generate_series(1, 3) AS t(j)), " +
        "tp AS (SELECT doc_id, j, " +
        "('0x' || substr(md5(j::VARCHAR || ':' || text), 1, 12))" +
        "::BIGINT % 4096 AS pos " +
        "FROM documents, generate_series(1, 3) AS t(j)), " +
        "hits AS (SELECT doc_id FROM tp JOIN bits USING (pos) " +
        "GROUP BY doc_id HAVING count(DISTINCT j) = 3), " +
        "ex AS (SELECT DISTINCT d.doc_id FROM documents d " +
        "JOIN ev e ON d.text = e.text) " +
        "SELECT h.doc_id, (e2.doc_id IS NOT NULL) AS exact_hit " +
        "FROM hits h LEFT JOIN ex e2 ON h.doc_id = e2.doc_id " +
        "ORDER BY h.doc_id"),
  )

  /** STREAMING cardinality growth ORACLED
    * ([[graft.streaming.HllStream]] / [[graft.operators.Sketches
    * .upsertHllBatch]]): the order keys arrive as four parquet files,
    * every micro-batch upserts ≤ 256 register rows keyed by its
    * streaming batchId (dynamic partitioned overwrite — an
    * at-least-once redelivery REPLACES its rows), and the estimate
    * served from the register-max merge of the artifact must
    * hash-match the single-pass q209 oracle over everything the stream
    * saw — register-max associativity is the whole reason a 100 TB
    * distinct count can grow per shard, and this row makes it
    * checkable through a real checkpoint. n_batches pins the stream
    * shape (repartition(4) + one file per trigger ⇒ exactly 4). */
  val q211HllStreamOracled: GraftQuery = GraftQuery(
    "q211_hll_stream_oracled",
    (s, d) => {
      import s.implicits._
      val src = AnnIndexes.prepared("q211src", d) { p =>
        Tables.orders(s, d).select($"o_orderkey").repartition(4)
          .write.mode("overwrite").parquet(p)
      }
      val root = Scratch.dir("graft_q211")
      graft.streaming.HllStream.runToCompletion(s, src,
        s"$root/hll", s"$root/chk", "o_orderkey")
      val regs = graft.operators.Sketches
        .hllRegistersFromArtifact(s, s"$root/hll")
      val nb = s.read.parquet(s"$root/hll")
        .agg(countDistinct($"batch_id").as("n_batches"))
      val exact = Tables.orders(s, d)
        .agg(countDistinct($"o_orderkey").as("exact"))
      graft.operators.Sketches.hllEstimate(regs)
        .crossJoin(nb).crossJoin(exact)
        .select($"m", $"zero_regs", $"max_register", $"sum_scaled",
          $"est", $"exact", $"n_batches",
          round(($"est" - $"exact") / $"exact", 4).as("rel_err"))
    },
    Some(
      "WITH h AS (SELECT " +
        "('0x' || substr(md5(o_orderkey::VARCHAR), 1, 2))::BIGINT " +
        "AS bucket, " +
        "('0x' || substr(md5(o_orderkey::VARCHAR), 3, 8))::BIGINT " +
        "AS w FROM orders), " +
        "r AS (SELECT bucket, max(CASE WHEN w = 0 THEN 33 " +
        "ELSE 33 - length(bin(w)) END) AS register FROM h GROUP BY 1), " +
        "a AS (SELECT count(*)::BIGINT AS nonzero, " +
        "sum(1::BIGINT << (33 - register))::BIGINT AS nz_scaled, " +
        "max(register) AS max_register FROM r), " +
        "s AS (SELECT 256::BIGINT AS m, " +
        "(256 - nonzero)::BIGINT AS zero_regs, " +
        "(nz_scaled + (256 - nonzero) * 8589934592)::BIGINT " +
        "AS sum_scaled, max_register::INT AS max_register FROM a), " +
        "e AS (SELECT *, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 256.0::DOUBLE) * 256.0::DOUBLE * 256.0::DOUBLE) " +
        "/ (sum_scaled / 8589934592.0::DOUBLE) AS raw FROM s), " +
        "f AS (SELECT m, zero_regs, max_register, sum_scaled, " +
        "CASE WHEN zero_regs > 0 AND raw <= 640.0::DOUBLE " +
        "THEN round(256.0::DOUBLE * ln(256.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est FROM e), " +
        "x AS (SELECT count(DISTINCT o_orderkey)::BIGINT AS exact " +
        "FROM orders) " +
        "SELECT f.m, f.zero_regs, f.max_register, f.sum_scaled, " +
        "f.est, x.exact, 4::BIGINT AS n_batches, " +
        "round((f.est - x.exact) / x.exact, 4) AS rel_err FROM f, x"),
  )

  /** STREAMING Bloom growth ORACLED ([[graft.streaming.SketchStreams
    * .runBloomToCompletion]] / [[graft.operators.Sketches
    * .upsertBloomBatch]]): the q210 eval slice arrives as four files,
    * every micro-batch upserts ≤ mBits bit rows keyed by its streaming
    * batchId, and the screen served from the SET-UNION merge of the
    * artifact must hash-match the single-pass q210 oracle — bits only
    * turn on, so the merged filter keeps zero false negatives whatever
    * the batch boundaries were, which is why a 100 TB reference set can
    * be sketched shard-by-shard and screened incrementally. The second
    * leg of the merge-law trio: q211 = MAX, HERE = UNION, q213 = SUM.
    */
  val q212BloomStreamOracled: GraftQuery = GraftQuery(
    "q212_bloom_stream_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val eval = docs.filter($"doc_id" % 17 === 0)
      val src = AnnIndexes.prepared("q212src", d) { p =>
        eval.select($"text").repartition(4)
          .write.mode("overwrite").parquet(p)
      }
      val root = Scratch.dir("graft_q212")
      graft.streaming.SketchStreams.runBloomToCompletion(s,
        src, s"$root/bloom", s"$root/chk", "text")
      val bits = graft.operators.Sketches
        .bloomBitsFromArtifact(s, s"$root/bloom")
      val nb = s.read.parquet(s"$root/bloom")
        .agg(countDistinct($"batch_id").as("n_batches"))
      val flagged = graft.operators.Sketches.bloomScreen(
          docs, "doc_id", "text", bits)
        .select($"id".as("doc_id"))
      val exact = docs
        .join(eval.select($"text").distinct(), Seq("text"), "left_semi")
        .select($"doc_id", lit(true).as("exact_hit"))
      flagged.join(exact, Seq("doc_id"), "left")
        .crossJoin(nb)
        .select($"doc_id",
          coalesce($"exact_hit", lit(false)).as("exact_hit"),
          $"n_batches")
        .orderBy($"doc_id")
    },
    Some(
      "WITH ev AS (SELECT DISTINCT text FROM documents " +
        "WHERE doc_id % 17 = 0), " +
        "bits AS (SELECT DISTINCT " +
        "('0x' || substr(md5(j::VARCHAR || ':' || text), 1, 12))" +
        "::BIGINT % 4096 AS pos " +
        "FROM ev, generate_series(1, 3) AS t(j)), " +
        "tp AS (SELECT doc_id, j, " +
        "('0x' || substr(md5(j::VARCHAR || ':' || text), 1, 12))" +
        "::BIGINT % 4096 AS pos " +
        "FROM documents, generate_series(1, 3) AS t(j)), " +
        "hits AS (SELECT doc_id FROM tp JOIN bits USING (pos) " +
        "GROUP BY doc_id HAVING count(DISTINCT j) = 3), " +
        "ex AS (SELECT DISTINCT d.doc_id FROM documents d " +
        "JOIN ev e ON d.text = e.text) " +
        "SELECT h.doc_id, (e2.doc_id IS NOT NULL) AS exact_hit, " +
        "4::BIGINT AS n_batches " +
        "FROM hits h LEFT JOIN ex e2 ON h.doc_id = e2.doc_id " +
        "ORDER BY h.doc_id"),
  )

  /** STREAMING count-min growth ORACLED ([[graft.streaming
    * .SketchStreams.runCmsToCompletion]] / [[graft.operators.Sketches
    * .upsertCmsBatch]]): the token stream arrives as four files, every
    * micro-batch upserts ≤ d·w counter rows keyed by its streaming
    * batchId, and the probe estimates served from the elementwise-SUM
    * merge of the artifact must hash-match the single-pass q183 oracle.
    * SUM is the one merge law of the trio that is NOT idempotent — a
    * redelivered batch would double-count — so this row is the one that
    * actually exercises the batchId-keyed overwrite for correctness,
    * not just hygiene (q211's max and q212's union would both survive a
    * duplicate batch unscathed; a summed counter would not). */
  val q213CmsStreamOracled: GraftQuery = GraftQuery(
    "q213_cms_stream_oracled",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("t"))
      val src = AnnIndexes.prepared("q213src", d) { p =>
        toks.repartition(4).write.mode("overwrite").parquet(p)
      }
      val root = Scratch.dir("graft_q213")
      graft.streaming.SketchStreams.runCmsToCompletion(s,
        src, s"$root/cms", s"$root/chk", "t")
      val counters = graft.operators.Sketches
        .cmsCountersFromArtifact(s, s"$root/cms")
      val nb = s.read.parquet(s"$root/cms")
        .agg(countDistinct($"batch_id").as("n_batches"))
      val probes = Seq("customer", "vector", "window", "merge", "the")
      val est = graft.operators.Sketches.cmsEstimates(counters, probes)
      val exact = toks.filter($"t".isin(probes: _*))
        .groupBy($"t").agg(count(lit(1)).as("exact"))
      probes.toDF("t")
        .join(exact, Seq("t"), "left")
        .join(est, Seq("t"))
        .crossJoin(nb)
        .select($"t", coalesce($"exact", lit(0L)).as("exact"), $"est",
          ($"est" >= coalesce($"exact", lit(0L))).as("admissible"),
          $"n_batches")
        .orderBy($"t")
    },
    Some(
      "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t " +
        "FROM documents), " +
        "js AS (SELECT unnest(generate_series(0, 3)) AS j), " +
        "cms AS MATERIALIZED (SELECT j, " +
        "('0x' || substr(md5(j::VARCHAR || '|' || t), 1, 8))::BIGINT " +
        "% 512 AS bucket, count(*)::BIGINT AS c " +
        "FROM tok, js GROUP BY 1, 2), " +
        "pr AS (SELECT * FROM (VALUES ('customer'), ('vector'), " +
        "('window'), ('merge'), ('the')) AS x(t)), " +
        "pj AS (SELECT pr.t, js.j, ('0x' || substr(md5(js.j::VARCHAR " +
        "|| '|' || pr.t), 1, 8))::BIGINT % 512 AS bucket FROM pr, js), " +
        "est AS (SELECT t, min(coalesce(cms.c, 0))::BIGINT AS est " +
        "FROM pj LEFT JOIN cms USING (j, bucket) GROUP BY t), " +
        "ex AS (SELECT t, count(*)::BIGINT AS exact FROM tok " +
        "WHERE t IN ('customer','vector','window','merge','the') " +
        "GROUP BY t) " +
        "SELECT pr.t, coalesce(ex.exact, 0)::BIGINT AS exact, est.est, " +
        "est.est >= coalesce(ex.exact, 0) AS admissible, " +
        "4::BIGINT AS n_batches " +
        "FROM pr LEFT JOIN ex USING (t) JOIN est USING (t) " +
        "ORDER BY t"),
  )

  /** Dataset-overlap estimation by HLL SET ALGEBRA, fully ORACLED —
    * the sketch-level answer to "how much does corpus A overlap corpus
    * B" WITHOUT EVER JOINING THEM: build portable p=12 registers per
    * side ([[graft.operators.Sketches.hllRegisters]]), merge by
    * register-max into the union sketch, and estimate the intersection
    * by inclusion-exclusion (|A∩B| ≈ Â + B̂ - Û). At 100 TB the two
    * corpora may live in different systems — each side ships 4096 tiny
    * register rows and the overlap is answered from sketches alone;
    * the exact INTERSECT here is the grading baseline, not the
    * mechanism. DuckDB rebuilds all three register sets and replays
    * the same estimate CASE per side, so the estimates, the
    * inclusion-exclusion arithmetic and the relative error are all in
    * the hashed row. */
  val q214HllOverlapOracled: GraftQuery = GraftQuery(
    "q214_hll_overlap_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val a = docs.filter($"doc_id" % 2 === 0).select($"text")
      val b = docs.filter($"doc_id" % 3 === 0).select($"text")
      val ra = graft.operators.Sketches.hllRegisters(a, "text", p = 12)
      val rb = graft.operators.Sketches.hllRegisters(b, "text", p = 12)
      val ru = graft.operators.Sketches.hllMergeRegisters(ra, rb)
      def est(r: org.apache.spark.sql.DataFrame, name: String) =
        graft.operators.Sketches.hllEstimate(r, p = 12)
          .select($"est".as(name))
      val exacts = a.distinct()
        .join(b.distinct(), Seq("text"), "left_semi")
        .agg(count(lit(1)).as("exact_overlap"))
        .crossJoin(a.agg(countDistinct($"text").as("exact_a")))
        .crossJoin(b.agg(countDistinct($"text").as("exact_b")))
      est(ra, "est_a").crossJoin(est(rb, "est_b"))
        .crossJoin(est(ru, "est_u")).crossJoin(exacts)
        .withColumn("est_overlap",
          round($"est_a" + $"est_b" - $"est_u", 4))
        .select($"est_a", $"est_b", $"est_u", $"est_overlap",
          $"exact_a", $"exact_b", $"exact_overlap",
          round(($"est_overlap" - $"exact_overlap") / $"exact_overlap",
            4).as("rel_err"))
    },
    Some(
      "WITH ka AS (SELECT text AS key FROM documents " +
        "WHERE doc_id % 2 = 0), " +
        "kb AS (SELECT text AS key FROM documents " +
        "WHERE doc_id % 3 = 0), " +
        "k AS (SELECT 'a' AS s, key FROM ka " +
        "UNION ALL SELECT 'b', key FROM kb), " +
        "h AS (SELECT s, " +
        "('0x' || substr(md5(key), 1, 3))::BIGINT AS bucket, " +
        "('0x' || substr(md5(key), 4, 8))::BIGINT AS w FROM k), " +
        "r AS (SELECT s, bucket, max(CASE WHEN w = 0 THEN 33 " +
        "ELSE 33 - length(bin(w)) END) AS register FROM h " +
        "GROUP BY 1, 2), " +
        "r3 AS (SELECT s, bucket, register FROM r UNION ALL " +
        "SELECT 'u', bucket, max(register) FROM r GROUP BY bucket), " +
        "a AS (SELECT s, count(*)::BIGINT AS nonzero, " +
        "sum(1::BIGINT << (33 - register))::BIGINT AS nz_scaled " +
        "FROM r3 GROUP BY s), " +
        "e AS (SELECT s, (4096 - nonzero)::BIGINT AS zero_regs, " +
        "(nz_scaled + (4096 - nonzero) * 8589934592)::BIGINT " +
        "AS sum_scaled FROM a), " +
        "rw AS (SELECT s, zero_regs, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 4096.0::DOUBLE) * 4096.0::DOUBLE * " +
        "4096.0::DOUBLE) / (sum_scaled / 8589934592.0::DOUBLE) " +
        "AS raw FROM e), " +
        "est AS (SELECT s, CASE WHEN zero_regs > 0 " +
        "AND raw <= 10240.0::DOUBLE " +
        "THEN round(4096.0::DOUBLE * ln(4096.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est FROM rw), " +
        "p AS (SELECT max(CASE WHEN s = 'a' THEN est END) AS est_a, " +
        "max(CASE WHEN s = 'b' THEN est END) AS est_b, " +
        "max(CASE WHEN s = 'u' THEN est END) AS est_u FROM est), " +
        "po AS (SELECT est_a, est_b, est_u, " +
        "round(est_a + est_b - est_u, 4) AS est_overlap FROM p), " +
        "x AS (SELECT " +
        "(SELECT count(DISTINCT key) FROM ka)::BIGINT AS exact_a, " +
        "(SELECT count(DISTINCT key) FROM kb)::BIGINT AS exact_b, " +
        "(SELECT count(*) FROM (SELECT DISTINCT key FROM ka " +
        "INTERSECT SELECT DISTINCT key FROM kb))::BIGINT " +
        "AS exact_overlap) " +
        "SELECT po.est_a, po.est_b, po.est_u, po.est_overlap, " +
        "x.exact_a, x.exact_b, x.exact_overlap, " +
        "round((po.est_overlap - x.exact_overlap) / x.exact_overlap, 4) " +
        "AS rel_err FROM po, x"),
  )

  /** Per-source cardinality PROFILE, fully ORACLED ([[graft.operators
    * .Sketches.hllRegistersByGroup]]/[[graft.operators.Sketches
    * .hllEstimateByGroup]]) — the grouped twin of q209, and the
    * oracled face of the DataSketches artifact profile (q134/q65,
    * whose binaries are engine-internal): one groupBy on (source,
    * 8-bit bucket) builds every source's registers in a single pass
    * (at most 20×256 rows at any corpus size), and the per-source
    * estimate CASE replays in DuckDB term-for-term next to the exact
    * per-source distinct. The dataset-card shape at 100 TB: "how many
    * distinct documents does each source contribute" answered without
    * a per-source exact distinct over the full corpus. */
  val q215HllProfileOracled: GraftQuery = GraftQuery(
    "q215_hll_profile_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val regs = graft.operators.Sketches
        .hllRegistersByGroup(docs, Seq("source"), "text")
      val ests = graft.operators.Sketches
        .hllEstimateByGroup(regs, Seq("source"))
      val exact = docs.groupBy($"source")
        .agg(countDistinct($"text").as("exact"))
      ests.join(exact, Seq("source"))
        .select($"source", $"zero_regs", $"max_register", $"sum_scaled",
          $"est", $"exact",
          round(($"est" - $"exact") / $"exact", 4).as("rel_err"))
        .orderBy($"source")
    },
    Some(
      "WITH h AS (SELECT source AS s, " +
        "('0x' || substr(md5(text), 1, 2))::BIGINT AS bucket, " +
        "('0x' || substr(md5(text), 3, 8))::BIGINT AS w " +
        "FROM documents), " +
        "r AS (SELECT s, bucket, max(CASE WHEN w = 0 THEN 33 " +
        "ELSE 33 - length(bin(w)) END) AS register FROM h " +
        "GROUP BY 1, 2), " +
        "a AS (SELECT s, count(*)::BIGINT AS nonzero, " +
        "sum(1::BIGINT << (33 - register))::BIGINT AS nz_scaled, " +
        "max(register)::INT AS max_register FROM r GROUP BY s), " +
        "e AS (SELECT s, (256 - nonzero)::BIGINT AS zero_regs, " +
        "(nz_scaled + (256 - nonzero) * 8589934592)::BIGINT " +
        "AS sum_scaled, max_register FROM a), " +
        "rw AS (SELECT *, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 256.0::DOUBLE) * 256.0::DOUBLE * " +
        "256.0::DOUBLE) / (sum_scaled / 8589934592.0::DOUBLE) " +
        "AS raw FROM e), " +
        "est AS (SELECT s, zero_regs, max_register, sum_scaled, " +
        "CASE WHEN zero_regs > 0 AND raw <= 640.0::DOUBLE " +
        "THEN round(256.0::DOUBLE * ln(256.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est FROM rw), " +
        "x AS (SELECT source AS s, count(DISTINCT text)::BIGINT " +
        "AS exact FROM documents GROUP BY 1) " +
        "SELECT est.s AS source, est.zero_regs, est.max_register, " +
        "est.sum_scaled, est.est, x.exact, " +
        "round((est.est - x.exact) / x.exact, 4) AS rel_err " +
        "FROM est JOIN x USING (s) ORDER BY source"),
  )

  /** Pairwise dataset-overlap MATRIX by HLL set algebra, fully ORACLED
    * — q214's two-corpus inclusion-exclusion generalized to N datasets
    * in one pass: four corpus slices (doc_id % m = 0 for m ∈ 2..5 —
    * genuinely overlapping, with nested pairs like A4 ⊂ A2 in the
    * fixture) each build p=12 grouped registers, every pair's union
    * sketch is a register-max over its two members' rows, and all six
    * overlap estimates come from sketches alone. At 100 TB this is the
    * contamination matrix across N snapshots/sources: N×4096 register
    * rows in, N² pair estimates out, the corpora themselves never
    * joined — the exact per-pair INTERSECT here is only the grading
    * baseline. Every register, estimate CASE and inclusion-exclusion
    * term replays in DuckDB. */
  val q216OverlapMatrixOracled: GraftQuery = GraftQuery(
    "q216_overlap_matrix_oracled",
    (s, d) => {
      import s.implicits._
      val ms = Seq(2, 3, 4, 5)
      val docs = Tables.documents(s, d)
      val slices = docs
        .select($"doc_id", $"text",
          explode(array(ms.map(lit): _*)).as("ds"))
        .filter($"doc_id" % $"ds" === 0)
        .select($"ds", $"text")
      val r = graft.operators.Sketches
        .hllRegistersByGroup(slices, Seq("ds"), "text", p = 12)
      val es = graft.operators.Sketches
        .hllEstimateByGroup(r, Seq("ds"), p = 12)
        .select($"ds", $"est")
      val pairs = (for { i <- ms; j <- ms if i < j } yield (i, j))
        .toDF("d1", "d2")
      val members = pairs
        .select($"d1", $"d2", explode(array($"d1", $"d2")).as("ds"))
      val ru = members.join(r, Seq("ds"))
        .groupBy($"d1", $"d2", $"bucket")
        .agg(max($"register").cast("int").as("register"))
      val eu = graft.operators.Sketches
        .hllEstimateByGroup(ru, Seq("d1", "d2"), p = 12)
        .select($"d1", $"d2", $"est".as("est_u"))
      val st = slices.distinct()
      val xo = st.as("a")
        .join(st.as("b"),
          $"a.text" === $"b.text" && $"a.ds" < $"b.ds")
        .groupBy($"a.ds".as("d1"), $"b.ds".as("d2"))
        .agg(countDistinct($"a.text").as("exact_overlap"))
      pairs
        .join(es.select($"ds".as("d1"), $"est".as("est_a")), Seq("d1"))
        .join(es.select($"ds".as("d2"), $"est".as("est_b")), Seq("d2"))
        .join(eu, Seq("d1", "d2"))
        .join(xo, Seq("d1", "d2"))
        .withColumn("est_overlap",
          round($"est_a" + $"est_b" - $"est_u", 4))
        .select($"d1", $"d2", $"est_a", $"est_b", $"est_u",
          $"est_overlap", $"exact_overlap",
          round(($"est_overlap" - $"exact_overlap") / $"exact_overlap",
            4).as("rel_err"))
        .orderBy($"d1", $"d2")
    },
    Some(
      "WITH sl AS (SELECT m.ds, d.text FROM documents d, " +
        "(VALUES (2), (3), (4), (5)) AS m(ds) " +
        "WHERE d.doc_id % m.ds = 0), " +
        "h AS (SELECT ds, " +
        "('0x' || substr(md5(text), 1, 3))::BIGINT AS bucket, " +
        "('0x' || substr(md5(text), 4, 8))::BIGINT AS w FROM sl), " +
        "r AS (SELECT ds, bucket, max(CASE WHEN w = 0 THEN 33 " +
        "ELSE 33 - length(bin(w)) END) AS register FROM h " +
        "GROUP BY 1, 2), " +
        "pairs AS (SELECT a.ds AS d1, b.ds AS d2 " +
        "FROM (SELECT DISTINCT ds FROM sl) a, " +
        "(SELECT DISTINCT ds FROM sl) b WHERE a.ds < b.ds), " +
        "ru AS (SELECT p.d1, p.d2, r.bucket, max(r.register) " +
        "AS register FROM pairs p JOIN r ON r.ds IN (p.d1, p.d2) " +
        "GROUP BY 1, 2, 3), " +
        "ea AS (SELECT ds, CASE WHEN zero_regs > 0 " +
        "AND raw <= 10240.0::DOUBLE " +
        "THEN round(4096.0::DOUBLE * ln(4096.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est FROM " +
        "(SELECT ds, zero_regs, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 4096.0::DOUBLE) * 4096.0::DOUBLE * " +
        "4096.0::DOUBLE) / (sum_scaled / 8589934592.0::DOUBLE) AS raw " +
        "FROM (SELECT ds, (4096 - count(*))::BIGINT AS zero_regs, " +
        "(sum(1::BIGINT << (33 - register)) + " +
        "(4096 - count(*)) * 8589934592)::BIGINT AS sum_scaled " +
        "FROM r GROUP BY ds))), " +
        "eu AS (SELECT d1, d2, CASE WHEN zero_regs > 0 " +
        "AND raw <= 10240.0::DOUBLE " +
        "THEN round(4096.0::DOUBLE * ln(4096.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est_u FROM " +
        "(SELECT d1, d2, zero_regs, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 4096.0::DOUBLE) * 4096.0::DOUBLE * " +
        "4096.0::DOUBLE) / (sum_scaled / 8589934592.0::DOUBLE) AS raw " +
        "FROM (SELECT d1, d2, (4096 - count(*))::BIGINT AS zero_regs, " +
        "(sum(1::BIGINT << (33 - register)) + " +
        "(4096 - count(*)) * 8589934592)::BIGINT AS sum_scaled " +
        "FROM ru GROUP BY d1, d2))), " +
        "x AS (SELECT a.ds AS d1, b.ds AS d2, " +
        "count(DISTINCT a.text)::BIGINT AS exact_overlap " +
        "FROM (SELECT DISTINCT ds, text FROM sl) a " +
        "JOIN (SELECT DISTINCT ds, text FROM sl) b " +
        "ON a.text = b.text AND a.ds < b.ds GROUP BY 1, 2), " +
        "po AS (SELECT p.d1, p.d2, ea1.est AS est_a, ea2.est AS est_b, " +
        "eu.est_u, round(ea1.est + ea2.est - eu.est_u, 4) " +
        "AS est_overlap, x.exact_overlap " +
        "FROM pairs p JOIN ea ea1 ON ea1.ds = p.d1 " +
        "JOIN ea ea2 ON ea2.ds = p.d2 " +
        "JOIN eu ON eu.d1 = p.d1 AND eu.d2 = p.d2 " +
        "JOIN x ON x.d1 = p.d1 AND x.d2 = p.d2) " +
        "SELECT d1, d2, est_a, est_b, est_u, est_overlap, " +
        "exact_overlap, " +
        "round((est_overlap - exact_overlap) / exact_overlap, 4) " +
        "AS rel_err FROM po ORDER BY d1, d2"),
  )

  /** Partition-invariant approximate QUANTILES, fully ORACLED
    * ([[graft.operators.Sketches.histogramCounts]]/[[graft.operators
    * .Sketches.histogramQuantiles]]) — the mergeable-quantile face the
    * registry deliberately lacked: Spark's `approx_percentile` is
    * excluded because Greenwald–Khanna merges are order-sensitive,
    * and exact percentiles (q107) rescan everything. HERE a
    * fixed-width integer histogram (40 bins × width 16 over n_chars,
    * SUM-mergeable per shard) answers p50/p95/p99 by cumulative-rank
    * interpolation — pure integer arithmetic plus one division, so
    * DuckDB replays bins, ranks and estimates bit-for-bit, graded
    * against the exact percentile (q107's proven percentile ≡
    * quantile_cont parity). The 100 TB shape: ≤ nbins rows ever leave
    * the executors, and shard histograms ADD. */
  val q217HistQuantilesOracled: GraftQuery = GraftQuery(
    "q217_hist_quantiles_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val counts = graft.operators.Sketches
        .histogramCounts(docs, "n_chars", width = 16L, nbins = 40)
      val est = graft.operators.Sketches
        .histogramQuantiles(counts, width = 16L,
          qs = Seq(0.5, 0.95, 0.99))
      val exact = docs.agg(
          percentile($"n_chars", lit(0.5)).as("e50"),
          percentile($"n_chars", lit(0.95)).as("e95"),
          percentile($"n_chars", lit(0.99)).as("e99"))
        .selectExpr(
          "stack(3, 0.5D, e50, 0.95D, e95, 0.99D, e99) AS (q, exact)")
        .select($"q", round($"exact", 4).as("exact"))
      est.join(exact, Seq("q"))
        .select($"q", $"est", $"exact",
          round(abs($"est" - $"exact"), 4).as("abs_err"))
        .orderBy($"q")
    },
    Some(
      "WITH b AS (SELECT least(greatest(n_chars // 16, 0), 39)" +
        "::BIGINT AS bin, count(*)::BIGINT AS cnt FROM documents " +
        "GROUP BY 1), " +
        "c AS (SELECT bin, cnt, " +
        "sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum FROM b), " +
        "t AS (SELECT count(*)::BIGINT AS n FROM documents), " +
        "qs AS (SELECT * FROM (VALUES (0.5::DOUBLE), (0.95::DOUBLE), " +
        "(0.99::DOUBLE)) v(q)), " +
        "r AS (SELECT q, ceil(q * n)::BIGINT AS rk FROM qs, t), " +
        "est AS (SELECT r.q, round(c.bin * 16 + 16.0::DOUBLE * " +
        "(r.rk - (c.cum - c.cnt)) / c.cnt, 4) AS est " +
        "FROM r JOIN c ON c.cum >= r.rk AND c.cum - c.cnt < r.rk), " +
        "x AS (SELECT 0.5::DOUBLE AS q, " +
        "round(quantile_cont(n_chars, 0.5), 4) AS exact " +
        "FROM documents UNION ALL " +
        "SELECT 0.95::DOUBLE, round(quantile_cont(n_chars, 0.95), 4) " +
        "FROM documents UNION ALL " +
        "SELECT 0.99::DOUBLE, round(quantile_cont(n_chars, 0.99), 4) " +
        "FROM documents) " +
        "SELECT est.q, est.est, x.exact, " +
        "round(abs(est.est - x.exact), 4) AS abs_err " +
        "FROM est JOIN x USING (q) ORDER BY est.q"),
  )

  /** BLOOM-ACCELERATED exact semi-join, fully ORACLED — the runtime-
    * filter pattern composed end-to-end: the reference key set builds
    * a 65536-bit k=3 filter ([[graft.operators.Sketches.bloomBits]] —
    * ~2 KB of bit rows however many keys), the corpus's DISTINCT keys
    * are screened through the broadcast bits, only the flagged sliver
    * is confirmed against the reference with the exact equi-join, and
    * the confirmed keys drive the final aggregation. The ORACLE is the
    * plain exact join — the whole point is that the mechanism changes
    * and the result provably does not (bloom never drops a true key;
    * the confirm step removes its false positives). At 100 TB this is
    * how you semi-join against a reference too large to broadcast
    * exactly: broadcast its bloom instead, and the corpus-side shuffle
    * carries only candidates. */
  val q218BloomJoinOracled: GraftQuery = GraftQuery(
    "q218_bloom_join_oracled",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val ref = Tables.orders(s, d).filter($"o_orderkey" % 41 === 0)
        .select($"o_orderkey")
      val bits = graft.operators.Sketches.bloomBits(
        ref, "o_orderkey", mBits = 65536, k = 3)
      val cand = graft.operators.Sketches.bloomScreen(
          li.select($"l_orderkey").distinct(), "l_orderkey",
          "l_orderkey", bits, mBits = 65536, k = 3)
        .select($"id".as("l_orderkey"))
      val confirmed = cand.join(ref,
        cand("l_orderkey") === ref("o_orderkey"), "left_semi")
      li.join(confirmed, Seq("l_orderkey"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag")
    },
    Some(
      "SELECT l_returnflag, count(*)::BIGINT AS n, " +
        "sum(l_quantity) AS sum_qty " +
        "FROM lineitem JOIN (SELECT o_orderkey FROM orders " +
        "WHERE o_orderkey % 41 = 0) r ON l_orderkey = r.o_orderkey " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
  )

  /** SELF-JOIN SIZE (second frequency moment F2) estimated from the
    * count-min sketch alone, fully ORACLED — the Cormode–Muthukrishnan
    * join-size estimate applied to the duplication-mass question:
    * Σ_t c_t² is the number of identical-token pairs, i.e. the pair
    * budget a dedup pass would face, and HERE it is answered from d
    * rows of w counters (est_j = Σ_b c_{j,b}², est = min_j — never an
    * undercount, overcount only from hash collisions ≈ (Σc)²/w) WITHOUT
    * ever grouping the full key space or joining the corpus to itself.
    * Pure integer arithmetic end-to-end: DuckDB rebuilds the d×w
    * counter table and replays every squared sum, the min, the
    * admissibility flag and the relative error against the exact F2.
    * The 100 TB shape: skew detection and dedup-pair budgeting from a
    * fixed-size summary before launching the expensive job. */
  val q219F2SketchOracled: GraftQuery = GraftQuery(
    "q219_f2_sketch_oracled",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("t"))
      val counters = graft.operators.Sketches
        .cmsCounters(toks, "t", d = 4, w = 8192)
      val est = counters.groupBy($"j")
        .agg(sum($"c" * $"c").as("f2j"))
        .agg(min($"f2j").as("est"))
      val exact = toks.groupBy($"t").agg(count(lit(1)).as("c"))
        .agg(sum($"c" * $"c").as("exact"))
      est.crossJoin(exact)
        .select($"est", $"exact",
          ($"est" >= $"exact").as("admissible"),
          round(($"est" - $"exact") / $"exact", 4).as("rel_err"))
    },
    Some(
      "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t " +
        "FROM documents), " +
        "js AS (SELECT unnest(generate_series(0, 3)) AS j), " +
        "cms AS (SELECT j, " +
        "('0x' || substr(md5(j::VARCHAR || '|' || t), 1, 8))::BIGINT " +
        "% 8192 AS bucket, count(*)::BIGINT AS c " +
        "FROM tok, js GROUP BY 1, 2), " +
        "f2 AS (SELECT j, sum(c * c)::BIGINT AS f2j FROM cms " +
        "GROUP BY j), " +
        "e AS (SELECT min(f2j)::BIGINT AS est FROM f2), " +
        "x AS (SELECT sum(c * c)::BIGINT AS exact FROM " +
        "(SELECT count(*)::BIGINT AS c FROM tok GROUP BY t)) " +
        "SELECT e.est, x.exact, e.est >= x.exact AS admissible, " +
        "round((e.est - x.exact) / x.exact, 4) AS rel_err FROM e, x"),
  )

  /** CROSS-corpus JOIN-SIZE estimation by CMS inner product, fully
    * ORACLED — q219's F2 generalized to two different corpora: the
    * equi-join size |A ⋈ B| on a key equals Σ_t cA_t·cB_t (here the
    * cross-duplication mass between two document slices' token
    * streams), and the sketch estimate is min_j Σ_b cA_{j,b}·cB_{j,b}
    * over each side's d×w counters — each corpus is sketched
    * INDEPENDENTLY (they never meet; only two fixed-size counter
    * tables join, on (j, bucket)), the estimate never undercounts, and
    * every product, sum, min and the error vs the exact join size
    * replays in DuckDB as pure integers. The 100 TB planning shape:
    * "how big would this join / cross-dedup pass be" answered from two
    * shipped sketches before any shuffle of the data. */
  val q220JoinSizeOracled: GraftQuery = GraftQuery(
    "q220_join_size_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      def toksOf(df: org.apache.spark.sql.DataFrame) =
        df.select(explode(split($"text", " ")).as("t"))
      val ta = toksOf(docs.filter($"doc_id" % 2 === 0))
      val tb = toksOf(docs.filter($"doc_id" % 2 =!= 0))
      val ca = graft.operators.Sketches.cmsCounters(ta, "t", 4, 8192)
        .withColumnRenamed("c", "ca")
      val cb = graft.operators.Sketches.cmsCounters(tb, "t", 4, 8192)
        .withColumnRenamed("c", "cb")
      val est = ca.join(cb, Seq("j", "bucket"))
        .groupBy($"j").agg(sum($"ca" * $"cb").as("ipj"))
        .agg(min($"ipj").as("est"))
      val exact = ta.groupBy($"t").agg(count(lit(1)).as("na"))
        .join(tb.groupBy($"t").agg(count(lit(1)).as("nb")), Seq("t"))
        .agg(coalesce(sum($"na" * $"nb"), lit(0L)).as("exact"))
      est.crossJoin(exact)
        .select($"est", $"exact",
          ($"est" >= $"exact").as("admissible"),
          round(($"est" - $"exact") / $"exact", 4).as("rel_err"))
    },
    Some(
      "WITH ta AS (SELECT unnest(string_split(text, ' ')) AS t " +
        "FROM documents WHERE doc_id % 2 = 0), " +
        "tb AS (SELECT unnest(string_split(text, ' ')) AS t " +
        "FROM documents WHERE doc_id % 2 <> 0), " +
        "js AS (SELECT unnest(generate_series(0, 3)) AS j), " +
        "ca AS (SELECT j, " +
        "('0x' || substr(md5(j::VARCHAR || '|' || t), 1, 8))::BIGINT " +
        "% 8192 AS bucket, count(*)::BIGINT AS ca " +
        "FROM ta, js GROUP BY 1, 2), " +
        "cb AS (SELECT j, " +
        "('0x' || substr(md5(j::VARCHAR || '|' || t), 1, 8))::BIGINT " +
        "% 8192 AS bucket, count(*)::BIGINT AS cb " +
        "FROM tb, js GROUP BY 1, 2), " +
        "ip AS (SELECT ca.j, sum(ca.ca * cb.cb)::BIGINT AS ipj " +
        "FROM ca JOIN cb USING (j, bucket) GROUP BY ca.j), " +
        "e AS (SELECT min(ipj)::BIGINT AS est FROM ip), " +
        "x AS (SELECT coalesce(sum(na * nb), 0)::BIGINT AS exact FROM " +
        "(SELECT t, count(*)::BIGINT AS na FROM ta GROUP BY t) a " +
        "JOIN (SELECT t, count(*)::BIGINT AS nb FROM tb GROUP BY t) b " +
        "USING (t)) " +
        "SELECT e.est, x.exact, e.est >= x.exact AS admissible, " +
        "round((e.est - x.exact) / x.exact, 4) AS rel_err FROM e, x"),
  )

  /** STREAMING late-data accounting, fully ORACLED ([[graft.streaming
    * .EventStream.runLateAppend]]) — event-time WATERMARK semantics
    * made checkable: the events table is split into four arrival
    * shards (ts-quartiles) with PLANTED stragglers (every 37th row by
    * the (ts, event_id) total order arrives two shards late — days
    * behind a 30-minute watermark), drained one file per micro-batch
    * in pinned modification-time order, and the append-mode tumbling
    * 1-hour counts must hash-match DuckDB's replay of the full
    * watermark protocol: running-max per-shard watermark, late-input
    * filtering against the LAGGED watermark (Spark's
    * eventTimeWatermarkForLateEvents — a straggler arriving in the
    * very batch whose eviction finalizes its window still merges;
    * WatermarkLateSpec pins all three semantic cases), and emission
    * of exactly the windows the FINAL watermark passed. At 100 TB
    * this is the correctness contract every event-time pipeline
    * rests on — which rows a watermark silently drops is now an
    * oracle-checked number, not a doc claim. */
  /** The ONE planted-straggler backlog builder behind the per-JVM
    * `prepared("q225src")` cache: q225/q226/q228 must read the same
    * arrival order by construction, and a single definition means
    * drift can no longer hide behind whichever query ran first and
    * warmed the cache (ADVICE r11). */
  private def writeSharedLateBacklog(
      s: org.apache.spark.sql.SparkSession, d: String,
      p: String): Unit = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"ts", $"event_id")
    val sharded = Tables.events(s, d)
      .select($"event_id", $"ts",
        (ntile(4).over(w) - 1).as("q"),
        row_number().over(w).as("rn"))
      .select($"event_id", $"ts",
        when($"rn" % 37 === 0, least($"q" + 2, lit(3)))
          .otherwise($"q").cast("int").as("shard"))
    graft.streaming.EventStream.writeShardedBacklog(s, p, sharded,
      "shard", 4)
  }

  val q225WatermarkLateOracled: GraftQuery = GraftQuery(
    "q225_watermark_late_oracled",
    (s, d) => {
      import s.implicits._
      val src = AnnIndexes.prepared("q225src", d)(
        writeSharedLateBacklog(s, d, _))
      graft.streaming.EventStream.runLateAppend(s, src, "30 minutes",
          queryName = "graft_q225")
        .orderBy($"w_start_ms")
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT ts, CASE WHEN rn % 37 = 0 " +
        "THEN least(q + 2, 3) ELSE q END AS shard FROM ord), " +
        "mx AS (SELECT shard, max(ts) AS mt FROM sh GROUP BY shard), " +
        // the LAGGED (late-events) watermark for shard k: max event
        // time over shards <= k-2, minus the delay (NULL = no filter)
        "wm AS (SELECT shard, max(mt) OVER (ORDER BY shard " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) " +
        "- INTERVAL 30 MINUTE AS wml FROM mx), " +
        "surv AS (SELECT sh.ts FROM sh JOIN wm USING (shard) " +
        "WHERE wm.wml IS NULL " +
        "OR date_trunc('hour', sh.ts) + INTERVAL 1 HOUR > wm.wml), " +
        "fin AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wmf FROM sh) " +
        "SELECT epoch_ms(date_trunc('hour', surv.ts)) AS w_start_ms, " +
        "count(*)::BIGINT AS n_events FROM surv, fin " +
        "WHERE date_trunc('hour', surv.ts) + INTERVAL 1 HOUR <= fin.wmf " +
        "GROUP BY 1 ORDER BY 1"))

  /** SLIDING-window late-data accounting, fully ORACLED — q225's
    * protocol over OVERLAPPING windows (1 hour every 30 minutes,
    * same planted-straggler backlog): Spark drops late input PER
    * (row, window) pair, so a straggler whose earlier window was
    * already finalized still counts in its open later window
    * (pinned in WatermarkLateSpec). The oracle explodes every row to
    * its two windows and replays the lagged-watermark filter per
    * pair — window multiplicity, the filter, and final emission all
    * in the hashed rows. */
  val q226SlidingLateOracled: GraftQuery = GraftQuery(
    "q226_sliding_late_oracled",
    (s, d) => {
      import s.implicits._
      // same prepared backlog as q225 (shared key AND shared builder)
      val src = AnnIndexes.prepared("q225src", d)(
        writeSharedLateBacklog(s, d, _))
      graft.streaming.EventStream.runLateAppend(s, src, "30 minutes",
          queryName = "graft_q226", slide = Some("30 minutes"))
        .orderBy($"w_start_ms")
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT ts, CASE WHEN rn % 37 = 0 " +
        "THEN least(q + 2, 3) ELSE q END AS shard FROM ord), " +
        "mx AS (SELECT shard, max(ts) AS mt FROM sh GROUP BY shard), " +
        "wm AS (SELECT shard, max(mt) OVER (ORDER BY shard " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) " +
        "- INTERVAL 30 MINUTE AS wml FROM mx), " +
        // explode each row to its two overlapping 1h/30m windows and
        // filter PER (row, window) against the lagged watermark
        "cand AS (SELECT sh.ts, sh.shard, " +
        "time_bucket(INTERVAL '30 minutes', sh.ts) - o.off AS w_start " +
        "FROM sh, (VALUES (INTERVAL '0 minutes'), " +
        "(INTERVAL '30 minutes')) o(off)), " +
        "surv AS (SELECT c.w_start FROM cand c JOIN wm USING (shard) " +
        "WHERE wm.wml IS NULL OR c.w_start + INTERVAL 1 HOUR > wm.wml), " +
        "fin AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wmf FROM sh) " +
        "SELECT epoch_ms(surv.w_start) AS w_start_ms, " +
        "count(*)::BIGINT AS n_events FROM surv, fin " +
        "WHERE surv.w_start + INTERVAL 1 HOUR <= fin.wmf " +
        "GROUP BY 1 ORDER BY 1"))

  /** SESSION-window late-data accounting, fully ORACLED — the third
    * face of the watermark protocol (q225 tumbling, q226 sliding,
    * HERE gap-merged per-key sessions): user-keyed 1-minute-gap
    * sessions over the planted-straggler backlog, emitted once the
    * watermark passes a session's end (last event + gap). The late
    * predicate is SESSION-END-scoped against the lagged watermark
    * (WatermarkLateSpec pins it at the ts-vs-end boundary), and the
    * fixture's 30-minute margins vs the 1-minute gap make the oracle
    * robust to any predicate strictness. DuckDB replays survivors →
    * per-key gaps-and-islands → watermark-gated emission; session
    * starts, ends, and counts all hash. Keyed sessions are how
    * event-time sessionization actually runs at 100 TB — state is
    * per (key, open session), never corpus-sized.
    *
    * ORACLE CONSTRAINT (ADVICE r11, asserted at all three SFs in
    * WatermarkLateSpec): the gaps-and-islands replay assumes no
    * surviving straggler lands within `gap` of an earlier same-key
    * survivor whose session end had already passed an eviction
    * watermark when the straggler arrived — Spark would then emit TWO
    * session rows (state was evicted, the straggler re-opens) where
    * the replay merges ONE. Survival alone (ts+gap > lagged wm) does
    * not rule this out; the fixture's 30-minute watermark margin vs
    * the 1-minute gap does, and the spec makes that a checked fact
    * instead of a data-dependent hope. */
  val q227SessionLateOracled: GraftQuery = GraftQuery(
    "q227_session_late_oracled",
    (s, d) => {
      import s.implicits._
      val src = AnnIndexes.prepared("q227src", d) { p =>
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"ts", $"event_id")
        val sharded = Tables.events(s, d)
          .select($"event_id", $"ts", ($"user_id" % 4).as("k"),
            (ntile(4).over(w) - 1).as("q"),
            row_number().over(w).as("rn"))
          .select($"event_id", $"ts", $"k",
            when($"rn" % 37 === 0, least($"q" + 2, lit(3)))
              .otherwise($"q").cast("int").as("shard"))
        graft.streaming.EventStream.writeShardedBacklog(s, p, sharded,
          "shard", 4)
      }
      graft.streaming.EventStream.runSessionAppend(s, src,
          "30 minutes", "1 minute", queryName = "graft_q227")
        .orderBy($"k", $"s_start_ms")
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, user_id % 4 AS k, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT ts, k, CASE WHEN rn % 37 = 0 " +
        "THEN least(q + 2, 3) ELSE q END AS shard FROM ord), " +
        "mx AS (SELECT shard, max(ts) AS mt FROM sh GROUP BY shard), " +
        "wm AS (SELECT shard, max(mt) OVER (ORDER BY shard " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) " +
        "- INTERVAL 30 MINUTE AS wml FROM mx), " +
        "surv AS (SELECT sh.k, sh.ts FROM sh JOIN wm USING (shard) " +
        "WHERE wm.wml IS NULL " +
        "OR sh.ts + INTERVAL 1 MINUTE > wm.wml), " +
        "s1 AS (SELECT k, ts, CASE WHEN " +
        "lag(ts) OVER (PARTITION BY k ORDER BY ts) IS NULL OR " +
        "ts - lag(ts) OVER (PARTITION BY k ORDER BY ts) " +
        "> INTERVAL 1 MINUTE THEN 1 ELSE 0 END AS brk FROM surv), " +
        "s2 AS (SELECT k, ts, sum(brk) OVER (PARTITION BY k " +
        "ORDER BY ts) AS sid FROM s1), " +
        "sess AS (SELECT k, min(ts) AS st, max(ts) AS en, " +
        "count(*)::BIGINT AS n_events FROM s2 GROUP BY k, sid), " +
        "fin AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wmf FROM sh) " +
        "SELECT sess.k, epoch_ms(sess.st) AS s_start_ms, " +
        "epoch_ms(sess.en + INTERVAL 1 MINUTE) AS s_end_ms, " +
        "sess.n_events FROM sess, fin " +
        "WHERE sess.en + INTERVAL 1 MINUTE <= fin.wmf " +
        "ORDER BY sess.k, s_start_ms"))

  /** UPDATE-mode emission protocol, fully ORACLED — the fourth
    * watermark face: the planted-straggler backlog through an
    * update-mode tumbling aggregation, summarized as (window,
    * n_updates, n_final). Update mode emits a window's CUMULATIVE
    * count once per batch that changed it, so n_updates = the number
    * of arrival shards contributing a SURVIVING row and n_final = the
    * survivor count — both replayed from the (window, shard) survivor
    * matrix under the lagged-watermark filter. A surviving row can
    * never hit an evicted window (survival ⇒ end > lagged wm ≥ every
    * earlier eviction watermark), so the summary needs no eviction
    * model at all — watermark monotonicity, made load-bearing.
    * WatermarkLateSpec pins the per-batch emission on a hand fixture;
    * with q41 (complete), q225 (append) and HERE, all three output
    * modes carry an oracled protocol face. */
  val q228UpdateModeOracled: GraftQuery = GraftQuery(
    "q228_update_mode_oracled",
    (s, d) => {
      import s.implicits._
      // same prepared backlog as q225/q226 (shared key AND builder)
      val src = AnnIndexes.prepared("q225src", d)(
        writeSharedLateBacklog(s, d, _))
      graft.streaming.EventStream.runUpdateCounts(s, src, "30 minutes",
          queryName = "graft_q228")
        .orderBy($"w_start_ms")
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT ts, CASE WHEN rn % 37 = 0 " +
        "THEN least(q + 2, 3) ELSE q END AS shard FROM ord), " +
        "mx AS (SELECT shard, max(ts) AS mt FROM sh GROUP BY shard), " +
        "wm AS (SELECT shard, max(mt) OVER (ORDER BY shard " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) " +
        "- INTERVAL 30 MINUTE AS wml FROM mx), " +
        "surv AS (SELECT sh.ts, sh.shard FROM sh JOIN wm USING (shard) " +
        "WHERE wm.wml IS NULL " +
        "OR date_trunc('hour', sh.ts) + INTERVAL 1 HOUR > wm.wml) " +
        "SELECT epoch_ms(date_trunc('hour', ts)) AS w_start_ms, " +
        "count(DISTINCT shard)::BIGINT AS n_updates, " +
        "count(*)::BIGINT AS n_final FROM surv " +
        "GROUP BY 1 ORDER BY 1"))

  /** The ONE q233/q235 backlog builder behind the per-JVM
    * `prepared("q233src")` cache — the q225 shared-builder lesson
    * (ADVICE r11) applied on arrival: the inner and outer join faces
    * must read the same arrival order by construction. */
  private def writeJoinLateBacklog(
      s: org.apache.spark.sql.SparkSession, d: String,
      p: String): Unit = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"ts", $"event_id")
    val sharded = Tables.events(s, d)
      .select($"event_id", $"ts", $"event_type", $"user_id",
        (ntile(4).over(w) - 1).as("q"),
        row_number().over(w).as("rn"))
      .select($"event_id", $"ts", $"event_type", $"user_id",
        when($"rn" % 37 === 0, least($"q" + 2, lit(3)))
          .otherwise($"q").cast("int").as("shard"))
    graft.streaming.EventStream.writeShardedBacklog(s, p, sharded,
      "shard", 4)
  }

  /** STREAM-STREAM JOIN late-data accounting, fully ORACLED — the
    * stateful-JOIN face of the watermark protocol (the q225-q228
    * quartet covers aggregation emission; HERE is which PAIRS a
    * two-sided-watermark interval join actually produces). The events
    * table rides the standard planted-straggler backlog (with
    * event_type and user_id kept) through
    * [[graft.streaming.EventStream.runLateJoin]]: purchases ⋈ clicks
    * on user within [p_ts - 1h, p_ts], 30-minute watermarks both
    * sides. The protocol DuckDB replays — discovered on hand fixtures
    * and pinned in WatermarkLateSpec — differs from the aggregation
    * quartet in every clause: join INPUT is never watermark-filtered;
    * the clock is the MIN of the two sides' node watermarks (each =
    * that side's running max minus the delay, so the slower side
    * drags the clock); state eviction at batch end applies the LAGGED
    * global watermark (2-PRECEDING over shards, the same lag q225
    * found) with NON-strict thresholds — a purchase dies at
    * p_ts <= wm, a click at c_ts + 1h <= wm (the interval's upper
    * bound extends its lifetime); and a pair is emitted iff the
    * earlier-arriving side survived every eviction before the later
    * side's batch (same-batch arrivals always match). At 100 TB this
    * is THE contract for enrichment joins over event streams: which
    * correlations silently vanish under a watermark is now an
    * oracle-checked row set. */
  val q233StreamJoinLateOracled: GraftQuery = GraftQuery(
    "q233_stream_join_late_oracled",
    (s, d) => {
      import s.implicits._
      val src = AnnIndexes.prepared("q233src", d)(
        writeJoinLateBacklog(s, d, _))
      graft.streaming.EventStream.runLateJoin(s, src, "30 minutes",
          queryName = "graft_q233")
        .orderBy($"p_event_id", $"c_event_id")
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, event_type, user_id, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT event_id, ts, event_type, user_id, " +
        "CASE WHEN rn % 37 = 0 THEN least(q + 2, 3) ELSE q END " +
        "AS shard FROM ord), " +
        // per-side node watermarks: running max per side, min of the
        // two, minus the delay; NULL while either side is silent
        "mx AS (SELECT shard, " +
        "max(ts) FILTER (WHERE event_type = 'purchase') AS mp, " +
        "max(ts) FILTER (WHERE event_type = 'click') AS mc " +
        "FROM sh GROUP BY shard), " +
        "rm AS (SELECT shard, max(mp) OVER (ORDER BY shard) AS rmp, " +
        "max(mc) OVER (ORDER BY shard) AS rmc FROM mx), " +
        "wm AS (SELECT shard, CASE WHEN rmp IS NULL OR rmc IS NULL " +
        "THEN NULL ELSE least(rmp, rmc) - INTERVAL 30 MINUTE END " +
        "AS w FROM rm), " +
        // eviction effective before batch j = the lagged watermark —
        // the SAME value that gates input admission (below)
        "wl AS (SELECT shard, lag(w, 2) OVER (ORDER BY shard) AS wl " +
        "FROM wm), " +
        // input-late rows (ts <= the lagged wm at arrival) are
        // DROPPED ENTIRELY — they join nothing, not even same-batch
        // state (the ProbeOJ2 discovery, pinned in WatermarkLateSpec)
        "p AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'purchase' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "c AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'click' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "pairs AS (SELECT p.event_id AS p_event_id, " +
        "c.event_id AS c_event_id, p.ts AS pts, c.ts AS cts, " +
        "p.shard AS ps, c.shard AS cs FROM p JOIN c " +
        "ON p.user_id = c.user_id " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts), " +
        "surv AS (SELECT pr.* FROM pairs pr JOIN wl " +
        "ON wl.shard = greatest(pr.ps, pr.cs) WHERE pr.ps = pr.cs " +
        "OR (pr.ps < pr.cs AND (wl.wl IS NULL OR pr.pts > wl.wl)) " +
        "OR (pr.cs < pr.ps AND (wl.wl IS NULL " +
        "OR pr.cts + INTERVAL 1 HOUR > wl.wl))) " +
        "SELECT p_event_id, c_event_id, epoch_ms(pts) AS p_ms, " +
        "epoch_ms(cts) AS c_ms FROM surv " +
        "ORDER BY p_event_id, c_event_id"))

  /** LEFT OUTER stream-stream join late accounting, fully ORACLED —
    * q233's outer face: WHEN does an unmatched purchase get its
    * (p, NULL) row? The discovered protocol (pinned in
    * WatermarkLateSpec on the same hand fixtures):
    *
    *  - a row arriving with ts at or below the LAGGED watermark (the
    *    same eventTimeWatermarkForLateEvents aggregations filter
    *    with) is dropped ENTIRELY — it joins nothing, not even
    *    existing state, and a dropped left row NEVER gets a null row
    *    (ProbeOJ2: an input-late click did not match an alive stored
    *    purchase, and the purchase later nulled);
    *  - an ADMITTED left row that matched nothing emits (p, NULL)
    *    when its state is evicted — including by the trailing
    *    no-data batch, whose eviction watermark is the FINAL one
    *    (computed from all data), not the lagged one;
    *  - so at drain end: null rows = admitted ∧ zero emitted pairs ∧
    *    p_ts <= final watermark. Matched-then-evicted rows never
    *    null (match-before-evict marks them).
    *
    * At 100 TB this is the funnel-analysis contract: which purchases
    * report "no preceding click" vs which silently report NOTHING
    * (input-late rows!) is now an oracle-checked row set — the
    * silent class is the one that surprises people. */
  val q235OuterJoinLateOracled: GraftQuery = GraftQuery(
    "q235_outer_join_late_oracled",
    (s, d) => {
      import s.implicits._
      // same prepared backlog as q233 (shared key AND builder)
      val src = AnnIndexes.prepared("q233src", d)(
        writeJoinLateBacklog(s, d, _))
      graft.streaming.EventStream.runLateJoin(s, src, "30 minutes",
          queryName = "graft_q235", joinType = "leftOuter")
        .orderBy($"p_event_id", $"c_event_id".asc_nulls_first)
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, event_type, user_id, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT event_id, ts, event_type, user_id, " +
        "CASE WHEN rn % 37 = 0 THEN least(q + 2, 3) ELSE q END " +
        "AS shard FROM ord), " +
        "mx AS (SELECT shard, " +
        "max(ts) FILTER (WHERE event_type = 'purchase') AS mp, " +
        "max(ts) FILTER (WHERE event_type = 'click') AS mc " +
        "FROM sh GROUP BY shard), " +
        "rm AS (SELECT shard, max(mp) OVER (ORDER BY shard) AS rmp, " +
        "max(mc) OVER (ORDER BY shard) AS rmc FROM mx), " +
        "wm AS (SELECT shard, CASE WHEN rmp IS NULL OR rmc IS NULL " +
        "THEN NULL ELSE least(rmp, rmc) - INTERVAL 30 MINUTE END " +
        "AS w FROM rm), " +
        // wl = the lagged watermark: BOTH the input-admission gate
        // and the pair-survival clock (q233); wf = the final one the
        // trailing no-data batch evicts with
        "wl AS (SELECT shard, lag(w, 2) OVER (ORDER BY shard) AS wl " +
        "FROM wm), " +
        "fin AS (SELECT w AS wf FROM wm ORDER BY shard DESC LIMIT 1), " +
        "p AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'purchase' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "c AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'click' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "pairs AS (SELECT p.event_id AS p_event_id, " +
        "c.event_id AS c_event_id, p.ts AS pts, c.ts AS cts, " +
        "p.shard AS ps, c.shard AS cs FROM p JOIN c " +
        "ON p.user_id = c.user_id " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts), " +
        "surv AS (SELECT pr.* FROM pairs pr JOIN wl " +
        "ON wl.shard = greatest(pr.ps, pr.cs) WHERE pr.ps = pr.cs " +
        "OR (pr.ps < pr.cs AND (wl.wl IS NULL OR pr.pts > wl.wl)) " +
        "OR (pr.cs < pr.ps AND (pr.cts + INTERVAL 1 HOUR > wl.wl " +
        "OR wl.wl IS NULL))), " +
        "nulls AS (SELECT p.event_id AS p_event_id, " +
        "NULL::BIGINT AS c_event_id, epoch_ms(p.ts) AS p_ms, " +
        "NULL::BIGINT AS c_ms FROM p, fin " +
        "WHERE p.ts <= fin.wf " +
        "AND NOT EXISTS (SELECT 1 FROM surv " +
        "WHERE surv.p_event_id = p.event_id)) " +
        "SELECT * FROM (" +
        "SELECT p_event_id, c_event_id, epoch_ms(pts) AS p_ms, " +
        "epoch_ms(cts) AS c_ms FROM surv " +
        "UNION ALL SELECT * FROM nulls) " +
        "ORDER BY p_event_id, c_event_id NULLS FIRST"))

  /** FULL OUTER stream-stream join late accounting, fully ORACLED —
    * the last eviction class of the q233/q235 axis (VERDICT r12 #4):
    * BOTH sides' unmatched rows emit on state eviction. The protocol
    * is q235's plus its mirror, re-pinned on hand fixtures in
    * WatermarkLateSpec before the oracle was written:
    *
    *  - input-late rows (ts <= the LAGGED watermark at arrival) are
    *    dropped ENTIRELY on either side — no pair, no null row;
    *  - an admitted unmatched purchase nulls at eviction:
    *    p_ts <= final watermark (q235's class);
    *  - an admitted unmatched CLICK nulls at ITS eviction threshold:
    *    c_ts + 1h <= final watermark — the interval's upper bound
    *    extends the click's lifetime, so a click can sit unmatched
    *    and SILENT in state long after the symmetric purchase would
    *    have nulled (the funnel-analysis asymmetry people miss);
    *  - matched-then-evicted rows on either side never null.
    *
    * At 100 TB: full-outer is the reconciliation-join contract — both
    * "purchase with no click" and "click with no purchase" rows are
    * now an oracle-checked set, including WHICH silent classes
    * (input-late, unevicted-at-drain) produce neither. */
  val q236FullOuterJoinLateOracled: GraftQuery = GraftQuery(
    "q236_full_outer_join_late_oracled",
    (s, d) => {
      import s.implicits._
      // same prepared backlog as q233/q235 (shared key AND builder)
      val src = AnnIndexes.prepared("q233src", d)(
        writeJoinLateBacklog(s, d, _))
      graft.streaming.EventStream.runLateJoin(s, src, "30 minutes",
          queryName = "graft_q236", joinType = "fullOuter")
        .orderBy($"p_event_id".asc_nulls_first,
          $"c_event_id".asc_nulls_first)
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, event_type, user_id, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT event_id, ts, event_type, user_id, " +
        "CASE WHEN rn % 37 = 0 THEN least(q + 2, 3) ELSE q END " +
        "AS shard FROM ord), " +
        "mx AS (SELECT shard, " +
        "max(ts) FILTER (WHERE event_type = 'purchase') AS mp, " +
        "max(ts) FILTER (WHERE event_type = 'click') AS mc " +
        "FROM sh GROUP BY shard), " +
        "rm AS (SELECT shard, max(mp) OVER (ORDER BY shard) AS rmp, " +
        "max(mc) OVER (ORDER BY shard) AS rmc FROM mx), " +
        "wm AS (SELECT shard, CASE WHEN rmp IS NULL OR rmc IS NULL " +
        "THEN NULL ELSE least(rmp, rmc) - INTERVAL 30 MINUTE END " +
        "AS w FROM rm), " +
        "wl AS (SELECT shard, lag(w, 2) OVER (ORDER BY shard) AS wl " +
        "FROM wm), " +
        "fin AS (SELECT w AS wf FROM wm ORDER BY shard DESC LIMIT 1), " +
        "p AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'purchase' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "c AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'click' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "pairs AS (SELECT p.event_id AS p_event_id, " +
        "c.event_id AS c_event_id, p.ts AS pts, c.ts AS cts, " +
        "p.shard AS ps, c.shard AS cs FROM p JOIN c " +
        "ON p.user_id = c.user_id " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts), " +
        "surv AS (SELECT pr.* FROM pairs pr JOIN wl " +
        "ON wl.shard = greatest(pr.ps, pr.cs) WHERE pr.ps = pr.cs " +
        "OR (pr.ps < pr.cs AND (wl.wl IS NULL OR pr.pts > wl.wl)) " +
        "OR (pr.cs < pr.ps AND (pr.cts + INTERVAL 1 HOUR > wl.wl " +
        "OR wl.wl IS NULL))), " +
        // the two null classes: admitted, zero surviving pairs, and
        // EVICTED by the final watermark — at the side's own
        // threshold (purchase: p_ts; click: c_ts + 1h)
        "pnulls AS (SELECT p.event_id AS p_event_id, " +
        "NULL::BIGINT AS c_event_id, epoch_ms(p.ts) AS p_ms, " +
        "NULL::BIGINT AS c_ms FROM p, fin " +
        "WHERE p.ts <= fin.wf " +
        "AND NOT EXISTS (SELECT 1 FROM surv " +
        "WHERE surv.p_event_id = p.event_id)), " +
        "cnulls AS (SELECT NULL::BIGINT AS p_event_id, " +
        "c.event_id AS c_event_id, NULL::BIGINT AS p_ms, " +
        "epoch_ms(c.ts) AS c_ms FROM c, fin " +
        "WHERE c.ts + INTERVAL 1 HOUR <= fin.wf " +
        "AND NOT EXISTS (SELECT 1 FROM surv " +
        "WHERE surv.c_event_id = c.event_id)) " +
        "SELECT * FROM (" +
        "SELECT p_event_id, c_event_id, epoch_ms(pts) AS p_ms, " +
        "epoch_ms(cts) AS c_ms FROM surv " +
        "UNION ALL SELECT * FROM pnulls " +
        "UNION ALL SELECT * FROM cnulls) " +
        "ORDER BY p_event_id NULLS FIRST, c_event_id NULLS FIRST"))

  /** RIGHT OUTER stream-stream join late accounting, fully ORACLED —
    * the fourth and final face of the q233 axis (inner / left / full
    * / right). Protocol = q236 minus the left-null class, re-pinned
    * on the hand fixture in WatermarkLateSpec: only admitted
    * unmatched CLICKS null, at the click's own eviction threshold
    * (c_ts + 1h <= final watermark); an unmatched purchase — evicted
    * or not — emits NOTHING. With all four faces oracled, every
    * outer-emission class of Spark's stream-stream interval join is
    * an oracle-checked row set. */
  val q238RightOuterJoinLateOracled: GraftQuery = GraftQuery(
    "q238_right_outer_join_late_oracled",
    (s, d) => {
      import s.implicits._
      // same prepared backlog as q233/q235/q236
      val src = AnnIndexes.prepared("q233src", d)(
        writeJoinLateBacklog(s, d, _))
      graft.streaming.EventStream.runLateJoin(s, src, "30 minutes",
          queryName = "graft_q238", joinType = "rightOuter")
        .orderBy($"p_event_id".asc_nulls_first,
          $"c_event_id".asc_nulls_first)
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, event_type, user_id, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT event_id, ts, event_type, user_id, " +
        "CASE WHEN rn % 37 = 0 THEN least(q + 2, 3) ELSE q END " +
        "AS shard FROM ord), " +
        "mx AS (SELECT shard, " +
        "max(ts) FILTER (WHERE event_type = 'purchase') AS mp, " +
        "max(ts) FILTER (WHERE event_type = 'click') AS mc " +
        "FROM sh GROUP BY shard), " +
        "rm AS (SELECT shard, max(mp) OVER (ORDER BY shard) AS rmp, " +
        "max(mc) OVER (ORDER BY shard) AS rmc FROM mx), " +
        "wm AS (SELECT shard, CASE WHEN rmp IS NULL OR rmc IS NULL " +
        "THEN NULL ELSE least(rmp, rmc) - INTERVAL 30 MINUTE END " +
        "AS w FROM rm), " +
        "wl AS (SELECT shard, lag(w, 2) OVER (ORDER BY shard) AS wl " +
        "FROM wm), " +
        "fin AS (SELECT w AS wf FROM wm ORDER BY shard DESC LIMIT 1), " +
        "p AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'purchase' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "c AS (SELECT event_id, ts, user_id, sh.shard FROM sh " +
        "JOIN wl ON wl.shard = sh.shard " +
        "WHERE event_type = 'click' " +
        "AND (wl.wl IS NULL OR ts > wl.wl)), " +
        "pairs AS (SELECT p.event_id AS p_event_id, " +
        "c.event_id AS c_event_id, p.ts AS pts, c.ts AS cts, " +
        "p.shard AS ps, c.shard AS cs FROM p JOIN c " +
        "ON p.user_id = c.user_id " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts), " +
        "surv AS (SELECT pr.* FROM pairs pr JOIN wl " +
        "ON wl.shard = greatest(pr.ps, pr.cs) WHERE pr.ps = pr.cs " +
        "OR (pr.ps < pr.cs AND (wl.wl IS NULL OR pr.pts > wl.wl)) " +
        "OR (pr.cs < pr.ps AND (pr.cts + INTERVAL 1 HOUR > wl.wl " +
        "OR wl.wl IS NULL))), " +
        "cnulls AS (SELECT NULL::BIGINT AS p_event_id, " +
        "c.event_id AS c_event_id, NULL::BIGINT AS p_ms, " +
        "epoch_ms(c.ts) AS c_ms FROM c, fin " +
        "WHERE c.ts + INTERVAL 1 HOUR <= fin.wf " +
        "AND NOT EXISTS (SELECT 1 FROM surv " +
        "WHERE surv.c_event_id = c.event_id)) " +
        "SELECT * FROM (" +
        "SELECT p_event_id, c_event_id, epoch_ms(pts) AS p_ms, " +
        "epoch_ms(cts) AS c_ms FROM surv " +
        "UNION ALL SELECT * FROM cnulls) " +
        "ORDER BY p_event_id NULLS FIRST, c_event_id NULLS FIRST"))

  /** Event-time cardinality PROFILE — daily distinct users from
    * grouped portable-HLL registers, fully ORACLED: the q215 grouped
    * sketch keyed by the event-time day (epoch-millis per the q15
    * convention), so "how many distinct users did we see each day"
    * costs one groupBy on (day, 8-bit bucket) — at most 30×256 rows —
    * instead of a per-day exact distinct over the full stream. The
    * fixture spans BOTH estimator branches across the SFs (daily
    * n≈12/130/1330 vs m=256: deep linear counting at sf0.001/0.01,
    * the raw harmonic branch at sf0.1), and DuckDB replays registers,
    * branch choice and estimates per day next to the exact distinct.
    * The streaming-analytics shape at 100 TB: per-window cardinality
    * from a fixed-size artifact the stream upserts (q211's law), never
    * from rescanning the window. */
  val q221DailyUsersOracled: GraftQuery = GraftQuery(
    "q221_daily_users_oracled",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(unix_millis(date_trunc("day", $"ts")).as("day_ms"),
          $"user_id")
      val regs = graft.operators.Sketches
        .hllRegistersByGroup(ev, Seq("day_ms"), "user_id")
      val ests = graft.operators.Sketches
        .hllEstimateByGroup(regs, Seq("day_ms"))
      val exact = ev.groupBy($"day_ms")
        .agg(countDistinct($"user_id").as("exact"))
      ests.join(exact, Seq("day_ms"))
        .select($"day_ms", $"zero_regs", $"sum_scaled", $"est",
          $"exact", round(($"est" - $"exact") / $"exact", 4)
            .as("rel_err"))
        .orderBy($"day_ms")
    },
    Some(
      "WITH ev AS (SELECT epoch_ms(date_trunc('day', ts)) AS day_ms, " +
        "user_id FROM events WHERE user_id IS NOT NULL), " +
        "h AS (SELECT day_ms, " +
        "('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT " +
        "AS bucket, " +
        "('0x' || substr(md5(user_id::VARCHAR), 3, 8))::BIGINT " +
        "AS w FROM ev), " +
        "r AS (SELECT day_ms, bucket, max(CASE WHEN w = 0 THEN 33 " +
        "ELSE 33 - length(bin(w)) END) AS register FROM h " +
        "GROUP BY 1, 2), " +
        "a AS (SELECT day_ms, count(*)::BIGINT AS nonzero, " +
        "sum(1::BIGINT << (33 - register))::BIGINT AS nz_scaled " +
        "FROM r GROUP BY day_ms), " +
        "e AS (SELECT day_ms, (256 - nonzero)::BIGINT AS zero_regs, " +
        "(nz_scaled + (256 - nonzero) * 8589934592)::BIGINT " +
        "AS sum_scaled FROM a), " +
        "rw AS (SELECT *, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 256.0::DOUBLE) * 256.0::DOUBLE * " +
        "256.0::DOUBLE) / (sum_scaled / 8589934592.0::DOUBLE) " +
        "AS raw FROM e), " +
        "est AS (SELECT day_ms, zero_regs, sum_scaled, " +
        "CASE WHEN zero_regs > 0 AND raw <= 640.0::DOUBLE " +
        "THEN round(256.0::DOUBLE * ln(256.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est FROM rw), " +
        "x AS (SELECT day_ms, count(DISTINCT user_id)::BIGINT " +
        "AS exact FROM ev GROUP BY 1) " +
        "SELECT est.day_ms, est.zero_regs, est.sum_scaled, est.est, " +
        "x.exact, round((est.est - x.exact) / x.exact, 4) AS rel_err " +
        "FROM est JOIN x USING (day_ms) ORDER BY est.day_ms"),
  )

  /** STREAMING quantile growth ORACLED ([[graft.streaming
    * .SketchStreams.runHistToCompletion]] / [[graft.operators.Sketches
    * .upsertHistBatch]]) — the q217 histogram given the artifact
    * lifecycle: document lengths arrive as four files, every
    * micro-batch upserts ≤ nbins bin rows keyed by its streaming
    * batchId (SUM law — the q213 overwrite discipline), and
    * p50/p95/p99 served from the per-bin sum of the artifact must
    * hash-match the single-pass q217 oracle through a real checkpoint.
    * Every portable sketch in the library now has batch, streaming AND
    * oracled faces: HLL (q209/q211), Bloom (q210/q212), count-min
    * (q183/q213), histogram (q217/HERE). */
  val q222HistStreamOracled: GraftQuery = GraftQuery(
    "q222_hist_stream_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val src = AnnIndexes.prepared("q222src", d) { p =>
        docs.select($"n_chars").repartition(4)
          .write.mode("overwrite").parquet(p)
      }
      val root = Scratch.dir("graft_q222")
      graft.streaming.SketchStreams.runHistToCompletion(s,
        src, s"$root/hist", s"$root/chk", "n_chars",
        width = 16L, nbins = 40)
      val counts = graft.operators.Sketches
        .histogramCountsFromArtifact(s, s"$root/hist")
      val nb = s.read.parquet(s"$root/hist")
        .agg(countDistinct($"batch_id").as("n_batches"))
      val est = graft.operators.Sketches
        .histogramQuantiles(counts, width = 16L,
          qs = Seq(0.5, 0.95, 0.99))
      val exact = docs.agg(
          percentile($"n_chars", lit(0.5)).as("e50"),
          percentile($"n_chars", lit(0.95)).as("e95"),
          percentile($"n_chars", lit(0.99)).as("e99"))
        .selectExpr(
          "stack(3, 0.5D, e50, 0.95D, e95, 0.99D, e99) AS (q, exact)")
        .select($"q", round($"exact", 4).as("exact"))
      est.join(exact, Seq("q")).crossJoin(nb)
        .select($"q", $"est", $"exact",
          round(abs($"est" - $"exact"), 4).as("abs_err"), $"n_batches")
        .orderBy($"q")
    },
    Some(
      "WITH b AS (SELECT least(greatest(n_chars // 16, 0), 39)" +
        "::BIGINT AS bin, count(*)::BIGINT AS cnt FROM documents " +
        "GROUP BY 1), " +
        "c AS (SELECT bin, cnt, " +
        "sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum FROM b), " +
        "t AS (SELECT count(*)::BIGINT AS n FROM documents), " +
        "qs AS (SELECT * FROM (VALUES (0.5::DOUBLE), (0.95::DOUBLE), " +
        "(0.99::DOUBLE)) v(q)), " +
        "r AS (SELECT q, ceil(q * n)::BIGINT AS rk FROM qs, t), " +
        "est AS (SELECT r.q, round(c.bin * 16 + 16.0::DOUBLE * " +
        "(r.rk - (c.cum - c.cnt)) / c.cnt, 4) AS est " +
        "FROM r JOIN c ON c.cum >= r.rk AND c.cum - c.cnt < r.rk), " +
        "x AS (SELECT 0.5::DOUBLE AS q, " +
        "round(quantile_cont(n_chars, 0.5), 4) AS exact " +
        "FROM documents UNION ALL " +
        "SELECT 0.95::DOUBLE, round(quantile_cont(n_chars, 0.95), 4) " +
        "FROM documents UNION ALL " +
        "SELECT 0.99::DOUBLE, round(quantile_cont(n_chars, 0.99), 4) " +
        "FROM documents) " +
        "SELECT est.q, est.est, x.exact, " +
        "round(abs(est.est - x.exact), 4) AS abs_err, " +
        "4::BIGINT AS n_batches " +
        "FROM est JOIN x USING (q) ORDER BY est.q"),
  )

  /** Sketch-estimated JACCARD and CONTAINMENT matrix, fully ORACLED —
    * the metrics a dedup pipeline actually thresholds on, derived from
    * the q216 register algebra: J(A,B) = overlap/union and
    * containment of the SECOND slice in the first, overlap/|B| — both
    * estimated purely from per-slice p=12 registers (Â, B̂, Û ⇒
    * Ĵ = (Â+B̂-Û)/Û) and graded
    * against the exact set ratios. The HLL route to what q200 answers
    * by MinHash signatures — two independent estimators of the same
    * dataset-similarity question, each replayable in SQL. The fixture's
    * nested pair (A4 ⊂ A2) pins containment ≈ 1 from sketches alone.
    * At 100 TB: threshold "are these two sources near-duplicates of
    * each other" on shipped register files, before any corpus joins. */
  val q223SketchJaccardOracled: GraftQuery = GraftQuery(
    "q223_sketch_jaccard_oracled",
    (s, d) => {
      import s.implicits._
      val ms = Seq(2, 3, 4, 5)
      val docs = Tables.documents(s, d)
      val slices = docs
        .select($"doc_id", $"text",
          explode(array(ms.map(lit): _*)).as("ds"))
        .filter($"doc_id" % $"ds" === 0)
        .select($"ds", $"text")
      val r = graft.operators.Sketches
        .hllRegistersByGroup(slices, Seq("ds"), "text", p = 12)
      val es = graft.operators.Sketches
        .hllEstimateByGroup(r, Seq("ds"), p = 12)
        .select($"ds", $"est")
      val pairs = (for { i <- ms; j <- ms if i < j } yield (i, j))
        .toDF("d1", "d2")
      val members = pairs
        .select($"d1", $"d2", explode(array($"d1", $"d2")).as("ds"))
      val ru = members.join(r, Seq("ds"))
        .groupBy($"d1", $"d2", $"bucket")
        .agg(max($"register").cast("int").as("register"))
      val eu = graft.operators.Sketches
        .hllEstimateByGroup(ru, Seq("d1", "d2"), p = 12)
        .select($"d1", $"d2", $"est".as("est_u"))
      val st = slices.distinct()
      val xo = st.as("a")
        .join(st.as("b"),
          $"a.text" === $"b.text" && $"a.ds" < $"b.ds")
        .groupBy($"a.ds".as("d1"), $"b.ds".as("d2"))
        .agg(countDistinct($"a.text").as("x_overlap"))
      val xu = members.join(st, Seq("ds"))
        .groupBy($"d1", $"d2")
        .agg(countDistinct($"text").as("x_union"))
      val xb = st.groupBy($"ds".as("d2"))
        .agg(countDistinct($"text").as("x_b"))
      pairs
        .join(es.select($"ds".as("d1"), $"est".as("est_a")), Seq("d1"))
        .join(es.select($"ds".as("d2"), $"est".as("est_b")), Seq("d2"))
        .join(eu, Seq("d1", "d2"))
        .join(xo, Seq("d1", "d2")).join(xu, Seq("d1", "d2"))
        .join(xb, Seq("d2"))
        .withColumn("est_ov", round($"est_a" + $"est_b" - $"est_u", 4))
        .select($"d1", $"d2",
          round($"est_ov" / $"est_u", 4).as("est_jaccard"),
          round($"x_overlap" / $"x_union", 4).as("exact_jaccard"),
          round($"est_ov" / $"est_b", 4).as("est_containment"),
          round($"x_overlap" / $"x_b", 4).as("exact_containment"))
        .orderBy($"d1", $"d2")
    },
    Some(
      "WITH sl AS (SELECT m.ds, d.text FROM documents d, " +
        "(VALUES (2), (3), (4), (5)) AS m(ds) " +
        "WHERE d.doc_id % m.ds = 0), " +
        "h AS (SELECT ds, " +
        "('0x' || substr(md5(text), 1, 3))::BIGINT AS bucket, " +
        "('0x' || substr(md5(text), 4, 8))::BIGINT AS w FROM sl), " +
        "r AS (SELECT ds, bucket, max(CASE WHEN w = 0 THEN 33 " +
        "ELSE 33 - length(bin(w)) END) AS register FROM h " +
        "GROUP BY 1, 2), " +
        "pairs AS (SELECT a.ds AS d1, b.ds AS d2 " +
        "FROM (SELECT DISTINCT ds FROM sl) a, " +
        "(SELECT DISTINCT ds FROM sl) b WHERE a.ds < b.ds), " +
        "ru AS (SELECT p.d1, p.d2, r.bucket, max(r.register) " +
        "AS register FROM pairs p JOIN r ON r.ds IN (p.d1, p.d2) " +
        "GROUP BY 1, 2, 3), " +
        "ea AS (SELECT ds, CASE WHEN zero_regs > 0 " +
        "AND raw <= 10240.0::DOUBLE " +
        "THEN round(4096.0::DOUBLE * ln(4096.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est FROM " +
        "(SELECT ds, zero_regs, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 4096.0::DOUBLE) * 4096.0::DOUBLE * " +
        "4096.0::DOUBLE) / (sum_scaled / 8589934592.0::DOUBLE) AS raw " +
        "FROM (SELECT ds, (4096 - count(*))::BIGINT AS zero_regs, " +
        "(sum(1::BIGINT << (33 - register)) + " +
        "(4096 - count(*)) * 8589934592)::BIGINT AS sum_scaled " +
        "FROM r GROUP BY ds))), " +
        "eu AS (SELECT d1, d2, CASE WHEN zero_regs > 0 " +
        "AND raw <= 10240.0::DOUBLE " +
        "THEN round(4096.0::DOUBLE * ln(4096.0::DOUBLE / zero_regs), 4) " +
        "ELSE round(raw, 4) END AS est_u FROM " +
        "(SELECT d1, d2, zero_regs, (0.7213::DOUBLE / (1.0::DOUBLE + " +
        "1.079::DOUBLE / 4096.0::DOUBLE) * 4096.0::DOUBLE * " +
        "4096.0::DOUBLE) / (sum_scaled / 8589934592.0::DOUBLE) AS raw " +
        "FROM (SELECT d1, d2, (4096 - count(*))::BIGINT AS zero_regs, " +
        "(sum(1::BIGINT << (33 - register)) + " +
        "(4096 - count(*)) * 8589934592)::BIGINT AS sum_scaled " +
        "FROM ru GROUP BY d1, d2))), " +
        "st AS (SELECT DISTINCT ds, text FROM sl), " +
        "xo AS (SELECT a.ds AS d1, b.ds AS d2, " +
        "count(DISTINCT a.text)::BIGINT AS x_overlap " +
        "FROM st a JOIN st b ON a.text = b.text AND a.ds < b.ds " +
        "GROUP BY 1, 2), " +
        "xu AS (SELECT p.d1, p.d2, count(DISTINCT st.text)::BIGINT " +
        "AS x_union FROM pairs p JOIN st ON st.ds IN (p.d1, p.d2) " +
        "GROUP BY 1, 2), " +
        "xb AS (SELECT ds AS d2, count(DISTINCT text)::BIGINT AS x_b " +
        "FROM st GROUP BY 1), " +
        "po AS (SELECT p.d1, p.d2, ea2.est AS est_b, eu.est_u, " +
        "round(ea1.est + ea2.est - eu.est_u, 4) AS est_ov, " +
        "xo.x_overlap, xu.x_union, xb.x_b " +
        "FROM pairs p JOIN ea ea1 ON ea1.ds = p.d1 " +
        "JOIN ea ea2 ON ea2.ds = p.d2 " +
        "JOIN eu ON eu.d1 = p.d1 AND eu.d2 = p.d2 " +
        "JOIN xo ON xo.d1 = p.d1 AND xo.d2 = p.d2 " +
        "JOIN xu ON xu.d1 = p.d1 AND xu.d2 = p.d2 " +
        "JOIN xb ON xb.d2 = p.d2) " +
        "SELECT d1, d2, round(est_ov / est_u, 4) AS est_jaccard, " +
        "round(x_overlap / x_union, 4) AS exact_jaccard, " +
        "round(est_ov / est_b, 4) AS est_containment, " +
        "round(x_overlap / x_b, 4) AS exact_containment " +
        "FROM po ORDER BY d1, d2"),
  )

  /** Weighted sample without replacement ([[Sampling
    * .weightedSamplePerGroup]], Efraimidis–Spirakis A-Res): 5 docs per
    * language with inclusion probability ∝ n_chars, drawn from the
    * portable sha-bucket uniform — the sample is a pure function of
    * (ids, weights, seed) and the oracle re-derives every ln(u)/w key,
    * ranking included. */
  val q165WeightedSample: GraftQuery = GraftQuery(
    "q165_weighted_sample",
    (s, d) => {
      import s.implicits._
      graft.operators.Sampling.weightedSamplePerGroup(
          Tables.documents(s, d).select($"doc_id", $"lang", $"n_chars"),
          "doc_id", "lang", "n_chars", k = 5, seed = 165L)
        .select($"lang", $"doc_id", $"n_chars", $"rk")
        .orderBy($"lang", $"rk")
    },
    Some(
      "WITH d AS (SELECT doc_id, lang, n_chars, " +
        "('0x' || substr(sha256(doc_id::VARCHAR || ':165'), 1, 4))" +
        "::BIGINT AS b FROM documents WHERE n_chars > 0), " +
        "k AS (SELECT *, ln((b + 0.5) / 65536.0) / n_chars AS key " +
        "FROM d), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang " +
        "ORDER BY key DESC, doc_id) AS rk FROM k) " +
        "SELECT lang, doc_id, n_chars, rk FROM r WHERE rk <= 5 " +
        "ORDER BY lang, rk"))

  /** Leakage-safe split report ([[Sampling.contentSplit]]): the split
    * decision is a pure function of sha2(text), so exact duplicates can
    * never straddle train/eval. Reports per (source, split) document and
    * content-group counts; `n_docs != n_groups` on a split is exactly the
    * duplicated mass the content key protects. Zero-shuffle assignment;
    * the one aggregation shuffle is the report itself. */
  val q131ContentSplit: GraftQuery = GraftQuery(
    "q131_content_split",
    (s, d) => {
      import s.implicits._
      Sampling.contentSplit(Tables.documents(s, d), "text")
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(sha2($"text".cast("binary"), 256)).as("n_groups"))
        .orderBy($"source", $"split")
    },
    Some(
      "SELECT source, split, count(*) AS n_docs, " +
        "count(DISTINCT h) AS n_groups FROM (" +
        "SELECT source, sha256(text) AS h, " +
        "CASE WHEN substr(sha256(text), 1, 1) BETWEEN '0' AND '9' " +
        "OR substr(sha256(text), 1, 1) IN ('a', 'b') THEN 'train' " +
        "WHEN substr(sha256(text), 1, 1) IN ('c', 'd') THEN 'val' " +
        "ELSE 'test' END AS split FROM documents) " +
        "GROUP BY source, split ORDER BY source, split"))

  /** Passage-duplication profile ([[Dedup.blockDupProfile]]): per-source
    * count of non-overlapping 10-token blocks whose text repeats anywhere
    * in the corpus. The whole pipeline — chop, corpus-wide count, join
    * back, per-source rollup — is replayed by DuckDB over the identical
    * slicing semantics (1-based inclusive on both engines). */
  val q132BlockDupProfile: GraftQuery = GraftQuery(
    "q132_block_dup_profile",
    (s, d) =>
      Dedup.blockDupProfile(Tables.documents(s, d), "source", "text",
          blockLen = 10)
        .orderBy(col("source")),
    Some(
      "WITH w AS (SELECT source, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "f AS (SELECT source, ws FROM w WHERE len(ws) >= 10), " +
        "c AS (SELECT source, " +
        "array_to_string(ws[i*10+1 : i*10+10], ' ') AS block " +
        "FROM f, UNNEST(range(len(ws)//10)) AS t(i)), " +
        "g AS (SELECT block, count(*) AS tot FROM c GROUP BY block) " +
        "SELECT source, count(*) AS n_blocks, " +
        "count(DISTINCT c.block) AS n_distinct, " +
        "CAST(sum(CASE WHEN g.tot > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_inst, " +
        "round(sum(CASE WHEN g.tot > 1 THEN 1 ELSE 0 END)::DOUBLE " +
        "/ count(*), 6) AS dup_rate " +
        "FROM c JOIN g USING (block) GROUP BY source ORDER BY source"))

  /** ANSI-replayable DSIR importance weights
    * ([[Dsir.importanceWeightsReplayable]]) — the oracle face of
    * q133's scoring stage: portable sha-256 buckets, Laplace-smoothed
    * target/raw log-ratios, and per-doc sums carried as
    * DECIMAL(20,6) of 6-dp partials (exact addition — summation order
    * cannot move a bit on either engine). Every weight hash-checked. */
  val q177DsirOracled: GraftQuery = GraftQuery(
    "q177_dsir_oracled",
    (s, d) => {
      import s.implicits._
      Dsir.importanceWeightsReplayable(Tables.documents(s, d),
          "doc_id", "text", isTarget = $"lang" === "en", buckets = 512)
        .orderBy($"doc_id")
    },
    Some(
      "WITH tk AS (SELECT doc_id, lang = 'en' AS tgt, " +
        "string_split(text,' ') AS t FROM documents), " +
        "g AS (SELECT doc_id, tgt, unnest(list_concat(t, " +
        "CASE WHEN len(t) >= 2 THEN list_transform(" +
        "generate_series(1, len(t) - 1), i -> array_to_string(" +
        "list_slice(t, i, i + 1), ' ')) " +
        "ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM tk), " +
        "b AS (SELECT doc_id, tgt, " +
        "('0x' || substr(sha256(gram), 1, 8))::BIGINT % 512 AS bucket " +
        "FROM g), " +
        "dc AS (SELECT doc_id, tgt, bucket, count(*) AS c " +
        "FROM b GROUP BY 1, 2, 3), " +
        "bc AS (SELECT bucket, " +
        "sum(CASE WHEN tgt THEN c ELSE 0 END) AS nt, " +
        "sum(CASE WHEN tgt THEN 0 ELSE c END) AS nr FROM dc " +
        "GROUP BY bucket), " +
        "tot AS (SELECT sum(nt) AS tt, sum(nr) AS tr FROM bc), " +
        "r AS (SELECT bucket, ln((nt + 1)::DOUBLE / (tt + 512)::DOUBLE) " +
        "- ln((nr + 1)::DOUBLE / (tr + 512)::DOUBLE) AS ratio " +
        "FROM bc, tot) " +
        "SELECT doc_id, round(sum(round(c * ratio, 6)" +
        "::DECIMAL(20,6))::DOUBLE, 6) AS log_weight " +
        "FROM dc JOIN r USING (bucket) GROUP BY doc_id " +
        "ORDER BY doc_id"))

  /** Logistic-regression TRAINING replayed in SQL — the ORACLED face
    * of the quality-classifier family (q135's production path stays
    * rows-only: xxhash64 features + a bounded training sample +
    * 50-iteration GD): [[graft.ml.DistributedLogReg
    * .fitScoreReplayable]] fits 6 unrolled batch-GD rounds (lr=6) on
    * portable sha-bucket gram features (the q177 hash family) over the
    * full corpus (target = lang='en'), quantizing the margin before
    * the sigmoid, the sigmoid after it, and the weights/bias after
    * every gradient step (the q158 contract) — DuckDB re-derives the
    * features, replays all six training rounds with the weight
    * vector as a 64-list, and re-scores every document. The first
    * oracled TRAINED MODEL in the registry: an engine drift anywhere
    * in the fit (hashing, normalization, gradient, update order) flips
    * hash_match. The corpus's lang signal is deliberately weak
    * (~0.005 token-distribution deltas), so the fit's learning shows
    * as RANKING separation (AUC ≈ 0.64 vs 0.5 chance — spec-gated),
    * not a flipped 0.5 threshold; scores are the production semantics
    * (downstream threshold/top-k). */
  val q187LogregOracled: GraftQuery = GraftQuery(
    "q187_logreg_oracled",
    (s, d) => {
      import s.implicits._
      graft.ml.DistributedLogReg.fitScoreReplayable(
          Tables.documents(s, d), "doc_id", "text",
          isTarget = $"lang" === "en", buckets = 64, iters = 6,
          lr = 6.0)
        .orderBy($"doc_id")
    },
    Some {
      val rounds = (1 to 6).map { t =>
        val wp = if (t == 1) "w0" else s"w${t - 1}"
        s", z$t AS (SELECT f.doc_id, any_value(f.y) AS y, " +
          "round(sum(w.w[f.bucket + 1] * f.x), 6) " +
          s"AS z FROM fx f, $wp w GROUP BY f.doc_id)" +
          s", p$t AS MATERIALIZED (SELECT doc_id, y, " +
          s"round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z$t)" +
          s", g$t AS (SELECT r.i AS bucket, coalesce(sum((p.p - p.y) " +
          "* f.x), 0.0) / (SELECT m FROM mm) AS g " +
          "FROM range(0, 65) r(i) " +
          s"LEFT JOIN fx f ON f.bucket = r.i " +
          s"LEFT JOIN p$t p ON p.doc_id = f.doc_id GROUP BY r.i)" +
          s", gl$t AS (SELECT list(g ORDER BY bucket) AS gl FROM g$t)" +
          s", w$t AS MATERIALIZED (SELECT list_transform(" +
          "range(1, 66), i -> round(wp.w[i] - 6.0 * gl.gl[i], 6)) " +
          s"AS w FROM $wp wp, gl$t gl)"
      }.mkString
      "WITH tk AS (SELECT doc_id, lang = 'en' AS tgt, " +
        "string_split(text,' ') AS t FROM documents), " +
        "g AS (SELECT doc_id, tgt, unnest(list_concat(t, " +
        "CASE WHEN len(t) >= 2 THEN list_transform(" +
        "generate_series(1, len(t) - 1), i -> array_to_string(" +
        "list_slice(t, i, i + 1), ' ')) " +
        "ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM tk), " +
        "dc AS (SELECT doc_id, tgt, " +
        "('0x' || substr(sha256(gram), 1, 8))::BIGINT % 64 AS bucket, " +
        "count(*)::DOUBLE AS c FROM g GROUP BY 1, 2, 3), " +
        "tot AS (SELECT doc_id, sum(c) AS n FROM dc GROUP BY doc_id), " +
        // bias rides as feature 64 with x = 1 on every doc — one
        // aggregation serves every gradient component (incl. bias)
        "fx AS MATERIALIZED (SELECT dc.doc_id, dc.bucket, " +
        "dc.c / tot.n AS x, CASE WHEN dc.tgt THEN 1.0 ELSE 0.0 END " +
        "AS y FROM dc JOIN tot USING (doc_id) " +
        "UNION ALL SELECT doc_id, 64 AS bucket, 1.0 AS x, " +
        "CASE WHEN any_value(tgt) THEN 1.0 ELSE 0.0 END AS y " +
        "FROM dc GROUP BY doc_id), " +
        "mm AS (SELECT count(DISTINCT doc_id)::DOUBLE AS m FROM fx), " +
        "w0 AS (SELECT list_transform(range(1, 66), x -> 0.0) AS w)" +
        rounds +
        " SELECT f.doc_id, any_value(f.y)::INT AS label, " +
        "round(1.0 / (1.0 + exp(-round(" +
        "sum(w.w[f.bucket + 1] * f.x), 6))), 6) AS score " +
        "FROM fx f, w6 w GROUP BY f.doc_id ORDER BY f.doc_id"
    })

  /** DSIR resampling report ([[Dsir.importanceWeights]] +
    * [[Dsir.resampleTopK]]): tilt the corpus toward an `en`-language
    * target by hashed-bigram importance weights, Gumbel-top-k select
    * 100 docs, and report the per-language weight/selection profile —
    * the tilt should concentrate selection on target-like languages.
    * Deterministic (seeded hashes, 9-dp-rounded weights, id
    * tie-breaks) but not ANSI-expressible → rows-only. */
  val q133DsirResample: GraftQuery = GraftQuery(
    "q133_dsir_resample",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val w = Dsir.importanceWeights(docs, "doc_id", "text",
        isTarget = $"lang" === "en", buckets = 1024, seed = 42L)
      // resample the RAW pool only: target docs fit the model but must
      // not compete for selection slots (they'd dominate the top-k —
      // DSIR selects FROM the crawl TOWARD the target)
      val raw = docs.filter($"lang" =!= "en").select($"doc_id")
      val sel = Dsir.resampleTopK(w.join(raw, "doc_id"), "doc_id",
          k = 100, seed = 7L)
        .select($"doc_id", lit(1L).as("__sel"))
      docs.join(w, "doc_id")
        .join(sel, Seq("doc_id"), "left_outer")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"__sel", lit(0L))).as("n_selected"),
          round(avg($"log_weight"), 6).as("mean_logw"))
        .orderBy($"lang")
    },
    None)

  /** Cardinality-sketch accuracy report: per order-priority exact
    * distinct customers vs the HLL++ estimate, with relative error.
    * Uses Spark's built-in `approx_count_distinct` (dense registers,
    * elementwise-max merge) because that estimate is BIT-INVARIANT to
    * partition count and merge order — the RegistrySpec gate — where
    * the DataSketches binary ([[Sketches]], the persisted-artifact
    * lifecycle) wobbles within sketch error across union shapes.
    * Rows-only: DuckDB's approx_count_distinct is a different sketch. */
  val q134SketchAccuracy: GraftQuery = GraftQuery(
    "q134_sketch_accuracy",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority".as("group"))
        .agg(countDistinct($"o_custkey").as("exact_distinct"),
          approx_count_distinct($"o_custkey", 0.02).as("hll_estimate"),
          count(lit(1)).as("n_rows"))
        .select($"group", $"exact_distinct", $"hll_estimate", $"n_rows",
          round(abs($"hll_estimate" - $"exact_distinct")
            .cast("double") / $"exact_distinct", 6).as("rel_err"))
        .orderBy($"group")
    },
    None)

  /** The EXACT half of q134's exact-vs-HLL accuracy pair, split out as
    * its own oracled row (the q153/q154 component-split pattern): exact
    * distinct customers and row count per order priority, hash-matched
    * against DuckDB. q134 stays rows-only because the HLL++ estimate has
    * no DuckDB twin — this row pins the denominator of its rel_err, so
    * an accuracy drift can be attributed to the sketch side alone. */
  val q157ExactDistinct: GraftQuery = GraftQuery(
    "q157_exact_distinct",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority".as("grp"))
        .agg(countDistinct($"o_custkey").as("exact_distinct"),
          count(lit(1)).as("n_rows"))
        .orderBy($"grp")
    },
    Some("SELECT o_orderpriority AS grp, " +
      "count(DISTINCT o_custkey) AS exact_distinct, " +
      "count(*) AS n_rows " +
      "FROM orders GROUP BY o_orderpriority ORDER BY grp"))

  /** Discriminative quality filter ([[QualityClassifier]]): train the
    * fastText-style hashed-bigram logistic classifier against the `en`
    * target, score every document distributed, and report the
    * per-language score profile — target-like languages should
    * concentrate above the 0.5 boundary. Deterministic (driver-side
    * seeded training on a hash-selected sample, 9-dp-rounded logits)
    * but not ANSI-expressible → rows-only. */
  val q135QualityClassifier: GraftQuery = GraftQuery(
    "q135_quality_classifier",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val model = QualityClassifier.train(docs, "doc_id", "text",
        isTarget = $"lang" === "en", buckets = 1024, seed = 42L,
        maxSample = 200, iters = 60)
      docs.join(QualityClassifier.score(docs, "doc_id", "text", model),
          "doc_id")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg($"quality_score"), 6).as("mean_score"),
          sum(when($"quality_score" > 0.5, 1L).otherwise(0L))
            .as("n_above_half"))
        .orderBy($"lang")
    },
    None)

  /** Incremental-ingest snapshot diff ([[Dedup.snapshotDiff]]): two
    * deterministic sub-snapshots of the corpus (doc_id % 10 ≠ 0 as
    * "old", doc_id % 7 ≠ 0 as "new") diffed by CONTENT hash, rolled up
    * per (source, status). The whole pipeline — sha256 identity,
    * anti/outer joins on the hash, rollup — is replayed by DuckDB. */
  val q136SnapshotDiff: GraftQuery = GraftQuery(
    "q136_snapshot_diff",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      Dedup.snapshotDiff(
          docs.filter($"doc_id" % 10 =!= 0),
          docs.filter($"doc_id" % 7 =!= 0), "text")
        .groupBy($"source", $"diff_status")
        .agg(count(lit(1)).as("n"))
        .orderBy($"source", $"diff_status")
    },
    Some(
      "WITH oldt AS (SELECT * FROM documents WHERE doc_id % 10 <> 0), " +
        "newt AS (SELECT * FROM documents WHERE doc_id % 7 <> 0), " +
        "tagged AS (" +
        "SELECT source, CASE WHEN sha256(text) IN " +
        "(SELECT sha256(text) FROM oldt) THEN 'common' ELSE 'added' END " +
        "AS diff_status FROM newt " +
        "UNION ALL " +
        "SELECT source, 'removed' AS diff_status FROM oldt " +
        "WHERE sha256(text) NOT IN (SELECT sha256(text) FROM newt)) " +
        "SELECT source, diff_status, count(*) AS n FROM tagged " +
        "GROUP BY source, diff_status ORDER BY source, diff_status"))

  /** The curation pipeline END-TO-END, oracled as ONE query: Gopher
    * document gate (q121's rule pack) → exact-dedup keep-canonical
    * (q21's min-id policy) → content-keyed split (q131) → per
    * (source, split) counts. Each stage is a separately-oracled
    * operator; this exhibit proves the COMPOSITION matches DuckDB
    * replaying the same gate → dedup → split chain — the shape a real
    * pretraining-corpus build runs nightly. Three shuffles end to end
    * (dedup group, join-back, report rollup); the gate and split are
    * zero-shuffle projections. */
  val q143GatedCuration: GraftQuery = GraftQuery(
    "q143_gated_curation",
    (s, d) => {
      import s.implicits._
      val gated = Tables.documents(s, d)
        .withColumn("g", graft.functions.TextFunctions.gopherFlags(
          $"text", minWords = 40, maxWords = 100000,
          stopwords = Seq("the", "a"), minStopHits = 2))
        .filter($"g.keep").drop("g")
      val canonical = Dedup.exact(gated, "doc_id", "text")
        .select($"doc_id")
      Sampling.contentSplit(gated.join(canonical, "doc_id"), "text")
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"source", $"split")
    },
    Some(
      "WITH w AS (SELECT doc_id, source, text, " +
        "string_split(text, ' ') AS ws FROM documents), " +
        "g AS (SELECT doc_id, source, text FROM (" +
        "SELECT doc_id, source, text, len(ws) AS n_words, " +
        "list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws) " +
        "AS mwl, " +
        "(length(text) - length(replace(replace(text, '#', ''), '…', '')))" +
        "::DOUBLE / greatest(length(text), 1) AS sr, " +
        "len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE " +
        "/ len(ws) AS awr, " +
        "len(list_filter(['the', 'a'], s2 -> list_contains(ws, s2))) AS sh " +
        "FROM w) WHERE n_words BETWEEN 40 AND 100000 " +
        "AND mwl BETWEEN 3.0 AND 10.0 AND sr <= 0.1 AND awr >= 0.8 " +
        "AND sh >= 2), " +
        "canon AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY text), " +
        "kept AS (SELECT g.* FROM g JOIN canon USING (doc_id)), " +
        "labeled AS (SELECT source, " +
        "CASE WHEN substr(sha256(text), 1, 1) BETWEEN '0' AND '9' " +
        "OR substr(sha256(text), 1, 1) IN ('a', 'b') THEN 'train' " +
        "WHEN substr(sha256(text), 1, 1) IN ('c', 'd') THEN 'val' " +
        "ELSE 'test' END AS split FROM kept) " +
        "SELECT source, split, count(*) AS n_docs FROM labeled " +
        "GROUP BY source, split ORDER BY source, split"))

  /** Eval decontamination by EXCISION ([[Dedup.contaminatedSpans]] +
    * [[Dedup.exciseSpans]]): strip every corpus span covered by
    * benchmark 3-grams (docs 0–19 standing in for the eval suite),
    * keeping the rest of each document — the PaLM-style surgical
    * alternative to q98's drop-the-whole-document counting. The oracle
    * replays gram matching, the gaps-and-islands merge, AND the
    * positional token rebuild. */
  val q144Decontaminate: GraftQuery = GraftQuery(
    "q144_decontaminate",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val bench = docs.filter($"doc_id" < 20)
      val corpus = docs.filter($"doc_id" >= 20)
      Dedup.exciseSpans(corpus, "doc_id", "text",
          Dedup.contaminatedSpans(corpus, bench, "doc_id", "text", n = 3))
        .select($"doc_id", $"n_removed".cast("long").as("n_removed"),
          $"clean_text")
        .orderBy($"doc_id")
    },
    Some(
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS toks " +
        "FROM documents), " +
        "win AS (SELECT doc_id, i AS pos, " +
        "array_to_string(toks[i : i + 2], ' ') AS gram " +
        "FROM t, unnest(generate_series(1, len(toks) - 2)) AS s(i)), " +
        "bench AS (SELECT DISTINCT gram FROM win WHERE doc_id < 20), " +
        "mk AS (SELECT w.doc_id, w.pos FROM win w JOIN bench USING (gram) " +
        "WHERE w.doc_id >= 20), " +
        "g AS (SELECT doc_id, pos, CASE WHEN pos - coalesce(lag(pos) " +
        "OVER (PARTITION BY doc_id ORDER BY pos), pos) > 3 " +
        "THEN 1 ELSE 0 END AS gap FROM mk), " +
        "isl AS (SELECT doc_id, pos, sum(gap) OVER (PARTITION BY doc_id " +
        "ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM g), " +
        "sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 2 AS e " +
        "FROM isl GROUP BY doc_id, island), " +
        "tok AS (SELECT doc_id, unnest(toks) AS tk, " +
        "unnest(generate_series(1, len(toks))) AS p FROM t " +
        "WHERE doc_id >= 20), " +
        "keep AS (SELECT k.doc_id, k.tk, k.p FROM tok k " +
        "WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = k.doc_id " +
        "AND k.p BETWEEN sp.s AND sp.e)) " +
        "SELECT d.doc_id, " +
        "len(string_split(d.text,' ')) - coalesce(k.n_kept, 0) " +
        "AS n_removed, coalesce(k.txt, '') AS clean_text " +
        "FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n_kept, " +
        "string_agg(tk, ' ' ORDER BY p) AS txt FROM keep GROUP BY doc_id) " +
        "k USING (doc_id) WHERE d.doc_id >= 20 ORDER BY d.doc_id"))

  /** Incremental curation, ORACLED end-to-end: the exact dataframe
    * pipeline `curate --append` runs — ship an initial snapshot through
    * gate → exact-dedup → content split, then diff a grown snapshot
    * against the shipped CONTENT (sha256 identity, [[Dedup
    * .snapshotDiff]]) and push only the added documents through the
    * same pipeline. DuckDB replays both phases (the gate CTE twice, the
    * content-hash anti-join between them), so the append semantics —
    * not just the artifact equality CurationSpec proves — are oracle-
    * checked at both SFs. Uses [[Curation.gateDedupSplit]], the same
    * code path the curate verbs execute. */
  val q151IncrementalCuration: GraftQuery = GraftQuery(
    "q151_incremental_curation",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val initial = docs.filter($"doc_id" % 3 =!= 0)
      val shipped = Curation.gateDedupSplit(initial)
      val added = Dedup.snapshotDiff(shipped.drop("split"), docs, "text")
        .filter($"diff_status" === "added").drop("diff_status")
      val appended = Curation.gateDedupSplit(added)
      shipped.select($"split", lit("base").as("phase"))
        .unionAll(appended.select($"split", lit("appended").as("phase")))
        .groupBy($"split", $"phase")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"split", $"phase")
    },
    Some(
      "WITH init AS (SELECT * FROM documents WHERE doc_id % 3 != 0), " +
        "iw AS (SELECT doc_id, source, text, " +
        "string_split(text, ' ') AS ws FROM init), " +
        "ig AS (SELECT doc_id, source, text FROM (" +
        "SELECT doc_id, source, text, len(ws) AS n_words, " +
        "list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws) " +
        "AS mwl, " +
        "(length(text) - length(replace(replace(text, '#', ''), '…', '')))" +
        "::DOUBLE / greatest(length(text), 1) AS sr, " +
        "len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE " +
        "/ len(ws) AS awr, " +
        "len(list_filter(['the', 'a'], s2 -> list_contains(ws, s2))) AS sh " +
        "FROM iw) WHERE n_words BETWEEN 40 AND 100000 " +
        "AND mwl BETWEEN 3.0 AND 10.0 AND sr <= 0.1 AND awr >= 0.8 " +
        "AND sh >= 2), " +
        "ic AS (SELECT min(doc_id) AS doc_id FROM ig GROUP BY text), " +
        "ik AS (SELECT ig.* FROM ig JOIN ic USING (doc_id)), " +
        "ibase AS (SELECT CASE WHEN substr(sha256(text), 1, 1) " +
        "BETWEEN '0' AND '9' OR substr(sha256(text), 1, 1) " +
        "IN ('a', 'b') THEN 'train' " +
        "WHEN substr(sha256(text), 1, 1) IN ('c', 'd') THEN 'val' " +
        "ELSE 'test' END AS split FROM ik), " +
        "basehash AS (SELECT DISTINCT sha256(text) AS h FROM ik), " +
        "added AS (SELECT d.doc_id, d.source, d.text FROM documents d " +
        "WHERE sha256(d.text) NOT IN (SELECT h FROM basehash)), " +
        "aw AS (SELECT doc_id, source, text, " +
        "string_split(text, ' ') AS ws FROM added), " +
        "ag AS (SELECT doc_id, source, text FROM (" +
        "SELECT doc_id, source, text, len(ws) AS n_words, " +
        "list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws) " +
        "AS mwl, " +
        "(length(text) - length(replace(replace(text, '#', ''), '…', '')))" +
        "::DOUBLE / greatest(length(text), 1) AS sr, " +
        "len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE " +
        "/ len(ws) AS awr, " +
        "len(list_filter(['the', 'a'], s2 -> list_contains(ws, s2))) AS sh " +
        "FROM aw) WHERE n_words BETWEEN 40 AND 100000 " +
        "AND mwl BETWEEN 3.0 AND 10.0 AND sr <= 0.1 AND awr >= 0.8 " +
        "AND sh >= 2), " +
        "ac AS (SELECT min(doc_id) AS doc_id FROM ag GROUP BY text), " +
        "ak AS (SELECT ag.* FROM ag JOIN ac USING (doc_id)), " +
        "aapp AS (SELECT CASE WHEN substr(sha256(text), 1, 1) " +
        "BETWEEN '0' AND '9' OR substr(sha256(text), 1, 1) " +
        "IN ('a', 'b') THEN 'train' " +
        "WHEN substr(sha256(text), 1, 1) IN ('c', 'd') THEN 'val' " +
        "ELSE 'test' END AS split FROM ak) " +
        "SELECT split, 'base' AS phase, count(*) AS n_docs FROM ibase " +
        "GROUP BY split " +
        "UNION ALL " +
        "SELECT split, 'appended' AS phase, count(*) AS n_docs FROM aapp " +
        "GROUP BY split " +
        "ORDER BY split, phase"))

  /** Per-(event_id, ts, value) backlog for the streaming DENSITY face
    * — the q225 shard protocol (ts-ordered ntile quartiles, every
    * 37th row displaced two shards forward = the planted stragglers)
    * carrying the `value` column the cell key needs. A separate
    * prepared key from q225src so the two artifact schemas can never
    * alias. */
  private def writeSharedLateValueBacklog(
      s: org.apache.spark.sql.SparkSession, d: String,
      p: String): Unit = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"ts", $"event_id")
    val sharded = Tables.events(s, d)
      .select($"event_id", $"ts", $"value",
        (ntile(4).over(w) - 1).as("q"),
        row_number().over(w).as("rn"))
      .select($"event_id", $"ts", $"value",
        when($"rn" % 37 === 0, least($"q" + 2, lit(3)))
          .otherwise($"q").cast("int").as("shard"))
    graft.streaming.EventStream.writeShardedBacklog(s, p, sharded,
      "shard", 4)
  }

  /** STREAMING density clustering — the density axis' streaming face
    * (batch grid DBSCAN is q239; VERDICT r13 #8): per 1-hour
    * event-time window, a (window x ⌊value/25⌋-cell) count keyed in
    * stream state ([[graft.streaming.EventStream.runLateCellDensity]]
    * — cells as state keys, eviction by watermark, late rows under
    * the q225 lagged-watermark protocol, pinned keyed-emission case
    * in WatermarkLateSpec BEFORE this oracle), then the batch step
    * 1-D grid DBSCAN can replay exactly: dense cells (n ≥ 5) merge
    * with ADJACENT dense cells into value-density segments — in one
    * dimension connected components ARE gaps-and-islands (cell −
    * rank), so the oracle needs no recursive closure at all (the
    * q239 lesson applied at design time). Output: one row per
    * (window, segment): cell_lo, cell_hi, n_cells, n_points. The
    * three SFs tell the density story unprompted: sf0.001 emits NO
    * segments (all cells sparse), sf0.1 carpets the clock. */
  val q241StreamDensityOracled: GraftQuery = GraftQuery(
    "q241_stream_density_oracled",
    (s, d) => {
      import s.implicits._
      val src = AnnIndexes.prepared("q241src", d)(
        writeSharedLateValueBacklog(s, d, _))
      val cells = graft.streaming.EventStream.runLateCellDensity(
        s, src, "30 minutes", eps = 25.0, queryName = "graft_q241")
      cells.filter($"n" >= 5)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"w_start_ms").orderBy($"cell")))
        .withColumn("grp", $"cell" - $"rk")
        .groupBy($"w_start_ms", $"grp")
        .agg(min($"cell").as("cell_lo"), max($"cell").as("cell_hi"),
          count(lit(1)).as("n_cells"), sum($"n").as("n_points"))
        .select($"w_start_ms", $"cell_lo", $"cell_hi", $"n_cells",
          $"n_points")
        .orderBy($"w_start_ms", $"cell_lo")
    },
    Some(
      "WITH ord AS (SELECT event_id, ts, value, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT ts, value, CASE WHEN rn % 37 = 0 " +
        "THEN least(q + 2, 3) ELSE q END AS shard FROM ord), " +
        "mx AS (SELECT shard, max(ts) AS mt FROM sh GROUP BY shard), " +
        "wm AS (SELECT shard, max(mt) OVER (ORDER BY shard " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) " +
        "- INTERVAL 30 MINUTE AS wml FROM mx), " +
        "surv AS (SELECT sh.ts, sh.value FROM sh JOIN wm USING (shard) " +
        "WHERE wm.wml IS NULL " +
        "OR date_trunc('hour', sh.ts) + INTERVAL 1 HOUR > wm.wml), " +
        "fin AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wmf FROM sh), " +
        "cells AS (SELECT epoch_ms(date_trunc('hour', surv.ts)) " +
        "AS w_start_ms, floor(surv.value / 25.0)::BIGINT AS cell, " +
        "count(*) AS n FROM surv, fin " +
        "WHERE date_trunc('hour', surv.ts) + INTERVAL 1 HOUR " +
        "<= fin.wmf GROUP BY 1, 2), " +
        "dense AS (SELECT * FROM cells WHERE n >= 5), " +
        "seg AS (SELECT w_start_ms, cell, n, cell - row_number() " +
        "OVER (PARTITION BY w_start_ms ORDER BY cell) AS grp " +
        "FROM dense) " +
        "SELECT w_start_ms, min(cell) AS cell_lo, " +
        "max(cell) AS cell_hi, count(*)::BIGINT AS n_cells, " +
        "sum(n)::BIGINT AS n_points FROM seg " +
        "GROUP BY w_start_ms, grp ORDER BY w_start_ms, cell_lo"))

  /** The q241 backlog writer grown a second dimension: (event_id,
    * ts, value, user_id, shard) under the identical q225 shard
    * protocol. A separate prepared key (q242src) so the artifact
    * schemas can never alias. */
  private def writeSharedLateValue2dBacklog(
      s: org.apache.spark.sql.SparkSession, d: String,
      p: String): Unit = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"ts", $"event_id")
    val sharded = Tables.events(s, d)
      .select($"event_id", $"ts", $"value", $"user_id",
        (ntile(4).over(w) - 1).as("q"),
        row_number().over(w).as("rn"))
      .select($"event_id", $"ts", $"value", $"user_id",
        when($"rn" % 37 === 0, least($"q" + 2, lit(3)))
          .otherwise($"q").cast("int").as("shard"))
    graft.streaming.EventStream.writeShardedBacklog(s, p, sharded,
      "shard", 4)
  }

  /** STREAMING density clustering in TWO dimensions — the q239
    * bounded-closure oracle over emitted stream state (VERDICT r14
    * #6; q241 proved the cells-as-state pattern where 1-D components
    * are gaps-and-islands): per 1-hour window a (⌊value/50⌋ ×
    * ⌊user_id/20⌋) cell count keyed in stream state
    * ([[graft.streaming.EventStream.runLateCellDensity2d]], 2-key
    * emission pinned in WatermarkLateSpec BEFORE this oracle), then
    * the batch step merges DENSE cells (n ≥ 4) with 8-ADJACENT dense
    * cells into per-window components — the q239 grid machinery over
    * stream state. 2-D components need a real closure; it stays
    * ORACLE-BOUNDED BY CONSTRUCTION because the closure runs over
    * dense CELLS, not points — a handful per window (sf0.1: 1783
    * dense cells across 650 windows), so the recursive reach is
    * Σ|component|² over ≤ ~10-cell components. Cells get a synthetic
    * id (hourIdx·2²⁴ + (cx+1)·2¹² + (cy+1) with hourIdx =
    * w_start_ms ÷ 3 600 000, exact integer division of the
    * hour-aligned stamp — injective for cx, cy < 4095, i.e. value
    * < ~205k and user_id < ~82k, two orders of magnitude past any
    * generated SF; both engines spell the same arithmetic) so the
    * component label is the min encoded cell. The three SFs tell the
    * story: sf0.001 has dense cells but NO adjacent pairs (all
    * singleton segments), sf0.01 merges a few, sf0.1 forms real 2-D
    * regions. Output: one row per (window, component) with the cell
    * bounding box, cell count, and point count. */
  val q242StreamDensity2dOracled: GraftQuery = GraftQuery(
    "q242_stream_density2d_oracled",
    (s, d) => {
      import s.implicits._
      val src = AnnIndexes.prepared("q242src", d)(
        writeSharedLateValue2dBacklog(s, d, _))
      val cells = graft.streaming.EventStream.runLateCellDensity2d(
        s, src, "30 minutes", epsV = 50.0, epsU = 20.0,
        queryName = "graft_q242")
      // the packed encoding is injective ONLY for cx, cy in
      // [-1, 4094] ((cx+1)·4096 + (cy+1) < 2²⁴) — outside it two
      // cells could alias and silently merge components, and the
      // oracle shares the arithmetic so the hash gate could not see
      // it (ADVICE r15). Generated data sits at cx ≤ 9 / cy ≤ 7;
      // out-of-domain input now FAILS FAST instead of mislabeling.
      val cid = when(
          $"cx" < -1L || $"cx" > 4094L || $"cy" < -1L || $"cy" > 4094L,
          raise_error(format_string(
            "q242 cell (%d,%d) outside the injective encoding " +
              "domain [-1,4094] — key components on " +
              "(w_start_ms,cx,cy) for wider grids", $"cx", $"cy")))
        .otherwise(expr("w_start_ms DIV 3600000") * 16777216L +
          ($"cx" + 1L) * 4096L + ($"cy" + 1L)).as("cid")
      val dense = cells.filter($"n" >= 4)
        .select($"w_start_ms", $"cx", $"cy", $"n", cid)
        .persist()
      dense.count()
      val offs = broadcast(Seq(-1L, 0L, 1L)
        .flatMap(a => Seq(-1L, 0L, 1L).map(b => (a, b)))
        .toDF("dx", "dy"))
      val right = dense.select($"w_start_ms".as("w2"),
        $"cx".as("cx2"), $"cy".as("cy2"), $"cid".as("cid2"))
      val edges = dense.crossJoin(offs)
        .select($"w_start_ms".as("w1"), ($"cx" + $"dx").as("cxp"),
          ($"cy" + $"dy").as("cyp"), $"cid")
        .join(right, $"w1" === $"w2" && $"cxp" === $"cx2" &&
          $"cyp" === $"cy2")
        .filter($"cid" < $"cid2")
        .select($"cid".as("id_a"), $"cid2".as("id_b"))
      val comp = graft.operators.Dedup.connectedComponents(edges)
      val res = dense
        .join(comp.select($"id".as("cid"), $"component"),
          Seq("cid"), "left_outer")
        .select($"w_start_ms", $"cx", $"cy", $"n",
          coalesce($"component", $"cid").as("comp"))
        .groupBy($"w_start_ms", $"comp")
        .agg(min($"cx").as("cx_lo"), max($"cx").as("cx_hi"),
          min($"cy").as("cy_lo"), max($"cy").as("cy_hi"),
          count(lit(1)).as("n_cells"), sum($"n").as("n_points"))
        .select($"w_start_ms", $"cx_lo", $"cx_hi", $"cy_lo",
          $"cy_hi", $"n_cells", $"n_points")
        .orderBy($"w_start_ms", $"cx_lo", $"cy_lo", $"cx_hi",
          $"cy_hi", $"n_cells", $"n_points")
      // bounded output (one row per dense region): localize, then
      // release the dense-cell cache and the component frame
      val rows = res.collect().toSeq
      comp.unpersist()
      dense.unpersist()
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
          res.schema)
        .orderBy($"w_start_ms", $"cx_lo", $"cy_lo", $"cx_hi",
          $"cy_hi", $"n_cells", $"n_points")
    },
    Some(
      "WITH RECURSIVE ord AS (SELECT event_id, ts, value, user_id, " +
        "ntile(4) OVER (ORDER BY ts, event_id) - 1 AS q, " +
        "row_number() OVER (ORDER BY ts, event_id) AS rn FROM events), " +
        "sh AS (SELECT ts, value, user_id, CASE WHEN rn % 37 = 0 " +
        "THEN least(q + 2, 3) ELSE q END AS shard FROM ord), " +
        "mx AS (SELECT shard, max(ts) AS mt FROM sh GROUP BY shard), " +
        "wm AS (SELECT shard, max(mt) OVER (ORDER BY shard " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) " +
        "- INTERVAL 30 MINUTE AS wml FROM mx), " +
        "surv AS (SELECT sh.ts, sh.value, sh.user_id FROM sh " +
        "JOIN wm USING (shard) WHERE wm.wml IS NULL " +
        "OR date_trunc('hour', sh.ts) + INTERVAL 1 HOUR > wm.wml), " +
        "fin AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wmf FROM sh), " +
        "cells AS (SELECT epoch_ms(date_trunc('hour', surv.ts)) " +
        "AS w_start_ms, floor(surv.value / 50.0)::BIGINT AS cx, " +
        "floor(surv.user_id / 20.0)::BIGINT AS cy, " +
        "count(*) AS n FROM surv, fin " +
        "WHERE date_trunc('hour', surv.ts) + INTERVAL 1 HOUR " +
        "<= fin.wmf GROUP BY 1, 2, 3), " +
        "dense AS MATERIALIZED (SELECT w_start_ms, cx, cy, n, " +
        "(w_start_ms // 3600000) * 16777216 " +
        "+ (cx + 1) * 4096 + (cy + 1) AS cid " +
        "FROM cells WHERE n >= 4), " +
        "e AS MATERIALIZED (SELECT a.cid AS src, b.cid AS dst " +
        "FROM dense a JOIN dense b ON a.w_start_ms = b.w_start_ms " +
        "AND abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 " +
        "AND a.cid != b.cid), " +
        // exact transitive min-label closure over dense CELLS — the
        // q239 pattern with the bound built in (cells, not points)
        "reach(id, lbl) AS (SELECT src, src FROM e " +
        "UNION SELECT e2.dst, r.lbl FROM reach r " +
        "JOIN e e2 ON e2.src = r.id), " +
        "comp AS (SELECT id, min(lbl) AS component FROM reach " +
        "GROUP BY id), " +
        "lab AS (SELECT d.w_start_ms, d.cx, d.cy, d.n, " +
        "coalesce(c.component, d.cid) AS comp FROM dense d " +
        "LEFT JOIN comp c ON c.id = d.cid) " +
        "SELECT w_start_ms, min(cx) AS cx_lo, max(cx) AS cx_hi, " +
        "min(cy) AS cy_lo, max(cy) AS cy_hi, " +
        "count(*)::BIGINT AS n_cells, sum(n)::BIGINT AS n_points " +
        "FROM lab GROUP BY w_start_ms, comp " +
        "ORDER BY w_start_ms, cx_lo, cy_lo, cx_hi, cy_hi, " +
        "n_cells, n_points"))
}
