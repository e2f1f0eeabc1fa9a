package graft

import org.apache.spark.sql.functions._

import graft.engine.{ClusterEngine, EngineConf}
import graft.preprocess.Scaling

/** Clustering-parity queries (SURVEY.md §2.9/§2.10).
  *
  * ML fits are seed-pinned and deterministic but not SQL-expressible →
  * rows-only driver checks (no oracle). The deterministic *formula* pieces
  * the fits consume — per-segment scaling, centroid, radius, guard — are
  * oracle-checked here (q34/q35) against DuckDB, exercising the same
  * [[Scaling]] code the engine runs.
  */
object MLQueries {

  def all: Seq[GraftQuery] = Seq(q30ClusterLocal,
    q33OptimalKLocal, q34CentroidRadius, q35SegmentGuard,
    q36ClusterBisecting, q37ClusterGmmLocal, q38TfIdf, q39Cluster3d,
    q81Word2Vec, q191Word2VecOracled, q239DbscanOracled)

  /** The spark.ml CONTRAST demos (q31/q32) — architecture exhibits,
    * not timed-registry rows (VERDICT r11 #7): their 11 s/capture is
    * by-design spark.ml per-job overhead, the very thing the q30/q37
    * one-shuffle engine exists to avoid, so paying it in every bench
    * capture measures nothing new. They stay runnable (`exhibit` CLI
    * verb, MlContrastSpec keeps them green at spec SF) and their
    * semantics stay gated through the oracled engine faces
    * (q158/q181/q182/q190/q205). */
  def exhibits: Seq[GraftQuery] = Seq(q31ClusterMl, q32ClusterGmmMl)

  private def lineitemConf = EngineConf(
    macroCol = "l_returnflag", microCol = "l_linestatus",
    xCol = "l_quantity", yCol = "l_extendedprice",
    fixedK = Some(3), iterNum = 2, seed = 42L)

  private def flatten(res: org.apache.spark.sql.Dataset[graft.engine.SegmentResult]) =
    res.select(
      col("macroId"), col("microId"), col("k"),
      round(col("silhouette"), 4).as("silhouette"),
      round(col("entropy"), 4).as("entropy"),
      explode(col("clusters")).as("c"))
      .select(col("macroId"), col("microId"), col("k"), col("silhouette"),
        col("entropy"), col("c.name").as("cluster"),
        col("c.clusterSize").as("cluster_size"),
        round(col("c.radius"), 4).as("radius"))
      .orderBy(col("macroId"), col("microId"), col("cluster"))

  /** Scalable backend: every (returnflag, linestatus) segment KMeans'd in
    * one shuffle (flatMapGroups + LocalKMeans), k=3, seed-pinned. */
  val q30ClusterLocal: GraftQuery = GraftQuery(
    "q30_cluster_local",
    (s, d) => flatten(ClusterEngine.run(Tables.lineitem(s, d), lineitemConf)))

  /** Parity backend: spark.ml KMeans fits on the two 'A' segments (the
    * few-huge-segments path; scoped to keep its per-segment-job cost from
    * dominating the bench — the contrast with q30 is the point).
    * mlMaxIter=8: at 150k rows/segment the fit converges in single-digit
    * Lloyd rounds; the default 20 rounds only buys per-job overhead. */
  val q31ClusterMl: GraftQuery = GraftQuery(
    "q31_cluster_ml",
    (s, d) => {
      import s.implicits._
      flatten(ClusterEngine.runMl(
        Tables.lineitem(s, d).filter($"l_returnflag" === "A"),
        lineitemConf.copy(iterNum = 1, mlMaxIter = Some(8))))
    })

  /** Scalable backend, BisectingKMeans leg (recursive largest-cluster
    * 2-splits in-task). */
  val q36ClusterBisecting: GraftQuery = GraftQuery(
    "q36_cluster_bisecting_local",
    (s, d) => flatten(ClusterEngine.run(Tables.lineitem(s, d),
      lineitemConf.copy(algorithm = "BisectingKMeans"))))

  /** Scalable backend, GaussianMixture leg (in-task full-covariance EM;
    * capped points per segment keep EM cost bounded). */
  val q37ClusterGmmLocal: GraftQuery = GraftQuery(
    "q37_cluster_gmm_local",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("user_bucket", ($"user_id" % 3).cast("string"))
        .withColumn("ts_sec", unix_timestamp($"ts").cast("double"))
      flatten(ClusterEngine.run(ev, EngineConf(
        macroCol = "event_type", microCol = "user_bucket",
        xCol = "value", yCol = "ts_sec",
        algorithm = "GaussianMixture", fixedK = Some(2), iterNum = 1,
        seed = 42L, maxPointsPerSegment = 2000)))
    })

  /** GaussianMixture on event buckets (ml backend; GMM centers = data
    * means per the reference, `scripts/metrics.py:32-54`). */
  val q32ClusterGmmMl: GraftQuery = GraftQuery(
    "q32_cluster_gmm_ml",
    (s, d) => {
      import s.implicits._
      // one event type × two buckets: 2 GMM fits — the ml backend is the
      // few-huge-segments path, so the query keeps the grid small
      val ev = Tables.events(s, d)
        .filter($"event_type" === "purchase")
        .withColumn("user_bucket", ($"user_id" % 2).cast("string"))
        .withColumn("ts_sec", unix_timestamp($"ts").cast("double"))
      // mlMaxIter=25 (library default is 100): EM on a 2-gaussian segment
      // plateaus well inside 25 rounds; the remaining 75 are pure per-job
      // overhead at bench scale.
      flatten(ClusterEngine.runMl(ev, EngineConf(
        macroCol = "event_type", microCol = "user_bucket",
        xCol = "value", yCol = "ts_sec",
        algorithm = "GaussianMixture", fixedK = Some(2), iterNum = 1,
        seed = 42L, mlMaxIter = Some(25))))
    })

  /** Full optimal-k pipeline (k-sweep 2..6 + selection policy M9/M10 +
    * seed search M7) running inside each segment's task. */
  val q33OptimalKLocal: GraftQuery = GraftQuery(
    "q33_optimal_k_local",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("user_bucket", ($"user_id" % 4).cast("string"))
        .withColumn("ts_sec", unix_timestamp($"ts").cast("double"))
      val res = ClusterEngine.run(ev, EngineConf(
        macroCol = "event_type", microCol = "user_bucket",
        xCol = "value", yCol = "ts_sec",
        startK = 2, stopK = 6, iterNum = 2, seed = 42L))
      res.select(col("macroId"), col("microId"), col("k"),
        round(col("silhouette"), 4).as("silhouette"))
        .orderBy(col("macroId"), col("microId"))
    })

  /** A1/A4/A6 formulas, oracle-checked: per-segment min–max scaling (the
    * engine's Scaling module), centroid = mean point, radius = sqrt of max
    * squared distance to the centroid. */
  val q34CentroidRadius: GraftQuery = GraftQuery(
    "q34_centroid_radius",
    (s, d) => {
      import s.implicits._
      val scaled = Scaling.scaleSegments(Tables.lineitem(s, d),
        "l_returnflag", "l_linestatus",
        Seq("l_quantity", "l_extendedprice"))
      val xs = col(Scaling.scaledName("l_quantity"))
      val ys = col(Scaling.scaledName("l_extendedprice"))
      val cent = scaled.groupBy($"l_returnflag", $"l_linestatus")
        .agg(avg(xs).as("cx"), avg(ys).as("cy"), count(lit(1)).as("n"))
      scaled.join(broadcast(cent), Seq("l_returnflag", "l_linestatus"))
        .groupBy($"l_returnflag", $"l_linestatus", $"cx", $"cy", $"n")
        .agg(max(pow(xs - $"cx", 2) + pow(ys - $"cy", 2)).as("max_sq"))
        .select($"l_returnflag", $"l_linestatus",
          round($"cx", 4).as("cx"), round($"cy", 4).as("cy"), $"n",
          round(sqrt($"max_sq"), 4).as("radius"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(
      "WITH bounds AS (" +
        "SELECT l_returnflag, l_linestatus, " +
        "min(l_quantity) AS qmin, max(l_quantity) AS qmax, " +
        "min(l_extendedprice) AS pmin, max(l_extendedprice) AS pmax " +
        "FROM lineitem GROUP BY 1, 2), " +
        "scaled AS (" +
        "SELECT l.l_returnflag, l.l_linestatus, " +
        "CASE WHEN qmax - qmin > 0 THEN (l_quantity - qmin) / (qmax - qmin) * 100.0 ELSE 0.0 END AS xs, " +
        "CASE WHEN pmax - pmin > 0 THEN (l_extendedprice - pmin) / (pmax - pmin) * 100.0 ELSE 0.0 END AS ys " +
        "FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag " +
        "AND l.l_linestatus = b.l_linestatus), " +
        "cent AS (" +
        "SELECT l_returnflag, l_linestatus, avg(xs) AS cx, avg(ys) AS cy, " +
        "count(*) AS n FROM scaled GROUP BY 1, 2) " +
        "SELECT s.l_returnflag, s.l_linestatus, round(cx, 4) AS cx, " +
        "round(cy, 4) AS cy, n, " +
        "round(sqrt(max(pow(xs - cx, 2) + pow(ys - cy, 2))), 4) AS radius " +
        "FROM scaled s JOIN cent c ON s.l_returnflag = c.l_returnflag " +
        "AND s.l_linestatus = c.l_linestatus " +
        "GROUP BY s.l_returnflag, s.l_linestatus, cx, cy, n " +
        "ORDER BY s.l_returnflag, s.l_linestatus"))

  /** M12: the ≥2-distinct-points segment guard as data. */
  val q35SegmentGuard: GraftQuery = GraftQuery(
    "q35_segment_guard",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_points"),
          countDistinct(struct($"l_quantity", $"l_extendedprice"))
            .as("n_distinct"))
        .withColumn("eligible", ($"n_distinct" >= 2).cast("int"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(
      "SELECT l_returnflag, l_linestatus, count(*) AS n_points, " +
        "count(DISTINCT (l_quantity, l_extendedprice)) AS n_distinct, " +
        "CASE WHEN count(DISTINCT (l_quantity, l_extendedprice)) >= 2 " +
        "THEN 1 ELSE 0 END AS eligible " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"))

  /** Exact TF-IDF featurization, fully relational (explode → tf → df →
    * join), with the smooth idf = ln((N+1)/(df+1)) + 1; per-doc L2 norm of
    * the tf-idf vector as the scalar fingerprint. No feature hashing →
    * no collisions AND the whole computation is SQL-expressible, so this
    * is oracle-checked (round 1's HashingTF variant was rows-only; the
    * spark.ml parity of the norm is asserted in ScalingSpec-adjacent
    * tests). One wide shuffle on (doc, term), one small shuffle on term —
    * the 100 TB shape. */
  val q38TfIdf: GraftQuery = GraftQuery(
    "q38_tfidf_norm",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val terms = docs.select($"doc_id",
        explode(split(lower($"text"), " ")).as("term"))
      val tf = terms.groupBy($"doc_id", $"term")
        .agg(count(lit(1)).cast("double").as("tf"))
      val df = terms.groupBy($"term")
        .agg(countDistinct($"doc_id").cast("double").as("df"))
      val n = docs.agg(count(lit(1)).cast("double").as("n"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .groupBy($"doc_id")
        .agg(round(sqrt(sum(pow($"tf" * (log(($"n" + 1) / ($"df" + 1)) + 1),
          2))), 4).as("tfidf_norm"))
        .orderBy($"doc_id")
    },
    Some(
      "WITH terms AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) " +
        "AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf " +
        "FROM terms GROUP BY 1, 2), " +
        "df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df " +
        "FROM terms GROUP BY 1), " +
        "n AS (SELECT count(*)::DOUBLE AS n FROM documents) " +
        "SELECT doc_id, round(sqrt(sum(pow(tf * (ln((n+1)/(df+1)) + 1), 2))), 4) " +
        "AS tfidf_norm FROM tf JOIN df USING (term), n " +
        "GROUP BY doc_id ORDER BY doc_id"))

  /** n-dimensional clustering: three scaled lineitem metrics per point
    * (quantity, extendedprice, discount) through the same one-shuffle
    * backend — centers come back 3-D. Rows-only, seed-pinned. */
  val q39Cluster3d: GraftQuery = GraftQuery(
    "q39_cluster_3d_local",
    (s, d) => {
      val res = ClusterEngine.runNd(Tables.lineitem(s, d),
        lineitemConf.copy(iterNum = 1),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      flatten(res)
    })

  /** Word2vec training with a green row — the ORACLED face of q81
    * ([[graft.ml.DistributedWord2Vec.fitReplayable]]), the last model
    * family without one: 2 batch-GD rounds of skip-gram +
    * deterministic negative sampling over the corpus (md5 init, md5
    * negatives, 6-dp dot quantization before the sigmoid, 9-dp DECIMAL
    * gradient sums, 6-dp round-boundary re-quantization). DuckDB
    * replays tokenization, the vocabulary order, both init matrices,
    * every pair + its negative draw, both gradients and both updates —
    * all 8 components of every trained input vector hash-matched. */
  val q191Word2VecOracled: GraftQuery = GraftQuery(
    "q191_word2vec_oracled",
    (s, d) => graft.ml.DistributedWord2Vec.fitReplayable(
      Tables.documents(s, d), "doc_id", "text",
      dim = 8, minCount = 5, rounds = 2, lr = 0.5),
    Some {
      val dim = 8
      def vecCtes(r: Int): String =
        s", uvec$r AS (SELECT w, list(x ORDER BY j) AS u FROM u$r " +
          "GROUP BY w)" +
          s", vvec$r AS (SELECT w, list(x ORDER BY j) AS v FROM v$r " +
          "GROUP BY w)"
      val rounds = (1 to 2).map { r =>
        val p = r - 1
        s", s$r AS MATERIALIZED (SELECT c, o, nw, " +
          "round(1.0 / (1.0 + exp(-round(dpos, 6))), 6) - 1.0 AS gpos, " +
          "round(1.0 / (1.0 + exp(-round(dneg, 6))), 6) AS gneg FROM (" +
          "SELECT pr.c, pr.o, pr.nw, " +
          s"list_sum(list_transform(range(1, ${dim + 1}), " +
          "i -> uc.u[i] * vo.v[i])) AS dpos, " +
          s"list_sum(list_transform(range(1, ${dim + 1}), " +
          "i -> uc.u[i] * vn.v[i])) AS dneg " +
          s"FROM pr, uvec$p uc, vvec$p vo, vvec$p vn " +
          "WHERE uc.w = pr.c AND vo.w = pr.o AND vn.w = pr.nw))" +
          s", gu$r AS (SELECT w, j, " +
          "sum(round(t, 9)::DECIMAL(28,9))::DOUBLE AS g, " +
          "count(*) AS cnt FROM (" +
          s"SELECT s.c AS w, t.j, s.gpos * vo.v[t.j + 1] + " +
          s"s.gneg * vn.v[t.j + 1] AS t " +
          s"FROM s$r s, vvec$p vo, vvec$p vn, range(0, $dim) t(j) " +
          "WHERE vo.w = s.o AND vn.w = s.nw) GROUP BY w, j)" +
          s", gvt$r AS (SELECT s.o AS w, t.j, s.gpos * uc.u[t.j + 1] " +
          s"AS t FROM s$r s, uvec$p uc, range(0, $dim) t(j) " +
          "WHERE uc.w = s.c " +
          s"UNION ALL SELECT s.nw AS w, t.j, s.gneg * uc.u[t.j + 1] " +
          s"AS t FROM s$r s, uvec$p uc, range(0, $dim) t(j) " +
          "WHERE uc.w = s.c)" +
          s", gv$r AS (SELECT w, j, " +
          "sum(round(t, 9)::DECIMAL(28,9))::DOUBLE AS g, " +
          "count(*) AS cnt " +
          s"FROM gvt$r GROUP BY w, j)" +
          s", u$r AS MATERIALIZED (SELECT u.w, u.j, " +
          "round(u.x - 0.5 * coalesce(g.g / g.cnt, 0.0), 6) AS x " +
          s"FROM u$p u LEFT JOIN gu$r g ON g.w = u.w AND g.j = u.j)" +
          s", v$r AS MATERIALIZED (SELECT v.w, v.j, " +
          "round(v.x - 0.5 * coalesce(g.g / g.cnt, 0.0), 6) AS x " +
          s"FROM v$p v LEFT JOIN gv$r g ON g.w = v.w AND g.j = v.j)" +
          vecCtes(r)
      }.mkString
      "WITH tk AS MATERIALIZED (SELECT doc_id, p.i - 1 AS pos, " +
        "p.w AS w FROM (SELECT doc_id, unnest(list_transform(" +
        "generate_series(1, len(ws)), i -> {'i': i, 'w': ws[i]})) AS p " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents)) WHERE len(p.w) > 0), " +
        "vs AS MATERIALIZED (SELECT w, row_number() OVER " +
        "(ORDER BY n DESC, w) - 1 AS idx FROM (SELECT w, count(*) " +
        "AS n FROM tk GROUP BY w HAVING count(*) >= 5)), " +
        "vc AS (SELECT count(*) AS v FROM vs), " +
        s"u0 AS MATERIALIZED (SELECT w, t.j, ((('0x' || " +
        "substr(md5(w || '|u|' || t.j::VARCHAR), 1, 6))::BIGINT " +
        s"/ 16777215.0 - 0.5) / $dim.0) AS x FROM vs, " +
        s"range(0, $dim) t(j)), " +
        s"v0 AS MATERIALIZED (SELECT w, t.j, ((('0x' || " +
        "substr(md5(w || '|v|' || t.j::VARCHAR), 1, 6))::BIGINT " +
        s"/ 16777215.0 - 0.5) / $dim.0) AS x FROM vs, " +
        s"range(0, $dim) t(j)), " +
        "tv AS (SELECT tk.doc_id, tk.pos, tk.w FROM tk " +
        "JOIN vs USING (w)), " +
        "pr AS MATERIALIZED (SELECT p.c, p.o, vs2.w AS nw FROM (" +
        "SELECT a.doc_id, a.pos, a.w AS c, b.w AS o, " +
        "('0x' || substr(md5(a.w || '|' || b.w || '|' || " +
        "a.doc_id::VARCHAR || '|' || a.pos::VARCHAR), 1, 8))::BIGINT " +
        "% (SELECT v FROM vc) AS nidx " +
        "FROM tv a JOIN tv b ON b.doc_id = a.doc_id " +
        "AND b.pos = a.pos + 1) p JOIN vs vs2 ON vs2.idx = p.nidx)" +
        vecCtes(0) +
        rounds +
        " SELECT w AS word, j, round(x, 6) AS u FROM u2 " +
        "ORDER BY word, j"
    })

  /** Train word embeddings on the corpus (spark.ml Word2Vec, seed-pinned,
    * single partition for run-to-run determinism) and report per-word
    * vector norms for the most frequent terms. Rows-only. */
  val q81Word2Vec: GraftQuery = GraftQuery(
    "q81_word2vec",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.ml.feature.Word2Vec
      val docs = Tables.documents(s, d)
        .select(split($"text", " ").as("words")).coalesce(1)
      val model = new Word2Vec().setInputCol("words").setOutputCol("vec")
        .setVectorSize(16).setMinCount(5).setSeed(42L).setNumPartitions(1)
        .fit(docs)
      val normUdf = udf((v: org.apache.spark.ml.linalg.Vector) =>
        math.sqrt(v.toArray.map(x => x * x).sum))
      model.getVectors
        .select($"word", round(normUdf($"vector"), 4).as("vec_norm"))
        .orderBy($"word")
    })

  /** Grid-based DBSCAN over the events table — the density-clustering
    * face of the reference's domain ([[graft.operators.Dbscan]]),
    * FULLY ORACLED: features are the 6-dp-quantized (min-max-scaled
    * value, time-of-day fraction), eps = 0.005, minPts = 5; the
    * output is the per-cluster profile (point/core/border counts and
    * the exact bounding box — min/max, never avg, so no
    * summation-order term) plus the noise row (cluster = −1).
    *
    * The input is bounded to ~10k points by the ADAPTIVE modulus
    * m = max(1, n/10⁴), event_id % m = 0 — an oracle-tractability
    * bound, the q85/q43 precedent: DuckDB replays the component
    * labels with an exact recursive min-label closure, whose
    * materialized (node, label) relation is Σ|component|² rows —
    * unbounded on the raw sf0.1 table, where the core graph is one
    * ~95k-node near-giant component (a 24-round unrolled
    * pointer-doubling replay was tried first and converges only
    * linearly in diameter: 196 vs 193 exact components at sf0.01 —
    * the min-id node's ball adds nothing to a frontier, so the
    * "jump" step buys no doubling). The OPERATOR keeps its scale
    * path regardless: [[graft.operators.Dedup.connectedComponents]]
    * (driver union-find under its documented bound, iterative
    * min-propagation beyond), the same component engine the banded-
    * LSH dedup family is scale-gated on. The adaptive modulus also
    * makes every SF tell the density story at comparable n: sparse
    * corpora are noise-heavy (sf0.001: all noise), dense ones grow
    * fewer, larger clusters — same query, no per-SF tuning. */
  val q239DbscanOracled: GraftQuery = GraftQuery(
    "q239_dbscan_oracled",
    (s, d) => {
      import s.implicits._
      val evAll = Tables.events(s, d)
      val m = math.max(1L, evAll.count() / 10000L)
      val ev = evAll.filter($"event_id" % m === 0)
      val mm = ev.agg(min($"value").as("mnv"), max($"value").as("mxv"))
      val pts = ev.crossJoin(broadcast(mm))
        .select($"event_id".as("id"),
          round(($"value" - $"mnv") / ($"mxv" - $"mnv"), 6).as("x"),
          round((unix_millis($"ts") % 86400000L) / lit(86400000.0), 6)
            .as("y"))
      val labeled = graft.operators.Dbscan.label(pts, eps = 0.005,
        minPts = 5)
      val profile = labeled
        .groupBy($"cluster")
        .agg(count(lit(1)).as("n_points"),
          sum(when($"role" === "core", 1L).otherwise(0L)).as("n_core"),
          sum(when($"role" === "border", 1L).otherwise(0L))
            .as("n_border"),
          min($"x").as("x_min"), max($"x").as("x_max"),
          min($"y").as("y_min"), max($"y").as("y_max"))
        .orderBy($"cluster")
      // caller-owned persist (ADVICE r13): materialize the cluster
      // profile (a handful of rows) and release the corpus-sized
      // label cache instead of leaving it pinned for the session
      val rows = profile.collect().toSeq
      labeled.unpersist()
      s.createDataFrame(
        s.sparkContext.parallelize(rows, 1), profile.schema)
        .orderBy($"cluster")
    },
    Some(
      "WITH RECURSIVE md AS (SELECT greatest(1, count(*) // 10000) " +
        "AS m FROM events), " +
        "sel AS MATERIALIZED (SELECT events.* FROM events, md " +
        "WHERE event_id % md.m = 0), " +
        "mm AS (SELECT min(value) AS mnv, max(value) AS mxv " +
        "FROM sel), " +
        "pts AS MATERIALIZED (SELECT event_id AS id, " +
        "round((value - mnv) / (mxv - mnv), 6) AS x, " +
        "round((epoch_ms(ts) % 86400000) / 86400000.0, 6) AS y " +
        "FROM sel, mm), " +
        "cell AS MATERIALIZED (SELECT id, x, y, " +
        "floor(x / 0.005)::BIGINT AS cx, " +
        "floor(y / 0.005)::BIGINT AS cy FROM pts), " +
        "nb AS (SELECT c.id, c.x, c.y, c.cx + dx.o AS cx2, " +
        "c.cy + dy.o AS cy2 FROM cell c, " +
        "(SELECT unnest([-1, 0, 1]) AS o) dx, " +
        "(SELECT unnest([-1, 0, 1]) AS o) dy), " +
        "cand AS MATERIALIZED (SELECT a.id AS id, b.id AS id2 " +
        "FROM nb a JOIN cell b ON a.cx2 = b.cx AND a.cy2 = b.cy " +
        "WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) " +
        "<= 0.005 * 0.005), " +
        "deg AS (SELECT id, count(*) AS n FROM cand GROUP BY id), " +
        "core AS MATERIALIZED (SELECT id FROM deg WHERE n >= 5), " +
        "ce AS (SELECT least(c.id, c.id2) AS id_a, " +
        "greatest(c.id, c.id2) AS id_b FROM cand c " +
        "JOIN core k1 ON k1.id = c.id " +
        "JOIN core k2 ON k2.id = c.id2 WHERE c.id != c.id2), " +
        "bidir AS MATERIALIZED (SELECT DISTINCT id_a AS src, " +
        "id_b AS dst FROM ce " +
        "UNION SELECT DISTINCT id_b, id_a FROM ce), " +
        // exact transitive min-label closure — Σ|component|² rows,
        // bounded by the adaptive-modulus input (see scaladoc)
        "reach(id, lbl) AS (SELECT src, src FROM bidir " +
        "UNION SELECT b.dst, r.lbl FROM reach r " +
        "JOIN bidir b ON b.src = r.id), " +
        "comp AS (SELECT id, min(lbl) AS component FROM reach " +
        "GROUP BY id)" +
        ", corelab AS MATERIALIZED (SELECT k.id, " +
        "coalesce(c.component, k.id) AS cluster FROM core k " +
        "LEFT JOIN comp c USING (id)), " +
        "border AS (SELECT c.id, min(cl.cluster) AS cluster " +
        "FROM cand c JOIN corelab cl ON cl.id = c.id2 " +
        "LEFT JOIN core k ON k.id = c.id " +
        "WHERE c.id != c.id2 AND k.id IS NULL GROUP BY c.id), " +
        "lab AS (SELECT p.id, p.x, p.y, " +
        "CASE WHEN cl.cluster IS NOT NULL THEN 'core' " +
        "WHEN b.cluster IS NOT NULL THEN 'border' " +
        "ELSE 'noise' END AS role, " +
        "coalesce(cl.cluster, b.cluster, -1) AS cluster " +
        "FROM pts p LEFT JOIN corelab cl ON cl.id = p.id " +
        "LEFT JOIN border b ON b.id = p.id) " +
        "SELECT cluster, count(*)::BIGINT AS n_points, " +
        "sum(CASE WHEN role = 'core' THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_core, " +
        "sum(CASE WHEN role = 'border' THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_border, " +
        "min(x) AS x_min, max(x) AS x_max, " +
        "min(y) AS y_min, max(y) AS y_max " +
        "FROM lab GROUP BY cluster ORDER BY cluster"))
}
