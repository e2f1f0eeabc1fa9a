package graft

import org.apache.spark.sql.functions._

/** Fourth SQL-coverage wave — classic warehouse shapes the earlier waves
  * lacked: big-big join with conditional aggregation (TPC-H Q12
  * flavor), the returned-revenue top-k (Q10 flavor), INTERSECT, and a
  * blocked fuzzy join on edit distance. All DuckDB-oracled. */
object AnalyticsQueries {

  def all: Seq[GraftQuery] = Seq(q137ShippingLag, q138ReturnedRevenue,
    q139IntersectYears, q140FuzzyNameMatch, q141ClusterSplit,
    q142RangeFrame, q145JsonExtract, q146NtileLead, q147LinearRegr,
    q149WindowCompleteness)

  /** TPC-H Q12 flavor: lineitem⋈orders with CASE bucketing on the
    * ship-vs-order lag, per priority. The join is big-big (both fact
    * tables) — shuffle hash/SMJ on the order key at scale, AQE may
    * broadcast at test SF; the aggregation rides the same exchange. */
  val q137ShippingLag: GraftQuery = GraftQuery(
    "q137_shipping_lag",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .select($"o_orderpriority",
          datediff($"l_shipdate".cast("date"), $"o_orderdate".cast("date"))
            .as("lag"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(when($"lag" > 60, 1L).otherwise(0L)).as("n_slow"),
          sum(when($"lag" <= 60, 1L).otherwise(0L)).as("n_fast"),
          round(avg($"lag".cast("double")), 4).as("avg_lag"))
        .orderBy($"o_orderpriority")
    },
    Some(
      "SELECT o_orderpriority, count(*) AS n_lines, " +
        "CAST(sum(CASE WHEN lag > 60 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_slow, " +
        "CAST(sum(CASE WHEN lag <= 60 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_fast, " +
        "round(avg(lag::DOUBLE), 4) AS avg_lag FROM (" +
        "SELECT o_orderpriority, date_diff('day', o_orderdate::DATE, " +
        "l_shipdate::DATE) AS lag " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"))

  /** TPC-H Q10 flavor: revenue lost to returned items, top 20
    * customers. Three-table join; revenue = Σ price·(1−discount),
    * rounded before the top-k so both engines rank identical doubles;
    * total order (revenue desc, custkey) makes LIMIT deterministic. */
  val q138ReturnedRevenue: GraftQuery = GraftQuery(
    "q138_returned_revenue",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).filter($"l_returnflag" === "R")
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some(
      "SELECT c_custkey, c_name, " +
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE l_returnflag = 'R' " +
        "GROUP BY c_custkey, c_name " +
        "ORDER BY revenue DESC, c_custkey LIMIT 20"))

  /** INTERSECT set-op (the one set operation the earlier waves lacked):
    * customers active in BOTH 1995 and 1996. Spark plans intersect as
    * a left-semi aggregate join — one shuffle per side. */
  val q139IntersectYears: GraftQuery = GraftQuery(
    "q139_intersect_years",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      o.filter(year($"o_orderdate") === 1995).select($"o_custkey")
        .intersect(
          o.filter(year($"o_orderdate") === 1996).select($"o_custkey"))
        .orderBy($"o_custkey")
    },
    Some(
      "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 " +
        "INTERSECT " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 " +
        "ORDER BY o_custkey"))

  /** Blocked fuzzy join on edit distance: candidate pairs come from an
    * EQUI-join on a blocking key (name length here), then the
    * levenshtein filter runs inside the block — the standard way to
    * fuzzy-match at scale without an all-pairs term (block sizes bound
    * the quadratic locally, exactly like LSH bands bound MinHash). */
  val q140FuzzyNameMatch: GraftQuery = GraftQuery(
    "q140_fuzzy_name_match",
    (s, d) => {
      import s.implicits._
      val n = Tables.nation(s, d)
        .select($"n_name", length($"n_name").as("blk"))
      val a = n.select($"n_name".as("name_a"), $"blk")
      val b = n.select($"n_name".as("name_b"), $"blk")
      a.join(b, "blk")
        .filter($"name_a" < $"name_b")
        .select($"name_a", $"name_b",
          levenshtein($"name_a", $"name_b").as("dist"))
        .filter($"dist" <= 2)
        .orderBy($"name_a", $"name_b")
    },
    Some(
      "SELECT a.n_name AS name_a, b.n_name AS name_b, " +
        "levenshtein(a.n_name, b.n_name) AS dist " +
        "FROM nation a JOIN nation b " +
        "ON length(a.n_name) = length(b.n_name) " +
        "AND a.n_name < b.n_name " +
        "WHERE levenshtein(a.n_name, b.n_name) <= 2 " +
        "ORDER BY name_a, name_b"))

  /** Near-dup-safe split ([[graft.operators.Sampling.clusterKeyedSplit]])
    * over the exact-Jaccard dedup families of the bounded doc_id < 300
    * slice (the q85/q99 edge list, served from the per-JVM artifact
    * cache): every member of a near-dup family takes its
    * REPRESENTATIVE's content-hash split, so paraphrase families never
    * straddle train/eval. Fully oracled — DuckDB replays the shingle
    * Jaccard, the recursive-CTE components, the representative lookup,
    * AND the sha256 split assignment. */
  val q141ClusterSplit: GraftQuery = GraftQuery(
    "q141_cluster_split",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).filter($"doc_id" < 300)
      val comps = graft.operators.Dedup
        .connectedComponents(AnnIndexes.jaccardEdges(s, d))
      graft.operators.Sampling
        .clusterKeyedSplit(docs, "doc_id", "text", comps)
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"rep_id").as("n_clusters"),
          sum(when($"doc_id" =!= $"rep_id", 1L).otherwise(0L))
            .as("n_dup_members"))
        .orderBy($"split")
    },
    Some(
      "WITH RECURSIVE docs AS (SELECT * FROM documents WHERE doc_id < 300), " +
        "sh AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(1, len(string_split(text,' ')) - 2)), " +
        "i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))) " +
        "AS shingles FROM docs), " +
        "edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE / " +
        "len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5), " +
        "bidir AS (SELECT id_a AS src, id_b AS dst FROM edges " +
        "UNION SELECT id_b, id_a FROM edges), " +
        "reach(id, lbl) AS (SELECT src, src FROM bidir " +
        "UNION SELECT b.dst, r.lbl FROM reach r JOIN bidir b ON b.src = r.id), " +
        "comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id), " +
        "rep AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep_id " +
        "FROM docs d LEFT JOIN comp c ON d.doc_id = c.id), " +
        "labeled AS (SELECT r.doc_id, r.rep_id, " +
        "CASE WHEN substr(sha256(t.text), 1, 1) BETWEEN '0' AND '9' " +
        "OR substr(sha256(t.text), 1, 1) IN ('a', 'b') THEN 'train' " +
        "WHEN substr(sha256(t.text), 1, 1) IN ('c', 'd') THEN 'val' " +
        "ELSE 'test' END AS split " +
        "FROM rep r JOIN docs t ON r.rep_id = t.doc_id) " +
        "SELECT split, count(*) AS n_docs, " +
        "count(DISTINCT rep_id) AS n_clusters, " +
        "CAST(sum(CASE WHEN doc_id <> rep_id THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_members " +
        "FROM labeled GROUP BY split ORDER BY split"))

  /** RANGE window frame — the one frame type the ROWS-frame wave (q123)
    * left uncovered: per user, events in the PRECEDING HOUR by event
    * TIME (not row count — gaps matter). Value-range frames are what
    * rate-limit / rolling-exposure features actually need; one shuffle
    * on the partition key, frame evaluation is a per-partition sliding
    * scan. */
  val q142RangeFrame: GraftQuery = GraftQuery(
    "q142_range_frame",
    (s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"es")
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"value",
          unix_seconds($"ts").as("es"))
        .select($"event_id",
          count(lit(1)).over(w).as("n_hour"),
          round(sum($"value").over(w), 2).as("sum_hour"))
        .orderBy($"event_id")
    },
    Some(
      "SELECT event_id, count(*) OVER w AS n_hour, " +
        "round(sum(value) OVER w, 2) AS sum_hour " +
        // floor(), NOT ::BIGINT — DuckDB's double->int cast ROUNDS, so a
        // >=0.5s fraction would shift the frame edge vs Spark's
        // truncating unix_seconds
        "FROM (SELECT event_id, user_id, value, " +
        "floor(epoch(ts))::BIGINT AS es FROM events) " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY es " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"))

  /** JSON extraction over the semi-structured props column — the
    * scalar-function family the other waves left uncovered. Path
    * extraction happens in the scan projection (codegen'd
    * get_json_object), aggregated per event type. */
  val q145JsonExtract: GraftQuery = GraftQuery(
    "q145_json_extract",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          round(avg($"k".cast("double")), 4).as("avg_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some(
      "SELECT event_type, count(*) AS n, " +
        "CAST(sum(k) AS BIGINT) AS sum_k, " +
        "round(avg(k::DOUBLE), 4) AS avg_k, " +
        "min(k) AS min_k, max(k) AS max_k FROM (" +
        "SELECT event_type, " +
        "json_extract_string(props, '$.k')::BIGINT AS k FROM events) " +
        "GROUP BY event_type ORDER BY event_type"))

  /** ntile + lead — the last uncovered window functions: price
    * quartiles within each priority partition (never a global
    * single-partition ntile) crossed with the customer's
    * days-to-next-order from lead(). Both windows carry explicit
    * orderkey tie-breaks so frames are total-ordered on both engines. */
  val q146NtileLead: GraftQuery = GraftQuery(
    "q146_ntile_lead",
    (s, d) => {
      import s.implicits._
      val byPriority = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      val byCust = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_orderpriority", $"o_totalprice",
          ntile(4).over(byPriority).as("quartile"),
          datediff(lead($"o_orderdate", 1).over(byCust).cast("date"),
            $"o_orderdate".cast("date")).as("gap"))
        .groupBy($"o_orderpriority", $"quartile")
        .agg(count(lit(1)).as("n"),
          round(avg($"o_totalprice"), 2).as("avg_price"),
          round(avg($"gap".cast("double")), 4).as("avg_gap"))
        .orderBy($"o_orderpriority", $"quartile")
    },
    Some(
      "SELECT o_orderpriority, quartile, count(*) AS n, " +
        "round(avg(o_totalprice), 2) AS avg_price, " +
        "round(avg(gap::DOUBLE), 4) AS avg_gap FROM (" +
        "SELECT o_orderpriority, o_totalprice, " +
        "ntile(4) OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey) AS quartile, " +
        "date_diff('day', o_orderdate::DATE, " +
        "lead(o_orderdate) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey)::DATE) AS gap FROM orders) " +
        "GROUP BY o_orderpriority, quartile " +
        "ORDER BY o_orderpriority, quartile"))

  /** Linear-regression aggregates (regr_*) — one-pass distributed OLS
    * per group, the completion of q76's moment family: price-vs-
    * quantity slope, intercept, fit quality, and pair count per return
    * flag. */
  val q147LinearRegr: GraftQuery = GraftQuery(
    "q147_linear_regr",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag".as("rf"),
          $"l_extendedprice".cast("double").as("y"),
          $"l_quantity".cast("double").as("x"))
        .groupBy($"rf")
        .agg(round(regr_slope($"y", $"x"), 4).as("slope"),
          round(regr_intercept($"y", $"x"), 4).as("intercept"),
          round(regr_r2($"y", $"x"), 6).as("r2"),
          regr_count($"y", $"x").as("n_pairs"))
        .orderBy($"rf")
    },
    Some(
      "SELECT l_returnflag AS rf, " +
        "round(regr_slope(l_extendedprice::DOUBLE, l_quantity::DOUBLE), 4) " +
        "AS slope, " +
        "round(regr_intercept(l_extendedprice::DOUBLE, " +
        "l_quantity::DOUBLE), 4) AS intercept, " +
        "round(regr_r2(l_extendedprice::DOUBLE, l_quantity::DOUBLE), 6) " +
        "AS r2, " +
        // DuckDB regr_count returns UINTEGER — cast to the BIGINT the
        // Spark side produces
        "regr_count(l_extendedprice::DOUBLE, l_quantity::DOUBLE)::BIGINT " +
        "AS n_pairs FROM lineitem GROUP BY 1 ORDER BY rf"))

  /** Window/aggregate completeness wave: `lag`/`lead` with IGNORE NULLS
    * (per-row, over a column where every 3rd value is nulled — the
    * gap-carry-forward shape of sensor/event streams), plus
    * `percentile_disc` (WITHIN GROUP) and `mode` per priority joined
    * back onto the rows. Bounded to o_orderkey < 5000 so the per-row
    * output stays small at every SF while still crossing many null
    * gaps per partition. mode ties are structurally absent
    * (o_orderstatus counts per priority differ by orders of
    * magnitude); percentile_disc picks an actual element, so both
    * engines return the identical double. */
  val q149WindowCompleteness: GraftQuery = GraftQuery(
    "q149_window_completeness",
    (s, d) => {
      import s.implicits._
      val t = Tables.orders(s, d).filter($"o_orderkey" < 5000)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority").orderBy($"o_orderkey")
      val rows = t
        .select($"o_orderkey", $"o_orderpriority",
          when($"o_orderkey" % 3 === 0, lit(null).cast("double"))
            .otherwise(round($"o_totalprice", 2)).as("v"))
        .withColumn("prev_v", lag($"v", 1, null, ignoreNulls = true).over(w))
        .withColumn("next_v", lead($"v", 1, null, ignoreNulls = true).over(w))
      val agg = t.groupBy($"o_orderpriority")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP " +
            "(ORDER BY o_totalprice)").as("med_raw"),
          expr("mode(o_orderstatus)").as("status_mode"))
        .select($"o_orderpriority", round($"med_raw", 2).as("med"),
          $"status_mode")
      rows.join(agg, "o_orderpriority")
        .select($"o_orderkey", $"o_orderpriority", $"v", $"prev_v",
          $"next_v", $"med", $"status_mode")
        .orderBy($"o_orderkey")
    },
    Some(
      "WITH t AS (SELECT * FROM orders WHERE o_orderkey < 5000), " +
        "r AS (SELECT o_orderkey, o_orderpriority, " +
        "CASE WHEN o_orderkey % 3 = 0 THEN NULL " +
        "ELSE round(o_totalprice, 2) END AS v FROM t), " +
        "wnd AS (SELECT o_orderkey, o_orderpriority, v, " +
        "lag(v IGNORE NULLS) OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_orderkey) AS prev_v, " +
        "lead(v IGNORE NULLS) OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_orderkey) AS next_v FROM r), " +
        "a AS (SELECT o_orderpriority, " +
        "round(percentile_disc(0.5) WITHIN GROUP " +
        "(ORDER BY o_totalprice), 2) AS med, " +
        "mode(o_orderstatus) AS status_mode FROM t " +
        "GROUP BY o_orderpriority) " +
        "SELECT w.o_orderkey, w.o_orderpriority, w.v, w.prev_v, " +
        "w.next_v, a.med, a.status_mode " +
        "FROM wnd w JOIN a USING (o_orderpriority) ORDER BY o_orderkey"))
}
