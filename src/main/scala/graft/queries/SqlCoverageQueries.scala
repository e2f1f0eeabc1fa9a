package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.preprocess.Scaling

/** Second wave of oracle-checked operator coverage: exact distinct
  * aggregates, session windows, JSON extraction, date arithmetic, regex,
  * full-outer and range joins, lag/lead/ntile, exact percentiles, and the
  * reference's intra/inter-cluster mean pairwise distances (A7/A8) in
  * closed form — one aggregation instead of the reference's O(n²)
  * collect-and-loop (`/root/reference/scripts/metrics.py:57-110`).
  */
object SqlCoverageQueries {

  def all: Seq[GraftQuery] = Seq(q52CountDistinct, q53SessionWindows,
    q54JsonExtract, q55DateArith, q56RegexExtract, q57FullOuter,
    q58RangeJoin, q59LagLeadNtile, q60Percentiles, q61IntraClusterDist,
    q62InterClusterDist)

  /** Exact multi-column distinct aggregates (one shuffle, expand-based). */
  val q52CountDistinct: GraftQuery = GraftQuery(
    "q52_count_distinct",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"l_returnflag")
    },
    Some(
      "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_suppkey) AS n_supps, " +
        "count(DISTINCT l_orderkey) AS n_orders " +
        "FROM lineitem GROUP BY 1 ORDER BY l_returnflag"))

  /** Gap-based session windows via the built-in session_window (batch
    * form); oracle = gaps-and-islands SQL. New session when the gap is
    * ≥ 30 minutes (session_window closes at last_ts + gap). */
  val q53SessionWindows: GraftQuery = GraftQuery(
    "q53_session_windows",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum($"value"), 2).as("session_value"))
        .select($"user_id", unix_millis($"session_window.start").as("start_ms"),
          $"n_events", $"session_value")
        .orderBy($"user_id", $"start_ms")
    },
    Some(
      "WITH o AS (SELECT user_id, ts, event_id, value, CASE WHEN " +
        "lag(ts) OVER w IS NULL OR " +
        "ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END " +
        "AS new_s FROM events WINDOW w AS " +
        "(PARTITION BY user_id ORDER BY ts, event_id)), " +
        // cumulative sum in the SAME (ts, event_id) total order as the
        // lag window — a new_s tie-break would misassign a tied boundary
        // row to the previous session
        "g AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sess FROM o) " +
        "SELECT user_id, epoch_ms(min(ts)) AS start_ms, " +
        "count(*) AS n_events, round(sum(value), 2) AS session_value " +
        "FROM g GROUP BY user_id, sess ORDER BY user_id, start_ms"))

  /** JSON path extraction from the string props column. */
  val q54JsonExtract: GraftQuery = GraftQuery(
    "q54_json_extract",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(avg($"k"), 4).as("avg_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some(
      "SELECT event_type, count(*) AS n, " +
        "round(avg(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k, " +
        "max(json_extract_string(props, '$.k')::BIGINT) AS max_k " +
        "FROM events GROUP BY 1 ORDER BY event_type"))

  /** Date arithmetic: ship delay in days per order priority. */
  val q55DateArith: GraftQuery = GraftQuery(
    "q55_date_arith",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .select($"o_orderpriority",
          datediff($"l_shipdate", $"o_orderdate").as("delay"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(avg($"delay"), 4).as("avg_delay"),
          min($"delay").as("min_delay"), max($"delay").as("max_delay"))
        .orderBy($"o_orderpriority")
    },
    Some(
      "SELECT o_orderpriority, count(*) AS n, " +
        "round(avg(datediff('day', o_orderdate, l_shipdate)), 4) AS avg_delay, " +
        "min(datediff('day', o_orderdate, l_shipdate)) AS min_delay, " +
        "max(datediff('day', o_orderdate, l_shipdate)) AS max_delay " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY o_orderpriority"))

  /** Regex extraction + counting (RE2-safe pattern: no lookaround). */
  val q56RegexExtract: GraftQuery = GraftQuery(
    "q56_regex_extract",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey",
          regexp_extract($"p_name", "([a-z]+)", 1).as("first_word"),
          size(split($"p_type", " ")).as("type_words"))
        .orderBy($"p_partkey")
    },
    Some(
      "SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS first_word, " +
        "len(string_split(p_type, ' ')) AS type_words " +
        "FROM part ORDER BY p_partkey"))

  /** Full outer join: suppliers vs customers per nation. */
  val q57FullOuter: GraftQuery = GraftQuery(
    "q57_full_outer",
    (s, d) => {
      import s.implicits._
      val sup = Tables.supplier(s, d).groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      val cust = Tables.customer(s, d).groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      sup.join(cust, Seq("nationkey"), "full_outer")
        .select($"nationkey", coalesce($"n_supp", lit(0L)).as("n_supp"),
          coalesce($"n_cust", lit(0L)).as("n_cust"))
        .orderBy($"nationkey")
    },
    Some(
      "SELECT coalesce(s.nationkey, c.nationkey) AS nationkey, " +
        "coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust FROM " +
        "(SELECT s_nationkey AS nationkey, count(*) AS n_supp " +
        "FROM supplier GROUP BY 1) s FULL OUTER JOIN " +
        "(SELECT c_nationkey AS nationkey, count(*) AS n_cust " +
        "FROM customer GROUP BY 1) c USING (nationkey) ORDER BY nationkey"))

  /** Non-equi (band) range join: similar-size parts per probe part.
    * Realized as explode-to-equi-join: a ±1 integer band is exactly 3
    * discrete target values, so each probe explodes into 3 (key, target)
    * rows and the band condition becomes a hash-joinable equality. A
    * direct `BETWEEN` join plans as a (broadcast) nested loop — O(|L|·|R|)
    * predicate evaluations — while this shape is O(bandwidth·|L| + |R|)
    * through one shuffle, which is what survives when neither side is
    * broadcastable. */
  val q58RangeJoin: GraftQuery = GraftQuery(
    "q58_range_join",
    (s, d) => {
      import s.implicits._
      val p = Tables.part(s, d)
      val targets = p.filter($"p_partkey" % 10 === 0)
        .select($"p_partkey".as("probe_key"),
          explode(array($"p_size" - 1, $"p_size", $"p_size" + 1))
            .as("p_size"))
      targets.join(p, Seq("p_size"))
        .filter($"p_partkey" =!= $"probe_key")
        .groupBy($"probe_key")
        .agg(count(lit(1)).as("n_similar"),
          round(avg($"p_retailprice"), 2).as("avg_price"))
        .orderBy($"probe_key")
    },
    Some(
      "SELECT probe_key, count(*) AS n_similar, " +
        "round(avg(p_retailprice), 2) AS avg_price FROM " +
        "(SELECT p_partkey AS probe_key, p_size AS probe_size FROM part " +
        "WHERE p_partkey % 10 = 0) probes JOIN part " +
        "ON p_size BETWEEN probe_size - 1 AND probe_size + 1 " +
        "AND p_partkey != probe_key " +
        "GROUP BY probe_key ORDER BY probe_key"))

  /** lag/lead/ntile window trio per customer order history. */
  val q59LagLeadNtile: GraftQuery = GraftQuery(
    "q59_lag_lead_ntile",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some(
      "SELECT o_custkey, o_orderkey, " +
        "lag(o_totalprice, 1) OVER w AS prev_price, " +
        "lead(o_totalprice, 1) OVER w AS next_price, " +
        "ntile(4) OVER w AS quartile FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"))

  /** Exact median + interpolated quartile (continuous percentile). */
  val q60Percentiles: GraftQuery = GraftQuery(
    "q60_percentiles",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(round(median($"o_totalprice"), 2).as("med"),
          round(expr("percentile(o_totalprice, 0.25)"), 2).as("q1"),
          round(expr("percentile(o_totalprice, 0.75)"), 2).as("q3"))
        .orderBy($"o_orderstatus")
    },
    Some(
      "SELECT o_orderstatus, round(median(o_totalprice), 2) AS med, " +
        "round(quantile_cont(o_totalprice, 0.25), 2) AS q1, " +
        "round(quantile_cont(o_totalprice, 0.75), 2) AS q3 " +
        "FROM orders GROUP BY 1 ORDER BY o_orderstatus"))

  private val intraCte =
    "WITH bounds AS (SELECT l_returnflag, l_linestatus, " +
      "min(l_quantity) AS qmin, max(l_quantity) AS qmax, " +
      "min(l_extendedprice) AS pmin, max(l_extendedprice) AS pmax " +
      "FROM lineitem GROUP BY 1, 2), " +
      "scaled AS (SELECT l.l_returnflag AS rf, l.l_linestatus AS ls, " +
      "CASE WHEN qmax - qmin > 0 THEN (l_quantity - qmin) / (qmax - qmin) * 100.0 ELSE 0.0 END AS x, " +
      "CASE WHEN pmax - pmin > 0 THEN (l_extendedprice - pmin) / (pmax - pmin) * 100.0 ELSE 0.0 END AS y " +
      "FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag " +
      "AND l.l_linestatus = b.l_linestatus), " +
      "aggs AS (SELECT rf, ls, count(*) AS n, sum(x) AS sx, sum(y) AS sy, " +
      "sum(x*x + y*y) AS ssq FROM scaled GROUP BY 1, 2) "

  /** A7: mean pairwise squared distance within each segment, closed form:
    * Σ_{i≠j}||xi−xj||² = 2n·Σ||xi||² − 2||Σxi||² — ONE aggregation
    * replaces the reference's collect() + O(n²) Python loop
    * (`metrics.py:57-80`), same value (their i<j sum over n(n−1) divisor
    * equals the ordered-pair mean halved... preserved exactly: they
    * divide the i<j sum by n(n−1), i.e. half the ordered-pair mean). */
  val q61IntraClusterDist: GraftQuery = GraftQuery(
    "q61_intra_cluster_dist",
    (s, d) => {
      import s.implicits._
      val scaled = Scaling.scaleSegments(Tables.lineitem(s, d),
        "l_returnflag", "l_linestatus", Seq("l_quantity", "l_extendedprice"))
      val x = col(Scaling.scaledName("l_quantity"))
      val y = col(Scaling.scaledName("l_extendedprice"))
      scaled.groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x + y * y).as("ssq"))
        .select($"l_returnflag", $"l_linestatus", $"n",
          round(($"n" * $"ssq" - ($"sx" * $"sx" + $"sy" * $"sy")) /
            ($"n" * ($"n" - 1)), 4).as("intra_dist"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(intraCte +
      "SELECT rf AS l_returnflag, ls AS l_linestatus, n, " +
        "round((n * ssq - (sx*sx + sy*sy)) / (n * (n - 1)), 4) AS intra_dist " +
        "FROM aggs ORDER BY l_returnflag, l_linestatus"))

  /** A8: mean pairwise squared distance BETWEEN segments (all cross
    * pairs), closed form: Σ_{a,b}||a−b||² = n₂Σ||a||² + n₁Σ||b||² −
    * 2·Σa·Σb — two aggregations replace the reference's double collect()
    * loop (`metrics.py:83-110`). */
  val q62InterClusterDist: GraftQuery = GraftQuery(
    "q62_inter_cluster_dist",
    (s, d) => {
      import s.implicits._
      val scaled = Scaling.scaleSegments(Tables.lineitem(s, d),
        "l_returnflag", "l_linestatus", Seq("l_quantity", "l_extendedprice"))
      val x = col(Scaling.scaledName("l_quantity"))
      val y = col(Scaling.scaledName("l_extendedprice"))
      val aggs = scaled.groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x + y * y).as("ssq"))
      val a = aggs.select($"l_returnflag".as("rf_a"), $"l_linestatus".as("ls_a"),
        $"n".as("na"), $"sx".as("sxa"), $"sy".as("sya"), $"ssq".as("ssqa"))
      val b = aggs.select($"l_returnflag".as("rf_b"), $"l_linestatus".as("ls_b"),
        $"n".as("nb"), $"sx".as("sxb"), $"sy".as("syb"), $"ssq".as("ssqb"))
      a.join(b, $"rf_a" < $"rf_b" || ($"rf_a" === $"rf_b" && $"ls_a" < $"ls_b"))
        .select($"rf_a", $"ls_a", $"rf_b", $"ls_b",
          round(($"nb" * $"ssqa" + $"na" * $"ssqb" -
            lit(2.0) * ($"sxa" * $"sxb" + $"sya" * $"syb")) /
            ($"na" * $"nb"), 4).as("inter_dist"))
        .orderBy($"rf_a", $"ls_a", $"rf_b", $"ls_b")
    },
    Some(intraCte +
      "SELECT a.rf AS rf_a, a.ls AS ls_a, b.rf AS rf_b, b.ls AS ls_b, " +
        "round((b.n * a.ssq + a.n * b.ssq - " +
        "2.0 * (a.sx * b.sx + a.sy * b.sy)) / (a.n * b.n), 4) AS inter_dist " +
        "FROM aggs a JOIN aggs b ON (a.rf < b.rf OR (a.rf = b.rf AND a.ls < b.ls)) " +
        "ORDER BY rf_a, ls_a, rf_b, ls_b"))
}
