package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic relational operators over the TPC-H-ish testdata.
  *
  * Coverage of SURVEY.md §2: scans (S1), projections/filters/derived
  * columns (P1–P4), joins (§2.3 incl. the broadcast left join that replaces
  * the reference's driver-side k-dict lookup, `scripts/cluster.py:98-128`),
  * aggregations (A1–A3, A5 entropy formula), windows (§2.5 extension),
  * sorts/limits/top-k (O1–O3), set ops (§2.7), scalar functions (F1–F8).
  *
  * Scale notes are inline: every join states its broadcast decision, every
  * aggregation is a single shuffle, and the min–max scaling (P4) uses the
  * agg-then-broadcast-join-back pattern instead of an unbounded window so
  * the plan survives 100 TB inputs.
  */
object RelationalQueries {

  def all: Seq[GraftQuery] = Seq(
    q01PricingSummary, q02FilterProject, q03JoinBroadcastAgg,
    q04MultiJoinAgg, q05WindowTopK, q06TopNOrders, q07DistinctFlags,
    q08ExceptCustomers, q09SemiJoin, q10AntiJoin, q11ScalarFuncs,
    q12DateParts, q13MinMaxScale, q14Entropy, q15EventsHourly,
    q16RollupAgg, q17CaseAggPivot, q18RunningWindow, q19UnionAll,
    q116QualityGate)

  /** A1/A2 fused multi-aggregate, one shuffle (TPC-H Q1 shape). */
  val q01PricingSummary: GraftQuery = GraftQuery(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(
      "SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity),2) AS sum_qty, " +
        "round(sum(l_extendedprice),2) AS sum_base_price, " +
        "round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price, " +
        "round(avg(l_quantity),4) AS avg_qty, " +
        "round(avg(l_discount),4) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"))

  /** P1/P2: predicate + projection, both pushed into the parquet scan. */
  val q02FilterProject: GraftQuery = GraftQuery(
    "q02_filter_project",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_returnflag" === "R" && $"l_discount" > 0.05)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some(
      "SELECT l_orderkey, l_linenumber, l_quantity, l_discount " +
        "FROM lineitem WHERE l_returnflag = 'R' AND l_discount > 0.05 " +
        "ORDER BY l_orderkey, l_linenumber"))

  /** Join with an explicitly broadcast dimension (customer is always the
    * small side at scale: dims grow slower than facts). */
  val q03JoinBroadcastAgg: GraftQuery = GraftQuery(
    "q03_join_broadcast_agg",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(round(sum($"o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"c_mktsegment")
    },
    Some(
      "SELECT c_mktsegment, round(sum(o_totalprice),2) AS revenue, " +
        "count(*) AS n_orders " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"))

  /** Fact-fact shuffle join (lineitem⋈orders, AQE-planned) followed by
    * broadcast dims — the 100 TB-safe join ordering. */
  val q04MultiJoinAgg: GraftQuery = GraftQuery(
    "q04_multi_join_agg",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = broadcast(Tables.customer(s, d))
      val n  = broadcast(Tables.nation(s, d))
      val r  = broadcast(Tables.region(s, d))
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(n, $"c_nationkey" === $"n_nationkey")
        .join(r, $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"r_name", $"n_name")
    },
    Some(
      "SELECT r_name, n_name, " +
        "round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, " +
        "count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"))

  /** Top-k per key via ranking window — single shuffle on the partition
    * key; deterministic tie-break on o_orderkey. */
  val q05WindowTopK: GraftQuery = GraftQuery(
    "q05_window_topk",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
        .orderBy($"o_custkey", $"rk")
    },
    Some(
      "SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) " +
        "WHERE rk <= 3 ORDER BY o_custkey, rk"))

  /** Global top-N: Spark plans TakeOrderedAndProject (per-partition heap +
    * driver merge of N rows), no full sort at scale. */
  val q06TopNOrders: GraftQuery = GraftQuery(
    "q06_topn_orders",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },
    Some(
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"))

  /** A3: distinct = hash aggregate, one shuffle on the distinct key. */
  val q07DistinctFlags: GraftQuery = GraftQuery(
    "q07_distinct_flags",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "ORDER BY l_returnflag, l_linestatus"))

  /** Set difference (EXCEPT = distinct anti semantics in both engines):
    * users who purchased but never hit an error. */
  val q08ExceptCustomers: GraftQuery = GraftQuery(
    "q08_except_users",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      ev.filter($"event_type" === "purchase")
        .select($"user_id")
        .except(ev.filter($"event_type" === "error").select($"user_id"))
        .orderBy($"user_id")
    },
    Some(
      "SELECT user_id FROM (" +
        "SELECT user_id FROM events WHERE event_type = 'purchase' " +
        "EXCEPT SELECT user_id FROM events WHERE event_type = 'error') " +
        "ORDER BY user_id"))

  /** Left-semi join (EXISTS) — no payload duplication, broadcastable. */
  val q09SemiJoin: GraftQuery = GraftQuery(
    "q09_semi_join",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some(
      "SELECT c_custkey, c_name FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "ORDER BY c_custkey"))

  /** Left-anti join (NOT EXISTS): customers with no high-value order. */
  val q10AntiJoin: GraftQuery = GraftQuery(
    "q10_anti_join",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter($"o_totalprice" > 400000.0)
            .select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    },
    Some(
      "SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders " +
        "WHERE o_custkey = c_custkey AND o_totalprice > 400000.0) " +
        "ORDER BY c_custkey"))

  /** F1–F7: string/math/conditional scalar functions, all codegen'd
    * built-ins (no UDFs → stays inside WholeStageCodegen). */
  val q11ScalarFuncs: GraftQuery = GraftQuery(
    "q11_scalar_funcs",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d).select(
        $"p_partkey",
        upper($"p_brand").as("brand_u"),
        substring($"p_name", 1, 8).as("name_pfx"),
        length($"p_name").as("name_len"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        when($"p_size" > 25, lit("big")).otherwise(lit("small"))
          .as("size_class"),
        round($"p_retailprice" * 1.1, 2).as("uplift"))
        .orderBy($"p_partkey")
    },
    Some(
      "SELECT p_partkey, upper(p_brand) AS brand_u, " +
        "substr(p_name,1,8) AS name_pfx, length(p_name) AS name_len, " +
        "concat_ws('|', p_brand, p_type) AS brand_type, " +
        "CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class, " +
        "round(p_retailprice*1.1,2) AS uplift " +
        "FROM part ORDER BY p_partkey"))

  /** F6/F8: date-part extraction + aggregation. */
  val q12DateParts: GraftQuery = GraftQuery(
    "q12_date_parts",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy(year($"o_orderdate").as("o_year"),
          quarter($"o_orderdate").as("o_quarter"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("revenue"))
        .orderBy($"o_year", $"o_quarter")
    },
    Some(
      "SELECT year(o_orderdate) AS o_year, quarter(o_orderdate) AS o_quarter, " +
        "count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue " +
        "FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter"))

  /** P4/A1: the reference's min–max scaling (`scripts/preprocess.py:91-106`)
    * incl. the max==min → 0.0 branch, as agg + broadcast join-back (NOT an
    * unbounded window: bounds are #groups rows, the rescan is one pass). */
  val q13MinMaxScale: GraftQuery = GraftQuery(
    "q13_minmax_scale",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val bounds = li.groupBy($"l_returnflag")
        .agg(min($"l_quantity").as("q_min"), max($"l_quantity").as("q_max"))
      li.join(broadcast(bounds), "l_returnflag")
        .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
          round(
            when($"q_max" === $"q_min", lit(0.0))
              .otherwise(($"l_quantity" - $"q_min") /
                ($"q_max" - $"q_min") * 100.0), 4).as("q_scaled"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some(
      "WITH bounds AS (SELECT l_returnflag, min(l_quantity) AS q_min, " +
        "max(l_quantity) AS q_max FROM lineitem GROUP BY 1) " +
        "SELECT l_orderkey, l_linenumber, l.l_returnflag, " +
        "round(CASE WHEN q_max = q_min THEN 0.0 " +
        "ELSE (l_quantity - q_min) / (q_max - q_min) * 100.0 END, 4) " +
        "AS q_scaled " +
        "FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag " +
        "ORDER BY l_orderkey, l_linenumber"))

  /** A5: Shannon entropy of group sizes, base 2 (reference formula
    * `scripts/metrics.py:113-137` with base fixed at
    * `scripts/cluster.py:145`) — groupBy then a 1-row reduce, never k+1
    * count jobs like the reference. */
  val q14Entropy: GraftQuery = GraftQuery(
    "q14_entropy",
    (s, d) => {
      import s.implicits._
      val counts = Tables.events(s, d)
        .groupBy($"event_type")
        .agg(count(lit(1)).cast("double").as("c"))
      val total = counts.agg(sum($"c").as("t"))
      counts.crossJoin(broadcast(total))
        .agg(round(sum(-($"c" / $"t") * log2($"c" / $"t")), 6).as("entropy"))
    },
    Some(
      "WITH counts AS (SELECT event_type, count(*)::DOUBLE AS c " +
        "FROM events GROUP BY 1), t AS (SELECT sum(c) AS t FROM counts) " +
        "SELECT round(sum(-(c/t)*log2(c/t)), 6) AS entropy FROM counts, t"))

  /** Event-time tumbling window aggregation (batch form of the streaming
    * pipeline in graft.streaming); epoch-millis keys for oracle parity. */
  val q15EventsHourly: GraftQuery = GraftQuery(
    "q15_events_hourly",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .select(unix_millis($"hr").as("hr_ms"), $"event_type", $"n",
          $"sum_value")
        .orderBy($"hr_ms", $"event_type")
    },
    Some(
      "SELECT epoch_ms(date_trunc('hour', ts)) AS hr_ms, event_type, " +
        "count(*) AS n, round(sum(value),2) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY hr_ms, event_type"))

  /** Rollup (grouping sets) with grouping-id disambiguation. */
  val q16RollupAgg: GraftQuery = GraftQuery(
    "q16_rollup_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"n", $"qty")
        .orderBy($"rf", $"ls")
    },
    Some(
      "SELECT coalesce(l_returnflag,'ALL') AS rf, " +
        "coalesce(l_linestatus,'ALL') AS ls, count(*) AS n, " +
        "round(sum(l_quantity),2) AS qty " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
        "ORDER BY rf, ls"))

  /** Pivot via conditional aggregation (engine-portable PIVOT shape). */
  val q17CaseAggPivot: GraftQuery = GraftQuery(
    "q17_case_agg_pivot",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(sum(when($"l_linestatus" === "F", $"l_quantity")
            .otherwise(lit(0.0))), 2).as("qty_f"),
          round(sum(when($"l_linestatus" === "O", $"l_quantity")
            .otherwise(lit(0.0))), 2).as("qty_o"))
        .orderBy($"l_returnflag")
    },
    Some(
      "SELECT l_returnflag, " +
        "round(sum(CASE WHEN l_linestatus='F' THEN l_quantity ELSE 0.0 END),2) AS qty_f, " +
        "round(sum(CASE WHEN l_linestatus='O' THEN l_quantity ELSE 0.0 END),2) AS qty_o " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))

  /** Frame-based running aggregate (rows unbounded-preceding..current). */
  val q18RunningWindow: GraftQuery = GraftQuery(
    "q18_running_window",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total", round(sum($"o_totalprice").over(w), 2))
        .select($"o_custkey", $"o_orderkey", $"running_total")
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some(
      "SELECT o_custkey, o_orderkey, " +
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) " +
        "AS running_total " +
        "FROM orders ORDER BY o_custkey, o_orderkey"))

  /** UNION ALL of heterogeneous sources aligned to a common schema. */
  val q19UnionAll: GraftQuery = GraftQuery(
    "q19_union_all",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
        .select(lit("customer").as("src"), $"c_custkey".as("id"),
          $"c_acctbal".as("bal"))
      val su = Tables.supplier(s, d)
        .select(lit("supplier").as("src"), $"s_suppkey".as("id"),
          $"s_acctbal".as("bal"))
      c.unionAll(su).orderBy($"src", $"id")
    },
    Some(
      "SELECT * FROM (" +
        "SELECT 'customer' AS src, c_custkey AS id, c_acctbal AS bal " +
        "FROM customer " +
        "UNION ALL " +
        "SELECT 'supplier' AS src, s_suppkey AS id, s_acctbal AS bal " +
        "FROM supplier) ORDER BY src, id"))

  /** Data-quality gate ([[graft.operators.Profiler]]): five declarative
    * validity rules over lineitem evaluated in ONE aggregation pass
    * (2·rules+1 accumulators, one scan, no shuffle beyond the final
    * single row) — the ingest "expectations" report of a production
    * pipeline. The oracle recomputes each rule as its own aggregate. */
  val q116QualityGate: GraftQuery = GraftQuery(
    "q116_quality_gate",
    (s, d) => {
      import s.implicits._
      import graft.operators.Profiler
      import graft.operators.Profiler.Rule
      Profiler.check(Tables.lineitem(s, d), Seq(
          // nullif makes the rule expression NULL for zero-discount rows,
          // so the oracle exercises n_null > 0 (not just the spec)
          Rule("disc_nonzero", nullif($"l_discount", lit(0.0)) > 0.0),
          Rule("disc_range", $"l_discount" >= 0.0 && $"l_discount" <= 0.1),
          Rule("flag_domain", $"l_returnflag".isin("A", "N", "R")),
          Rule("price_pos", $"l_extendedprice" > 0.0),
          Rule("qty_range", $"l_quantity" >= 1.0 && $"l_quantity" <= 50.0),
          Rule("ship_not_null", $"l_shipdate".isNotNull)))
        .orderBy($"rule")
    },
    // every sum(CASE ...) is cast ::BIGINT: DuckDB sum() returns HUGEINT
    // and UNION ALL type-unifies a column to the widest branch type, so a
    // single uncast branch silently flips the whole column to HUGEINT and
    // fails the driver's typed hash compare (the round-1 q82 trap)
    Some(
      "SELECT 'disc_nonzero' AS rule, count(*) AS n_rows, " +
        "sum(CASE WHEN (nullif(l_discount, 0.0) > 0.0) " +
        "IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null, " +
        "sum(CASE WHEN NOT (nullif(l_discount, 0.0) > 0.0) " +
        "THEN 1 ELSE 0 END)::BIGINT AS n_violations FROM lineitem " +
        "UNION ALL SELECT 'disc_range', count(*), " +
        "sum(CASE WHEN (l_discount >= 0.0 AND l_discount <= 0.1) " +
        "IS NULL THEN 1 ELSE 0 END)::BIGINT, " +
        "sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.1) " +
        "THEN 1 ELSE 0 END)::BIGINT FROM lineitem " +
        "UNION ALL SELECT 'flag_domain', count(*), " +
        "sum(CASE WHEN (l_returnflag IN ('A','N','R')) IS NULL " +
        "THEN 1 ELSE 0 END)::BIGINT, " +
        "sum(CASE WHEN NOT (l_returnflag IN ('A','N','R')) " +
        "THEN 1 ELSE 0 END)::BIGINT FROM lineitem " +
        "UNION ALL SELECT 'price_pos', count(*), " +
        "sum(CASE WHEN (l_extendedprice > 0.0) IS NULL THEN 1 ELSE 0 END)::BIGINT, " +
        "sum(CASE WHEN NOT (l_extendedprice > 0.0) THEN 1 ELSE 0 END)::BIGINT " +
        "FROM lineitem " +
        "UNION ALL SELECT 'qty_range', count(*), " +
        "sum(CASE WHEN (l_quantity >= 1.0 AND l_quantity <= 50.0) " +
        "IS NULL THEN 1 ELSE 0 END)::BIGINT, " +
        "sum(CASE WHEN NOT (l_quantity >= 1.0 AND l_quantity <= 50.0) " +
        "THEN 1 ELSE 0 END)::BIGINT FROM lineitem " +
        "UNION ALL SELECT 'ship_not_null', count(*), " +
        "sum(CASE WHEN (l_shipdate IS NOT NULL) IS NULL " +
        "THEN 1 ELSE 0 END)::BIGINT, " +
        "sum(CASE WHEN NOT (l_shipdate IS NOT NULL) THEN 1 ELSE 0 END)::BIGINT " +
        "FROM lineitem ORDER BY rule"))
}
