package graft

import org.apache.spark.sql.functions._

/** Third coverage wave: cube grouping sets, explode/unnest, and a
  * correlated-subquery shape decorrelated into the join+window form that
  * scales (compute the per-group aggregate once, join back broadcast).
  */
object SqlCoverageQueries2 {

  def all: Seq[GraftQuery] = Seq(q67Cube, q68ExplodeUnnest,
    q69AboveCustomerAvg, q70CollectList, q71Unpivot, q72FirstLast,
    q74ManySegments, q75BoolAggs, q76StatsAggs, q77TopKAgg,
    q87GroupingId, q190SegmentEngineOracled,
    q205SegmentDistributedOracled)

  /** CUBE over two dimensions with grouping-id disambiguation. */
  val q67Cube: GraftQuery = GraftQuery(
    "q67_cube",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("rev"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"rev")
        .orderBy($"status", $"priority")
    },
    Some(
      "SELECT coalesce(o_orderstatus, 'ALL') AS status, " +
        "coalesce(o_orderpriority, 'ALL') AS priority, " +
        "count(*) AS n, round(sum(o_totalprice), 2) AS rev " +
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
        "ORDER BY status, priority"))

  /** Generator/unnest: explode tokens with position, re-aggregate. */
  val q68ExplodeUnnest: GraftQuery = GraftQuery(
    "q68_explode_unnest",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d).filter($"doc_id" < 50)
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", $"pos", $"col".as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("first_doc"),
          min($"pos").as("min_pos"))
        .filter($"n" >= 10)
        .orderBy($"token")
    },
    Some(
      "SELECT token, count(*) AS n, min(doc_id) AS first_doc, " +
        "min(pos) AS min_pos FROM (" +
        "SELECT doc_id, u.token AS token, u.pos AS pos FROM (" +
        "SELECT doc_id, unnest(list_transform(string_split(text, ' '), " +
        "(t, i) -> struct_pack(token := t, pos := i - 1))) AS u " +
        "FROM documents WHERE doc_id < 50)) " +
        "GROUP BY token HAVING count(*) >= 10 ORDER BY token"))

  /** "Orders above their customer's average" — the correlated-subquery
    * classic, decorrelated: one groupBy for the per-customer mean,
    * broadcast join-back, filter. Same rows as the correlated form. */
  val q69AboveCustomerAvg: GraftQuery = GraftQuery(
    "q69_above_customer_avg",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val avgs = o.groupBy($"o_custkey").agg(avg($"o_totalprice").as("cavg"))
      // the averaged value itself is not emitted: engines sum doubles in
      // different orders, and a last-ulp difference at a .xx5 boundary
      // flips round(avg, 2) — membership under the > filter is the test
      o.join(broadcast(avgs), Seq("o_custkey"))
        .filter($"o_totalprice" > $"cavg")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some(
      "SELECT o_custkey, o_orderkey, o_totalprice FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg " +
        "FROM orders) WHERE o_totalprice > cavg " +
        "ORDER BY o_custkey, o_orderkey"))

  /** Ordered collect_list rendered as a string (array surface kept
    * engine-portable for the hash compare). */
  val q70CollectList: GraftQuery = GraftQuery(
    "q70_collect_list",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(concat_ws(",",
          array_sort(collect_set($"l_linestatus"))).as("statuses"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },
    Some(
      "SELECT l_returnflag, array_to_string(list_sort(" +
        "list_distinct(list(l_linestatus))), ',') AS statuses, " +
        "count(*) AS n FROM lineitem GROUP BY 1 ORDER BY l_returnflag"))

  /** Unpivot (wide→long): acctbal columns of two entity kinds stacked. */
  val q71Unpivot: GraftQuery = GraftQuery(
    "q71_unpivot",
    (s, d) => {
      import s.implicits._
      val wide = Tables.customer(s, d)
        .select($"c_custkey".as("id"), $"c_acctbal".as("bal_now"),
          ($"c_acctbal" * 2.0).as("bal_proj")) // 2x is exact in binary —
          // a 1.1x projection would mint .xx5 halves where engines'
          // rounding diverges
        .filter($"id" <= 50)
      wide.unpivot(Array($"id"), Array($"bal_now", $"bal_proj"),
          "measure", "value")
        .orderBy($"id", $"measure")
    },
    Some(
      "SELECT id, measure, value FROM (" +
        "SELECT c_custkey AS id, c_acctbal AS bal_now, " +
        "c_acctbal * 2 AS bal_proj FROM customer " +
        "WHERE c_custkey <= 50) " +
        "UNPIVOT (value FOR measure IN (bal_now, bal_proj)) " +
        "ORDER BY id, measure"))

  /** first_value / last_value over an explicit full frame. */
  val q72FirstLast: GraftQuery = GraftQuery(
    "q72_first_last",
    (s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          first($"o_totalprice").over(w).as("first_price"),
          last($"o_totalprice").over(w).as("last_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some(
      "SELECT o_custkey, o_orderkey, " +
        "first_value(o_totalprice) OVER w AS first_price, " +
        "last_value(o_totalprice) OVER w AS last_price " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey"))

  /** Many-segment engine stress: ~500 (event_type × user-bucket) segments
    * with the full k-search, still one shuffle (rows-only; the BENCH
    * number is the point — segment count does not multiply job count). */
  val q74ManySegments: GraftQuery = GraftQuery(
    "q74_cluster_many_segments",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("bucket", ($"user_id" % 100).cast("string"))
        .withColumn("ts_sec", unix_timestamp($"ts").cast("double"))
      val res = graft.engine.ClusterEngine.run(ev, graft.engine.EngineConf(
        macroCol = "event_type", microCol = "bucket",
        xCol = "value", yCol = "ts_sec",
        startK = 2, stopK = 4, iterNum = 1, seed = 42L))
      res.select(col("macroId"), col("microId"), col("k"),
        round(col("silhouette"), 4).as("silhouette"))
        .orderBy(col("macroId"), col("microId"))
    })

  /** The segmentation ENGINE path with a green row — G1/G2's first
    * oracled face (q74's full k-search production path stays
    * rows-only): [[graft.engine.ClusterEngine.runNdReplayable]] drives
    * the SAME one-shuffle pipeline — per-(event_type × user-parity)
    * three-way min–max scaling, `groupByKey.flatMapGroups`
    * segmentation, in-task lexicographic sort — with the quantized
    * first-k-distinct Lloyd kernel, and DuckDB replays ALL of it:
    * the scaling arithmetic, the segment row_number order, the
    * ≥2-distinct guard, the init selection, three Lloyd rounds and
    * every final per-event assignment + distance. */
  val q190SegmentEngineOracled: GraftQuery = GraftQuery(
    "q190_segment_engine_oracled",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("bucket", ($"user_id" % 2).cast("string"))
        .withColumn("uval", ($"user_id" % 97).cast("double"))
      graft.engine.ClusterEngine.runNdReplayable(ev,
          "event_type", "bucket", Seq("value", "uval"), "event_id",
          k = 2, iterations = 3)
        .select($"ma".as("macro_id"), $"mi".as("micro_id"),
          $"id".as("event_id"), $"cluster", round($"d2", 6).as("d2"))
        .orderBy($"macro_id", $"micro_id", $"event_id")
    },
    Some {
      val rounds = (1 to 3).map { r =>
        val prev = if (r == 1) "c0" else s"c${r - 1}"
        s", s$r AS (SELECT p.ma, p.mi, p.rn, p.id, p.x, p.y, c.c, " +
          "(p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy) " +
          s"AS d2 FROM p0 p JOIN $prev c ON c.ma = p.ma AND c.mi = p.mi)" +
          s", a$r AS (SELECT ma, mi, rn, id, x, y, c FROM (SELECT *, " +
          "row_number() OVER (PARTITION BY ma, mi, rn ORDER BY d2, c) " +
          s"AS rk FROM s$r) WHERE rk = 1)" +
          s", c$r AS (SELECT ma, mi, c, round(avg(x), 6) AS cx, " +
          s"round(avg(y), 6) AS cy FROM a$r GROUP BY ma, mi, c)"
      }.mkString
      "WITH e AS (SELECT event_type AS ma, (user_id % 2)::VARCHAR AS mi, " +
        "event_id AS id, value::DOUBLE AS x0, " +
        "(user_id % 97)::DOUBLE AS y0 FROM events " +
        "WHERE value IS NOT NULL AND user_id IS NOT NULL), " +
        "b AS (SELECT ma, mi, min(x0) AS mnx, max(x0) AS mxx, " +
        "min(y0) AS mny, max(y0) AS mxy FROM e GROUP BY ma, mi), " +
        "sc AS (SELECT e.ma, e.mi, e.id, " +
        "CASE WHEN b.mxx - b.mnx > 0 THEN " +
        "(e.x0 - b.mnx) / (b.mxx - b.mnx) * 100.0 ELSE 0.0 END AS x, " +
        "CASE WHEN b.mxy - b.mny > 0 THEN " +
        "(e.y0 - b.mny) / (b.mxy - b.mny) * 100.0 ELSE 0.0 END AS y " +
        "FROM e JOIN b USING (ma, mi)), " +
        "p1 AS MATERIALIZED (SELECT *, row_number() OVER " +
        "(PARTITION BY ma, mi ORDER BY x, y, id) AS rn FROM sc), " +
        "d0 AS (SELECT *, row_number() OVER " +
        "(PARTITION BY ma, mi, x, y ORDER BY rn) AS dup FROM p1), " +
        "ok AS (SELECT ma, mi FROM d0 WHERE dup = 1 GROUP BY ma, mi " +
        "HAVING count(*) >= 2), " +
        "p0 AS MATERIALIZED (SELECT p1.* FROM p1 JOIN ok " +
        "USING (ma, mi)), " +
        "c0 AS (SELECT ma, mi, rn AS c, x AS cx, y AS cy FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY ma, mi " +
        "ORDER BY rn) AS ck FROM d0 WHERE dup = 1) WHERE ck <= 2)" +
        rounds +
        ", sf AS (SELECT p.ma, p.mi, p.rn, p.id, c.c, " +
        "(p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy) " +
        "AS d2 FROM p0 p JOIN c3 c ON c.ma = p.ma AND c.mi = p.mi) " +
        "SELECT ma AS macro_id, mi AS micro_id, id AS event_id, " +
        "c AS cluster, round(d2, 6) AS d2 FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY ma, mi, rn ORDER BY d2, c) " +
        "AS rk FROM sf) WHERE rk = 1 " +
        "ORDER BY macro_id, micro_id, event_id"
    })

  /** The HUGE-segment regime with a green row
    * ([[graft.engine.ClusterEngine.runGroupedReplayable]]): per-segment
    * k-means where a segment does NOT fit one task — the segment key
    * becomes the group of a grouped distributed Lloyd
    * (`DistributedKMeans.fitGrouped`), so all segments fit in one
    * scan+shuffle per round and nothing is collected. Same input shape
    * as q190 (event_type × user-parity segments, scaled (value, uval)
    * metrics) so the two regimes' faces are directly comparable; the
    * kernel differs per the q158 contract (init = first k points BY ID
    * per segment — no lex sort, no distinct guard: a starved twin
    * centroid drops instead). DuckDB replays scaling, per-segment init,
    * three rounds and every final assignment. */
  val q205SegmentDistributedOracled: GraftQuery = GraftQuery(
    "q205_segment_distributed_oracled",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("bucket", ($"user_id" % 2).cast("string"))
        .withColumn("uval", ($"user_id" % 97).cast("double"))
      graft.engine.ClusterEngine.runGroupedReplayable(ev,
          "event_type", "bucket", Seq("value", "uval"), "event_id",
          k = 2, iterations = 3)
        .select($"ma".as("macro_id"), $"mi".as("micro_id"),
          $"id".as("event_id"), $"cluster", round($"d2", 6).as("d2"))
        .orderBy($"macro_id", $"micro_id", $"event_id")
    },
    Some {
      val rounds = (1 to 3).map { r =>
        val prev = if (r == 1) "c0" else s"c${r - 1}"
        s", s$r AS (SELECT p.ma, p.mi, p.id, p.x, p.y, c.c, " +
          "(p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy) " +
          s"AS d2 FROM p0 p JOIN $prev c ON c.ma = p.ma AND c.mi = p.mi)" +
          s", a$r AS (SELECT ma, mi, id, x, y, c FROM (SELECT *, " +
          "row_number() OVER (PARTITION BY ma, mi, id ORDER BY d2, c) " +
          s"AS rk FROM s$r) WHERE rk = 1)" +
          s", c$r AS (SELECT ma, mi, c, round(avg(x), 6) AS cx, " +
          s"round(avg(y), 6) AS cy FROM a$r GROUP BY ma, mi, c)"
      }.mkString
      "WITH e AS (SELECT event_type AS ma, (user_id % 2)::VARCHAR AS mi, " +
        "event_id AS id, value::DOUBLE AS x0, " +
        "(user_id % 97)::DOUBLE AS y0 FROM events " +
        "WHERE value IS NOT NULL AND user_id IS NOT NULL), " +
        "b AS (SELECT ma, mi, min(x0) AS mnx, max(x0) AS mxx, " +
        "min(y0) AS mny, max(y0) AS mxy FROM e GROUP BY ma, mi), " +
        "p0 AS MATERIALIZED (SELECT e.ma, e.mi, e.id, " +
        "CASE WHEN b.mxx - b.mnx > 0 THEN " +
        "(e.x0 - b.mnx) / (b.mxx - b.mnx) * 100.0 ELSE 0.0 END AS x, " +
        "CASE WHEN b.mxy - b.mny > 0 THEN " +
        "(e.y0 - b.mny) / (b.mxy - b.mny) * 100.0 ELSE 0.0 END AS y " +
        "FROM e JOIN b USING (ma, mi)), " +
        "c0 AS (SELECT ma, mi, id AS c, x AS cx, y AS cy FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY ma, mi " +
        "ORDER BY id) AS rn FROM p0) WHERE rn <= 2)" +
        rounds +
        ", sf AS (SELECT p.ma, p.mi, p.id, c.c, " +
        "(p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy) " +
        "AS d2 FROM p0 p JOIN c3 c ON c.ma = p.ma AND c.mi = p.mi) " +
        "SELECT ma AS macro_id, mi AS micro_id, id AS event_id, " +
        "c AS cluster, round(d2, 6) AS d2 FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY ma, mi, id ORDER BY d2, c) " +
        "AS rk FROM sf) WHERE rk = 1 " +
        "ORDER BY macro_id, micro_id, event_id"
    })

  /** Boolean aggregates (every / any). */
  val q75BoolAggs: GraftQuery = GraftQuery(
    "q75_bool_aggs",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          bool_and($"l_discount" <= 0.1).cast("int").as("all_low_disc"),
          bool_or($"l_quantity" > 49.0).cast("int").as("any_big_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },
    Some(
      "SELECT l_returnflag, " +
        "bool_and(l_discount <= 0.1)::INT AS all_low_disc, " +
        "bool_or(l_quantity > 49.0)::INT AS any_big_qty, " +
        "count(*) AS n FROM lineitem GROUP BY 1 ORDER BY l_returnflag"))

  /** Statistical aggregates: sample stddev/variance + Pearson
    * correlation (both engines compute the same two-pass-free formulas;
    * rounded to absorb summation-order ulps). */
  val q76StatsAggs: GraftQuery = GraftQuery(
    "q76_stats_aggs",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 6).as("sd_qty"),
          round(var_samp($"l_discount"), 8).as("var_disc"),
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qp"))
        .orderBy($"l_returnflag")
    },
    Some(
      "SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd_qty, " +
        "round(var_samp(l_discount), 8) AS var_disc, " +
        "round(corr(l_quantity, l_extendedprice), 6) AS corr_qp " +
        "FROM lineitem GROUP BY 1 ORDER BY l_returnflag"))

  /** Top-3 orders per customer via the heap AGGREGATOR (map-side partial
    * top-k; at most k rows per group per map partition reach the shuffle,
    * vs the window formulation sorting every row). Oracle = the window
    * formulation: results are identical. */
  val q77TopKAgg: GraftQuery = GraftQuery(
    "q77_topk_agg",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(graft.functions.TopKAgg.topK(3)(
          $"o_totalprice", $"o_orderkey").as("top"))
        .select($"o_custkey", posexplode($"top"))
        .select($"o_custkey", ($"pos" + 1).as("rk"),
          $"col._2".as("o_orderkey"), $"col._1".as("o_totalprice"))
        .orderBy($"o_custkey", $"rk")
    },
    Some(
      "SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) " +
        "WHERE rk <= 3 ORDER BY o_custkey, rk"))

  /** GROUPING() disambiguation over a rollup: tells real NULL data apart
    * from subtotal rows — the correct way to consume grouping sets. */
  val q87GroupingId: GraftQuery = GraftQuery(
    "q87_grouping_id",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping($"o_orderstatus").cast("int").as("g_status"),
          grouping($"o_orderpriority").cast("int").as("g_priority"))
        .select(
          coalesce($"o_orderstatus", lit("-")).as("status"),
          coalesce($"o_orderpriority", lit("-")).as("priority"),
          $"g_status", $"g_priority", $"n")
        .orderBy($"g_status", $"g_priority", $"status", $"priority")
    },
    Some(
      "SELECT coalesce(o_orderstatus, '-') AS status, " +
        "coalesce(o_orderpriority, '-') AS priority, " +
        "grouping(o_orderstatus)::INT AS g_status, " +
        "grouping(o_orderpriority)::INT AS g_priority, count(*) AS n " +
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
        "ORDER BY g_status, g_priority, status, priority"))
}
