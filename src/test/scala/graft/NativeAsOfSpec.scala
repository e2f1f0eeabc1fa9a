package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.NativeAsOf

/** The plan-level as-of join ([[graft.plans.AsOfJoinExec]]) must agree
  * with the composed union+window realization on real data, and handle
  * the merge-sweep edge cases (ties, empty right, null keys/ts, multiple
  * partitions) that a two-pointer implementation can get wrong.
  */
class NativeAsOfSpec extends GraftSuite {
  import spark.implicits._

  private def purchasesClicks() = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
    (purchases, clicks)
  }

  test("native backward as-of matches the union+window operator") {
    val (purchases, clicks) = purchasesClicks()
    // NativeAsOf keys must share names across sides -> rename right key
    val nativeFixed = NativeAsOf.join(purchases,
      clicks.withColumnRenamed("c_user", "user_id"), Seq("user_id"),
      "ts", "c_ts")
      .select($"event_id", unix_millis($"c_ts").as("click_ms"))
    val windowed = AsOfJoin.backward(purchases,
      clicks.withColumnRenamed("c_user", "user_id")
        .withColumnRenamed("c_ts", "ts"),
      Seq("user_id"), "ts", "ts")
      .select($"event_id", unix_millis($"ts_asof").as("click_ms"))
    assert(nativeFixed.orderBy($"event_id").collect().toSeq ===
      windowed.orderBy($"event_id").collect().toSeq)
  }

  test("native forward as-of matches the union+window operator") {
    val (purchases, clicks) = purchasesClicks()
    val native = NativeAsOf.join(purchases,
      clicks.withColumnRenamed("c_user", "user_id"), Seq("user_id"),
      "ts", "c_ts", forward = true)
      .select($"event_id", unix_millis($"c_ts").as("click_ms"))
    val windowed = AsOfJoin.forward(purchases,
      clicks.withColumnRenamed("c_user", "user_id")
        .withColumnRenamed("c_ts", "ts"),
      Seq("user_id"), "ts", "ts")
      .select($"event_id", unix_millis($"ts_asof").as("click_ms"))
    assert(native.orderBy($"event_id").collect().toSeq ===
      windowed.orderBy($"event_id").collect().toSeq)
  }

  test("ties, misses, null keys and null timestamps") {
    val left = Seq(
      (1L, Option(1L), Option(10L)), // exact-tie match at ts=10
      (2L, Option(1L), Option(5L)),  // before all right rows -> null
      (3L, Option(2L), Option(99L)), // key with no right rows -> null
      (4L, None, Option(10L)),       // null key -> null
      (5L, Option(1L), None)         // null ts -> null
    ).toDF("id", "k", "ts")
    val right = Seq(
      (Option(1L), Option(10L), "a"),
      (Option(1L), Option(10L), "b"), // duplicate ts: either value is a
                                      // valid as-of answer; both rows tie
      (Option(1L), Option(20L), "c"),
      (Option(1L), None, "nullts"),   // never matches
      (None, Option(1L), "nullkey")   // never matches
    ).toDF("k", "rts", "v")
      .withColumnRenamed("k", "k2")
    val out = NativeAsOf.join(left,
      right.withColumnRenamed("k2", "k").withColumnRenamed("rts", "ts2"),
      Seq("k"), "ts", "ts2")
      .select($"id", $"v").orderBy($"id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(out(0)._1 === 1L && Set("a", "b").contains(out(0)._2))
    assert(out(1) === (2L, null))
    assert(out(2) === (3L, null))
    assert(out(3) === (4L, null))
    assert(out(4) === (5L, null))
  }

  test("planner picks sorted-merge or broadcast by right-side size") {
    val (purchases, clicks) = purchasesClicks()
    def planOf(threshold: String): String = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        val df = NativeAsOf.join(purchases,
          clicks.withColumnRenamed("c_user", "user_id"), Seq("user_id"),
          "ts", "c_ts")
        df.count() // executes end-to-end under this conf
        df.queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    val merge = planOf("-1")
    assert(merge.contains("AsOfJoin ") || merge.contains("AsOfJoin ["),
      s"expected AsOfJoin exec node in:\n$merge")
    assert(merge.contains("Exchange hashpartitioning"),
      "expected Catalyst-planned exchanges from the declared distribution")
    val bcast = planOf("10485760")
    assert(bcast.contains("BroadcastAsOfJoin"),
      s"expected BroadcastAsOfJoin exec node in:\n$bcast")
    assert(!bcast.contains("Exchange hashpartitioning"),
      s"broadcast as-of must not shuffle either side:\n$bcast")
  }

  test("randomized agreement with a driver-side brute-force oracle") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val lRows = (1 to 200).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong))
      // unique (key, ts) on the right so the matched value is well-defined
      val rPairs = rnd.shuffle(
        for (k <- 0L until 8L; t <- 0L until 50L) yield (k, t)).take(150)
      val rRows = rPairs.zipWithIndex.map { case ((k, t), i) =>
        (k, t, i.toLong)
      }
      val left = lRows.toDF("id", "k", "ts")
      val right = rRows.toDF("k", "rts", "v")
      def expected(fwd: Boolean): Map[Long, Option[Long]] =
        lRows.map { case (id, k, ts) =>
          val c = rRows.filter(r => r._1 == k &&
            (if (fwd) r._2 >= ts else r._2 <= ts))
          id -> (if (c.isEmpty) None
                 else Some((if (fwd) c.minBy(_._2) else c.maxBy(_._2))._3))
        }.toMap
      // threshold -1 forces the sorted-merge exec; default picks the
      // broadcast exec for this tiny right side — both must agree with
      // the brute-force oracle
      for (fwd <- Seq(false, true); threshold <- Seq("-1", "10485760")) {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val got =
          try {
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
            NativeAsOf.join(left,
              right.withColumnRenamed("rts", "ts2"), Seq("k"), "ts", "ts2",
              forward = fwd)
              .select($"id", $"v").collect()
              .map(r => r.getLong(0) ->
                (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
          } finally spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", prev)
        assert(got === expected(fwd),
          s"seed=$seed forward=$fwd threshold=$threshold")
      }
    }
  }

  test("left filters push below the join; unused right columns are pruned") {
    val s = spark
    val ev = Tables.events(spark, sf)
    val left = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val right = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"), $"value".as("c_value"),
        $"event_id".as("c_event_id"))
    val df = NativeAsOf.join(left, right, Seq("user_id"), "ts", "c_ts")
      .filter($"event_id" > 100) // left-only predicate, added ABOVE the join
      .select($"event_id", $"c_ts") // c_value / c_event_id unused
    // the filter must reach the left parquet scan as a pushed filter
    val physical = df.queryExecution.executedPlan.toString
    // (PushedFilters elides long lists -> match the prefix)
    assert(physical.contains("GreaterThan(event_id"),
      s"left filter did not reach the scan:\n$physical")
    // the unused right columns must not survive to the exchange
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("c_value"),
      s"unused right column not pruned:\n$optimized")
    // and the result is still correct vs the post-hoc filter
    val expected = NativeAsOf.join(left, right, Seq("user_id"),
      "ts", "c_ts").select($"event_id", $"c_ts")
      .collect().filter(r => r.getLong(0) > 100)
    assert(df.count() === expected.length)
  }

  test("empty right side yields all-null right columns") {
    val left = Seq((1L, 1L, 1L)).toDF("id", "k", "ts")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "rts", "v")
      .withColumnRenamed("k", "k_r")
    val out = NativeAsOf.join(left,
      right.withColumnRenamed("k_r", "k").withColumnRenamed("rts", "ts2"),
      Seq("k"), "ts", "ts2").collect()
    assert(out.length === 1 && out(0).isNullAt(4))
  }
}
