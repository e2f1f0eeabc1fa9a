package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: pre-bucketing both fact tables on the
  * join key lets the join run with NO shuffle exchange — the physical
  * pattern for repeated large-fact joins at 100 TB (pay the shuffle once
  * at write time, never again at read time).
  */
class BucketingSpec extends GraftSuite {

  test("join of tables bucketed on the key plans without a shuffle") {
    val s = spark
    import s.implicits._
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_b")

    // force the sort-merge path (tiny test tables would broadcast and
    // bypass bucketing; at real scale both sides are too big to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val joined =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = spark.table("li_b")
          .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
        val plan = j.queryExecution.executedPlan.toString()
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        assert(plan.contains("Bucketed: true"), plan)
        j.count() // execute under the no-broadcast conf
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // and it returns the same result as the plain join
    val plain = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .join(Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
    assert(joined.count() === plain.count())
  }

  test("native as-of join on bucketed tables elides both exchanges") {
    val s = spark
    import s.implicits._
    spark.sql("DROP TABLE IF EXISTS purch_b")
    spark.sql("DROP TABLE IF EXISTS click_b")
    val ev = Tables.events(spark, sf)
    ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
      .write.bucketBy(8, "user_id").sortBy("user_id", "ts")
      .saveAsTable("purch_b")
    ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"))
      .write.bucketBy(8, "user_id").sortBy("user_id", "c_ts")
      .saveAsTable("click_b")

    // threshold -1 forces the sorted-merge exec (the broadcast variant
    // would trivially have no exchange; the point here is bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val j =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val df = graft.plans.NativeAsOf.join(spark.table("purch_b"),
          spark.table("click_b"), Seq("user_id"), "ts", "c_ts")
        val plan = df.queryExecution.executedPlan.toString()
        // declared ClusteredDistribution is satisfied by the bucketing:
        // the plan-level operator pays ZERO shuffles (the union+window
        // realization cannot express this — its union breaks bucketing)
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed as-of still shuffles:\n$plan")
        assert(plan.contains("AsOfJoin "), plan)
        assert(!plan.contains("BroadcastAsOfJoin"), plan)
        df.count() // execute under the no-broadcast conf
        df
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // same results as the unbucketed native join
    val plainJ = graft.plans.NativeAsOf.join(
      ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts"),
      ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts")),
      Seq("user_id"), "ts", "c_ts")
      .select($"event_id", $"c_ts")
    val bucketed = j.select($"event_id", $"c_ts")
    assert(bucketed.exceptAll(plainJ).count() === 0)
    assert(plainJ.exceptAll(bucketed).count() === 0)
  }
}
