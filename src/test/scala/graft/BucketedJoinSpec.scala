package graft

import org.apache.spark.sql.functions._

import graft.io.Sinks

/** The co-located-join exhibit: two fact tables written with
  * [[Sinks.writeBucketed]] on the join key plan their equi-join with
  * ZERO shuffle exchanges — the one-time write shuffle is amortized
  * across every later join, which is the 100 TB answer to "this join
  * shuffles both sides every night".
  *
  * Broadcast is disabled inside the test so the planner cannot dodge
  * the question (at real fact×fact scale neither side broadcasts), and
  * AQE is disabled so the asserted plan is the static one.
  */
class BucketedJoinSpec extends GraftSuite {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed fact tables join with zero exchanges, same results") {
    val sf = SparkSuite.sfSmoke
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    Sinks.writeBucketed(orders, "orders_b8", buckets = 8, "o_orderkey")
    Sinks.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b8", buckets = 8, "o_orderkey")
    try withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("lineitem_b8")
        .join(spark.table("orders_b8"), "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself is exchange-free: both sides arrive
      // pre-distributed by the bucket layout. The aggregation after it
      // regroups on a DIFFERENT key, so the plan's ONLY exchange is
      // that re-key — the join contributes none.
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).size
      assert(exchanges == 1,
        s"expected the single re-key exchange, got $exchanges:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and a join ON the bucket key with agg ON the bucket key plans
      // with zero exchanges end to end
      val keyAgg = spark.table("lineitem_b8")
        .join(spark.table("orders_b8"), "o_orderkey")
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      val keyPlan = keyAgg.queryExecution.executedPlan.toString
      assert(!keyPlan.contains("Exchange"),
        s"bucket-key join+agg must be exchange-free:\n$keyPlan")
      // results identical to the plain shuffled join
      val shuffled = lineitem
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(orders, "o_orderkey")
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      assert(keyAgg.orderBy("o_orderkey").collect().toSeq ===
        shuffled.orderBy("o_orderkey").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b8")
      spark.sql("DROP TABLE IF EXISTS lineitem_b8")
    }
  }
}
