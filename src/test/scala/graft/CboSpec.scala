package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer exhibit: ANALYZE-computed table/column stats
  * change the JOIN STRATEGY at planning time.
  *
  * The 100×-scale planning story's last piece: file-size estimates see
  * a multi-MB dimension and plan a sort-merge join even when a
  * selective filter keeps only a sliver of it; with `ANALYZE TABLE …
  * COMPUTE STATISTICS FOR COLUMNS`, CBO's filter estimation (min/max →
  * selectivity) shrinks the estimated child below the broadcast
  * threshold and the SAME query plans a BroadcastHashJoin — no shuffle
  * of either side. AQE can rescue the bad plan at RUNTIME from shuffle
  * statistics, but at 100 TB you want the right plan before the first
  * shuffle is written, which only table stats deliver; AQE is disabled
  * here precisely to show the static decision flipping.
  */
class CboSpec extends GraftSuite {

  test("ANALYZE column stats flip a filtered-dim join from " +
      "sort-merge to broadcast at planning time") {
    val s = spark
    import s.implicits._
    s.sql("DROP TABLE IF EXISTS cbo_dim")
    s.sql("DROP TABLE IF EXISTS cbo_fact")
    // dim: 200k rows with a payload column → multi-MB on disk, of
    // which dim_id < 200 keeps 0.1%
    s.range(200000)
      .select(($"id" % 1000).as("k"),
        concat(lit("payload_value_"), $"id").as("pay"),
        $"id".as("dim_id"))
      .write.saveAsTable("cbo_dim")
    s.range(100000).select(($"id" % 1000).as("k"), $"id".as("fact_id"))
      .write.saveAsTable("cbo_fact")
    val saved = Seq("spark.sql.cbo.enabled",
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024).toString)
      def planStr: String = s.sql(
        "SELECT f.fact_id, d.pay FROM cbo_fact f " +
          "JOIN cbo_dim d ON f.k = d.k WHERE d.dim_id < 200")
        .queryExecution.executedPlan.toString
      // no stats: the dim's size estimate is its file size (multi-MB >
      // 64 kB) and the filter earns no reduction → sort-merge join
      val before = planStr
      assert(before.contains("SortMergeJoin"),
        s"expected SMJ before ANALYZE:\n$before")
      assert(!before.contains("BroadcastHashJoin"))
      s.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
      s.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS " +
        "FOR COLUMNS dim_id, k, pay")
      // with row counts + column min/max, the filtered dim estimates
      // ~200 rows → well under the threshold → broadcast, no shuffle
      val after = planStr
      assert(after.contains("BroadcastHashJoin"),
        s"expected broadcast after ANALYZE:\n$after")
      assert(!after.contains("SortMergeJoin"))
      // and the flipped plan computes the same result
      s.conf.set("spark.sql.adaptive.enabled", "true")
      val n = s.sql(
        "SELECT count(*) AS n FROM cbo_fact f " +
          "JOIN cbo_dim d ON f.k = d.k WHERE d.dim_id < 200")
        .head().getLong(0)
      assert(n === 200L * 100) // 200 dim rows × 100 fact rows per key
    } finally {
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
      s.sql("DROP TABLE IF EXISTS cbo_dim")
      s.sql("DROP TABLE IF EXISTS cbo_fact")
    }
  }
}
