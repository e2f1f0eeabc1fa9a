package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Plan-quality regression tests: the properties that make these queries
  * scale are asserted on the PHYSICAL plan, so a refactor that silently
  * loses a pushdown or a broadcast fails CI, not the 100 TB run.
  */
class PlanSpec extends GraftSuite {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution.executedPlan.toString()

  test("q02: predicates and column pruning reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("GreaterThan(l_discount,"), p) // list elided with "..."

    // pruned scan: untouched columns must not be read
    assert(!p.contains("l_tax") && !p.contains("l_shipdate"), p)
  }

  test("q04: all four dimension joins are broadcast") {
    val p = plan("q04_multi_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q13: scaling bounds come back via broadcast join, not a window") {
    val p = plan("q13_minmax_scale")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q01: aggregation is partial (map-side combine) + final") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("engine local backend plans exactly one shuffle for segmentation") {
    val conf = graft.engine.EngineConf("l_returnflag", "l_linestatus",
      "l_quantity", "l_extendedprice", fixedK = Some(2), iterNum = 1)
    val p = graft.engine.ClusterEngine.run(Tables.lineitem(spark, sf), conf)
      .queryExecution.executedPlan.toString()
    // one Exchange for the scaling-bounds agg, one for groupByKey;
    // dimension bounds come back broadcast (not counted as Exchange here)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"expected <=2 shuffles, got $shuffles in:\n$p")
  }

  test("q58: band join plans as a hash join, not a nested loop") {
    val p = plan("q58_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"band join fell back to a quadratic join:\n$p")
    assert(p.contains("HashJoin"), p)
  }

  test("q98: contamination joins the benchmark set by broadcast") {
    val p = plan("q98_contamination")
    // the benchmark shingle set must ship to the corpus, never the
    // reverse: a shuffle of the corpus side would not survive 100 TB
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q88: native as-of join plans a custom exec, no window detour") {
    val p = plan("q88_asof_native")
    assert(p.contains("AsOfJoin"), p) // merge or broadcast variant
    assert(!p.contains("Window"), p) // no union+window detour
  }

  test("native cosine projection stays inside whole-stage codegen") {
    val s = spark
    import s.implicits._
    val p = Tables.embeddings(spark, sf)
      .select(graft.operators.Similarity.cosine($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString()
    assert(p.contains("*(1) Project [arraycosine"), p)
  }
}

class SkewJoinSpec extends GraftSuite {

  test("runtime bloom filter prunes the big side of a selective " +
      "shuffle join") {
    // The 100 TB shape: fact ⋈ fact on a shuffle join, one side made
    // selective by a predicate — Spark should inject a bloom filter from
    // the selective side into the big side's scan so most rows die
    // BEFORE the shuffle. Thresholds are tuned for clusters, not sf0.001
    // (application side must look big), so only that knob is lowered —
    // the injection itself is what's under test.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "-1") // force a shuffle join, as at scale
      conf.set(keys(1), "0")
      val li = Tables.lineitem(spark, sf)
      val sel = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > lit(400000.0))
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val p = j.queryExecution.executedPlan.toString()
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p)
      // and the filtered plan still returns the exact join result
      val expected = {
        conf.set(keys(1), "10GB") // injection off at this size again
        li.join(sel, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity")).as("qty"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      }
      val got = j.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("salted join returns exactly the plain join result") {
    val s = spark
    import s.implicits._
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val salted = SkewJoin.saltedInnerJoin(li, o, "l_orderkey", salts = 4)
      .groupBy($"o_orderpriority").agg(round(sum($"l_quantity"), 2).as("q"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy($"o_orderpriority").agg(round(sum($"l_quantity"), 2).as("q"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted count equals plain count per key") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(spark, sf)
    val salted = SkewJoin.saltedCount(ev, "event_type")
    val plain = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() === 0)
  }
}

class ScaleShapeSpec extends GraftSuite {

  test("local backend handles 500+ segments in a single pass") {
    val s = spark
    import s.implicits._
    // 5 event types × ~50 user buckets ≈ 250 segments (sf0.01 events)
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("bucket", ($"user_id" % 50).cast("string"))
      .withColumn("ts_sec", unix_timestamp($"ts").cast("double"))
    val conf = graft.engine.EngineConf("event_type", "bucket", "value",
      "ts_sec", fixedK = Some(2), iterNum = 1)
    val t0 = System.nanoTime()
    val res = graft.engine.ClusterEngine.run(ev, conf).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(res.length > 150, s"only ${res.length} segments")
    // the point: hundreds of segments cost one job, not hundreds
    assert(secs < 60.0, s"took ${secs}s")
  }

  test("Viz.scatterData bounds the collect") {
    val got = graft.io.Viz.scatterData(
      Tables.events(spark, sf).withColumn("lbl", lit(1)),
      "value", "value", "lbl", limit = 50)
    assert(got.length === 50)
    intercept[IllegalArgumentException] {
      graft.io.Viz.scatterData(Tables.events(spark, sf), "value", "value",
        "value", limit = 1000000)
    }
  }

  test("Viz renders a REAL PNG scatter: decodable, points where mapped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_viz").toString
    val path = s"$dir/scatter.png"
    val pts = Array((0.0, 0.0, 0), (1.0, 1.0, 1), (0.5, 0.5, 2))
    graft.io.Viz.renderScatterPng(pts, path, width = 320, height = 240)
    val img = javax.imageio.ImageIO.read(new java.io.File(path))
    assert(img.getWidth === 320 && img.getHeight === 240)
    // every point's mapped pixel carries its label's palette color
    pts.foreach { case (x, y, label) =>
      val (px, py) = graft.io.Viz.pixelOf(x, y, 0.0, 1.0, 0.0, 1.0, 320, 240)
      assert((img.getRGB(px, py) & 0xffffff) === graft.io.Viz.Palette(label),
        s"point ($x,$y) label $label not drawn at ($px,$py)")
    }
  }

  test("Viz.scatterPng: the full sink writes a PNG from a DataFrame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_viz2").toString
    val path = s"$dir/clusters.png"
    graft.io.Viz.scatterPng(
      Tables.events(spark, sf).withColumn("lbl", (col("user_id") % 3).cast("int")),
      "value", "value", "lbl", path, limit = 200)
    val img = javax.imageio.ImageIO.read(new java.io.File(path))
    assert(img != null)
    assert(img.getWidth === 640 && img.getHeight === 480)
  }
}
