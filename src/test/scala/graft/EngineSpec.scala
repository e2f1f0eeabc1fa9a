package graft

import org.apache.spark.sql.functions._

import graft.engine.{ClusterEngine, EngineConf, ResultDocs}

class EngineSpec extends GraftSuite {

  private val conf = EngineConf(
    macroCol = "l_returnflag", microCol = "l_linestatus",
    xCol = "l_quantity", yCol = "l_extendedprice",
    fixedK = Some(3), iterNum = 2, seed = 42L)

  private lazy val li = Tables.lineitem(spark, sf)

  test("local backend clusters every eligible segment") {
    val res = ClusterEngine.run(li, conf).collect()
    assert(res.length === 6) // 3 returnflags × 2 linestatuses
    res.foreach { r =>
      assert(r.k === 3)
      assert(r.clusters.map(_.clusterSize).sum > 0)
      assert(r.silhouette >= -1.0 && r.silhouette <= 1.0)
      assert(r.entropy >= 0.0 && r.entropy <= math.log(3.0) / math.log(2.0) + 1e-9)
      r.clusters.foreach { c =>
        assert(c.radius >= 0.0)
        assert(c.center.length === 2)
      }
    }
  }

  test("local backend is deterministic across runs and partitionings") {
    val a = ClusterEngine.run(li, conf).collect()
      .sortBy(r => (r.macroId, r.microId))
    val b = ClusterEngine.run(li.repartition(13), conf).collect()
      .sortBy(r => (r.macroId, r.microId))
    assert(a.map(_.silhouette).toSeq === b.map(_.silhouette).toSeq)
    assert(a.map(_.clusters.map(_.clusterSize).sorted).toSeq ===
      b.map(_.clusters.map(_.clusterSize).sorted).toSeq)
  }

  test("kStore override pins k per segment") {
    val kStore = Map(("A", "F") -> graft.engine.KEntry(2, 0.0))
    val res = ClusterEngine.run(li, conf.copy(fixedK = None, stopK = 4,
      iterNum = 1), kStore).collect()
    val af = res.find(r => r.macroId == "A" && r.microId == "F").get
    assert(af.k === 2)
  }

  test("ml backend produces comparable segment results") {
    val res = ClusterEngine.runMl(li, conf.copy(iterNum = 1)).collect()
    assert(res.length === 6)
    res.foreach { r =>
      assert(r.k === 3)
      assert(r.silhouette >= -1.0 && r.silhouette <= 1.0)
    }
  }

  test("degenerate segments are dropped by the ≥2-distinct guard") {
    val s = spark
    import s.implicits._
    val degenerate = Seq(
      ("m1", "u1", 1.0, 1.0), ("m1", "u1", 1.0, 1.0), // 1 distinct point
      ("m2", "u2", 1.0, 1.0), ("m2", "u2", 2.0, 2.0)  // eligible
    ).toDF("ma", "mi", "x", "y")
    val res = ClusterEngine.run(degenerate,
      EngineConf("ma", "mi", "x", "y", fixedK = Some(2), iterNum = 1)).collect()
    assert(res.map(_.macroId).toSeq === Seq("m2"))
  }

  test("original document has the reference's nested shape") {
    val res = ClusterEngine.run(li, conf)
    val doc = ResultDocs.original(res, conf, "2026-08-12")
    val row = doc.collect()(0)
    assert(doc.columns.toSeq === Seq("algorithm", "macro", "micro",
      "firstColumn", "secondColumn", "date", "list"))
    assert(row.getAs[String]("algorithm") === "KMeans")
    assert(row.getAs[String]("macro") === "l_returnflag")
    val list = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("list")
    assert(list.length === 3) // macro values A, N, R
    val microList = list.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "l_linestatus_List")
    assert(microList.length === 2) // F, O
    val clusters = microList.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("clusters")
    assert(clusters.length === 3)
  }

  test("d3 document: structural rename + size in [1, d3NormalizeMax]") {
    val res = ClusterEngine.run(li, conf)
    val doc = ResultDocs.d3(res, conf, "2026-08-12")
    val row = doc.collect()(0)
    assert(row.getAs[String]("name") === "clusters")
    val macros = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
    val micros = macros.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
    val clusters = micros.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
    val sizes = for {
      ma <- macros; mi <- ma.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
      c <- mi.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
    } yield c.getAs[Double]("size")
    assert(clusters.nonEmpty)
    assert(sizes.forall(s => s >= 1.0 && s <= conf.d3NormalizeMax))
    assert(sizes.exists(_ === 1.0) && sizes.exists(_ > 49.0)) // spans range
  }

  test("latestFor: unordered (x,y) lookup returns the newest doc") {
    // the GUI quirk (views.py:31-35): a doc written as (x=qty, y=price)
    // must be found when asked for (price, qty), and the LATEST date wins
    val res = ClusterEngine.run(li, conf)
    val docs = ResultDocs.original(res, conf, "2026-08-11")
      .unionByName(ResultDocs.original(res, conf, "2026-08-12"))
    val hitSwapped = ResultDocs.latestFor(docs, "KMeans",
      conf.macroCol, conf.microCol, conf.yCol, conf.xCol)
    val rows = hitSwapped.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("date") === "2026-08-12")
    assert(rows(0).getAs[String]("firstColumn") === conf.xCol)
    val miss = ResultDocs.latestFor(docs, "KMeans",
      conf.macroCol, conf.microCol, conf.xCol, "no_such_col")
    assert(miss.count() === 0)
    // reference precedence: when BOTH orientations exist, the exact
    // orientation wins even against a NEWER swapped doc (views.py only
    // falls back to the swap when the exact lookup misses)
    val res2 = ClusterEngine.run(li, conf)
    val swapped = ResultDocs.original(res2, conf, "2026-08-13")
      .withColumn("firstColumn", org.apache.spark.sql.functions
        .lit(conf.yCol))
      .withColumn("secondColumn", org.apache.spark.sql.functions
        .lit(conf.xCol))
    val both = docs.unionByName(swapped)
    val hit = ResultDocs.latestFor(both, "KMeans",
      conf.macroCol, conf.microCol, conf.xCol, conf.yCol).collect()
    assert(hit.length === 1)
    assert(hit(0).getAs[String]("firstColumn") === conf.xCol)
    assert(hit(0).getAs[String]("date") === "2026-08-12") // not the newer swap
  }

  test("config JSON overlay keeps defaults for absent fields") {
    val c = graft.config.GraftConfig.fromJson(
      """{"startK": 3, "algorithms": ["BisectingKMeans"]}""")
    assert(c.startK === 3)
    assert(c.stopK === 10) // default kept
    assert(c.algorithms === Seq("BisectingKMeans"))
    assert(c.taskGrid.nonEmpty)
  }

  test("dedup/ANN knobs overlay like the reference's clustering knobs") {
    val c = graft.config.GraftConfig.fromJson(
      """{"minhashBands": 16, "maxBucket": 50, "annNprobe": 8}""")
    assert(c.minhashBands === 16 && c.maxBucket === 50 && c.annNprobe === 8)
    // absent extension knobs keep operator defaults
    assert(c.minhashNumHashes === 32 && c.dedupThreshold === 0.5)
    assert(c.pqSubspaces === 8 && c.annNlist === 16 && c.shingleN === 3)
  }

  test("metricSets drive an n-D task grid; default falls back to pairs") {
    val c = graft.config.GraftConfig.fromJson(
      """{"metricSets": [["cpu_percent", "ram_usage", "disk_io"]]}""")
    val grid = c.taskGridNd
    assert(grid.nonEmpty)
    assert(grid.forall(_._3 === Seq("cpu_percent", "ram_usage", "disk_io")))
    // without metricSets the n-D grid mirrors the pairwise grid
    val d = graft.config.GraftConfig()
    assert(d.taskGridNd.map(t => (t._1, t._2, t._3(0), t._3(1), t._4)) ===
      d.taskGrid)
  }
}

class NdEngineSpec extends GraftSuite {

  test("3-D clustering produces 3-D centers with same segment coverage") {
    val conf = graft.engine.EngineConf("l_returnflag", "l_linestatus",
      "l_quantity", "l_extendedprice", fixedK = Some(3), iterNum = 1)
    val res = graft.engine.ClusterEngine.runNd(Tables.lineitem(spark, sf),
      conf, Seq("l_quantity", "l_extendedprice", "l_discount")).collect()
    assert(res.length === 6)
    assert(res.forall(_.clusters.forall(_.center.length === 3)))
    assert(res.forall(r => r.silhouette >= -1.0 && r.silhouette <= 1.0))
  }

  test("runNd with two metrics equals run (delegation identity)") {
    val conf = graft.engine.EngineConf("l_returnflag", "l_linestatus",
      "l_quantity", "l_extendedprice", fixedK = Some(2), iterNum = 1)
    val li = Tables.lineitem(spark, sf)
    val a = graft.engine.ClusterEngine.run(li, conf).collect()
      .sortBy(r => (r.macroId, r.microId))
    val b = graft.engine.ClusterEngine.runNd(li, conf,
      Seq("l_quantity", "l_extendedprice")).collect()
      .sortBy(r => (r.macroId, r.microId))
    assert(a.map(_.silhouette).toSeq === b.map(_.silhouette).toSeq)
  }

  test("1-D clustering works (single metric column)") {
    val conf = graft.engine.EngineConf("l_returnflag", "l_linestatus",
      "l_quantity", "l_quantity", fixedK = Some(2), iterNum = 1)
    val res = graft.engine.ClusterEngine.runNd(Tables.lineitem(spark, sf),
      conf, Seq("l_quantity")).collect()
    assert(res.length === 6)
    assert(res.forall(_.clusters.forall(_.center.length === 1)))
  }
}
