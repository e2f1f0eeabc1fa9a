package graft

import graft.engine.{ClusterEngine, EngineConf}

/** Guards the over-cap segment path: the retained subset (and therefore the
  * clustering) must be a pure function of (point values, seed) — invariant
  * to input partitioning and arrival order — even when a segment exceeds
  * `maxPointsPerSegment`. Round-3 review found `it.take(maxPts)` kept the
  * first rows in groupByKey ARRIVAL order, so over-cap segments depended on
  * how the data happened to be partitioned; at 100× scale that is the
  * common path. These specs run a segment over a lowered cap at different
  * shuffle-partition counts and input layouts and require bit-identical
  * results.
  */
class CapDeterminismSpec extends GraftSuite {

  private def mkPoints(n: Int, seed: Long): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(Array(r.nextGaussian() * 10, r.nextGaussian() * 10))
  }

  test("capDeterministic is invariant to input order and a subset of input") {
    val pts = mkPoints(500, 7L)
    val a = ClusterEngine.capDeterministic(pts.iterator, 100, 42L)
    val shuffled = new scala.util.Random(9L).shuffle(pts.toSeq).toArray
    val b = ClusterEngine.capDeterministic(shuffled.iterator, 100, 42L)
    val key = (p: Array[Double]) => p.toSeq
    assert(a.length === 100 && b.length === 100)
    assert(a.map(key).sortBy(_.toString).toSeq ===
      b.map(key).sortBy(_.toString).toSeq)
    val all = pts.map(key).toSet
    assert(a.map(key).forall(all.contains))
  }

  test("capDeterministic below the cap keeps everything") {
    val pts = mkPoints(50, 3L)
    val kept = ClusterEngine.capDeterministic(pts.iterator, 100, 42L)
    assert(kept.map(_.toSeq).sortBy(_.toString).toSeq ===
      pts.map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("capDeterministic selection changes with the seed") {
    val pts = mkPoints(500, 7L)
    val a = ClusterEngine.capDeterministic(pts.iterator, 100, 1L)
    val b = ClusterEngine.capDeterministic(pts.iterator, 100, 2L)
    assert(a.map(_.toSeq).toSet !== b.map(_.toSeq).toSet)
  }

  test("over-cap segment clusters bit-identically at 3 vs 8 partitions") {
    import spark.implicits._
    // two segments, one well over the lowered cap
    val big = mkPoints(400, 11L).zipWithIndex.map { case (p, i) =>
      ("A", "x", p(0), p(1), i)
    }
    val small = mkPoints(60, 13L).zipWithIndex.map { case (p, i) =>
      ("B", "y", p(0), p(1), i)
    }
    val rows = (big ++ small).toSeq
    val conf = EngineConf(macroCol = "ma", microCol = "mi",
      xCol = "x", yCol = "y", fixedK = Some(3), iterNum = 1,
      maxPointsPerSegment = 120)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runWith(shufflePartitions: Int, layout: Int, orderSeed: Long) = {
      val ordered = new scala.util.Random(orderSeed).shuffle(rows)
      val df = ordered.toDF("ma", "mi", "x", "y", "id")
        .repartition(layout)
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
      try ClusterEngine.run(df, conf).collect()
        .sortBy(r => (r.macroId, r.microId))
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val r1 = runWith(3, 2, 1L)
    val r2 = runWith(8, 7, 2L)
    assert(r1.length === 2)
    assert(r1.toSeq === r2.toSeq) // case-class deep equality: bit-identical
  }
}
