package graft

import org.apache.spark.sql.functions._

import graft.expressions.SortedLongIntersect

/** The spec the SortedLongIntersect docstring promised (VERDICT r16
  * #4 — the merge-intersect shipped in the r16 snapshot without it):
  * parity with `array_intersect` on random SORTED duplicate-free
  * inputs (the exact contract triangleCounts' adjacency arrays
  * satisfy), the empty/null shapes, and codegen participation (the
  * ArrayL2Sq assertion pattern). */
class SortedLongIntersectSpec extends GraftSuite {

  /** Deterministic pseudo-random sorted duplicate-free long arrays —
    * a fixed-seed LCG, no RNG state outside the test. */
  private def randSorted(seed: Long, n: Int, domain: Long): Seq[Long] = {
    var x = seed
    val out = scala.collection.mutable.SortedSet.empty[Long]
    while (out.size < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out += math.floorMod(x, domain)
    }
    out.toSeq
  }

  test("parity with array_intersect on random sorted duplicate-free " +
      "arrays (element set AND emitted order)") {
    val s = spark
    import s.implicits._
    val rows = (1 to 200).map { i =>
      (randSorted(i.toLong, 1 + i % 40, 120L),
        randSorted(1000L + i, 1 + (i * 7) % 40, 120L))
    }
    // the encoder's Seq[Long] schema is array<bigint> with
    // non-nullable elements — the exact collect_list shape the
    // expression's type check demands (a cast would re-mark the
    // elements nullable and be rejected)
    val df = rows.toDF("a", "b")
      .select(
        SortedLongIntersect($"a", $"b").as("m"),
        array_intersect($"a", $"b").as("ai"))
    // array equality in Spark SQL compares element order too — on
    // duplicate-free inputs array_intersect preserves LEFT order,
    // which for a sorted left side is ascending, exactly the merge's
    // emitted order
    assert(df.filter(!($"m" <=> $"ai")).count() === 0)
  }

  test("disjoint, identical, nested, empty and null shapes") {
    val s = spark
    import s.implicits._
    def lit2(xs: Seq[Long]) = typedLit(xs)
    val nonNullArr = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
    val r = spark.range(1)
      .select(
        SortedLongIntersect(lit2(Seq(1L, 3L, 5L)), lit2(Seq(2L, 4L)))
          .as("disjoint"),
        SortedLongIntersect(lit2(Seq(1L, 2L, 3L)), lit2(Seq(1L, 2L, 3L)))
          .as("identical"),
        SortedLongIntersect(lit2(Seq(1L, 2L, 3L, 9L)), lit2(Seq(2L, 9L)))
          .as("nested"),
        SortedLongIntersect(lit2(Seq.empty[Long]), lit2(Seq(1L)))
          .as("empty"),
        SortedLongIntersect(
          lit(null).cast(nonNullArr), lit2(Seq(1L))).as("nullarr"))
      .first()
    assert(r.getSeq[Long](0) === Seq.empty)
    assert(r.getSeq[Long](1) === Seq(1L, 2L, 3L))
    assert(r.getSeq[Long](2) === Seq(2L, 9L))
    assert(r.getSeq[Long](3) === Seq.empty)
    assert(r.isNullAt(4)) // null array yields NULL (BinaryExpression)
  }

  test("the production pairing: sort_array(collect_list) adjacency " +
      "arrays intersect identically under both kernels") {
    val s = spark
    import s.implicits._
    // a small oriented edge set with shared neighbors (triangle shape)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val adj = edges.groupBy($"src")
      .agg(sort_array(collect_list($"dst")).as("nbrs"))
    val joined = edges
      .join(adj.select($"src", $"nbrs".as("nu")), Seq("src"))
      .join(adj.select($"src".as("dst"), $"nbrs".as("nv")), Seq("dst"))
    val cmp = joined.select(
      SortedLongIntersect($"nu", $"nv").as("m"),
      array_intersect($"nu", $"nv").as("ai"))
    assert(cmp.filter(!($"m" <=> $"ai")).count() === 0)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val s = spark
    import s.implicits._
    // non-constant inputs (sequence over range) so the projection
    // cannot constant-fold away before reaching codegen
    val df = spark.range(1, 50)
      .select(sequence(lit(1L), $"id").as("a"),
        sequence(lit(2L), $"id" + 1).as("b"))
      .select(SortedLongIntersect($"a", $"b").as("m"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [sortedlongintersect"), plan)
    // |[1..id] ∩ [2..id+1]| = id − 1
    assert(df.select(max(size($"m"))).first().getInt(0) === 48)
  }
}
