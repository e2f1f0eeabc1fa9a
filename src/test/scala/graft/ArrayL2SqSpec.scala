package graft

import org.apache.spark.sql.functions._

import graft.expressions.{ArrayL2Sq, L2Fusion}

/** Native squared-L2 kernel + fusion rule: bit-parity with the HOF
  * formulation, SQL registration, codegen participation, and the
  * rewrite actually firing on the textbook shape. */
class ArrayL2SqSpec extends GraftSuite {

  private def hofL2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  test("native expression equals HOF formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val v = graft.operators.Similarity.asDouble($"embedding")
    val q = Tables.embeddings(spark, sf).limit(20)
      .select($"vec_id".as("qid"),
        graft.operators.Similarity.asDouble($"embedding").as("qv"))
    val both = Tables.embeddings(spark, sf).limit(100)
      .crossJoin(q)
      .select(ArrayL2Sq(v, $"qv").as("native"),
        hofL2(v, $"qv").as("hof"))
    assert(both.filter(!($"native" <=> $"hof")).count() === 0)
  }

  test("degenerate shapes agree with the HOF: empty, ragged, null elem") {
    ArrayL2Sq.register(spark)
    val r = spark.sql(
      "SELECT array_l2sq(CAST(array() AS ARRAY<DOUBLE>), " +
        "CAST(array() AS ARRAY<DOUBLE>)) AS empty, " +
        "array_l2sq(array(1.0d), array(1.0d, 2.0d)) AS ragged, " +
        "array_l2sq(array(1.0d, CAST(NULL AS DOUBLE)), " +
        "array(1.0d, 2.0d)) AS nullelem, " +
        "array_l2sq(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS nullarr")
      .first()
    assert(r.getDouble(0) === 0.0) // empty fold = the HOF's zero seed
    assert(r.isNullAt(1))          // ragged: zip_with pads with null
    assert(r.isNullAt(2))          // null element poisons the fold
    assert(r.isNullAt(3))
  }

  test("L2Fusion rewrites the textbook HOF shape to the kernel") {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.GraftExprBridge.ensureOptimization(spark, L2Fusion)
    val v = graft.operators.Similarity.asDouble($"embedding")
    val df = Tables.embeddings(spark, sf)
      .select(hofL2(v, reverse(v)).as("d2"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("arrayl2sq"),
      s"L2Fusion did not fire:\n$optimized")
    assert(!optimized.contains("zip_with"),
      "unfused zip_with survived in the optimized plan")
    // and the fused plan still computes the right thing
    val manual = Tables.embeddings(spark, sf)
      .select(hofL2(v, v).as("z")).agg(max($"z")).first().getDouble(0)
    assert(manual === 0.0)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val s = spark
    import s.implicits._
    val v = graft.operators.Similarity.asDouble($"embedding")
    val df = Tables.embeddings(spark, sf)
      .select(ArrayL2Sq(v, v).as("d"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [arrayl2sq"), plan)
    assert(df.agg(max($"d")).first().getDouble(0) === 0.0)
  }
}
