package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The session-extension stack: optimizer rule registered via
  * SparkSessionExtensions rewrites self-cosine to a literal. */
class ExtensionsSpec extends GraftSuite {

  // a shared session may already exist (getOrCreate would ignore
  // withExtensions), so attach the rule through the session-level hook on
  // a fresh child session — same rule object GraftExtensions injects
  private lazy val extSpark: SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+
        graft.expressions.CosineFusion :+
        graft.expressions.SimplifySelfCosine
    s
  }

  test("self-cosine is folded to a literal by the injected rule") {
    val e = Tables.embeddings(extSpark, sf)
    // non-null input required by the rewrite guard: coalesce payload
    val v = coalesce(Similarity.asDouble(col("embedding")),
      typedLit(Seq(0.0)))
    val df = e.select(graft.expressions.ArrayCosine(v, v).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("arraycosine"), optimized)
    assert(optimized.contains("1.0"), optimized)
    assert(df.distinct().collect().map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("distinct vectors are NOT folded (rule is guarded)") {
    val e = Tables.embeddings(extSpark, sf)
    val v = coalesce(Similarity.asDouble(col("embedding")),
      typedLit(Seq(0.0)))
    val shifted = coalesce(Similarity.asDouble(reverse(col("embedding"))),
      typedLit(Seq(0.0)))
    val df = e.select(graft.expressions.ArrayCosine(v, shifted).as("c"))
    assert(df.queryExecution.optimizedPlan.toString()
      .contains("arraycosine"))
  }

  test("HOF cosine composition is fused into the native kernel") {
    val e = Tables.embeddings(extSpark, sf)
    val q = Tables.embeddings(extSpark, sf)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .limit(5)
    val df = e.crossJoin(broadcast(q))
      .select(col("vec_id"), col("qid"),
        Similarity.cosineHof(col("embedding"), col("qv")).as("cos"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    // the 4-HOF composition must be gone, replaced by one arraycosine
    assert(optimized.contains("arraycosine"), optimized)
    assert(!optimized.contains("zip_with"), optimized)
    // and the fused plan returns bit-identical values to the unfused
    // one (same query on the base session, which has no fusion rule)
    val got = df.orderBy("vec_id", "qid").collect().map(_.getDouble(2))
    val want = Tables.embeddings(spark, sf).crossJoin(broadcast(
        Tables.embeddings(spark, sf)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
          .limit(5)))
      .select(col("vec_id"), col("qid"),
        Similarity.cosineHof(col("embedding"), col("qv")).as("cos"))
      .orderBy("vec_id", "qid").collect().map(_.getDouble(2))
    assert(got.toSeq === want.toSeq)
  }

  test("fusion then self-cosine folding compose: HOF self-cosine -> 1.0") {
    val e = Tables.embeddings(extSpark, sf)
    val v = coalesce(Similarity.asDouble(col("embedding")),
      typedLit(Seq(0.0)))
    // the naive self-similarity formulation collapses to a literal:
    // CosineFusion rewrites it to arraycosine(v, v), then
    // SimplifySelfCosine folds that to 1.0
    val df = e.select(
      (Similarity.dot(v, v) /
        (sqrt(Similarity.dot(v, v)) * sqrt(Similarity.dot(v, v))))
        .as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("arraycosine"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
    assert(df.distinct().collect().map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("fusion is NOT applied to a non-cosine lookalike") {
    val e = Tables.embeddings(extSpark, sf)
    val v = Similarity.asDouble(col("embedding"))
    val w = Similarity.asDouble(reverse(col("embedding")))
    // denominator norms are over DIFFERENT vectors than the numerator:
    // not a cosine — must stay unfused
    val df = e.select(
      (Similarity.dot(v, v) /
        (sqrt(Similarity.dot(w, w)) * sqrt(Similarity.dot(w, w))))
        .as("c"))
    assert(!df.queryExecution.optimizedPlan.toString()
      .contains("arraycosine"))
  }

  test("ragged and null-element inputs: fused kernel matches the HOF") {
    // the HOF column runs on the BASE session (no CosineFusion there) —
    // on extSpark it would be rewritten to ArrayCosine and the test
    // would compare the kernel to itself
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("id", "a", "b")
    val out = df.select($"id",
      graft.expressions.ArrayCosine(
        $"a".cast("array<double>"), $"b".cast("array<double>")).as("nat"),
      Similarity.cosineHof($"a", $"b").as("hof"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2)))
    // well-formed row scores; ragged row 2 and null-element row 3 are
    // NULL on BOTH paths — the rewrite changes nothing anywhere
    assert(out.toSeq === Seq((1L, false, false), (2L, true, true),
      (3L, true, true)))
  }

  test("zero-norm input: the ONE documented fusion divergence") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0.0, 0.0))).toDF("id", "v")
    // native kernel (and therefore the fused plan): IEEE NaN
    val nat = df.select(graft.expressions.ArrayCosine(
      $"v".cast("array<double>"), $"v".cast("array<double>")).as("c"))
      .first().getDouble(0)
    assert(nat.isNaN)
    // unfused ANSI HOF: DIVIDE_BY_ZERO error — the case the CosineFusion
    // scaladoc documents as deliberately canonicalized to NaN
    val err = intercept[Exception] {
      df.select(Similarity.cosineHof($"v", $"v").as("c")).collect()
    }
    assert(err.getMessage.contains("DIVIDE_BY_ZERO"), err.getMessage)
  }
}
