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
      s.experimental.extraOptimizations :+ graft.expressions.SimplifySelfCosine
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
}
