package graft

import org.apache.spark.sql.functions._

import graft.expressions.ArrayCosine
import graft.operators.Similarity

class ArrayCosineSpec extends GraftSuite {

  test("native expression equals HOF formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf).limit(100)
    val both = e.crossJoin(
        Tables.embeddings(spark, sf).limit(20)
          .select($"vec_id".as("qid"), $"embedding".as("qv")))
      .select(
        Similarity.cosine($"embedding", $"qv").as("native"),
        Similarity.cosineHof($"embedding", $"qv").as("hof"))
    assert(both.filter(!($"native" <=> $"hof")).count() === 0)
  }

  test("SQL registration: array_cosine callable from spark.sql") {
    ArrayCosine.register(spark)
    val r = spark.sql(
      "SELECT array_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c," +
        " array_cosine(array(1.0d, 0.0d), array(0.0d, 5.0d)) AS o")
      .first()
    assert(r.getDouble(0) === 1.0 +- 1e-12)
    assert(r.getDouble(1) === 0.0 +- 1e-12)
  }

  test("nulls propagate, type mismatch rejected at analysis") {
    ArrayCosine.register(spark)
    val r = spark.sql(
      "SELECT array_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))").first()
    assert(r.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT array_cosine('abc', array(1.0d))").collect()
    }
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val s = spark
    import s.implicits._
    val df = Tables.embeddings(spark, sf)
      .select(Similarity.cosine($"embedding", $"embedding").as("c"))
    val plan = df.queryExecution.executedPlan.toString()
    // codegen stages print as "*(n)" in the compact plan form; the
    // arraycosine projection must carry the star (no fallback Project)
    assert(plan.contains("*(1) Project [arraycosine"), plan)
    // force execution through the codegen path
    assert(df.agg(min($"c")).first().getDouble(0) === 1.0 +- 1e-9)
  }
}
