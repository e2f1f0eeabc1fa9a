package graft

import graft.preprocess.Scaling

class ScalingSpec extends GraftSuite {
  import org.apache.spark.sql.functions._

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", "x", 10.0, 5.0, 100.0),
      ("a", "x", 20.0, 7.0, 100.0),
      ("a", "y", 30.0, 7.0, 100.0), // constant metric2 within (a,y)? no: single row
      ("b", "x", -5.0, 3.0, 50.0),
      ("b", "x", 15.0, 3.0, 50.0) // metric2 constant within (b,x)
    ).toDF("macro", "micro", "m_usage", "k_count", "m_limit")
  }

  test("min-max scaling lands in [0,100] per segment") {
    val out = Scaling.scaleSegments(df, "macro", "micro", Seq("k_count"))
    val vals = out.select(col(Scaling.scaledName("k_count")))
      .collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v <= 100.0))
  }

  test("constant column within a segment scales to 0.0") {
    val s = spark
    import s.implicits._
    val out = Scaling.scaleSegments(df, "macro", "micro", Seq("k_count"))
    val bx = out.filter($"macro" === "b" && $"micro" === "x")
      .select(col(Scaling.scaledName("k_count"))).collect().map(_.getDouble(0))
    assert(bx.forall(_ === 0.0))
  }

  test("limit column triggers the ratio path (x*100/limit), not min-max") {
    val s = spark
    import s.implicits._
    val out = Scaling.scaleSegments(df, "macro", "micro", Seq("m_usage"))
    val got = out.filter($"macro" === "a" && $"micro" === "x")
      .select(col(Scaling.scaledName("m_usage"))).collect()
      .map(_.getDouble(0)).sorted.toSeq
    assert(got === Seq(10.0, 20.0)) // 10*100/100, 20*100/100
  }

  test("dontScale passes values through") {
    val out = Scaling.scaleSegments(df, "macro", "micro", Seq("k_count"),
      dontScale = Seq("k_count"))
    val got = out.select(col(Scaling.scaledName("k_count"))).collect()
      .map(_.getDouble(0)).sorted.toSeq
    assert(got === Seq(3.0, 3.0, 5.0, 7.0, 7.0))
  }

  test("null metric rows are dropped (na.drop parity)") {
    val s = spark
    import s.implicits._
    val withNull = df.union(Seq(("c", "z", null.asInstanceOf[java.lang.Double],
      java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(10.0)))
      .toDF("macro", "micro", "m_usage", "k_count", "m_limit")
      .select($"macro", $"micro", $"m_usage".cast("double"),
        $"k_count".cast("double"), $"m_limit".cast("double")))
    val out = Scaling.scaleSegments(withNull, "macro", "micro",
      Seq("m_usage", "k_count"))
    assert(out.filter($"macro" === "c").count() === 0)
  }
}
