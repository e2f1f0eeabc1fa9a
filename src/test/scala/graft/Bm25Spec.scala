package graft

import graft.operators.Bm25

/** [[graft.operators.Bm25]]: the scoring function is recomputed here in
  * plain Scala (same idf form, same length normalization, same 6-dp
  * partial / 4-dp sum quantization) on a corpus small enough to follow
  * by hand, so a drift in any BM25 term shows up as a numeric diff, not
  * just a rank flip. */
class Bm25Spec extends GraftSuite {

  private def hu(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25: hand-computed scores, ranking, and the k cutoff") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x y z b"))
      .toDF("doc_id", "text")
    // N=3, dl = 4/2/4, avgdl = 10/3; tf: d1 a=2 b=1, d2 a=1 b=1, d3 b=1
    val n = 3.0; val avgdl = 10.0 / 3
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def part(df: Double, tf: Double, dl: Double) =
      hu(idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
    val exp1 = hu(part(2, 2, 4) + part(3, 1, 4), 4)
    val exp2 = hu(part(2, 1, 2) + part(3, 1, 2), 4)
    val exp3 = hu(part(3, 1, 4), 4)
    assert(exp1 > exp2 && exp2 > exp3) // rarer term + higher tf dominate

    val top2 = Bm25.topK(d, "doc_id", "text", Seq("a", "b"), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(top2.toSeq === Seq((1L, exp1, 1), (2L, exp2, 2)))

    val all = Bm25.topK(d, "doc_id", "text", Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq === Seq((1L, exp1), (2L, exp2), (3L, exp3)))
  }

  test("bm25: docs without any query term never appear; ties break on id") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "q q"), (2L, "q q"), (3L, "zz zz"))
      .toDF("doc_id", "text")
    val out = Bm25.topK(d, "doc_id", "text", Seq("q"), k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 1), (2L, 2))) // same score → id order
  }
}
