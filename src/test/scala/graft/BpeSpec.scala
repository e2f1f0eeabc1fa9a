package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends GraftSuite {

  /** Independent reference implementation (functional style, different
    * code path from Bpe.trainMerges' imperative loop) with the same
    * documented rules: overlapping pair counts, count-then-lexicographic
    * selection, left-to-right non-overlapping rewrite. */
  private def refMerges(counts: Seq[(String, Long)],
      k: Int): Seq[(Int, String, String, Long)] = {
    def applyMerge(ss: List[String], l: String,
        r: String): List[String] = ss match {
      case a :: b :: rest if a == l && b == r =>
        (l + r) :: applyMerge(rest, l, r)
      case a :: rest => a :: applyMerge(rest, l, r)
      case Nil => Nil
    }
    var words = counts.map { case (w, c) =>
      (w.toList.map(_.toString), c) }
    (1 to k).iterator.map { rank =>
      val pc = words
        .flatMap { case (ss, c) => ss.zip(ss.tail).map(p => (p, c)) }
        .groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      if (pc.isEmpty) None
      else {
        val ((l, r), n) =
          pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
        words = words.map { case (ss, c) => (applyMerge(ss, l, r), c) }
        Some((rank, l, r, n))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
  }

  test("classic BPE example: es/est merges with lexicographic tie-break") {
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val got = Bpe.trainMerges(counts, 3)
    // ("e","s") and ("s","t") both count 9: lexicographic tie-break
    // picks (e,s); the fused "es" then pairs with "t" 9 times
    assert(got.head === ((1, "e", "s", 9L)))
    assert(got(1) === ((2, "es", "t", 9L)))
    assert(got === refMerges(counts, 3))
  }

  test("overlapping pairs count every occurrence; rewrite is " +
      "left-to-right non-overlapping") {
    val got = Bpe.trainMerges(Seq(("aaa", 2L)), 2)
    // "aaa" has TWO (a,a) occurrences ×2 words-worth of count = 4;
    // the rewrite fuses left-to-right: aaa -> [aa, a], so round 2
    // sees ("aa","a") twice
    assert(got === Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("stops early when no pairs remain") {
    val got = Bpe.trainMerges(Seq(("ab", 1L)), 10)
    assert(got === Seq((1, "a", "b", 1L)))
  }

  test("matches the reference implementation on the real corpus") {
    val wc = Bpe.wordCounts(Tables.documents(spark, sf), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    assert(Bpe.trainMerges(wc, 10) === refMerges(wc, 10))
  }

  test("topMerges is partition-count invariant and rank-ordered") {
    val docs = Tables.documents(spark, sf)
    def run(parts: Int): Seq[(Int, String, String, Long)] =
      Bpe.topMerges(docs.repartition(parts), "text", 8)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    val a = run(3)
    assert(a === run(8))
    assert(a.map(_._1) === (1 to a.length))
  }

  test("encode replays merges in rank order") {
    val s = spark
    import s.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val out = Bpe.encode(Seq((1L, "lowest test")).toDF("id", "text"),
        "text", merges)
      .select($"bpe_tokens").head().getSeq[String](0)
    // lowest -> l o w e s t -> (es) l o w es t -> (est) l o w est
    //        -> (lo) lo w est ; test -> t est
    assert(out === Seq("lo", "w", "est", "t", "est"))
  }

  test("vocab guard refuses an over-sized word table") {
    val s = spark
    import s.implicits._
    val df = (1 to 30).map(i => (i.toLong, s"w$i x$i y$i"))
      .toDF("id", "text")
    intercept[IllegalArgumentException] {
      Bpe.topMerges(df, "text", 2, maxVocab = 10)
    }
  }
}
