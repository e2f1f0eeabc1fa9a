package graft

import graft.functions.TextFunctions

/** Parity gate for the interpolated Kneser-Ney trigram scorer: a
  * from-scratch in-memory KN implementation on a hand corpus, plus
  * the property that makes KN a real smoothing method — each
  * context's distribution sums to 1 over the continuation vocab
  * (discount mass exactly re-spent by the lower orders). */
class TrigramKnSpec extends GraftSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b c a b d a"),
    (2L, "b c a b c"),
    (3L, "c c a b a d"),
    (4L, "a b"), // < 3 tokens: contributes no trigram, absent from out
    (5L, "d a b c a a"),
    // the ADVICE-r12 crash class: size(tokens) - 2 goes NEGATIVE here
    // (Slice throws "Unexpected value for length" without the clamp) —
    // both must score nothing, not fail the whole corpus scan
    (6L, "a"), // 1 token
    (7L, "")) // split("", " ") = [""] — 1 empty token

  private val D = 0.75

  // independent count tables
  private val tris = corpus.flatMap { case (_, t) =>
    t.split(" ").toSeq.sliding(3).filter(_.size == 3)
      .map(s => (s(0), s(1), s(2)))
  }
  private val tc = tris.groupBy(identity).map { case (k, v) =>
    (k, v.size.toLong) }
  private val hist = tc.groupBy { case ((w1, w2, _), _) => (w1, w2) }
    .map { case (k, m) => (k, (m.values.sum, m.size.toLong)) }
  private val midn = tc.keys.groupBy { case (_, w2, w3) => (w2, w3) }
    .map { case (k, ts) => (k, ts.map(_._1).toSet.size.toLong) }
  private val midd = tc.keys.groupBy(_._2)
    .map { case (w2, ts) => (w2, ts.size.toLong) }
  private val bty = tc.keys.map { case (_, w2, w3) => (w2, w3) }.toSet
  private val bfol = bty.groupBy(_._1).map { case (w2, s) =>
    (w2, s.size.toLong) }
  private val bpre = bty.groupBy(_._2).map { case (w3, s) =>
    (w3, s.size.toLong) }
  private val btot = bty.size.toLong

  private def pUni(w3: String): Double =
    bpre.getOrElse(w3, 0L).toDouble / btot.toDouble

  private def pMid(w2: String, w3: String): Double = {
    val nmid = midd(w2).toDouble
    math.max(midn.getOrElse((w2, w3), 0L).toDouble - D, 0.0) / nmid +
      D * bfol(w2).toDouble / nmid * pUni(w3)
  }

  private def pTri(w1: String, w2: String, w3: String): Double = {
    val (ch, n1f) = hist((w1, w2))
    math.max(tc.getOrElse((w1, w2, w3), 0L).toDouble - D, 0.0) /
      ch.toDouble +
      D * n1f.toDouble / ch.toDouble * pMid(w2, w3)
  }

  test("every context's KN distribution sums to exactly 1 over the " +
      "continuation vocab — the discounted mass is fully re-spent " +
      "by the interpolated lower orders") {
    val vocab = bty.map(_._2)
    assert(vocab.nonEmpty && hist.nonEmpty)
    hist.keys.foreach { case (w1, w2) =>
      val s = vocab.toSeq.map(w3 => pTri(w1, w2, w3)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"context ($w1,$w2) sums to $s")
    }
    // and the unigram base itself is a distribution
    assert(math.abs(vocab.toSeq.map(pUni).sum - 1.0) < 1e-12)
  }

  test("the distributed scorer equals the independent implementation " +
      "per document") {
    val got = TextFunctions.trigramKnLogProb(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val expect = corpus.flatMap { case (id, t) =>
      val lps = t.split(" ").toSeq.sliding(3).filter(_.size == 3)
        .map(s => math.log(pTri(s(0), s(1), s(2)))).toSeq
      if (lps.isEmpty) None
      else Some(id -> ((lps.size.toLong, lps.sum / lps.size)))
    }.toMap
    assert(got.keySet === expect.keySet)
    assert(!got.contains(4L)) // the 2-token doc scored nothing
    assert(!got.contains(6L) && !got.contains(7L)) // sub-2-token docs too
    expect.foreach { case (id, (n, avg)) =>
      assert(got(id)._1 === n)
      assert(math.abs(got(id)._2 - avg) < 1e-12,
        s"doc $id: ${got(id)._2} vs $avg")
    }
  }
}
