package graft

import graft.operators.UnigramLm

/** Parity gate for the unigram-LM trainer: the Viterbi DP against an
  * independent brute-force enumeration of ALL segmentations, and the
  * distributed trainer against a from-scratch in-memory EM — the
  * BpeSpec pattern (the oracle proves engine parity; this proves the
  * algorithm is the one the scaladoc claims). */
class UnigramLmSpec extends GraftSuite {
  import spark.implicits._

  /** Every segmentation of w into vocab pieces, cost summed
    * left-to-right (the DP's grouping). */
  private def allSegs(w: String, cost: Map[String, Double])
      : Seq[(List[String], Double)] = {
    def segs(rest: String): Seq[List[String]] =
      if (rest.isEmpty) Seq(Nil)
      else (1 to rest.length).flatMap { k =>
        val pc = rest.substring(0, k)
        if (cost.contains(pc)) segs(rest.substring(k)).map(pc :: _)
        else Seq.empty
      }
    segs(w).map(s => (s, s.foldLeft(0.0)((a, p) => a + cost(p))))
  }

  test("viterbiSegment reaches the brute-force minimum cost on " +
      "random words over random vocabs, and picks the unique " +
      "argmin when there is one") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(8)
      val w = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      // random vocab: all chars (coverage) + random substrings
      val pieces = (alphabet.map(_.toString) ++
        Seq.fill(6)({
          val s = rnd.nextInt(n); val e = s + 1 + rnd.nextInt(n - s)
          w.substring(s, e)
        })).distinct
      val cost = pieces.map(p => p -> (0.5 + rnd.nextDouble() * 4)).toMap
      val got = UnigramLm.viterbiSegment(w, cost)
      assert(got.nonEmpty, s"$w not covered")
      assert(got.mkString === w, s"$got does not spell $w")
      val gotCost = got.foldLeft(0.0)((a, p) => a + cost(p))
      val best = allSegs(w, cost)
      val minCost = best.map(_._2).min
      assert(gotCost === minCost,
        s"$w: dp cost $gotCost vs brute-force $minCost")
      val argmins = best.filter(_._2 == minCost).map(_._1)
      if (argmins.size == 1) assert(got === argmins.head)
    }
  }

  test("uncoverable words return Nil") {
    assert(UnigramLm.viterbiSegment("abc",
      Map("a" -> 1.0, "bc" -> 1.0, "abd" -> 1.0)) === List("a", "bc"))
    assert(UnigramLm.viterbiSegment("abc",
      Map("a" -> 1.0, "b" -> 1.0)) === Nil)
  }

  test("the distributed trainer matches a from-scratch in-memory EM " +
      "on a fixture corpus: per-round piece counts, survivor sets, " +
      "and re-estimated costs") {
    val docs = Seq(
      (1L, "s1", "aba bab abab ab"),
      (2L, "s1", "aba aba bb"),
      (3L, "s2", "abab abab aba b"),
      (4L, "s2", "ab bb bab"))
      .toDF("doc_id", "source", "text")
    val multiLimit = 4
    val rounds = 3
    // independent in-memory replay
    val wc = docs.collect().flatMap(_.getString(2).split(" "))
      .filter(_.nonEmpty).groupBy(identity).map { case (w, a) =>
        (w, a.length.toLong) }
    val subCnt = wc.toSeq.flatMap { case (w, c) =>
      for (s <- 0 until w.length; e <- s + 1 to w.length)
        yield (w.substring(s, e), c)
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
    val seed = subCnt.filter(_._1.length == 1) ++
      subCnt.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(multiLimit)
    def toCost(cnt: Iterable[(String, Long)]): Map[String, Double] = {
      val tot = cnt.map(_._2).sum.toDouble
      cnt.map { case (p, c) => p -> -math.log(c.toDouble / tot) }.toMap
    }
    var cost = toCost(seed.toSeq)
    val expect = Seq.newBuilder[(Int, String, Long, Double)]
    for (r <- 1 to rounds) {
      val counts = wc.toSeq.flatMap { case (w, c) =>
        UnigramLm.viterbiSegment(w, cost).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      cost = toCost(counts)
      counts.toSeq.sortBy(_._1).foreach { case (p, c) =>
        expect += ((r, p, c,
          BigDecimal(cost(p)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    val got = UnigramLm.train(docs, "text", multiLimit, rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expect.result())
  }

  test("EM pruning only ever shrinks the vocab, and every word stays " +
      "coverable every round on the corpus") {
    val docs = Tables.documents(spark, sf)
    val (rows, finalCost) =
      UnigramLm.trainRounds(docs, "text", multiLimit = 48, rounds = 3)
    val byRound = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byRound(2).subsetOf(byRound(1)))
    assert(byRound(3).subsetOf(byRound(2)))
    assert(byRound(3).nonEmpty)
    val words = UnigramLm.wordCounts(docs, "text")
      .collect().map(_.getString(0))
    words.foreach { w =>
      assert(UnigramLm.viterbiSegment(w, finalCost).nonEmpty,
        s"word $w lost coverage")
    }
  }
}
