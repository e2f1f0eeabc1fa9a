package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer trainer — the
  * q124 BPE family's second face (VERDICT r11 #3). Kudo (2018)
  * trains a unigram language model over a bounded candidate vocab by
  * EM; this is the deterministic hard-EM (Viterbi) variant, built on
  * the q124 work split:
  *
  *  - the CORPUS-sized job runs once: whitespace word counts
  *    ([[wordCounts]]) — at 100 TB this is the only pass over the
  *    data, and it is one groupBy;
  *  - the candidate seed is every substring of the distinct-word
  *    table weighted by word frequency, pruned to all single
  *    characters (coverage) plus the top-`multiLimit` multi-char
  *    pieces under the (count DESC, piece ASC) tie-break — bounded
  *    by construction, like the BPE merge table;
  *  - each EM round is ONE distributed aggregation over the
  *    distinct-word relation (Viterbi-segment every word under the
  *    broadcast cost table, explode the pieces, sum word counts per
  *    piece), followed by a driver M-step over the vocab-sized count
  *    vector: p(piece) = count / total, cost = -ln p. Pieces that
  *    earn no Viterbi count drop out — the EM pruning dynamic.
  *
  * Every step is exactly replayable by the DuckDB oracle
  * (CurationQueries.unigramCtes): the Viterbi DP is position-unrolled
  * (corpus words are <= 8 chars, same guard as the BPE oracle), DP
  * costs accumulate in the identical left-to-right grouping so the
  * doubles are bit-equal given ln parity (which q119/q128/q177
  * established on this container), and ties break on the total
  * (cost, piece length, piece) order both sides.
  *
  * Reference anchor: extends the tokenizer family surveyed from the
  * reference's text path (SURVEY.md §2 F-rows); the trainer itself is
  * a north-star extension like Bpe.scala:107.
  */
object UnigramLm {

  /** Viterbi best segmentation of `w` under `cost` (additive -ln p).
    * DP over positions 0..n; at each end position the winning
    * transition minimizes (total cost, piece length, piece) — the
    * exact order the oracle's row_number() replays. Returns Nil when
    * the word is not coverable (cannot happen for round >= 1 vocabs:
    * a word's previous best pieces always survive the M-step). */
  def viterbiSegment(w: String,
      cost: scala.collection.Map[String, Double]): List[String] = {
    val n = w.length
    val dp = new Array[Double](n + 1)
    val bp = new Array[String](n + 1)
    val reach = new Array[Boolean](n + 1)
    reach(0) = true
    var e = 1
    while (e <= n) {
      var best = 0.0
      var bestPc: String = null
      var s = 0
      while (s < e) {
        if (reach(s)) {
          val pc = w.substring(s, e)
          val c0 = cost.getOrElse(pc, Double.NaN)
          if (!c0.isNaN) {
            val cst = dp(s) + c0
            // total order: cost, then piece length, then piece — NOTE
            // equal length at the same end position implies the same
            // start, i.e. the same piece, so the order is total
            val better = bestPc == null || cst < best ||
              (cst == best && (pc.length < bestPc.length ||
                (pc.length == bestPc.length && pc < bestPc)))
            if (better) { best = cst; bestPc = pc }
          }
        }
        s += 1
      }
      if (bestPc != null) { dp(e) = best; bp(e) = bestPc; reach(e) = true }
      e += 1
    }
    if (!reach(n)) Nil
    else {
      var pos = n
      var out = List.empty[String]
      while (pos > 0) { out = bp(pos) :: out; pos -= bp(pos).length }
      out
    }
  }

  /** Distinct whitespace words with corpus frequencies — the one
    * corpus-sized job; everything after runs on this relation. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Seed candidate vocab: substring counts weighted by word
    * frequency, pruned to all single chars + top-`multiLimit`
    * multi-char pieces. Returns the bounded (piece, count) rows. */
  private def seedCounts(words: DataFrame, multiLimit: Int)
      : Array[(String, Long)] = {
    val subs = words.select(col("c"), explode(expr(
      "flatten(transform(sequence(1, length(w)), s -> " +
        "transform(sequence(s, length(w)), e -> " +
        "substring(w, s, e - s + 1))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(multiLimit)
    chars.unionByName(multi)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  private def toCost(counts: Array[(String, Long)])
      : Map[String, Double] = {
    val tot = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) => p -> -math.log(c.toDouble / tot) }.toMap
  }

  /** Run `rounds` hard-EM rounds. Returns the per-round E-step counts
    * with the round's re-estimated cost, plus the final cost table
    * (what [[encode]] segments with). */
  def trainRounds(docs: DataFrame, textCol: String, multiLimit: Int,
      rounds: Int): (Seq[(Int, String, Long, Double)], Map[String, Double]) = {
    val spark = docs.sparkSession
    val words = wordCounts(docs, textCol).persist()
    words.count()
    var cost = toCost(seedCounts(words, multiLimit))
    val out = Seq.newBuilder[(Int, String, Long, Double)]
    for (r <- 1 to rounds) {
      val counts = eStepCounts(spark, words, cost)
      cost = toCost(counts)
      counts.foreach { case (p, c) => out += ((r, p, c, cost(p))) }
    }
    words.unpersist()
    (out.result(), cost)
  }

  /** E-step: ONE aggregation over the distinct-word relation — the
    * vocab ships broadcast, the piece-count vector comes back
    * vocab-sized (bounded), never word- or corpus-sized. */
  private def eStepCounts(spark: SparkSession, words: DataFrame,
      cost: Map[String, Double]): Array[(String, Long)] = {
    val bc = spark.sparkContext.broadcast(cost)
    val seg = udf((w: String) => viterbiSegment(w, bc.value))
    words.select(explode(seg(col("w"))).as("piece"), col("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** The trained vocab as a DataFrame: one row per (EM round, piece
    * that earned Viterbi counts), with the round's count and the
    * re-estimated cost — the unigram twin of Bpe.topMerges' ranked
    * merge table. */
  def train(docs: DataFrame, textCol: String, multiLimit: Int = 48,
      rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val (rows, _) = trainRounds(docs, textCol, multiLimit, rounds)
    import spark.implicits._
    rows.toDF("rnd", "piece", "n_uses", "cost")
      .select(col("rnd"), col("piece"), col("n_uses"),
        round(col("cost"), 6).as("cost"))
      .orderBy(col("rnd"), col("piece"))
  }

  /** All n-best segmentations of `w` under `cost` — the deterministic
    * core of Kudo (2018) §3's subword REGULARIZATION: the sampler
    * draws from the n-best list with probability ∝ p(seg)^α, and the
    * n-best list itself is exact. Words are ≤ 8 chars (the same guard
    * the position-unrolled oracle DP uses), so FULL enumeration of
    * the 2^(len-1) cut masks is bounded (≤ 128) and replayable —
    * no approximate lattice needed. A segmentation is valid iff every
    * piece is in the vocab; cost accumulates LEFT-TO-RIGHT over the
    * pieces (the list_sum contract) so both engines see bit-equal
    * doubles. Returns (rank 1.., seg '-'-joined, n_pieces, cost,
    * gap = cost − best cost): the gap IS the sampler's log-odds —
    * p(seg_i)/p(seg_1) = exp(−gap) — kept in log space so the gate
    * never depends on exp() libm parity. */
  def nBestSegmentations(w: String,
      cost: scala.collection.Map[String, Double], n: Int)
      : Seq[(Int, String, Int, Double, Double)] = {
    val L = w.length
    require(L <= 8, s"n-best enumeration unrolled to 8 chars, got $L")
    val scored = (0 until (1 << math.max(L - 1, 0))).flatMap { mask =>
      val cuts = (1 until L).filter(i => ((mask >> (i - 1)) & 1) == 1)
      val bnds = 0 +: cuts :+ L
      val pieces = (1 until bnds.length)
        .map(j => w.substring(bnds(j - 1), bnds(j)))
      val cs = pieces.map(cost.get)
      if (cs.exists(_.isEmpty)) None
      else Some((pieces.mkString("-"), pieces.length,
        cs.map(_.get).foldLeft(0.0)(_ + _)))
    }
    val ranked = scored.sortBy(t => (t._3, t._2, t._1)).take(n)
    // a word containing a character absent from the cost table has NO
    // valid segmentation — return the empty n-best list rather than
    // throwing from deep inside an executor (ADVICE r13): q237 is safe
    // by construction (the same corpus trained the vocab), but any
    // caller with a mismatched cost map deserves a clean empty answer
    if (ranked.isEmpty) return Seq.empty
    val best = ranked.head._3
    ranked.zipWithIndex.map { case ((seg, np, c), i) =>
      (i + 1, seg, np, c, c - best)
    }
  }

  /** Per-distinct-word n-best table (w, rank, seg, n_pieces, cost,
    * gap) under a trained cost table — one UDF pass over the bounded
    * distinct-word relation (the q127/q230 work split: 100 TB of
    * corpus re-enumerates each distinct word once). */
  def nBestTable(docs: DataFrame, textCol: String,
      cost: Map[String, Double], n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cost)
    val nb = udf((w: String) => nBestSegmentations(w, bc.value, n))
    wordCounts(docs, textCol)
      .select(col("w"), explode(nb(col("w"))).as("e"))
      .select(col("w"), col("e._1").as("rank"), col("e._2").as("seg"),
        col("e._3").cast("long").as("n_pieces"), col("e._4").as("cost"),
        col("e._5").as("gap"))
  }

  /** Per-distinct-word Viterbi token counts under a trained cost
    * table — the q127 lifecycle shape: token occurrences in the
    * corpus broadcast-join this bounded relation, so encoding 100 TB
    * re-segments each distinct word exactly once. */
  def wordTokenCounts(docs: DataFrame, textCol: String,
      cost: Map[String, Double]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(cost)
    val nsymU = udf((w: String) => viterbiSegment(w, bc.value).size)
    wordCounts(docs, textCol)
      .select(col("w"), nsymU(col("w")).cast("long").as("nsym"))
  }
}
