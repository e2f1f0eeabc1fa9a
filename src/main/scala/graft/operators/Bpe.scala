package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a document corpus, Spark-first
  * (north-star extension: tokenizer-vocabulary construction is the step
  * between corpus curation and model training).
  *
  * The work splits exactly the way production BPE trainers split it
  * (HuggingFace tokenizers, SentencePiece): the CORPUS-sized work is one
  * distributed word-frequency aggregation (scales with data, one
  * shuffle); the merge loop then runs on the driver over the bounded
  * word-frequency table — its cost is vocab × merges, independent of
  * corpus size. At 100 TB the count is the only part that touches the
  * data, and it is a plain map-side-combined groupBy.
  *
  * Determinism: pair selection breaks count ties lexicographically on
  * (left, right), and merge application rewrites occurrences
  * left-to-right non-overlapping — the result is a pure function of the
  * word-frequency table, hence of the corpus.
  */
object Bpe extends Serializable {

  /** Guard: the merge loop holds the word-frequency table on the driver;
    * a corpus whose DISTINCT-word count exceeds this is refused rather
    * than silently OOMing (real corpora: cap the table with a frequency
    * floor upstream — rare words contribute no early merges). */
  val DefaultMaxVocab = 200000

  /** Distributed word counts for `textCol` (whitespace tokens). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** One left-to-right non-overlapping rewrite of (l, r) → l+r — THE
    * merge-application semantics, shared by [[trainMerges]] and
    * [[encode]] so the two can never drift. */
  private[operators] def applyMerge(syms: Array[String], l: String,
      r: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** The driver-side merge loop: `k` rounds over (word, count). Each
    * round counts all adjacent symbol pairs (weighted by word count,
    * overlapping occurrences all counted), picks the most frequent pair
    * — ties break on the lexicographically smallest (left, right) — and
    * rewrites every word left-to-right non-overlapping. Returns
    * (rank, left, right, pair_count) for each merge learned; stops early
    * if no pair remains (all words fused to single symbols). */
  def trainMerges(counts: Seq[(String, Long)],
      k: Int): Seq[(Int, String, String, Long)] = {
    require(k >= 1, "k must be >= 1")
    var words: Array[(Array[String], Long)] =
      counts.map { case (w, c) =>
        (w.toCharArray.map(_.toString), c)
      }.toArray
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), n) = pairCounts.minBy { case ((a, b), c) =>
          (-c, a, b)
        }
        out += ((rank, l, r, n))
        words = words.map { case (syms, c) => (applyMerge(syms, l, r), c) }
        rank += 1
      }
    }
    out.result()
  }

  /** End-to-end: distributed count → driver merges → merge-table
    * DataFrame (rank, left, right, pair_count), rank-ordered. */
  def topMerges(df: DataFrame, textCol: String, k: Int,
      maxVocab: Int = DefaultMaxVocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = wordCounts(df, textCol)
    // refuse BEFORE collecting: a distributed limit-probe costs one tiny
    // job, whereas collect-then-check would BE the driver OOM the guard
    // exists to prevent
    val probe = counts.limit(maxVocab + 1).count()
    require(probe <= maxVocab,
      s"distinct-word count exceeds maxVocab $maxVocab — " +
        "apply a frequency floor upstream")
    val wc = counts.collect().map(r => (r.getString(0), r.getLong(1)))
    // sorted so the driver loop's input order (and so any same-count
    // same-pair bookkeeping) is independent of partitioning
    trainMerges(wc.sortBy(_._1).toIndexedSeq, k)
      .toDF("rank", "left", "right", "pair_count")
      .orderBy(col("rank"))
  }

  /** Tokenize `textCol` with an already-learned merge list: each word is
    * split to characters and the merges replay IN RANK ORDER — the
    * standard BPE encode. Pure driver-literal loop unrolled into nested
    * higher-order expressions would be unreadable at k merges, so this
    * is a UDF by design (the merge table is tiny; the UDF carries it as
    * a broadcast-friendly immutable list). Output: `bpe_tokens`
    * array<string> column appended. */
  def encode(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val ms = merges.toIndexedSeq
    val enc = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        var syms: Array[String] = w.toCharArray.map(_.toString)
        ms.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        syms.toSeq
      }
    }
    df.withColumn("bpe_tokens", enc(col(textCol)))
  }
}
