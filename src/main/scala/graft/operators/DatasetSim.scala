package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-level similarity — the governance view over a multi-source
  * corpus: for every source pair, the exact Jaccard similarity of
  * their distinct shingle sets AND the MinHash estimate from compact
  * per-source signatures. The signature is what scales (32 md5-min
  * slots per source regardless of size — dataset onboarding compares
  * signatures, never corpora); the exact face is the ground truth the
  * estimate is judged by, and BOTH are SQL-replayable (q200): the md5
  * hash family is the q176 portable-minhash trick lifted from
  * documents to datasets.
  *
  * 100 TB shape: one distinct-shingle pass builds both faces' inputs;
  * signatures are (sources × slots) rows; the exact intersection join
  * keys on the shingle string (hash it at larger scales — same plan).
  */
object DatasetSim {

  /** Distinct (source, shingle) pairs — `n`-token shingles. */
  private def shingles(docs: DataFrame, srcCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(srcCol).as("src"),
      explode(graft.functions.TextFunctions.bound(
          split(col(textCol), " ")) { toks =>
        when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      }).as("shingle"))
      .distinct()

  /** Pairwise source similarity: (src_a, src_b, n_a, n_b, n_common,
    * jaccard — exact, jaccard_est — `slots`-slot md5-MinHash estimate),
    * src_a < src_b, both scores 6 dp. */
  def pairwise(docs: DataFrame, srcCol: String, textCol: String,
      shingleN: Int = 3, slots: Int = 32): DataFrame = {
    require(shingleN >= 1 && slots >= 1,
      s"need shingleN >= 1 and slots >= 1, got ($shingleN, $slots)")
    // not persisted: the branches consume it inside ONE final job and
    // an eager cache would outlive the call (the q159 lesson — measure
    // before caching; the distinct re-scan is cheap at any SF)
    val sh = shingles(docs, srcCol, textCol, shingleN)
    val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    // per-(source, slot) signature: lexicographic min of the salted md5
    val sig = sh
      .select(col("src"),
        explode(sequence(lit(1), lit(slots))).as("slot"),
        col("shingle"))
      .groupBy(col("src"), col("slot"))
      .agg(min(md5(concat_ws("|", col("slot").cast("string"),
        col("shingle")))).as("mh"))
    val est = sig.as("a").join(sig.as("b"),
        col("a.slot") === col("b.slot") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg((sum(when(col("a.mh") === col("b.mh"), 1).otherwise(0))
        .cast("double") / slots).as("est"))
    val out = sizes.as("sa").join(sizes.as("sb"),
        col("sa.src") < col("sb.src"))
      .select(col("sa.src").as("src_a"), col("sb.src").as("src_b"),
        col("sa.n").as("n_a"), col("sb.n").as("n_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .join(est, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") -
            coalesce(col("n_common"), lit(0L))), 6).as("jaccard"),
        round(coalesce(col("est"), lit(0.0)), 6).as("jaccard_est"))
      .orderBy(col("src_a"), col("src_b"))
    out
  }
}
