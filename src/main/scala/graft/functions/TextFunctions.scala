package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library (north-star extension): language-ID
  * (stopword n-gram heuristic), quality scoring, token counting,
  * document fingerprinting. All pure built-in expressions — codegen'd,
  * one scan, no shuffle, so they run at ingest bandwidth on any corpus
  * size.
  */
object TextFunctions extends Serializable {

  def tokens(text: Column): Column = split(text, " ")

  /** Let-binding for higher-order-function pipelines: evaluates `v`
    * ONCE per row and hands the materialized value to `body` as a
    * lambda variable. A lambda body re-evaluates any OUTER expression
    * it references per element (HOFs are interpreted — no
    * common-subexpression elimination inside the lambda), so e.g.
    * slicing an unbound `split(...)` array inside a transform() over
    * its windows re-splits the document per window — an O(n²) term
    * measured at 6× on the shingle family and 73× on winnowing
    * (BASELINE.md round-8 HOF-CSE rows). The single-element transform
    * is the cheapest binder Spark's expression language offers. */
  def bound(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Tiny per-language stopword profiles for the heuristic language ID.
    * Deliberately small: the operator's shape (profile scoring + argmax)
    * is the point; profiles are swappable data. */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pas", "que", "pour", "dans"))

  /** Fraction of tokens that appear in `words`. */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isInCollection(words))).cast("double") /
      size(toks)
  }

  /** Heuristic language ID: argmax of per-language stopword ratios, 'und'
    * (undetermined) when no profile scores above `minScore`. Ties break by
    * profile order (en first) — deterministic. */
  def langId(text: Column, minScore: Double = 0.02): Column = {
    val scores = stopwordProfiles.map { case (lang, words) =>
      lang -> stopwordRatio(text, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val picks = scores.map { case (lang, score) =>
      when(score >= minScore && score === best, lit(lang))
    }
    coalesce(picks :+ lit("und"): _*)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: whitespace tokens plus extra units
    * for long tokens (every 4 chars beyond the first 4 ≈ one merge-level
    * subword) — a deterministic, vocabulary-free approximation. */
  def subwordCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + lit(1L) +
        floor((length(t).cast("double") - 1.0) / 4.0).cast("long"))

  /** Type-token ratio (distinct tokens / tokens) — repetitiveness gauge. */
  def typeTokenRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    size(array_distinct(toks)).cast("double") / size(toks)
  }

  /** Composite quality score in [0,1]: length band + lexical diversity +
    * mean-token-length band. The weights/bands are heuristic data; the
    * operator shape (pure-expression composite score) is the point. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val diversity = typeTokenRatio(text)
    val meanTokLen = (length(text).cast("double") - nTok + 1.0) / nTok
    val tokLenScore = when(meanTokLen.between(3.0, 9.0), 1.0).otherwise(0.5)
    round(lenScore * 0.4 + diversity * 0.4 + tokLenScore * 0.2, 6)
  }

  /** Email/phone patterns for PII scrubbing — deliberately simple,
    * RE2-compatible syntax so the same pattern runs identically in Spark
    * (Java regex) and DuckDB (RE2): no backreferences, no lookaround. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{2,4}"

  /** PII scrubbing: emails → `<EMAIL>`, international-format phone
    * numbers → `<PHONE>`. Pure regexp_replace — codegen'd, one pass, the
    * standard pre-training redaction step. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** How many PII hits a redaction pass would scrub (audit metric). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Word 2-grams of the token stream, NON-distinct (repetition analysis
    * needs the duplicates). */
  def wordBigrams(text: Column): Column =
    bound(tokens(text)) { t =>
      transform(sequence(lit(1), greatest(lit(1), size(t) - 1)),
        i => concat_ws(" ", slice(t, i, lit(2))))
    }

  /** Gopher-style repetition signals per document:
    * `dup_bigram_frac` = fraction of bigram occurrences that are repeats
    * (1 − distinct/total); `top_bigram_share` = share of the most frequent
    * bigram. Both pure expressions — the per-doc occurrence count is
    * O(distinct × total) inside one row, fine at document length and
    * embarrassingly parallel across the corpus. */
  def dupBigramFrac(text: Column): Column = {
    val bg = wordBigrams(text)
    round(lit(1.0) -
      size(array_distinct(bg)).cast("double") / size(bg), 4)
  }

  def topBigramShare(text: Column): Column = {
    val bg = wordBigrams(text)
    val counts = transform(array_distinct(bg),
      b => size(filter(bg, x => x === b)))
    round(array_max(counts).cast("double") / size(bg), 4)
  }

  /** Top-`topN` vocabulary by token frequency (ties broken by token
    * string, so the set is a total-order-deterministic function of the
    * corpus). One explode + one groupBy shuffle; the result is tiny by
    * construction (≤ topN rows) — safe to collect and broadcast as a
    * literal into [[oovFraction]]. */
  def vocabulary(df: org.apache.spark.sql.DataFrame, textCol: String,
      topN: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)

  /** Out-of-vocabulary fraction of a document's tokens against a
    * (driver-bounded) vocabulary — the tokenizer-coverage signal of a
    * pretraining pipeline. Pure expressions: the vocab rides along as an
    * array literal (sorted for binary-searchable semantics; size is
    * topN, not corpus-sized). */
  def oovFraction(text: Column, vocab: Seq[String]): Column = {
    val vlit = array(vocab.sorted.map(lit): _*)
    val toks = tokens(text)
    size(filter(toks, t => !array_contains(vlit, t))).cast("double") /
      size(toks)
  }

  /** Laplace-smoothed unigram language-model scores — the
    * perplexity-filtering signal of a CCNet-style quality pipeline:
    * p(t) = (count(t) + 1) / (N + V) over the given training corpus,
    * score(doc) = mean ln p(t) over its tokens (higher = more typical;
    * gibberish and outlier docs score low). Train and score corpora may
    * differ (score web text under a trusted-corpus LM).
    *
    * Shape: one groupBy(token) shuffle builds the counts, one
    * equi-join scores (AQE broadcasts it while the vocab is small; a
    * 100 TB vocab degrades gracefully to a shuffle join), one
    * groupBy(doc) aggregates. All built-in expressions. */
  def unigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      train: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val corpus = train.getOrElse(df)
    val tok = corpus.select(explode(tokens(col(textCol))).as("t"))
    val counts = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
    // (N + V) rides along as a broadcast one-row cross join instead of
    // an eager .head(): the query stays lazy, and exchange reuse shares
    // ONE counts aggregation between the totals and the scoring join
    // (an eager head() would run the corpus explode+shuffle twice)
    val totals = broadcast(counts
      .agg((sum(col("c")) + count(lit(1))).cast("double").as("__nv")))
    val scored = df
      .select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .join(counts, Seq("t"), "left_outer")
      .crossJoin(totals)
      .select(col(idCol),
        log((coalesce(col("c"), lit(0L)) + lit(1.0)) / col("__nv"))
          .as("lp"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("lp")).as("avg_logprob"))
  }

  /** Interpolated bigram LM score (the perplexity-style quality signal
    * of CCNet, Wenzek et al. 2019, arXiv:1911.00359 — there a 5-gram
    * KenLM; here the order-2 member of the same family, one order up
    * from [[unigramLogProb]]): per document, the mean over positions
    * i ≥ 2 of
    *   log( λ·C(w_{i-1},w_i)/C_head(w_{i-1}) + (1−λ)·(C(w_i)+1)/(N+V) )
    * — conditional bigram MLE interpolated with the Laplace unigram, so
    * unseen bigrams back off instead of −∞ (the unigram term is always
    * positive). C_head sums the bigram table per head word, which makes
    * the conditional a true distribution over observed continuations.
    *
    * Shape at 100 TB: one bigram-count shuffle + one head-sum + the
    * unigram counts, then scoring joins on the gram keys — the same
    * count-then-join plan as the unigram scorer, nothing quadratic.
    * Train on `train` (defaults to `df` itself); docs with fewer than 2
    * tokens have no bigrams and are absent from the output. */
  def bigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, lambda: Double = 0.5,
      train: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val corpus = train.getOrElse(df)
    def bigramsOf(t: Column): Column =
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = corpus
      .select(explode(bigramsOf(tokens(col(textCol)))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bcnt = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    val hcnt = bcnt.groupBy(col("w1")).agg(sum(col("cb")).as("ch"))
    val tok = corpus.select(explode(tokens(col(textCol))).as("t"))
    val counts = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val totals = broadcast(counts
      .agg((sum(col("c")) + count(lit(1))).cast("double").as("__nv")))
    // λ and 1−λ are both computed IN the expression (lit(1.0) − lit(λ))
    // so Spark and the DuckDB oracle materialize the identical doubles
    val scored = df
      .select(col(idCol), explode(bigramsOf(tokens(col(textCol)))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(bcnt, Seq("w1", "w2"), "left_outer")
      .join(hcnt, Seq("w1"), "left_outer")
      .join(counts.withColumnRenamed("t", "w2"), Seq("w2"), "left_outer")
      .crossJoin(totals)
      .select(col(idCol),
        log(lit(lambda) *
            (coalesce(col("cb"), lit(0L)) / coalesce(col("ch"), lit(1L))) +
          (lit(1.0) - lit(lambda)) *
            ((coalesce(col("c"), lit(0L)) + lit(1.0)) / col("__nv")))
          .as("lp"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("avg_logprob"))
  }

  /** Interpolated Kneser-Ney TRIGRAM log-probability per document —
    * the CCNet-class LM filter next to the q119 unigram and q128
    * interpolated-bigram scorers (VERDICT r11 #8). Chen & Goodman
    * (1998) interpolated KN with a fixed discount D:
    *
    *   P(w3|w1w2) = max(c(w1w2w3)−D,0)/c(w1w2·)
    *                + D·N1+(w1w2·)/c(w1w2·) · P(w3|w2)
    *   P(w3|w2)   = max(N1+(·w2w3)−D,0)/N1+(·w2·)
    *                + D·N1+(w2·)/N1+(·w2·) · P(w3)
    *   P(w3)      = N1+(·w3)/N1+(··)        (continuation unigram)
    *
    * Every count table derives from ONE trigram-count aggregation
    * (c(w1w2·) = Σ_w3 c(w1w2w3); the bigram TYPE tables come from the
    * distinct (w2,w3) pairs of the same relation) — one counts
    * shuffle per order, then vocab-bounded broadcast joins back onto
    * the scored trigrams. Scored trigrams come from the corpus, so
    * c(w1w2w3) ≥ 1 and no denominator is ever 0. D = 0.75 — a dyadic
    * literal, IEEE-exact on both engines; all arithmetic is spelled
    * with the same shape the DuckDB oracle uses so the doubles agree
    * bit-for-bit before the final 6-dp pin (the q128 contract). */
  def trigramKnLogProb(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, discount: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    val D = lit(discount)
    // window count clamped at 0: a doc with < 3 tokens has NO trigrams
    // and must vanish from the output (the oracle's len(ws) >= 3
    // guard), not crash — Slice throws on a negative length, and a
    // 1-token doc makes size(t) - 2 = -1 (ADVICE r12)
    def trigramsOf(t: Column): Column = {
      val nTri = greatest(size(t) - 2, lit(0))
      zip_with(
        zip_with(slice(t, lit(1), nTri),
          slice(t, lit(2), nTri),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(t, lit(3), nTri),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3")))
    }
    val tri = df
      .select(col(idCol),
        explode(trigramsOf(tokens(col(textCol)))).as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val tc = tri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("ct"))
    val hist = tc.groupBy(col("w1"), col("w2"))
      .agg(sum(col("ct")).as("ch"), countDistinct(col("w3")).as("n1f"))
    val midn = tc.groupBy(col("w2"), col("w3"))
      .agg(countDistinct(col("w1")).as("n1pre"))
    val midd = tc.select(col("w1"), col("w2"), col("w3")).distinct()
      .groupBy(col("w2")).agg(count(lit(1)).as("nmid"))
    val bty = tc.select(col("w2"), col("w3")).distinct()
    val bfol = bty.groupBy(col("w2")).agg(count(lit(1)).as("nfol"))
    val bpre = bty.groupBy(col("w3")).agg(count(lit(1)).as("npre"))
    val btot = broadcast(bty.agg(count(lit(1)).as("__b")))
    val puni = col("npre").cast("double") / col("__b").cast("double")
    val pmid =
      greatest(col("n1pre").cast("double") - D, lit(0.0)) /
        col("nmid").cast("double") +
        D * col("nfol").cast("double") / col("nmid").cast("double") *
        puni
    val ptri =
      greatest(col("ct").cast("double") - D, lit(0.0)) /
        col("ch").cast("double") +
        D * col("n1f").cast("double") / col("ch").cast("double") *
        pmid
    // count-table joins stay strategy-free (the q128 shape): at bench
    // scale AQE broadcasts them, at 100 TB trigram TYPE tables can be
    // billions of rows and the planner must be free to shuffle
    val scored = tri
      .join(tc, Seq("w1", "w2", "w3"))
      .join(hist, Seq("w1", "w2"))
      .join(midn, Seq("w2", "w3"))
      .join(midd, Seq("w2"))
      .join(bfol, Seq("w2"))
      .join(bpre, Seq("w3"))
      .crossJoin(btot)
      .select(col(idCol), log(ptri).as("lp"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), avg(col("lp")).as("avg_logprob"))
  }

  /** Gopher-style document-quality rule pack (Rae et al. 2021,
    * arXiv:2112.11446, Appendix A1.1 — the document filters of the
    * MassiveWeb curation pipeline), as ONE struct-valued expression so a
    * corpus sweep evaluates every rule in a single codegen'd scan:
    *
    *  - `n_words`          whitespace token count ∈ [minWords, maxWords]
    *  - `mean_word_len`    mean token length ∈ [minMeanWordLen, maxMeanWordLen]
    *  - `symbol_ratio`     fraction of chars in `symbols` ≤ maxSymbolRatio
    *  - `alpha_word_ratio` fraction of tokens containing an alphabetic
    *                       char ≥ minAlphaWordRatio
    *  - `stop_hits`        distinct required-stopword hits ≥ minStopHits
    *  - `keep`             conjunction of all five
    *
    * All pure built-ins (no UDF), so the gate runs at scan bandwidth on
    * any corpus size and composes with [[graft.operators.Profiler]] for
    * the report form. Thresholds are parameters because they are
    * corpus-tuned in practice (the paper's own values assume web text). */
  def gopherFlags(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      symbols: String = "#…", maxSymbolRatio: Double = 0.1,
      minAlphaWordRatio: Double = 0.8,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopHits: Int = 2): Column = {
    val toks = tokens(text)
    val nWords = size(toks)
    val meanLen = aggregate(toks, lit(0L), (s, t) => s + length(t))
      .cast("double") / nWords
    val symRatio = (length(text) - length(translate(text, symbols, "")))
      .cast("double") / greatest(length(text), lit(1))
    val alphaRatio = size(filter(toks, t => t.rlike("[a-zA-Z]")))
      .cast("double") / nWords
    val stopHits = size(filter(
      array(stopwords.map(lit): _*), s => array_contains(toks, s)))
    val keep = nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanWordLen, maxMeanWordLen) &&
      symRatio <= maxSymbolRatio &&
      alphaRatio >= minAlphaWordRatio &&
      stopHits >= minStopHits
    struct(nWords.as("n_words"), round(meanLen, 4).as("mean_word_len"),
      round(symRatio, 4).as("symbol_ratio"),
      round(alphaRatio, 4).as("alpha_word_ratio"),
      stopHits.as("stop_hits"), keep.as("keep"))
  }

  /** Polynomial rolling fingerprint over the token stream:
    * fp = fold(7, (acc, t) => (acc*31 + unit(t)) mod 1e9+7) where
    * unit(t) = length(t) + ascii(first char). Modding every step keeps the
    * value inside exact-integer range in any engine (no overflow
    * divergence). Order-sensitive by construction (it fingerprints the
    * sequence, not the bag). */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text),
        t => (length(t) + ascii(t)).cast("long")),
      lit(7L),
      (acc, t) => (acc * 31L + t) % 1000000007L)
}
