package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Bpe

/** Round-5 curation surface: Gopher-style document filtering, robust
  * (winsorized) statistics, sliding window frames, and BPE tokenizer
  * training. Everything except the BPE merge table (iterative semantics,
  * not ANSI-expressible) is DuckDB-oracled. */
object CurationQueries {

  def all: Seq[GraftQuery] =
    Seq(q121GopherFilters, q122Winsorize, q123RollingFeatures,
      q124BpeMerges, q125QuantileBins, q126RankDistribution,
      q127BpeEncode, q128BigramLogProb, q129GroupingSets,
      q130StringAgg, q229UnigramLmTrain, q230UnigramLmEncode,
      q237UnigramNBestOracled,
      q234TrigramKnOracled)

  /** Gopher rule-pack sweep ([[TextFunctions.gopherFlags]]): per-doc
    * rule values + keep decision in ONE codegen'd scan — the MassiveWeb
    * document gate. Thresholds tuned to the synthetic corpus so `keep`
    * actually varies (the defaults assume web text). */
  val q121GopherFilters: GraftQuery = GraftQuery(
    "q121_gopher_filters",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("g", TextFunctions.gopherFlags($"text",
          minWords = 40, maxWords = 100000,
          stopwords = Seq("the", "a"), minStopHits = 2))
        .select($"doc_id", $"g.n_words", $"g.mean_word_len",
          $"g.symbol_ratio", $"g.alpha_word_ratio", $"g.stop_hits",
          $"g.keep")
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, n_words, round(mean_word_len, 4) AS mean_word_len, " +
        "round(symbol_ratio, 4) AS symbol_ratio, " +
        "round(alpha_word_ratio, 4) AS alpha_word_ratio, stop_hits, " +
        "(n_words BETWEEN 40 AND 100000 AND " +
        "mean_word_len BETWEEN 3.0 AND 10.0 AND " +
        "symbol_ratio <= 0.1 AND alpha_word_ratio >= 0.8 AND " +
        "stop_hits >= 2) AS keep FROM (" +
        "SELECT doc_id, " +
        "len(ws) AS n_words, " +
        "list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws) " +
        "AS mean_word_len, " +
        "(length(text) - length(replace(replace(text, '#', ''), '…', '')))" +
        "::DOUBLE / greatest(length(text), 1) AS symbol_ratio, " +
        "len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE " +
        "/ len(ws) AS alpha_word_ratio, " +
        "len(list_filter(['the', 'a'], s2 -> list_contains(ws, s2))) " +
        "AS stop_hits " +
        "FROM (SELECT doc_id, text, string_split(text, ' ') AS ws " +
        "FROM documents)) ORDER BY doc_id"))

  /** Robust per-group statistics: exact p05/p95/median via one sort-based
    * aggregation, then winsorized mean and MAD via a BROADCAST join-back
    * of the 3-row stats table — the outlier-resistant profile of a
    * numeric column. Two shuffles total and the join side is tiny: the
    * agg-then-broadcast-back pattern that survives 100 TB (never a
    * per-group window over the fact table). */
  val q122Winsorize: GraftQuery = GraftQuery(
    "q122_winsorize",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select($"l_returnflag".as("rf"),
          $"l_extendedprice".cast("double").as("x"))
      val stats = li.groupBy($"rf").agg(
        expr("percentile(x, 0.05)").as("p05r"),
        expr("percentile(x, 0.95)").as("p95r"),
        expr("percentile(x, 0.5)").as("medr"))
      li.join(broadcast(stats), Seq("rf"))
        .select($"rf", $"p05r", $"p95r",
          greatest($"p05r", least($"p95r", $"x")).as("wx"),
          abs($"x" - $"medr").as("dev"))
        .groupBy($"rf")
        .agg(round(first($"p05r"), 6).as("p05"),
          round(first($"p95r"), 6).as("p95"),
          round(avg($"wx"), 4).as("wins_mean"),
          round(expr("percentile(dev, 0.5)"), 6).as("mad"))
        .select($"rf".as("l_returnflag"), $"p05", $"p95", $"wins_mean",
          $"mad")
        .orderBy($"l_returnflag")
    },
    Some(
      "WITH li AS (SELECT l_returnflag AS rf, l_extendedprice::DOUBLE " +
        "AS x FROM lineitem), " +
        "s AS (SELECT rf, quantile_cont(x, 0.05) AS p05r, " +
        "quantile_cont(x, 0.95) AS p95r, quantile_cont(x, 0.5) AS medr " +
        "FROM li GROUP BY rf) " +
        "SELECT li.rf AS l_returnflag, round(s.p05r, 6) AS p05, " +
        "round(s.p95r, 6) AS p95, " +
        "round(avg(greatest(s.p05r, least(s.p95r, li.x))), 4) " +
        "AS wins_mean, " +
        "round(quantile_cont(abs(li.x - s.medr), 0.5), 6) AS mad " +
        "FROM li JOIN s ON li.rf = s.rf " +
        "GROUP BY li.rf, s.p05r, s.p95r, s.medr ORDER BY l_returnflag"))

  /** Sliding ROWS frames (3-event rolling mean/max), cumulative count,
    * and inter-event gap — the per-entity feature-engineering window
    * pack. One shuffle on user_id serves every frame (all windows share
    * the (user_id | ts, event_id) sort), and the total ORDER BY makes the
    * whole 10k-row feature table hash-checkable. */
  val q123RollingFeatures: GraftQuery = GraftQuery(
    "q123_rolling_features",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val w3 = w.rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .select($"user_id", $"event_id",
          round(avg($"value").over(w3), 4).as("avg3"),
          max($"value").over(w3).as("max3"),
          count(lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("cum_n"),
          coalesce(unix_millis($"ts") - lag(unix_millis($"ts"), 1)
            .over(w), lit(0L)).as("gap_ms"))
        .orderBy($"user_id", $"event_id")
    },
    Some(
      "SELECT user_id, event_id, " +
        "round(avg(value) OVER w3, 4) AS avg3, " +
        "max(value) OVER w3 AS max3, " +
        "count(*) OVER wc AS cum_n, " +
        "coalesce(epoch_ms(ts) - lag(epoch_ms(ts)) OVER wo, 0) AS gap_ms " +
        "FROM events WINDOW " +
        "w3 AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), " +
        "wc AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wo AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY user_id, event_id"))

  /** Equi-depth binning (the QuantileDiscretizer artifact pattern): fit
    * decile edges with ONE exact-percentile aggregation, then assign
    * bins by counting edges below each value — the fitted edges travel
    * as a 9-double literal, so the transform is a codegen'd scan with no
    * join. Both engines interpolate percentiles identically, so the
    * whole fit+transform round trip is hash-checked. */
  val q125QuantileBins: GraftQuery = GraftQuery(
    "q125_quantile_bins",
    (s, d) => {
      import s.implicits._
      val ord = Tables.orders(s, d)
      val edges = ord
        .select(expr("percentile(o_totalprice, " +
          "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("e"))
        .head().getSeq[Double](0)
      ord.select($"o_totalprice".as("x"),
          (size(filter(typedLit(edges), e => $"o_totalprice" > e)) + 1)
            .as("bin"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"), round(min($"x"), 2).as("lo"),
          round(max($"x"), 2).as("hi"))
        .orderBy($"bin")
    },
    Some(
      "WITH e AS (SELECT quantile_cont(o_totalprice, " +
        "[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges FROM orders) " +
        "SELECT len(list_filter(e.edges, x -> o_totalprice > x)) + 1 " +
        "AS bin, count(*) AS n, round(min(o_totalprice), 2) AS lo, " +
        "round(max(o_totalprice), 2) AS hi " +
        "FROM orders, e GROUP BY 1 ORDER BY bin"))

  /** Rank-distribution window pack: percent_rank, cume_dist and
    * nth_value over a full frame — the remaining ANSI ranking functions
    * (rank/dense_rank/ntile/lag/lead/first/last are covered by
    * q05/q59/q77). Unique (price, orderkey) ordering makes every value
    * deterministic; one shuffle on the priority key serves all four
    * functions. */
  val q126RankDistribution: GraftQuery = GraftQuery(
    "q126_rank_distribution",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_orderpriority",
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value($"o_totalprice", 3)
            .over(w.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("third_price"))
        .orderBy($"o_orderkey")
    },
    Some(
      "SELECT o_orderkey, o_orderpriority, " +
        "round(percent_rank() OVER w, 6) AS pr, " +
        "round(cume_dist() OVER w, 6) AS cd, " +
        "nth_value(o_totalprice, 3) OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND UNBOUNDED FOLLOWING) AS third_price " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey"))

  /** Arbitrary GROUPING SETS (the general form behind q16's ROLLUP and
    * q67's CUBE): per-flag totals, per-status totals and the grand
    * total in ONE aggregation pass, with per-column grouping() flags.
    * (Single-column flags, not grouping_id(): the combined id's bit
    * order is engine-defined, the per-column flag is not.) */
  val q129GroupingSets: GraftQuery = GraftQuery(
    "q129_grouping_sets",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(grouping($"l_returnflag").as("g_rf"),
          grouping($"l_linestatus").as("g_ls"),
          count(lit(1)).as("n"),
          round(sum($"l_quantity"), 2).as("qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"g_rf".cast("long").as("g_rf"),
          $"g_ls".cast("long").as("g_ls"), $"n", $"qty")
        .orderBy($"rf", $"ls")
    },
    Some(
      "SELECT coalesce(l_returnflag, 'ALL') AS rf, " +
        "coalesce(l_linestatus, 'ALL') AS ls, " +
        "grouping(l_returnflag)::BIGINT AS g_rf, " +
        "grouping(l_linestatus)::BIGINT AS g_ls, " +
        "count(*) AS n, round(sum(l_quantity), 2) AS qty " +
        "FROM lineitem GROUP BY GROUPING SETS " +
        "((l_returnflag), (l_linestatus), ()) ORDER BY rf, ls"))

  /** Deterministic string aggregation: sorted-distinct value list per
    * group (collect_set is order-nondeterministic — array_sort makes
    * the result a pure function of the group's value SET, matching
    * string_agg DISTINCT ... ORDER BY on the oracle side). */
  val q130StringAgg: GraftQuery = GraftQuery(
    "q130_string_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(array_join(array_sort(collect_set($"l_linestatus")), ",")
            .as("statuses"),
          countDistinct($"l_linestatus").as("n_statuses"))
        .orderBy($"l_returnflag")
    },
    Some(
      "SELECT l_returnflag, " +
        "string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) " +
        "AS statuses, " +
        "count(DISTINCT l_linestatus) AS n_statuses " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))

  /** Interpolated bigram LM scoring
    * ([[TextFunctions.bigramLogProb]], λ = 0.5 — exact in fp on both
    * engines): the order-2 fluency signal over the corpus, fully
    * replayed by DuckDB including the head-conditional and the Laplace
    * backoff term. */
  val q128BigramLogProb: GraftQuery = GraftQuery(
    "q128_bigram_logprob",
    (s, d) => {
      import s.implicits._
      TextFunctions.bigramLogProb(Tables.documents(s, d), "doc_id",
          "text")
        .select($"doc_id", $"n_bigrams",
          round($"avg_logprob", 6).as("avg_logprob"))
        .orderBy($"doc_id")
    },
    Some(
      "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "tok AS (SELECT doc_id, unnest(ws) AS t FROM tk), " +
        "cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t), " +
        "tot AS (SELECT (SELECT count(*) FROM tok) AS n, " +
        "(SELECT count(*) FROM cnt) AS v), " +
        "bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (" +
        "SELECT doc_id, unnest(list_transform(" +
        "generate_series(1, len(ws) - 1), " +
        "i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS p FROM tk)), " +
        "bcnt AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2), " +
        "hcnt AS (SELECT w1, sum(cb) AS ch FROM bcnt GROUP BY 1), " +
        "sc AS (SELECT bg.doc_id, " +
        "ln(0.5 * (bcnt.cb / hcnt.ch) + " +
        "(1.0 - 0.5) * ((cnt.c + 1.0) / (tot.n + tot.v))) AS lp " +
        "FROM bg JOIN bcnt USING (w1, w2) JOIN hcnt USING (w1) " +
        "JOIN cnt ON bg.w2 = cnt.t, tot) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "round(avg(lp), 6) AS avg_logprob FROM sc " +
        "GROUP BY doc_id ORDER BY doc_id"))

  /** Interpolated Kneser-Ney TRIGRAM scoring
    * ([[TextFunctions.trigramKnLogProb]]) — the LM-filter ladder's
    * top rung (q119 unigram, q128 interpolated bigram, HERE KN
    * trigram, the CCNet-class filter). FULLY ORACLED: DuckDB
    * re-derives every KN count table from the corpus (trigram counts,
    * history sums, continuation type counts) and replays the exact
    * discount arithmetic (D = 0.75, a dyadic literal; every term
    * ::DOUBLE-cast so DuckDB's decimal literals never enter — the
    * q172 trap). */
  val q234TrigramKnOracled: GraftQuery = GraftQuery(
    "q234_trigram_kn_oracled",
    (s, d) => {
      import s.implicits._
      TextFunctions.trigramKnLogProb(Tables.documents(s, d), "doc_id",
          "text")
        .select($"doc_id", $"n_trigrams",
          round($"avg_logprob", 6).as("avg_logprob"))
        .orderBy($"doc_id")
    },
    Some(
      "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "tri AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, " +
        "ws[i+2] AS w3 FROM (SELECT doc_id, ws, " +
        "unnest(generate_series(1, len(ws) - 2)) AS i FROM tk " +
        "WHERE len(ws) >= 3)), " +
        "tc AS (SELECT w1, w2, w3, count(*)::BIGINT AS ct FROM tri " +
        "GROUP BY 1, 2, 3), " +
        "hist AS (SELECT w1, w2, sum(ct)::BIGINT AS ch, " +
        "count(DISTINCT w3)::BIGINT AS n1f FROM tc GROUP BY 1, 2), " +
        "midn AS (SELECT w2, w3, count(DISTINCT w1)::BIGINT AS n1pre " +
        "FROM tc GROUP BY 1, 2), " +
        "midd AS (SELECT w2, count(*)::BIGINT AS nmid FROM tc " +
        "GROUP BY 1), " +
        "bty AS (SELECT DISTINCT w2, w3 FROM tc), " +
        "bfol AS (SELECT w2, count(*)::BIGINT AS nfol FROM bty " +
        "GROUP BY 1), " +
        "bpre AS (SELECT w3, count(*)::BIGINT AS npre FROM bty " +
        "GROUP BY 1), " +
        "btot AS (SELECT count(*)::BIGINT AS b FROM bty), " +
        "sc AS (SELECT tri.doc_id, ln(" +
        "greatest(tc.ct::DOUBLE - 0.75::DOUBLE, 0.0::DOUBLE) / " +
        "hist.ch::DOUBLE + " +
        "0.75::DOUBLE * hist.n1f::DOUBLE / hist.ch::DOUBLE * (" +
        "greatest(midn.n1pre::DOUBLE - 0.75::DOUBLE, 0.0::DOUBLE) / " +
        "midd.nmid::DOUBLE + " +
        "0.75::DOUBLE * bfol.nfol::DOUBLE / midd.nmid::DOUBLE * " +
        "(bpre.npre::DOUBLE / btot.b::DOUBLE))) AS lp " +
        "FROM tri JOIN tc USING (w1, w2, w3) " +
        "JOIN hist USING (w1, w2) JOIN midn USING (w2, w3) " +
        "JOIN midd USING (w2) JOIN bfol USING (w2) " +
        "JOIN bpre ON tri.w3 = bpre.w3 CROSS JOIN btot) " +
        "SELECT doc_id, count(*)::BIGINT AS n_trigrams, " +
        "round(avg(lp), 6) AS avg_logprob FROM sc " +
        "GROUP BY doc_id ORDER BY doc_id"))

  /** The 12 unrolled BPE training rounds as chained DuckDB CTEs — the
    * q158-Lloyd trick applied to tokenizer training (r8 VERDICT #3's
    * last "genuinely infeasible" family, now replayed). Per round:
    * weighted adjacent-pair counts over the CURRENT symbolization,
    * argmax with the (count desc, left, right) tie-break, then the
    * left-to-right non-overlapping rewrite. Words travel as
    * '|'-delimited symbol strings; one merge application =
    * regexp_replace WITHOUT the 'g' flag (leftmost occurrence only —
    * repeatedly merging the leftmost remaining pair IS the greedy
    * semantics, and the delimiters keep symbols atomic), nested 4× per
    * round (8-char max word → ≤4 applications). `MATERIALIZED` pins
    * each round's word table to one evaluation — w(r-1) is referenced
    * by both the pair count and the rewrite, and DuckDB's default CTE
    * inlining made the chain exponential (measured: >120 s inlined,
    * 0.14 s materialized). */
  private def bpeRoundsCte(k: Int): String = {
    // symbols are spliced into a regex pattern/replacement, so quote
    // them: regexp_escape for the pattern (a word containing . * ( +
    // must match literally) and backslash-doubling for the replacement
    // (RE2 treats \1 as a backref there)
    def rewrite(expr: String): String =
      s"regexp_replace($expr, '\\|' || regexp_escape(m.l) || '\\|' || " +
        "regexp_escape(m.r) || '\\|', " +
        "'|' || replace(m.l, '\\', '\\\\') || " +
        "replace(m.r, '\\', '\\\\') || '|')"
    val rounds = (1 to k).map { r =>
      val prev = s"w${r - 1}"
      val rew = (1 to 4).foldLeft("s") { (e, _) => rewrite(e) }
      s", p$r AS (SELECT pr.l AS l, pr.r AS r, sum(c)::BIGINT AS cb " +
        "FROM (SELECT c, unnest(list_transform(generate_series(1, " +
        "len(sy)-1), i -> {'l': sy[i], 'r': sy[i+1]})) AS pr " +
        "FROM (SELECT c, list_filter(string_split(s,'|'), x -> x != '') " +
        s"AS sy FROM $prev)) GROUP BY 1, 2)" +
        s", m$r AS (SELECT l, r, cb FROM p$r ORDER BY cb DESC, l, r " +
        "LIMIT 1)" +
        s", w$r AS MATERIALIZED (SELECT w, c, $rew AS s FROM $prev, m$r m)"
    }.mkString
    "WITH wc AS (SELECT w, count(*)::BIGINT AS c FROM (SELECT " +
      "unnest(string_split(text,' ')) AS w FROM documents) " +
      "WHERE len(w)>0 GROUP BY w), " +
      // the 4-deep rewrite nesting covers at most 4 non-overlapping
      // merge sites per word per round, which is exact only for words
      // of <= 8 symbols — enforce that corpus invariant LOUDLY (a
      // longer word would silently under-merge and surface as a
      // spurious red gate instead of this targeted error)
      "guard AS (SELECT CASE WHEN max(len(w)) > 8 THEN error(" +
      "'bpe oracle: 4-deep rewrite assumes max word length 8') " +
      "ELSE 1 END AS ok FROM wc), " +
      "w0 AS MATERIALIZED (SELECT w, c, '|' || " +
      "array_to_string(string_split(w,''),'|') || '|' AS s " +
      "FROM wc, guard WHERE guard.ok = 1)" +
      rounds
  }

  /** BPE merge training ([[Bpe.topMerges]]): distributed word count +
    * driver merge loop over the bounded vocabulary. FULLY ORACLED as of
    * r9 ([[bpeRoundsCte]]): the merge loop is deterministic
    * (count-then-lexicographic tie-break), so DuckDB re-derives the
    * whole merge table from the corpus — rank, pair AND weighted count
    * per round — with no engine-side hash anywhere. BpeSpec still pins
    * the loop against an independent reference implementation. */
  val q124BpeMerges: GraftQuery = GraftQuery(
    "q124_bpe_merges",
    (s, d) => Bpe.topMerges(Tables.documents(s, d), "text", k = 12),
    Some(
      bpeRoundsCte(12) +
        " SELECT * FROM (" +
        (1 to 12).map(r => s"SELECT $r AS rank, l AS \"left\", " +
          s"r AS \"right\", cb AS pair_count FROM m$r")
          .mkString(" UNION ALL ") +
        ") ORDER BY rank"))

  /** Tokenizer lifecycle, closed: train merges ([[Bpe.topMerges]]),
    * encode the corpus with them ([[Bpe.encode]]), report per-source
    * token counts and the chars-per-token compression the learned vocab
    * buys. ORACLED via [[bpeRoundsCte]]: after the 12 training rounds,
    * each word's final symbolization IS its BPE encoding (encode
    * replays merges in rank order with the same applyMerge semantics —
    * [[Bpe.encode]] and [[Bpe.trainMerges]] share the method), so the
    * oracle joins token occurrences to the trained word table and sums
    * symbol counts per source. */
  val q127BpeEncode: GraftQuery = GraftQuery(
    "q127_bpe_encode",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = Bpe.topMerges(docs, "text", k = 12)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encode(docs, "text", merges)
        .select($"source", size($"bpe_tokens").as("n_bpe"),
          translate($"text", " ", "").as("squeezed"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_bpe").as("total_bpe_tokens"),
          round(sum(length($"squeezed")).cast("double") / sum($"n_bpe"), 4)
            .as("chars_per_token"))
        .orderBy($"source")
    },
    Some(
      bpeRoundsCte(12) +
        ", enc AS (SELECT w, len(list_filter(string_split(s,'|'), " +
        "x -> x != ''))::BIGINT AS nsym FROM w12), " +
        "tok AS (SELECT d.source, e.nsym FROM (SELECT source, " +
        "unnest(string_split(text,' ')) AS w FROM documents) d " +
        "JOIN enc e USING (w) WHERE len(d.w) > 0), " +
        "bpe AS (SELECT source, sum(nsym)::BIGINT AS total_bpe_tokens " +
        "FROM tok GROUP BY source), " +
        "chars AS (SELECT source, count(*)::BIGINT AS n_docs, " +
        "sum(length(replace(text, ' ', '')))::BIGINT AS n_chars " +
        "FROM documents GROUP BY source) " +
        "SELECT source, n_docs, total_bpe_tokens, " +
        "round(n_chars::DOUBLE / total_bpe_tokens, 4) AS chars_per_token " +
        "FROM chars JOIN bpe USING (source) ORDER BY source"))

  /** The unrolled unigram-LM hard-EM replay — [[bpeRoundsCte]]'s
    * sibling for [[graft.operators.UnigramLm]]. Per block r (an EM
    * round, or the final encode pass): candidate matches = the
    * substring table joined to vocab v(r-1); Viterbi DP unrolled over
    * word positions 1..8 (d-stages, with the running p-union of
    * reached boundaries), winner per (word, position) by
    * row_number() over (cost, piece length, piece); 8 backtrace
    * stages walk the best pieces; counts re-estimate v(r). DP costs
    * accumulate dp[s] + cost(piece) in the same left-to-right
    * grouping as the Scala DP, so with ln parity (q119/q128/q177
    * precedent) every comparison sees bit-equal doubles.
    * MATERIALIZED pins each stage to one evaluation — the q124
    * exponential-inlining lesson. */
  private def unigramCtes(blocks: Int, multiLimit: Int): String = {
    val prefix =
      "WITH wc AS MATERIALIZED (SELECT w, count(*)::BIGINT AS c FROM " +
        "(SELECT unnest(string_split(text,' ')) AS w FROM documents) " +
        "WHERE len(w)>0 GROUP BY w), " +
        "guard AS (SELECT CASE WHEN max(len(w)) > 8 THEN error(" +
        "'unigram oracle: viterbi DP unrolled to 8 positions') " +
        "ELSE 1 END AS ok FROM wc), " +
        "sub AS MATERIALIZED (SELECT w, c, q.s::INT AS s, q.e::INT AS e, " +
        "substr(w, q.s, q.e - q.s + 1) AS piece FROM (SELECT w, c, " +
        "unnest(flatten(list_transform(generate_series(1, len(w)), " +
        "s -> list_transform(generate_series(s, len(w)), " +
        "e -> {'s': s, 'e': e})))) AS q FROM wc, guard " +
        "WHERE guard.ok = 1)), " +
        "sc AS (SELECT piece, sum(c)::BIGINT AS cnt FROM sub " +
        "GROUP BY piece), " +
        "vb AS (SELECT piece, cnt FROM sc WHERE len(piece) = 1 " +
        "UNION ALL SELECT piece, cnt FROM (SELECT piece, cnt FROM sc " +
        s"WHERE len(piece) >= 2 ORDER BY cnt DESC, piece " +
        s"LIMIT $multiLimit)), " +
        "v0 AS MATERIALIZED (SELECT piece, -ln(cnt::DOUBLE / " +
        "(SELECT sum(cnt)::DOUBLE FROM vb)) AS cost FROM vb)"
    val rounds = (1 to blocks).map { r =>
      val dp = (1 to 8).map { e =>
        s", d${r}_$e AS MATERIALIZED (SELECT w, pos, cst, pc FROM (" +
          s"SELECT c.w, $e AS pos, p.cst + c.cost AS cst, " +
          "c.piece AS pc, row_number() OVER (PARTITION BY c.w " +
          "ORDER BY p.cst + c.cost, len(c.piece), c.piece) AS rn " +
          s"FROM cand$r c JOIN p${r}_${e - 1} p " +
          s"ON c.w = p.w AND c.s - 1 = p.pos WHERE c.e = $e) " +
          "WHERE rn = 1)" +
          s", p${r}_$e AS MATERIALIZED (SELECT w, pos, cst " +
          s"FROM p${r}_${e - 1} " +
          s"UNION ALL SELECT w, pos, cst FROM d${r}_$e)"
      }.mkString
      val dall = (1 to 8)
        .map(e => s"SELECT w, pos, pc FROM d${r}_$e")
        .mkString(" UNION ALL ")
      val bt = (1 to 8).map { i =>
        s", bt${r}_$i AS MATERIALIZED (SELECT b.w, b.c, " +
          s"d.pos - len(d.pc) AS pos, d.pc AS pc FROM bt${r}_${i - 1} b " +
          s"JOIN dall$r d ON b.w = d.w AND b.pos = d.pos " +
          "WHERE b.pos > 0)"
      }.mkString
      val used = (1 to 8).map(i => s"SELECT w, c, pc FROM bt${r}_$i")
        .mkString(" UNION ALL ")
      s", cand$r AS MATERIALIZED (SELECT b.w, b.s, b.e, b.piece, " +
        s"v.cost FROM sub b JOIN v${r - 1} v USING (piece))" +
        s", d${r}_0 AS (SELECT w, 0 AS pos, 0.0::DOUBLE AS cst, " +
        "'' AS pc FROM wc)" +
        s", p${r}_0 AS (SELECT w, pos, cst FROM d${r}_0)" +
        dp +
        s", dall$r AS MATERIALIZED ($dall)" +
        s", bt${r}_0 AS (SELECT w, c, len(w) AS pos FROM wc)" +
        bt +
        s", used$r AS (SELECT w, c, pc FROM ($used))" +
        s", u$r AS MATERIALIZED (SELECT pc AS piece, " +
        s"sum(c)::BIGINT AS cnt FROM used$r GROUP BY pc)" +
        s", v$r AS MATERIALIZED (SELECT piece, -ln(cnt::DOUBLE / " +
        s"(SELECT sum(cnt)::DOUBLE FROM u$r)) AS cost FROM u$r)"
    }.mkString
    prefix + rounds
  }

  /** Unigram-LM tokenizer training ([[graft.operators.UnigramLm]]) —
    * the SentencePiece-style sibling of q124: bounded candidate seed
    * (chars + top-48 substrings), 3 hard-EM rounds, each a single
    * distributed aggregation over the distinct-word relation with a
    * driver M-step. FULLY ORACLED via [[unigramCtes]]: DuckDB
    * re-derives every round's Viterbi piece counts AND the
    * re-estimated costs from the corpus. */
  val q229UnigramLmTrain: GraftQuery = GraftQuery(
    "q229_unigram_lm_train",
    (s, d) => graft.operators.UnigramLm.train(
      Tables.documents(s, d), "text", multiLimit = 48, rounds = 3),
    Some(
      unigramCtes(blocks = 3, multiLimit = 48) +
        " SELECT * FROM (" +
        (1 to 3).map(r => s"SELECT $r AS rnd, u.piece, " +
          "u.cnt AS n_uses, round(v.cost, 6) AS cost " +
          s"FROM u$r u JOIN v$r v USING (piece)")
          .mkString(" UNION ALL ") +
        ") ORDER BY rnd, piece"))

  /** Unigram tokenizer lifecycle, closed (the q127 shape): train 3 EM
    * rounds, segment the corpus with the FINAL vocab (oracle block 4
    * = an encode pass against v3), report per-source token counts and
    * the chars-per-token compression. The corpus join is per-distinct-
    * word ([[graft.operators.UnigramLm.wordTokenCounts]] broadcast),
    * so the encode re-segments each distinct word once however large
    * the corpus. */
  val q230UnigramLmEncode: GraftQuery = GraftQuery(
    "q230_unigram_lm_encode",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val (_, cost) = graft.operators.UnigramLm.trainRounds(
        docs, "text", multiLimit = 48, rounds = 3)
      val wn = graft.operators.UnigramLm.wordTokenCounts(
        docs, "text", cost)
      val chars = docs.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(translate($"text", " ", ""))).as("n_chars"))
      val lm = docs
        .select($"source", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(broadcast(wn), "w")
        .groupBy($"source").agg(sum($"nsym").as("total_lm_tokens"))
      chars.join(lm, "source")
        .select($"source", $"n_docs", $"total_lm_tokens",
          round($"n_chars".cast("double") / $"total_lm_tokens", 4)
            .as("chars_per_token"))
        .orderBy($"source")
    },
    Some(
      unigramCtes(blocks = 4, multiLimit = 48) +
        ", enc AS (SELECT w, count(*)::BIGINT AS nsym FROM used4 " +
        "GROUP BY w), " +
        "tok AS (SELECT d.source, e.nsym FROM (SELECT source, " +
        "unnest(string_split(text,' ')) AS w FROM documents) d " +
        "JOIN enc e USING (w) WHERE len(d.w) > 0), " +
        "lm AS (SELECT source, sum(nsym)::BIGINT AS total_lm_tokens " +
        "FROM tok GROUP BY source), " +
        "chars AS (SELECT source, count(*)::BIGINT AS n_docs, " +
        "sum(length(replace(text, ' ', '')))::BIGINT AS n_chars " +
        "FROM documents GROUP BY source) " +
        "SELECT source, n_docs, total_lm_tokens, " +
        "round(n_chars::DOUBLE / total_lm_tokens, 4) " +
        "AS chars_per_token " +
        "FROM chars JOIN lm USING (source) ORDER BY source"))

  /** Subword REGULARIZATION face (Kudo 2018 §3, VERDICT r12 #8): the
    * exact n-best (n=3) segmentations of every distinct word under
    * the q229-trained cost table, with each candidate's cost GAP to
    * the best — the sampler's log-odds (p_i/p_1 = exp(−gap); kept in
    * log space so the gate never rides exp() libm parity). Words are
    * ≤ 8 chars (the oracle's standing DP guard), so DuckDB replays
    * the FULL 2^(len−1) cut-mask enumeration next to the trained
    * vocab: every (word, rank) row — segmentation string, piece
    * count, left-fold cost, gap — hashes against Spark's. This
    * completes the tokenizer family the way q195 completed IVF-PQ:
    * train (q229), encode (q230), and now the sampling lattice the
    * training objective actually marginalizes over.
    *
    * Collation contract (ADVICE r13): the rank tie-break on the seg
    * string compares UTF-16 code units in Scala vs binary UTF-8 bytes
    * in DuckDB — identical orders for ASCII, divergent only for
    * supplementary-plane characters when cost AND piece count tie.
    * The documents corpus is lowercase-ASCII prose by construction
    * (TESTDATA.md), so the contract here is ASCII-only words; a
    * non-ASCII corpus would need a collation-neutral tie-break key
    * (e.g. the cut mask). */
  val q237UnigramNBestOracled: GraftQuery = GraftQuery(
    "q237_unigram_nbest_oracled",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val (_, cost) = graft.operators.UnigramLm.trainRounds(
        docs, "text", multiLimit = 48, rounds = 3)
      graft.operators.UnigramLm.nBestTable(docs, "text", cost, n = 3)
        .select($"w", $"rank", $"seg", $"n_pieces",
          round($"cost", 6).as("cost"), round($"gap", 6).as("gap"))
        .orderBy($"w", $"rank")
    },
    Some(
      unigramCtes(blocks = 3, multiLimit = 48) +
        // all 2^(len-1) cut masks per distinct word; bnds = cut
        // positions framed by 0 and len(w)
        ", msk AS (SELECT w, unnest(generate_series(0, " +
        "(1::BIGINT << greatest(len(w) - 1, 0)) - 1)) AS mask " +
        "FROM wc), " +
        "segb AS (SELECT w, mask, [0] || list_filter(" +
        "generate_series(1, len(w) - 1), " +
        "i -> ((mask >> (i - 1)) & 1) = 1) || [len(w)] AS bnds " +
        "FROM msk), " +
        "segp AS (SELECT w, mask, list_transform(" +
        "generate_series(1, len(bnds) - 1), " +
        "j -> substr(w, bnds[j] + 1, bnds[j + 1] - bnds[j])) " +
        "AS pieces FROM segb), " +
        "pe AS (SELECT w, mask, array_to_string(pieces, '-') AS seg, " +
        "len(pieces) AS np, unnest(pieces) AS piece, " +
        "unnest(generate_series(1, len(pieces))) AS j FROM segp), " +
        // valid iff every piece is in the final vocab; cost is the
        // LEFT-TO-RIGHT fold over the j-ordered piece costs
        "pj AS (SELECT w, mask, seg, np, count(v.piece) AS matched, " +
        "list_sum(list(v.cost ORDER BY j)) AS cst FROM pe " +
        "LEFT JOIN v3 v USING (piece) GROUP BY w, mask, seg, np), " +
        "vs AS (SELECT w, seg, np, cst, " +
        "row_number() OVER (PARTITION BY w " +
        "ORDER BY cst, np, seg) AS rank, " +
        "min(cst) OVER (PARTITION BY w) AS best FROM pj " +
        "WHERE matched = np) " +
        "SELECT w, rank::INT AS rank, seg, np::BIGINT AS n_pieces, " +
        "round(cst, 6) AS cost, round(cst - best, 6) AS gap " +
        "FROM vs WHERE rank <= 3 ORDER BY w, rank"))
}
