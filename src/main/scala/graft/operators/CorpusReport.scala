package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dataset-card report over a document corpus: the one-page JSON a data
  * team ships alongside a training set — sizes, vocabulary, language
  * mix, quality profile, duplication rate. Composed entirely from the
  * engine's scan-bandwidth primitives:
  *
  *  - one full-table aggregate (docs, tokens, chars, quality quantiles,
  *    Gopher keep-rate, distinct-text count for the exact-dup rate);
  *  - one exploded-token aggregate for the vocabulary size;
  *  - one tiny language-ID groupBy (heuristic [[TextFunctions.langId]],
  *    so the report works on corpora WITHOUT a lang column);
  *  - one [[Sampling.contentSplit]] rollup (split balance — the card's
  *    proof that eval leakage is structurally closed for exact dups);
  *  - one [[Dedup.blockDupProfile]] rollup (passage-level duplication,
  *    the signal document-exact dup rate misses).
  *
  * Five jobs total, all linear scans — the report costs what a few
  * counts cost, at any corpus size. Output is a deterministic JSON
  * string: fixed key order, 4-decimal rounding, languages sorted by
  * key. */
object CorpusReport {

  /** Optional media section: pass the corpus' binary frame (a
    * `content` column) and the card gains a per-container-format rollup
    * from [[graft.multimodal.Multimodal.mediaCodecProfile]] (ONE scan
    * of the binary payloads) — decodability counts, parsed-metadata
    * coverage, mean/total playtime and the codec mix:
    * `"media":{"mp4":{"n":N,"undecodable":N,"with_meta":N,
    * "mean_duration_ms":N,"total_duration_ms":N,
    * "codecs":{"avc1":N,…}},…}`. This is how the explicit-empty video
    * policy stays HONEST at the dataset level: a consumer reads how
    * many rows of each container shipped without decoded features —
    * and what those containers actually hold — instead of discovering
    * empty frame arrays one row at a time. */
  def report(docs: DataFrame, textCol: String = "text",
      media: Option[DataFrame] = None): String = {
    val base = reportText(docs, textCol)
    media match {
      case None => base
      case Some(m) =>
        // the (format, codec) grid reaching the driver is a handful of
        // rows at any corpus size; format-level figures are derived here
        val byFmt = graft.multimodal.Multimodal.mediaCodecProfile(m)
          .collect()
          .groupBy(_.getString(0)).toSeq.sortBy(_._1)
        val rows = byFmt.map { case (fmt, rs) =>
          val n = rs.map(_.getLong(2)).sum
          val undec = rs.map(_.getLong(3)).sum
          val meta = rs.map(_.getLong(4)).sum
          val totalDur =
            rs.map(r => if (r.isNullAt(5)) 0L else r.getLong(5)).sum
          // metadata-bearing undecodables (MP4/EBML duration parsed
          // from the container index) report real parsed structure,
          // never synthesized content
          val durPart =
            if (meta > 0)
              s""","mean_duration_ms":${math.round(totalDur.toDouble / meta)}""" +
                s""","total_duration_ms":$totalDur"""
            else ""
          val codecs = rs.filter(_.getString(1).nonEmpty)
            .sortBy(_.getString(1))
            .map(r => s""""${r.getString(1)}":${r.getLong(2)}""")
          val codecPart =
            if (codecs.nonEmpty)
              s""","codecs":${codecs.mkString("{", ",", "}")}"""
            else ""
          s""""$fmt":{"n":$n,"undecodable":$undec,"with_meta":$meta""" +
            durPart + codecPart + "}"
        }.mkString("{", ",", "}")
        base.dropRight(1) + s""","media":$rows}"""
    }
  }

  private def reportText(docs: DataFrame, textCol: String): String = {
    val t = col(textCol)
    val headRow = docs
      .select(t, TextFunctions.qualityScore(t).as("q"),
        TextFunctions.gopherFlags(t, minWords = 10, minStopHits = 0)
          .getField("keep").as("keep"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextFunctions.tokens(t))).as("n_tokens"),
        sum(length(t)).as("n_chars"),
        countDistinct(t).as("n_distinct_texts"),
        round(expr("percentile(q, 0.25)"), 4).as("q25"),
        round(expr("percentile(q, 0.5)"), 4).as("q50"),
        round(expr("percentile(q, 0.75)"), 4).as("q75"),
        round(avg(col("keep").cast("double")), 4).as("keep_rate"))
      .head()
    val nDocs = headRow.getLong(0)
    // Empty corpus: quantiles/averages are NULL and the scans below
    // would NPE on getDouble — emit the explicit empty card instead.
    if (nDocs == 0L)
      return """{"n_docs":0,"n_tokens":0,"n_chars":0,"vocab":0,""" +
        """"exact_dup_rate":0.0,"block_dup_rate":0.0,""" +
        """"quality":{},"gopher_keep_rate":0.0,"splits":{},""" +
        """"languages":{}}"""
    val vocab = docs
      .select(explode(TextFunctions.tokens(t)).as("w"))
      .filter(length(col("w")) > 0)
      .agg(countDistinct(col("w"))).head().getLong(0)
    val langs = docs
      .select(TextFunctions.langId(t).as("lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val dupRate =
      if (nDocs == 0) 0.0
      else math.rint((1.0 - headRow.getLong(3).toDouble / nDocs) * 1e4) / 1e4
    val langJson = langs
      .map { case (l, n) => s""""$l":$n""" }.mkString("{", ",", "}")
    val splits = Sampling.contentSplit(docs, textCol)
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val splitJson = splits
      .map { case (sp, n) => s""""$sp":$n""" }.mkString("{", ",", "}")
    val blockRow = Dedup.blockDupProfile(
        docs.withColumn("__one", lit("all")), "__one", textCol)
      .agg(sum(col("n_blocks")), sum(col("n_dup_inst"))).head()
    val blockDupRate =
      if (blockRow.isNullAt(0) || blockRow.getLong(0) == 0L) 0.0
      else math.rint(blockRow.getLong(1).toDouble /
        blockRow.getLong(0) * 1e4) / 1e4
    s"""{"n_docs":$nDocs,"n_tokens":${headRow.getLong(1)},""" +
      s""""n_chars":${headRow.getLong(2)},"vocab":$vocab,""" +
      s""""exact_dup_rate":$dupRate,"block_dup_rate":$blockDupRate,""" +
      s""""quality":{"p25":${headRow.getDouble(4)},""" +
      s""""p50":${headRow.getDouble(5)},"p75":${headRow.getDouble(6)}},""" +
      s""""gopher_keep_rate":${headRow.getDouble(7)},""" +
      s""""splits":$splitJson,"languages":$langJson}"""
  }
}
