package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}

/** Late round-5 shaping surface: content-keyed leakage-safe splits and
  * the passage-granularity duplication profile. Both fully DuckDB-oracled
  * (SHA-256 is the one hash with portable reference values, and block
  * chopping is plain list slicing on both engines). */
object SplitQueries {

  def all: Seq[GraftQuery] = Seq(q131ContentSplit, q132BlockDupProfile)

  /** Leakage-safe split report ([[Sampling.contentSplit]]): the split
    * decision is a pure function of sha2(text), so exact duplicates can
    * never straddle train/eval. Reports per (source, split) document and
    * content-group counts; `n_docs != n_groups` on a split is exactly the
    * duplicated mass the content key protects. Zero-shuffle assignment;
    * the one aggregation shuffle is the report itself. */
  val q131ContentSplit: GraftQuery = GraftQuery(
    "q131_content_split",
    (s, d) => {
      import s.implicits._
      Sampling.contentSplit(Tables.documents(s, d), "text")
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(sha2($"text".cast("binary"), 256)).as("n_groups"))
        .orderBy($"source", $"split")
    },
    Some(
      "SELECT source, split, count(*) AS n_docs, " +
        "count(DISTINCT h) AS n_groups FROM (" +
        "SELECT source, sha256(text) AS h, " +
        "CASE WHEN substr(sha256(text), 1, 1) BETWEEN '0' AND '9' " +
        "OR substr(sha256(text), 1, 1) IN ('a', 'b') THEN 'train' " +
        "WHEN substr(sha256(text), 1, 1) IN ('c', 'd') THEN 'val' " +
        "ELSE 'test' END AS split FROM documents) " +
        "GROUP BY source, split ORDER BY source, split"))

  /** Passage-duplication profile ([[Dedup.blockDupProfile]]): per-source
    * count of non-overlapping 10-token blocks whose text repeats anywhere
    * in the corpus. The whole pipeline — chop, corpus-wide count, join
    * back, per-source rollup — is replayed by DuckDB over the identical
    * slicing semantics (1-based inclusive on both engines). */
  val q132BlockDupProfile: GraftQuery = GraftQuery(
    "q132_block_dup_profile",
    (s, d) =>
      Dedup.blockDupProfile(Tables.documents(s, d), "source", "text",
          blockLen = 10)
        .orderBy(col("source")),
    Some(
      "WITH w AS (SELECT source, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "f AS (SELECT source, ws FROM w WHERE len(ws) >= 10), " +
        "c AS (SELECT source, " +
        "array_to_string(ws[i*10+1 : i*10+10], ' ') AS block " +
        "FROM f, UNNEST(range(len(ws)//10)) AS t(i)), " +
        "g AS (SELECT block, count(*) AS tot FROM c GROUP BY block) " +
        "SELECT source, count(*) AS n_blocks, " +
        "count(DISTINCT c.block) AS n_distinct, " +
        "CAST(sum(CASE WHEN g.tot > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_inst, " +
        "round(sum(CASE WHEN g.tot > 1 THEN 1 ELSE 0 END)::DOUBLE " +
        "/ count(*), 6) AS dup_rate " +
        "FROM c JOIN g USING (block) GROUP BY source ORDER BY source"))
}
