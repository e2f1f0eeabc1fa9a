package graft

import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (north-star
  * extensions: token counting, exact/normalized dedup, quality scoring).
  * All pure built-in expressions — no UDFs, fully codegen'd, and each one
  * is a single scan + (at most) one shuffle regardless of corpus size.
  */
object TextQueries {

  def all: Seq[GraftQuery] = Seq(q20TokenStats, q21DedupExact,
    q22DedupPrefixKey, q23StopwordRatio)

  /** Token counting: whitespace tokens, distinct tokens, char length. */
  val q20TokenStats: GraftQuery = GraftQuery(
    "q20_token_stats",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(
          $"doc_id",
          length($"text").as("len_chars"),
          size(split($"text", " ")).as("n_tokens"),
          size(array_distinct(split($"text", " "))).as("n_distinct_tokens"))
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, length(text) AS len_chars, " +
        "len(string_split(text,' ')) AS n_tokens, " +
        "len(list_distinct(string_split(text,' '))) AS n_distinct_tokens " +
        "FROM documents ORDER BY doc_id"))

  /** Exact dedup: canonical survivor (min doc_id) per identical text.
    * One hash-shuffle on the text key; at 100 TB you'd group on
    * sha2(text) instead of the full string to cut shuffle bytes —
    * semantics identical, collisions negligible. */
  val q21DedupExact: GraftQuery = GraftQuery(
    "q21_dedup_exact",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"text")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select($"doc_id", $"n_copies")
        .orderBy($"doc_id")
    },
    Some(
      "SELECT min(doc_id) AS doc_id, count(*) AS n_copies " +
        "FROM documents GROUP BY text ORDER BY doc_id"))

  /** Normalized (near-exact) dedup: key = first 10 tokens — the cheap
    * prefix-fingerprint pass that precedes MinHash in a dedup pipeline. */
  val q22DedupPrefixKey: GraftQuery = GraftQuery(
    "q22_dedup_prefix_key",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("pfx",
          concat_ws(" ", slice(split($"text", " "), 1, 10)))
        .groupBy($"pfx")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
        .select($"keep_id", $"n_docs")
        .orderBy($"keep_id")
    },
    Some(
      "SELECT min(doc_id) AS keep_id, count(*) AS n_docs FROM (" +
        "SELECT doc_id, array_to_string(" +
        "list_slice(string_split(text,' '),1,10),' ') AS pfx " +
        "FROM documents) GROUP BY pfx ORDER BY keep_id"))

  /** Quality scoring: stopword ratio via higher-order filter (codegen'd,
    * no UDF). */
  val q23StopwordRatio: GraftQuery = GraftQuery(
    "q23_stopword_ratio",
    (s, d) => {
      import s.implicits._
      val stop = Seq("the", "a", "of", "and", "to")
      val toks = split($"text", " ")
      Tables.documents(s, d)
        .select(
          $"doc_id",
          round(
            size(filter(toks, t => t.isInCollection(stop))).cast("double") /
              size(toks), 4).as("stop_ratio"))
        .orderBy($"doc_id")
    },
    Some(
      "SELECT doc_id, round(len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','of','and','to')))::DOUBLE / " +
        "len(string_split(text,' ')), 4) AS stop_ratio " +
        "FROM documents ORDER BY doc_id"))
}
