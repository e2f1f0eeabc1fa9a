package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker
import graft.streaming.EventStream

/** Training-data pipeline queries: exactly-once stream restoration,
  * sliding-window chunking, concat-and-chunk sequence packing. All
  * deterministic and ANSI-expressible — every query here is oracled. */
object PipelineQueries {

  def all: Seq[GraftQuery] = Seq(q102ExactlyOnce, q103Chunk, q104Pack)

  /** Exactly-once restoration of at-least-once delivery: two independent
    * file sources redeliver every event, a keyed streaming dedup drops
    * the replays, and the result must equal the batch table — the
    * canonical ingest front-door of a streaming pipeline
    * ([[EventStream.runExactlyOnce]]). */
  val q102ExactlyOnce: GraftQuery = GraftQuery(
    "q102_stream_dedup",
    (s, d) => {
      import s.implicits._
      EventStream.runExactlyOnce(s, d, queryName = "graft_q102")
        .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
          $"event_type", $"value")
        .orderBy($"event_id")
    },
    Some(
      "SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, " +
        "event_type, value FROM events ORDER BY event_id"))

  /** Sliding-window chunking ([[Chunker.chunk]]): 32-token windows every
    * 24 tokens (8-token overlap) over every document — the
    * context-window shaping step of a pretraining pipeline. No shuffle:
    * one projection + one explode per document. */
  val q103Chunk: GraftQuery = GraftQuery(
    "q103_chunk_docs",
    (s, d) => {
      import s.implicits._
      Chunker.chunk(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
          $"start_tok".cast("long").as("start_tok"),
          $"n_tok".cast("long").as("n_tok"), $"chunk")
        .orderBy($"doc_id", $"chunk_id")
    },
    Some(
      "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "e AS (SELECT doc_id, toks, len(toks) AS n, " +
        "unnest(generate_series(0, greatest(len(toks) - 9, 0), 24)) " +
        "AS start_tok FROM t) " +
        "SELECT doc_id, start_tok // 24 AS chunk_id, start_tok, " +
        "least(n - start_tok, 32) AS n_tok, " +
        "array_to_string(toks[start_tok + 1 : start_tok + 32], ' ') " +
        "AS chunk FROM e ORDER BY doc_id, chunk_id"))

  /** Concat-and-chunk sequence packing ([[Chunker.packSequences]]):
    * per-source token streams sliced into 512-token training sequences;
    * reports per-sequence document occupancy and boundary straddlers. */
  val q104Pack: GraftQuery = GraftQuery(
    "q104_pack_sequences",
    (s, d) => {
      import s.implicits._
      Chunker.packSequences(Tables.documents(s, d), "doc_id", "text",
          "source", seqLen = 512)
        .select($"source", $"seq_id", $"n_docs", $"n_tokens",
          $"n_straddle".cast("long").as("n_straddle"))
        .orderBy($"source", $"seq_id")
    },
    Some(
      "WITH t AS (SELECT source, doc_id, " +
        "len(string_split(text, ' ')) AS n_tok FROM documents), " +
        "o AS (SELECT source, doc_id, n_tok, " +
        "sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) - n_tok AS tok_off FROM t), " +
        "m AS (SELECT source, n_tok, " +
        "floor(tok_off / 512)::BIGINT AS seq_id, " +
        "(floor((tok_off + n_tok - 1) / 512) > floor(tok_off / 512))" +
        "::INT AS straddles FROM o) " +
        "SELECT source, seq_id, count(*) AS n_docs, " +
        "sum(n_tok)::BIGINT AS n_tokens, " +
        "sum(straddles)::BIGINT AS n_straddle " +
        "FROM m GROUP BY 1, 2 ORDER BY source, seq_id"))
}
