package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data shaping: sliding-window document chunking and
  * concat-and-chunk sequence packing (no reference counterpart — LLM
  * pipeline extensions, SURVEY.md north star).
  *
  * Both operators are pure built-in expressions over one window / one
  * explode — no UDFs, no shuffle beyond the window's hash partitioning —
  * and both are exactly replayable in ANSI SQL, so they are oracled
  * end-to-end (q103/q104).
  */
object Chunker {

  /** Sliding-window chunks: token windows of `chunkSize` starting every
    * `stride` tokens (overlap = chunkSize - stride). Chunks start at
    * 0, stride, 2·stride, … and stop once a chunk has reached the end of
    * the document — a start whose preceding chunk already covered the
    * last token is NOT emitted (no redundant fully-contained tails), so
    * every chunk contributes at least one new token and the windows tile
    * [0, n) exactly. A document no longer than `chunkSize` yields one
    * chunk. Embarrassingly parallel — one projection + one explode per
    * row, no shuffle at all.
    *
    * Output: (id, chunk_id, start_tok, n_tok, chunk). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride size=$chunkSize")
    val toks = split(col(textCol), " ")
    // largest admissible start: the previous chunk (start - stride) must
    // not already reach n, i.e. start <= n - (chunkSize - stride) - 1
    val hi = greatest(lit(0), col("n") - (chunkSize - stride) - 1)
    docs
      .select(col(idCol), toks.as("toks"), size(toks).as("n"))
      .select(col(idCol), col("toks"), col("n"),
        posexplode(sequence(lit(0), hi, lit(stride)))
          .as(Seq("chunk_id", "start_tok")))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        least(col("n") - col("start_tok"), lit(chunkSize)).as("n_tok"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(chunkSize)),
          " ").as("chunk"))
  }

  /** Concat-and-chunk sequence packing — the standard pretraining layout:
    * per `groupCol` (e.g. source/domain), documents are concatenated in
    * `idCol` order into one token stream and sliced into fixed
    * `seqLen`-token training sequences. A document starts in sequence
    * floor(offset / seqLen) where offset = running token count of all
    * earlier documents in its group; a document whose tokens cross a
    * sequence boundary straddles (end sequence > start sequence).
    *
    * Returns one row per (group, seq_id): how many documents start there,
    * how many tokens they contribute in total, and how many straddle into
    * the next sequence — the occupancy report a packing job emits.
    * One shuffle for the window (hash by group), one for the final
    * group-by; both scale by partitioning on the group key.
    *
    * SCALE KNOB `subShards`: the running token count is sequential
    * WITHIN a group — a mega-group (one domain holding half the corpus)
    * makes that window partition the straggler. `subShards = s > 1`
    * splits every group into `s` deterministic sub-streams
    * (`xxhash64(id) % s`) packed independently; each sub-stream yields
    * its own sequence space (seq ids offset by sub-shard so they stay
    * disjoint), costing at most `s` partial tail sequences per group —
    * the standard parallel-packing trade. The default 1 keeps one
    * contiguous stream per group (the oracle-checked shape, q104). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, seqLen: Int = 512, subShards: Int = 1,
      shardKey: Option[Column] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(subShards > 0, s"subShards must be positive, got $subShards")
    // shardKey overrides the default hash shard assignment (taken mod
    // subShards) — e.g. the id itself for an ANSI-replayable sharding
    // (q108's oracle); the hash default balances adversarial id ranges
    val shard: Column =
      if (subShards == 1) lit(0L)
      else pmod(shardKey.getOrElse(xxhash64(col(idCol))),
        lit(subShards.toLong))
    val w = Window.partitionBy(col(groupCol), col("__shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok: Column = size(split(col(textCol), " "))
    docs
      .select(col(groupCol), col(idCol), nTok.as("n_tok"),
        shard.as("__shard"))
      .withColumn("offset", sum(col("n_tok")).over(w) - col("n_tok"))
      // interleave sub-shard sequence spaces (local·s + shard) so ids
      // stay disjoint per group; s = 1 degenerates to floor(offset/len)
      .withColumn("seq_id",
        floor(col("offset") / seqLen) * subShards + col("__shard"))
      .withColumn("straddles",
        (floor((col("offset") + col("n_tok") - 1) / seqLen) >
          floor(col("offset") / seqLen)).cast("int"))
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("straddles")).as("n_straddle"))
  }
}
