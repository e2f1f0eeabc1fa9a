package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The graph-ANN family's ARTIFACT LIFECYCLE as a user surface
  * (VERDICT r15 #1): build / ingest / serve entirely from persisted
  * artifacts — the operational trio IVF got with `ann-index` /
  * `ann-ingest` / `ann-query`, now for the NN-descent + beam-search
  * family whose serving ladder ([[NnDescent.beamTopK]] driver walk,
  * [[NnDescent.beamTopKBulk]] relational, [[NnDescent.beamTopKHot]]
  * broadcast RAM replica) was previously reachable only through gated
  * queries and specs. `graft.Main` wires these to the
  * `graph-ann-build` / `graph-ann-ingest` / `graph-ann-serve` verbs.
  *
  * Index layout under `indexDir` (all parquet):
  *  - `graph/`   (u, rank, nb, d2) — the k-NN graph;
  *  - `vectors/` (id, v)           — the corpus the graph covers
  *    (the serve and ingest walks read vectors by id; persisting
  *    them WITH the index is the IVF-bucket precedent — an index a
  *    serving tier can load without the original table);
  *  - `entries/` (node_id, v)      — the rank-spaced entry frame;
  *  - `adj/`     (u, nb, nv)       — the pre-joined serving layout
  *    (one equi-join per hop instead of two);
  *  - `meta/`    one row (k, cap, rounds, entry_cand, dim) — the
  *    build geometry, guarded on every later verb like the dedup
  *    index's banding geometry.
  *
  * Every artifact rewrite goes through write-to-temp-then-swap
  * ([[writeSwap]]): the new frame is derived lazily FROM the old
  * files, so an in-place overwrite would delete its own input
  * mid-job.
  *
  * Determinism: all three verbs compose the gated operators
  * unchanged (q231 build, q240 ingest, q243/q244 serve geometries are
  * the defaults), so a CLI-built index serves bit-identically to the
  * oracle-gated faces — GraphAnnCliSpec pins exactly that, engine by
  * engine.
  */
object GraphAnnIndex {

  final case class Meta(k: Int, cap: Int, rounds: Int,
      entryCand: Int, dim: Int)

  private def fs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  /** Write `df` to `<dir>__tmp`, then atomically (per rename) swap it
    * into `dir` — the artifact being replaced is an INPUT of the
    * frame being written, so overwrite-in-place would erase the files
    * the running job still reads. */
  private def writeSwap(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val tmp = dir + "__tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (f.exists(p)) f.delete(p, true)
    require(f.rename(new org.apache.hadoop.fs.Path(tmp), p),
      s"swap of $tmp into $dir failed")
  }

  private def writeMeta(spark: SparkSession, indexDir: String,
      m: Meta): Unit = {
    import spark.implicits._
    Seq((m.k, m.cap, m.rounds, m.entryCand, m.dim))
      .toDF("k", "cap", "rounds", "entry_cand", "dim")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/meta")
  }

  def readMeta(spark: SparkSession, indexDir: String): Meta = {
    require(fs(spark, indexDir).exists(
      new org.apache.hadoop.fs.Path(s"$indexDir/meta")),
      s"no graph-ANN index under $indexDir — run graph-ann-build first")
    val r = spark.read.parquet(s"$indexDir/meta").head()
    Meta(r.getAs[Int]("k"), r.getAs[Int]("cap"),
      r.getAs[Int]("rounds"), r.getAs[Int]("entry_cand"),
      r.getAs[Int]("dim"))
  }

  /** (vec_id, embedding) → the engine shape (id: long,
    * v: array<double>) every NnDescent operator takes. */
  private def asVecs(df: DataFrame): DataFrame =
    df.select(col("vec_id").cast("long").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))

  /** BUILD: k-NN graph + entry frame + pre-joined adjacency + the
    * corpus copy, persisted under `indexDir` (the q231/q232 build
    * protocol). Returns (nVectors, nEdges). */
  def build(spark: SparkSession, input: String, indexDir: String,
      k: Int = 16, cap: Int = 32, rounds: Int = 3,
      entryCand: Int = 32): (Long, Long) = {
    val vecs = asVecs(spark.read.parquet(input)).persist()
    val n = vecs.count()
    require(n > 0, s"empty input $input")
    val dim = vecs.select(size(col("v"))).head().getInt(0)
    val graph = NnDescent.knnGraph(vecs, k, cap, rounds)
    graph.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/graph")
    vecs.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/vectors")
    graph.select(col("u"), col("nb"))
      .join(vecs.select(col("id").as("nb"), col("v").as("nv")), "nb")
      .select(col("u"), col("nb"), col("nv"))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/adj")
    val nEdges = graph.count()
    graph.unpersist() // knnGraph returns its result persisted
    NnDescent.entryCandidates(vecs, entryCand)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/entries")
    writeMeta(spark, indexDir, Meta(k, cap, rounds, entryCand, dim))
    vecs.unpersist()
    (n, nEdges)
  }

  /** INGEST: append a batch of new vectors to the persisted index
    * without retraining (the q240 search-then-link protocol):
    * [[NnDescent.appendToGraph]] under the stored geometry, the keyed
    * merge into the stored edge list ([[NnDescent.applyAppend]]), the
    * corpus copy and the pre-joined adjacency refreshed, and — when
    * `refreshEntries` is set — the entry frame re-derived from the
    * GROWN corpus ([[NnDescent.refreshEntries]], the measured answer
    * to entry-coverage decay; VERDICT r15 #2). Batch ids must be
    * disjoint from the stored corpus — a replayed batch fails fast
    * here (the strict-CLI contract; the streaming face layers
    * batchId-keyed idempotence on top). Returns (nNew, nRefreshedOld).
    */
  def ingest(spark: SparkSession, batch: String, indexDir: String,
      beam: Int = 4, hops: Int = 4,
      refreshEntries: Boolean = false): (Long, Long) =
    ingestBatch(spark, spark.read.parquet(batch), indexDir, beam,
      hops, refreshEntries)

  /** [[ingest]] over an in-memory batch frame — the entry point the
    * streaming face ([[graft.streaming.GraphAnnStream]]) feeds its
    * micro-batches through; the CLI path delegates here. */
  def ingestBatch(spark: SparkSession, batchDf: DataFrame,
      indexDir: String, beam: Int = 4, hops: Int = 4,
      refreshEntries: Boolean = false): (Long, Long) = {
    val meta = readMeta(spark, indexDir)
    val newVecs = asVecs(batchDf)
      .select(col("id").as("nid"), col("v").as("qv")).persist()
    val nNew = newVecs.count()
    val vectors = spark.read.parquet(s"$indexDir/vectors")
    val dup = newVecs.join(
      vectors.select(col("id").as("nid")), Seq("nid"), "left_semi")
      .count()
    require(dup == 0L,
      s"$dup batch id(s) already in the index at $indexDir — " +
        "graph-ann-ingest appends NEW vectors only (replayed batch?)")
    val graph = spark.read.parquet(s"$indexDir/graph")
    val appended = NnDescent.appendToGraph(
      graph.select(col("u"), col("nb"), col("d2")), vectors, newVecs,
      k = meta.k, beam = beam, hops = hops,
      entries = spark.read.parquet(s"$indexDir/entries"))
    val nRefreshed = appended.join(
      newVecs.select(col("nid").as("u")), Seq("u"), "left_anti")
      .select(col("u")).distinct().count()
    writeSwap(NnDescent.applyAppend(graph, appended),
      s"$indexDir/graph")
    appended.unpersist() // caller-owned persist (appendToGraph)
    writeSwap(vectors.unionByName(
      newVecs.select(col("nid").as("id"), col("qv").as("v"))),
      s"$indexDir/vectors")
    newVecs.unpersist()
    // the swapped graph/vectors are now the stored truth — re-derive
    // the serving layout from the files, not the pre-swap frames
    val g2 = spark.read.parquet(s"$indexDir/graph")
    val v2 = spark.read.parquet(s"$indexDir/vectors")
    writeSwap(g2.select(col("u"), col("nb"))
      .join(v2.select(col("id").as("nb"), col("v").as("nv")), "nb")
      .select(col("u"), col("nb"), col("nv")), s"$indexDir/adj")
    if (refreshEntries)
      writeSwap(NnDescent.refreshEntries(v2, meta.entryCand),
        s"$indexDir/entries")
    (nNew, nRefreshed)
  }

  /** SERVE: top-k beam search for a parquet of query vectors, from
    * the stored artifacts alone, through the chosen engine of the
    * r15 ladder — `driver` ([[NnDescent.beamTopK]], per-hop jobs
    * against the pre-joined adjacency), `bulk`
    * ([[NnDescent.beamTopKBulk]], one fixed-depth relational plan),
    * `hot` ([[NnDescent.beamTopKHot]], the broadcast RAM replica —
    * RAM-guarded by hotArtifacts), or `auto`
    * ([[NnDescent.beamServe]]'s batch-size dispatch, fed the batch
    * size counted ONCE here — ADVICE r15). Writes (query_id, rank,
    * node_id, d2) parquet to `outDir` and returns (nProbes, nRows).
    * Geometry: `k` is the ANSWER count per probe (the ef-search
    * return contract), independent of the stored graph's adjacency
    * width (meta.k) — beam 4 / hops 8 / k 8 are the gated q243/q244
    * serve defaults. */
  def serve(spark: SparkSession, indexDir: String, queries: String,
      outDir: String, engine: String = "auto", beam: Int = 4,
      hops: Int = 8, k: Int = 8): (Long, Long) = {
    val meta = readMeta(spark, indexDir)
    val graph = spark.read.parquet(s"$indexDir/graph")
      .select(col("u"), col("nb"))
    val vectors = spark.read.parquet(s"$indexDir/vectors")
    val entries = spark.read.parquet(s"$indexDir/entries")
    val adj = spark.read.parquet(s"$indexDir/adj")
    val probes = asVecs(spark.read.parquet(queries))
      .select(col("id").as("query_id"), col("v").as("qv")).persist()
    val n = probes.count()
    var hot: Option[org.apache.spark.broadcast.Broadcast[
      NnDescent.HotGraph]] = None
    val res = engine match {
      case "driver" =>
        NnDescent.beamTopK(graph, vectors, probes, hops, beam,
          k, entries, Some(adj))
      case "bulk" =>
        NnDescent.beamTopKBulk(graph, vectors, probes, hops, beam,
          k, entries, Some(adj))
      case "hot" =>
        val h = NnDescent.hotArtifacts(graph, vectors, entries)
        hot = Some(h)
        NnDescent.beamTopKHot(h, probes, hops, beam, k)
      case "auto" =>
        NnDescent.beamServe(graph, vectors, probes, hops, beam,
          k, entries, adj = Some(adj), knownBatch = Some(n))
      case other => throw new IllegalArgumentException(
        s"unknown engine '$other' — use auto|driver|bulk|hot")
    }
    res.write.mode(SaveMode.Overwrite).parquet(outDir)
    probes.unpersist()
    hot.foreach(_.destroy())
    (n, spark.read.parquet(outDir).count())
  }
}
