package graft

import org.apache.spark.sql.SparkSession

import graft.config.GraftConfig
import graft.engine.{ClusterEngine, EngineConf, ResultDocs}
import graft.io.{KStore, Sinks, Sources}

/** CLI entry points mirroring the reference's two scripts
  * (`/root/reference/scripts/cluster.py:238-308`,
  * `scripts/optimal_k.py:351-393`):
  *
  *   graft.Main cluster   <interval> <inputCsvOrParquetDir> <outDir> [conf.json]
  *   graft.Main optimal-k <inputCsvOrParquetDir> <outDir> [conf.json]
  *
  * `cluster` runs the config task grid over the input, writes
  * originalCollection/d3Collection-shaped JSON docs per task, and consults
  * the k-store under `<outDir>/kstore` (recompute-on-miss). `optimal-k`
  * runs the k-search for every task and upserts the k-store. The task grid
  * honors `threadNum` (G3) via a Future pool + FAIR scheduler when > 1;
  * with one-shuffle segmentation each task is a single job, so this only
  * overlaps scheduling gaps, never a job storm.
  */
object Main {

  def main(args: Array[String]): Unit = args.toList match {
    case "cluster" :: interval :: input :: outDir :: rest =>
      run(loadConf(rest), interval, input, outDir, searchK = false)
    case "optimal-k" :: input :: outDir :: rest =>
      run(loadConf(rest), "optimal-k", input, outDir, searchK = true)
    case "dedup" :: input :: outDir :: rest =>
      runDedup(loadConf(rest), input, outDir)
    case "dedup-ingest" :: batch :: indexDir :: outDir :: rest =>
      runDedupIngest(loadConf(rest), batch, indexDir, outDir)
    case "dedup-spans" :: input :: outDir :: rest =>
      runDedupSpans(input, outDir,
        rest.headOption.map(_.toInt).getOrElse(12))
    case "exhibit" :: sfDir :: outDir :: _ =>
      runExhibits(sfDir, outDir)
    case "score" :: input :: outDir :: _ =>
      runScore(input, outDir)
    case "media-meta" :: input :: outDir :: _ =>
      runMediaMeta(input, outDir)
    case "kmeans-corpus" :: input :: outDir :: rest =>
      runKmeansCorpus(input, outDir,
        k = rest.headOption.map(_.toInt).getOrElse(0),
        iterations = rest.drop(1).headOption.map(_.toInt).getOrElse(5))
    case "report" :: input :: outPath :: _ =>
      runReport(input, outPath)
    case "graph" :: edges :: outDir :: rest =>
      runGraph(edges, outDir,
        rest.headOption.map(_.toInt).getOrElse(10))
    case "screen" :: input :: outDir :: rest =>
      runScreen(input, outDir, rest.headOption)
    case "bpe-train" :: input :: mergesDir :: rest =>
      runBpeTrain(input, mergesDir,
        rest.headOption.map(_.toInt).getOrElse(32))
    case "bpe-encode" :: input :: mergesDir :: outDir :: _ =>
      runBpeEncode(input, mergesDir, outDir)
    case "pca-train" :: input :: momentsDir :: _ =>
      runPcaTrain(input, momentsDir)
    case "pca-ingest" :: batch :: momentsDir :: _ =>
      runPcaIngest(batch, momentsDir)
    case "pca-project" :: input :: momentsDir :: outDir :: rest =>
      runPcaProject(input, momentsDir, outDir,
        rest.headOption.map(_.toInt).getOrElse(16))
    case "ann-index" :: input :: outDir :: rest =>
      runAnnIndex(loadConf(rest), input, outDir)
    case "ann-ingest" :: batch :: indexDir :: rest =>
      runAnnIngest(loadConf(rest), batch, indexDir)
    case "ann-query" :: indexDir :: queries :: outDir :: rest =>
      runAnnQuery(loadConf(rest), indexDir, queries, outDir)
    case "ann-query-pq" :: indexDir :: queries :: outDir :: rest =>
      runAnnQueryPq(loadConf(rest), indexDir, queries, outDir)
    case "ann-query-ivfpq" :: indexDir :: queries :: outDir :: rest =>
      runAnnQueryIvfPq(loadConf(rest), indexDir, queries, outDir)
    case "graph-ann-build" :: input :: indexDir :: rest =>
      runGraphAnnBuild(input, indexDir, rest)
    case "graph-ann-ingest" :: batch :: indexDir :: rest =>
      runGraphAnnIngest(batch, indexDir, rest)
    case "graph-ann-serve" :: indexDir :: queries :: outDir :: rest =>
      runGraphAnnServe(indexDir, queries, outDir, rest)
    case "graph-ann-stream" :: srcDir :: indexDir :: chkDir :: rest =>
      runGraphAnnStream(srcDir, indexDir, chkDir, rest)
    case "sketch-ingest" :: batch :: sketchDir :: rest =>
      runSketchIngest(batch, sketchDir,
        rest.headOption.map(_.toLong).getOrElse(1L))
    case "sketch-report" :: sketchDir :: outDir :: _ =>
      runSketchReport(sketchDir, outDir)
    case "snapshot-diff" :: oldPath :: newPath :: outDir :: _ =>
      runSnapshotDiff(oldPath, newPath, outDir)
    case "quality-filter" :: input :: outDir :: rest =>
      runQualityFilter(input, outDir,
        rest.headOption.map(_.toDouble).getOrElse(0.5))
    case "dsir-select" :: input :: outDir :: rest =>
      runDsirSelect(input, outDir,
        rest.headOption.map(_.toInt).getOrElse(100))
    case "compact" :: dir :: rest =>
      runCompact(dir,
        rest.headOption.map(_.toLong).getOrElse(128L) * 1024 * 1024)
    case "jsonl-ingest" :: input :: outDir :: _ =>
      runJsonlIngest(input, outDir)
    case "decontaminate" :: input :: evalSet :: outDir :: rest =>
      runDecontaminate(input, evalSet, outDir,
        rest.headOption.map(_.toInt).getOrElse(8))
    case "decon-index" :: evalSet :: indexDir :: rest =>
      runDeconIndex(evalSet, indexDir,
        rest.headOption.map(_.toInt).getOrElse(8))
    case "decon-stream" :: srcDir :: indexDir :: outDir :: chkDir :: _ =>
      runDeconStream(srcDir, indexDir, outDir, chkDir)
    case "neardup-index" :: input :: indexDir :: _ =>
      runNearDupIndex(input, indexDir)
    case "neardup-stream" :: srcDir :: indexDir :: outDir :: chkDir :: rest =>
      runNearDupStream(srcDir, indexDir, outDir, chkDir,
        rest.headOption.map(_.toDouble).getOrElse(0.5))
    case "moments-stream" :: srcDir :: momentsDir :: chkDir :: rest =>
      runMomentsStream(srcDir, momentsDir, chkDir,
        rest.headOption.map(_.toInt).getOrElse(64))
    case "hll-stream" :: srcDir :: hllDir :: chkDir :: keyCol :: _ =>
      runHllStream(srcDir, hllDir, chkDir, keyCol)
    case "hist-stream" :: srcDir :: histDir :: chkDir :: valueCol :: rest =>
      runHistStream(srcDir, histDir, chkDir, valueCol,
        rest.headOption.map(_.toLong).getOrElse(16L),
        rest.drop(1).headOption.map(_.toInt).getOrElse(64))
    case "overlap" :: aPath :: bPath :: keyCol :: outDir :: _ =>
      runOverlap(aPath, bPath, keyCol, outDir)
    case "quantize" :: input :: outDir :: _ =>
      runQuantize(input, outDir)
    case "hybrid-search" :: docs :: emb :: outDir :: rest =>
      runHybridSearch(docs, emb, outDir, rest)
    case "curate" :: "--append" :: input :: outDir :: rest =>
      runCurate(input, outDir,
        rest.headOption.map(_.toLong).getOrElse(2000L), append = true)
    case "curate" :: input :: outDir :: rest =>
      runCurate(input, outDir,
        rest.headOption.map(_.toLong).getOrElse(2000L))
    case other =>
      System.err.println(
        s"""usage: graft.Main cluster <interval> <input> <outDir> [conf.json]
           |       graft.Main optimal-k <input> <outDir> [conf.json]
           |       graft.Main dedup <docsParquet> <outDir> [conf.json]
           |       graft.Main dedup-ingest <batchParquet> <indexDir> <outDir> [conf.json]
           |       graft.Main dedup-spans <docsParquet> <outDir> [w]
           |       graft.Main score <docsParquet> <outDir>
           |       graft.Main report <docsParquet> <outJson>
           |       graft.Main bpe-train <docsParquet> <mergesDir> [k]
           |       graft.Main bpe-encode <docsParquet> <mergesDir> <outDir>
           |       graft.Main pca-train <embParquet> <momentsDir>
           |       graft.Main pca-ingest <batchParquet> <momentsDir>
           |       graft.Main pca-project <embParquet> <momentsDir> <outDir> [k]
           |       graft.Main ann-index <embeddingsParquet> <outDir> [conf.json]
           |       graft.Main ann-ingest <batchParquet> <indexDir> [conf.json]
           |       graft.Main ann-query <indexDir> <queriesParquet> <outDir> [conf.json]
           |       graft.Main ann-query-pq <indexDir> <queriesParquet> <outDir> [conf.json]
           |       graft.Main ann-query-ivfpq <indexDir> <queriesParquet> <outDir> [conf.json]
           |       graft.Main graph-ann-build <embeddingsParquet> <indexDir> [--k n] [--cap n] [--rounds n] [--entries n]
           |       graft.Main graph-ann-ingest <batchParquet> <indexDir> [--refresh-entries] [--beam n] [--hops n]
           |       graft.Main graph-ann-serve <indexDir> <queriesParquet> <outDir> [--engine auto|driver|bulk|hot] [--beam n] [--hops n] [--topk n]
           |       graft.Main graph-ann-stream <srcDir> <indexDir> <chkDir> [--refresh-entries]
           |       graft.Main sketch-ingest <batchParquet> <sketchDir> [batchId]
           |       graft.Main sketch-report <sketchDir> <outDir>
           |       graft.Main snapshot-diff <oldParquet> <newParquet> <outDir>
           |       graft.Main quality-filter <docsParquet> <outDir> [threshold]
           |       graft.Main dsir-select <docsParquet> <outDir> [k]
           |       graft.Main jsonl-ingest <jsonlPath> <outDir>  (clean parquet + quarantine)
           |       graft.Main decontaminate <docsParquet> <evalParquet> <outDir> [w]
           |       graft.Main decon-index <evalParquet> <indexDir> [w]
           |       graft.Main decon-stream <srcDir> <indexDir> <outDir> <chkDir>
           |       graft.Main neardup-index <docsParquet> <indexDir>
           |       graft.Main neardup-stream <srcDir> <indexDir> <outDir> <chkDir> [threshold]
           |       graft.Main moments-stream <srcDir> <momentsDir> <chkDir> [dim]
           |       graft.Main hll-stream <srcDir> <hllDir> <chkDir> <keyCol>
           |       graft.Main hist-stream <srcDir> <histDir> <chkDir> <valueCol> [width] [nbins]
           |       graft.Main overlap <aParquet> <bParquet> <keyCol> <outDir>
           |       graft.Main quantize <embParquet> <outDir>
           |       graft.Main hybrid-search <docsParquet> <embParquet> <outDir> <term term ...> [--vec <id>] [--k <n>] [--rerank]
           |       graft.Main curate [--append] <docsParquet> <outDir> [rowsPerShard]
           |       graft.Main compact <parquetDir> [targetMB]  (writers must be quiesced)
           |       graft.Main media-meta <binaryParquet> <outDir>
           |       graft.Main kmeans-corpus <embParquet> <outDir> [k] [iters]  (k=0 sweeps 2..8)
           |(got: ${other.mkString(" ")})""".stripMargin)
      sys.exit(2)
  }

  /** Build the persisted similarity indexes from the config overlay's
    * ANN knobs (annNlist, pqSubspaces, pqCentroids): a cosine IVF for
    * `ann-query`, an L2 IVF for the `ann-query-ivfpq` composition (the
    * coarse metric must match ADC's), and the PQ codebook + codes. */
  private def runAnnIndex(gc: GraftConfig, input: String,
      outDir: String): Unit = {
    val spark = session()
    val emb = spark.read.parquet(input)
    graft.operators.IvfIndex.writeIndex(emb, "vec_id", "embedding",
      s"$outDir/ivf", nlist = gc.annNlist, seed = 42L)
    graft.operators.IvfIndex.writeIndex(emb, "vec_id", "embedding",
      s"$outDir/ivf_l2", nlist = gc.annNlist, seed = 42L, metric = "l2")
    graft.operators.PqIndex.writeIndex(emb, "vec_id", "embedding",
      s"$outDir/pq", m = gc.pqSubspaces, k = gc.pqCentroids, seed = 42L)
    spark.stop()
  }

  /** Ingest a new embedding batch into EVERY persisted index built by
    * `ann-index`: both IVF variants (bucket-assign under the stored
    * centroids) and the PQ codes (encode under the stored codebook) —
    * no retraining, no corpus re-read. */
  private def runAnnIngest(gc: GraftConfig, batch: String,
      indexDir: String): Unit = {
    val spark = session()
    // guard each sub-index like VecIngest: a partial layout (only ivf/)
    // must not throw after the first append already committed, and a
    // fully absent layout must fail fast instead of silently no-opping
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir), spark.sparkContext.hadoopConfiguration)
    def has(sub: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/$sub"))
    require(has("ivf") || has("ivf_l2") || has("pq"),
      s"no index found under $indexDir — run ann-index first")
    val emb = spark.read.parquet(batch)
    if (has("ivf"))
      graft.operators.IvfIndex.appendVectors(spark, s"$indexDir/ivf",
        emb, "vec_id", "embedding")
    if (has("ivf_l2"))
      graft.operators.IvfIndex.appendVectors(spark, s"$indexDir/ivf_l2",
        emb, "vec_id", "embedding")
    if (has("pq"))
      graft.operators.PqIndex.appendVectors(spark, s"$indexDir/pq",
        emb, "vec_id", "embedding")
    spark.stop()
  }

  /** Answer top-k queries from the PERSISTED IVF index (annNprobe from
    * the overlay) — no retraining, no corpus scan; only the probed
    * bucket partitions are read. */
  private def runAnnQuery(gc: GraftConfig, indexDir: String,
      queries: String, outDir: String): Unit = {
    val spark = session()
    require(graft.operators.IvfIndex.readIndexMetric(spark,
      s"$indexDir/ivf") == "cosine", "ann-query serves the cosine index")
    val (centroids, buckets) =
      graft.operators.IvfIndex.readIndex(spark, s"$indexDir/ivf")
    val q = spark.read.parquet(queries)
      .select(org.apache.spark.sql.functions.col("vec_id")
          .as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("qv"))
    Sinks.writeParquet(
      graft.operators.IvfIndex.topKAgainstIndex(q, centroids, buckets,
        "query_id", "qv", k = 10, nprobe = gc.annNprobe)
        .drop("qv"),
      outDir)
    spark.stop()
  }

  /** Collect the bounded query probe set as local (id, vector) pairs —
    * the shape the ADC scorers take their per-query lookup tables from.
    */
  private def loadQueryVectors(spark: SparkSession,
      queries: String): Seq[(Long, Array[Double])] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(queries)
      .select(col("vec_id").cast("long"),
        graft.operators.Similarity.asDouble(col("embedding")))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toArray)
      .toSeq.sortBy(_._1)
  }

  /** Answer top-k from the PERSISTED PQ index alone (codebook + codes —
    * the 32×-compressed artifact; no float vector is read). */
  private def runAnnQueryPq(gc: GraftConfig, indexDir: String,
      queries: String, outDir: String): Unit = {
    val spark = session()
    val (cb, codes) =
      graft.operators.PqIndex.readIndex(spark, s"$indexDir/pq")
    Sinks.writeParquet(
      graft.operators.PqIndex.adcTopK(spark,
        loadQueryVectors(spark, queries), codes, cb, k = 10),
      outDir)
    spark.stop()
  }

  /** Answer top-k from the PERSISTED IVF-PQ composition: the L2 IVF
    * prunes to annNprobe bucket partitions, the PQ codes score the
    * survivors via ADC — the FAISS-style serving path, entirely from
    * stored artifacts. */
  private def runAnnQueryIvfPq(gc: GraftConfig, indexDir: String,
      queries: String, outDir: String): Unit = {
    val spark = session()
    require(graft.operators.IvfIndex.readIndexMetric(spark,
      s"$indexDir/ivf_l2") == "l2",
      "ann-query-ivfpq needs the L2-bucketed index (coarse metric must " +
        "match ADC)")
    val (centroids, buckets) =
      graft.operators.IvfIndex.readIndex(spark, s"$indexDir/ivf_l2")
    val (cb, codes) =
      graft.operators.PqIndex.readIndex(spark, s"$indexDir/pq")
    Sinks.writeParquet(
      graft.operators.PqIndex.ivfPqTopKAgainstIndex(spark,
        loadQueryVectors(spark, queries), centroids, buckets, cb, codes,
        nprobe = gc.annNprobe, topK = 10),
      outDir)
    spark.stop()
  }

  /** Graph-ANN index lifecycle from the command line (VERDICT r15 #1
    * — the serving ladder as a user surface, mirroring the IVF trio):
    * build persists graph/vectors/entries/adj/meta, ingest appends a
    * batch without retraining (`--refresh-entries` re-derives the
    * entry frame from the grown corpus), serve answers a query
    * parquet through any engine of the r15 ladder. All three compose
    * the gated operators unchanged — GraphAnnCliSpec pins the CLI
    * path hash-equal to the q243/q244 oracle faces. */
  private def flagOpt(rest: List[String], flag: String): Option[String] =
    rest.sliding(2).collectFirst { case List(`flag`, v) => v }

  private def runGraphAnnBuild(input: String, indexDir: String,
      rest: List[String]): Unit = {
    val spark = session()
    val (n, e) = graft.operators.GraphAnnIndex.build(spark, input,
      indexDir,
      k = flagOpt(rest, "--k").map(_.toInt).getOrElse(16),
      cap = flagOpt(rest, "--cap").map(_.toInt).getOrElse(32),
      rounds = flagOpt(rest, "--rounds").map(_.toInt).getOrElse(3),
      entryCand = flagOpt(rest, "--entries").map(_.toInt).getOrElse(32))
    println(s">>> [graph-ann-build] vectors=$n edges=$e dir=$indexDir")
    spark.stop()
  }

  private def runGraphAnnIngest(batch: String, indexDir: String,
      rest: List[String]): Unit = {
    val spark = session()
    val (nNew, nRefreshed) = graft.operators.GraphAnnIndex.ingest(
      spark, batch, indexDir,
      beam = flagOpt(rest, "--beam").map(_.toInt).getOrElse(4),
      hops = flagOpt(rest, "--hops").map(_.toInt).getOrElse(4),
      refreshEntries = rest.contains("--refresh-entries"))
    println(s">>> [graph-ann-ingest] appended=$nNew " +
      s"refreshed_old_lists=$nRefreshed" +
      (if (rest.contains("--refresh-entries")) " entries=refreshed"
      else ""))
    spark.stop()
  }

  private def runGraphAnnServe(indexDir: String, queries: String,
      outDir: String, rest: List[String]): Unit = {
    val spark = session()
    val engine = flagOpt(rest, "--engine").getOrElse("auto")
    val (n, rows) = graft.operators.GraphAnnIndex.serve(spark,
      indexDir, queries, outDir, engine,
      beam = flagOpt(rest, "--beam").map(_.toInt).getOrElse(4),
      hops = flagOpt(rest, "--hops").map(_.toInt).getOrElse(8),
      k = flagOpt(rest, "--topk").map(_.toInt).getOrElse(8))
    println(s">>> [graph-ann-serve] engine=$engine probes=$n " +
      s"results=$rows")
    spark.stop()
  }

  /** Streaming graph-ANN ingest: drain the embedding backlog in
    * `srcDir` into the persisted index via the q240 append protocol,
    * batch-replay idempotent ([[graft.streaming.GraphAnnStream]]). */
  private def runGraphAnnStream(srcDir: String, indexDir: String,
      chkDir: String, rest: List[String]): Unit = {
    val spark = session()
    graft.streaming.GraphAnnStream.runToCompletion(spark, srcDir,
      indexDir, chkDir,
      refreshEntries = rest.contains("--refresh-entries"))
    println(s">>> [graph-ann-stream] indexed=" +
      s"${graft.streaming.GraphAnnStream.indexedVectors(spark, indexDir).count()}")
    spark.stop()
  }

  /** North-star CLI: MinHash near-dup detection + duplicate families +
    * the surviving corpus, parameterized by the config overlay's dedup
    * knobs (minhashNumHashes/minhashBands/dedupThreshold/shingleN/
    * maxBucket). Writes `pairs`, `families`, `kept` under outDir. */
  private def runDedup(gc: GraftConfig, input: String,
      outDir: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(input)
    val pairs = graft.operators.Dedup.minhashNearDups(docs, "doc_id",
      "text", numHashes = gc.minhashNumHashes, bands = gc.minhashBands,
      threshold = gc.dedupThreshold, shingleN = gc.shingleN,
      maxBucket = gc.maxBucket).persist()
    Sinks.writeParquet(pairs, s"$outDir/pairs")
    val families = graft.operators.Dedup.connectedComponents(pairs)
      .groupBy(org.apache.spark.sql.functions.col("component"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("family_size"))
    Sinks.writeParquet(families, s"$outDir/families")
    Sinks.writeParquet(
      graft.operators.Dedup.keepCanonical(docs, "doc_id", pairs),
      s"$outDir/kept")
    pairs.unpersist()
    spark.stop()
  }

  /** Production ingest loop: dedup one batch against the growing
    * persisted MinHash index (and itself), keep survivors, append only
    * their signatures — batch-1 text is never re-read when batch 2
    * arrives. Knobs from the config overlay, like `dedup`. */
  /** Span-level dedup end-to-end: identify duplicated w-token spans
    * ([[graft.operators.Dedup.duplicateSpans]]) and write both the span
    * table and the excised corpus — the decontamination run of a
    * training-data pipeline. */
  private def runDedupSpans(input: String, outDir: String,
      w: Int): Unit = {
    val spark = session()
    val docs = spark.read.parquet(input)
    Sinks.writeParquet(graft.operators.Dedup.duplicateSpans(docs,
      "doc_id", "text", w), s"$outDir/spans")
    // excise from the span table just WRITTEN — identification runs
    // exactly once, and the report reads files, not the DAG
    Sinks.writeParquet(graft.operators.Dedup.exciseSpans(docs, "doc_id",
      "text", spark.read.parquet(s"$outDir/spans")), s"$outDir/clean")
    val n = spark.read.parquet(s"$outDir/spans").count()
    val removed = spark.read.parquet(s"$outDir/clean")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("n_removed")))
      .head().getLong(0)
    println(s">>> [dedup-spans] w=$w spans=$n tokens_removed=$removed")
    spark.stop()
  }

  /** Corpus quality scoring in one pass: per document, the text-quality
    * signals a pretraining filter consumes — token stats, heuristic
    * language ID, composite quality score, repetition signals, and the
    * mean unigram log-probability (the perplexity-style signal, trained
    * on the corpus itself). Pure expressions plus the LM's one counts
    * shuffle + scoring join. */
  /** Dataset-card JSON for a document corpus
    * ([[graft.operators.CorpusReport]]) — three linear scans, one small
    * deterministic file. */
  private def runReport(input: String, outPath: String): Unit = {
    val spark = session()
    val json =
      graft.operators.CorpusReport.report(spark.read.parquet(input))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      json + "\n")
    println(s">>> [report] $json")
    spark.stop()
  }

  /** BPE artifact lifecycle — tokenizer twin of the ANN/PCA stories:
    * `bpe-train` runs the distributed word count + driver merge loop and
    * persists the rank-ordered merge table; `bpe-encode` reads it back
    * (never retrains) and tokenizes a corpus under the stored merges. */
  private def runBpeTrain(input: String, mergesDir: String,
      k: Int): Unit = {
    val spark = session()
    val merges =
      graft.operators.Bpe.topMerges(spark.read.parquet(input), "text", k)
    merges.coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(mergesDir)
    println(s">>> [bpe-train] merges=" +
      s"${spark.read.parquet(mergesDir).count()}")
    spark.stop()
  }

  private def runBpeEncode(input: String, mergesDir: String,
      outDir: String): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.{col, size}
    val merges = spark.read.parquet(mergesDir)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toSeq
    require(merges.nonEmpty, s"no merges at $mergesDir — run bpe-train")
    val out = graft.operators.Bpe
      .encode(spark.read.parquet(input), "text", merges)
      .select(col("doc_id"), col("bpe_tokens"),
        size(col("bpe_tokens")).as("n_bpe"))
    Sinks.writeParquet(out, outDir)
    println(s">>> [bpe-encode] docs=${spark.read.parquet(outDir).count()}")
    spark.stop()
  }

  /** Container-metadata extraction over a binary corpus
    * ([[graft.multimodal.Multimodal.videoMeta]]): one map-side pass
    * writes (id, format, brand, duration_ms, width, height, codec) —
    * the honest metadata face of the codec-less MP4/WebM policy. */
  /** Whole-corpus k-means ([[graft.ml.DistributedKMeans]]): with an
    * explicit k, one deterministic k-means||-seeded fit — assignments
    * to `outDir/assignments`, centroids to `outDir/centroids`. With
    * k=0, the optimal-k SWEEP (2..8) runs first on a deterministic 10%
    * hash slice, the winner by simplified silhouette is fit on the
    * full corpus, and the decision surface lands in `outDir/sweep` —
    * the reference's k-search lifecycle at corpus scale, never
    * collecting the data. */
  private def runKmeansCorpus(input: String, outDir: String, k: Int,
      iterations: Int): Unit = {
    val spark = session()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = spark.read.parquet(input)
      .select(col("vec_id").cast("long").as("id"),
        graft.operators.Similarity.asDouble(col("embedding")).as("v"))
    val chosenK =
      if (k > 0) k
      else {
        val slice = vecs.filter(
          pmod(xxhash64(col("id"), lit(159L)), lit(10)) === 0)
        val sweep = graft.ml.DistributedKMeans
          .sweepK(slice, "id", "v", ks = (2 to 8), iterations = iterations)
        sweep.map { case (kk, w, s) => (kk, w, s) }
          .toDF("k", "wssse", "silhouette")
          .coalesce(1).write.mode("overwrite")
          .json(s"$outDir/sweep")
        val best = sweep.maxBy(s => (s._3, -s._1))._1
        println(s">>> [kmeans-corpus] sweep chose k=$best " +
          sweep.map { case (kk, w, s) => f"k=$kk sil=$s%.4f" }
            .mkString("(", ", ", ")"))
        best
      }
    val (asg, cents) = graft.ml.DistributedKMeans.fit(
      vecs, "id", "v", chosenK, iterations)
    graft.io.Sinks.writeParquet(asg, s"$outDir/assignments")
    graft.io.Sinks.writeParquet(
      cents.select(col("c"), col("cv")), s"$outDir/centroids")
    println(s">>> [kmeans-corpus] k=$chosenK wrote $outDir")
    spark.stop()
  }

  private def runMediaMeta(input: String, outDir: String): Unit = {
    val spark = session()
    val withBin = spark.read.parquet(input)
    graft.io.Sinks.writeParquet(
      graft.multimodal.Multimodal.videoMeta(withBin), outDir)
    println(s">>> [media-meta] wrote $outDir")
    spark.stop()
  }

  /** Graph analytics bundle over an edge parquet (first two columns =
    * the endpoints): PageRank centrality, label-propagation
    * communities, and per-node triangle counts, each a parquet
    * artifact. One verb because the three share the edge scan and
    * answer the same corpus question from three sides (who's central /
    * who clusters / how cliquish). */
  private def runGraph(edgesPath: String, outDir: String,
      iterations: Int): Unit = {
    val spark = session()
    val edges = spark.read.parquet(edgesPath)
    val Array(a, b) = edges.columns.take(2)
    val g = graft.operators.Graph
    val ranks = g.pageRankUndirected(edges, a, b, iterations)
    Sinks.writeParquet(ranks, s"$outDir/ranks")
    val comms = g.labelPropagation(edges, a, b)
    Sinks.writeParquet(comms, s"$outDir/communities")
    val tri = g.triangleCounts(edges, a, b)
    Sinks.writeParquet(tri, s"$outDir/triangles")
    val nComm = comms.select("lab").distinct().count()
    println(s">>> [graph] nodes=${ranks.count()} communities=$nComm " +
      s"triangles=${tri.agg(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.col("n_tri"))).head()
        .getLong(0) / 3}")
    ranks.unpersist(); comms.unpersist(); tri.unpersist()
    spark.stop()
  }

  /** Content screening bundle: compression-ratio repetition gate plus
    * (optionally) an Aho–Corasick blocklist screen from a
    * phrase-per-line file. Writes one profile parquet — (doc_id,
    * n_bytes, ratio, hits, n_hits, keep) — with keep = in the
    * compression band AND zero blocklist hits; the caller filters,
    * the artifact keeps the evidence for every decision. */
  private def runScreen(input: String, outDir: String,
      phrasesFile: Option[String]): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.{col, lit, array}
    val docs = spark.read.parquet(input)
    val comp = graft.operators.Compression.profile(docs, "doc_id", "text")
    val out = phrasesFile match {
      case Some(f) =>
        val phrases = graft.operators.PhraseScreen.loadPhrases(f)
        val hits = graft.operators.PhraseScreen.screen(
          docs, "doc_id", "text", phrases)
        comp.join(hits, Seq("doc_id"))
          .withColumn("keep", col("keep") && col("n_hits") === 0)
      case None =>
        comp.withColumn("hits", array().cast("array<string>"))
          .withColumn("n_hits", lit(0L))
    }
    Sinks.writeParquet(out, outDir)
    val kept = spark.read.parquet(outDir)
    println(s">>> [screen] kept=${kept.filter(col("keep")).count()} " +
      s"of ${kept.count()}")
    spark.stop()
  }

  /** JSONL front door: PERMISSIVE read with corrupt-line quarantine
    * ([[graft.io.Sources.readJsonl]]) → clean parquet + the quarantined
    * raw lines as the audit artifact. */
  private def runJsonlIngest(input: String, outDir: String): Unit = {
    val spark = session()
    val df = graft.io.Sources.readJsonl(spark, input)
    val (clean, bad) = graft.io.Sources.splitQuarantine(df)
    Sinks.writeParquet(clean, s"$outDir/clean")
    Sinks.writeParquet(bad, s"$outDir/quarantine")
    println(s">>> [jsonl-ingest] clean=" +
      s"${spark.read.parquet(s"$outDir/clean").count()} quarantined=" +
      s"${spark.read.parquet(s"$outDir/quarantine").count()}")
    spark.stop()
  }

  /** Benchmark decontamination: per-training-doc w-gram overlap report
    * against the eval set, plus the CLEANED corpus (overlapping docs
    * anti-joined away) — the artifact keeps the evidence, the clean
    * set is what trains. */
  private def runDecontaminate(input: String, evalSet: String,
      outDir: String, w: Int): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.col
    val train = spark.read.parquet(input)
    val ev = spark.read.parquet(evalSet)
    val report = graft.operators.Decontaminate.overlapReport(
      train, ev, "doc_id", "text", w)
    Sinks.writeParquet(report, s"$outDir/report")
    val clean = train.join(
      spark.read.parquet(s"$outDir/report").select("doc_id"),
      Seq("doc_id"), "left_anti")
    Sinks.writeParquet(clean, s"$outDir/clean")
    println(s">>> [decontaminate] contaminated=" +
      s"${spark.read.parquet(s"$outDir/report").count()} " +
      s"kept=${spark.read.parquet(s"$outDir/clean").count()} " +
      s"of ${train.count()}")
    spark.stop()
  }

  /** Build the persisted eval-gram decon index once; `decon-stream`
    * then screens arriving shards without re-reading the eval set. */
  private def runDeconIndex(evalSet: String, indexDir: String,
      w: Int): Unit = {
    val spark = session()
    graft.operators.Decontaminate.writeEvalIndex(
      spark.read.parquet(evalSet), "doc_id", "text", indexDir, w)
    println(s">>> [decon-index] grams=" +
      s"${spark.read.parquet(s"$indexDir/grams").count()} w=$w")
    spark.stop()
  }

  /** Streaming decontamination screen: drain the parquet backlog in
    * `srcDir` against the persisted index, writing per-doc overlap
    * evidence to batchId-keyed partition dirs (replay-idempotent; the
    * q202 face). Re-running with the same checkpoint is a no-op. */
  private def runDeconStream(srcDir: String, indexDir: String,
      outDir: String, chkDir: String): Unit = {
    val spark = session()
    graft.streaming.DeconStream.runToCompletion(spark, srcDir, indexDir,
      outDir, chkDir)
    // an already-drained checkpoint (or all-empty source files) is a
    // correct no-op that never creates outDir
    val flagged = if (graft.io.Sources.exists(spark, outDir))
      graft.streaming.DeconStream.readOutput(spark, outDir).count() else 0L
    println(s">>> [decon-stream] flagged=$flagged")
    spark.stop()
  }

  /** Build the persisted REPLAYABLE near-dup index (md5 band keys +
    * shingle sets) for `neardup-stream`. The xxhash64 production index
    * stays behind `dedup-ingest`. */
  private def runNearDupIndex(input: String, indexDir: String): Unit = {
    val spark = session()
    graft.operators.Dedup.writeReplayableIndex(
      spark.read.parquet(input), "doc_id", "text", indexDir)
    println(s">>> [neardup-index] docs=" +
      s"${spark.read.parquet(s"$indexDir/sh").count()}")
    spark.stop()
  }

  /** Streaming near-dup screen: drain the parquet backlog in `srcDir`
    * against the persisted replayable index, writing verified
    * (new_id, corpus_id, jaccard) matches to batchId-keyed partition
    * dirs (replay-idempotent; the q203 face). */
  private def runNearDupStream(srcDir: String, indexDir: String,
      outDir: String, chkDir: String, threshold: Double): Unit = {
    val spark = session()
    graft.streaming.NearDupStream.runToCompletion(spark, srcDir, indexDir,
      outDir, chkDir, threshold = threshold)
    // same no-op contract as decon-stream: nothing drained, no outDir
    val matches = if (graft.io.Sources.exists(spark, outDir))
      graft.streaming.NearDupStream.readOutput(spark, outDir).count() else 0L
    println(s">>> [neardup-stream] matches=$matches")
    spark.stop()
  }

  /** Streaming model growth: drain the embedding backlog in `srcDir`,
    * upserting one idempotent moments row per micro-batch (the q207
    * face); the artifact then serves [[graft.ml.Pca.fitFromMoments]]
    * without ever re-reading data. */
  private def runMomentsStream(srcDir: String, momentsDir: String,
      chkDir: String, dim: Int): Unit = {
    val spark = session()
    graft.streaming.MomentsStream.runToCompletion(spark, srcDir,
      momentsDir, chkDir, dim = dim)
    val rows = if (graft.io.Sources.exists(spark, momentsDir))
      spark.read.parquet(momentsDir).count() else 0L
    println(s">>> [moments-stream] batches=$rows")
    spark.stop()
  }

  /** Streaming distinct-count growth over the portable-HLL artifact
    * ([[graft.streaming.HllStream]]): drain the backlog, then serve
    * the estimate from the register-max merge of the artifact alone —
    * the q211 lifecycle as an operational verb. */
  private def runHllStream(srcDir: String, hllDir: String,
      chkDir: String, keyCol: String): Unit = {
    val spark = session()
    graft.streaming.HllStream.runToCompletion(spark, srcDir, hllDir,
      chkDir, keyCol)
    val regs = graft.operators.Sketches
      .hllRegistersFromArtifact(spark, hllDir)
    val est = graft.operators.Sketches.hllEstimate(regs)
      .select("est").head().getDouble(0)
    val batches = spark.read.parquet(hllDir)
      .select("batch_id").distinct().count()
    println(s">>> [hll-stream] batches=$batches est=$est")
    spark.stop()
  }

  /** Streaming quantile growth over the histogram artifact
    * ([[graft.streaming.SketchStreams.runHistToCompletion]]): drain
    * the backlog, then serve p50/p95/p99 from the per-bin sum of the
    * artifact alone — the q222 lifecycle as an operational verb. */
  private def runHistStream(srcDir: String, histDir: String,
      chkDir: String, valueCol: String, width: Long, nbins: Int): Unit = {
    val spark = session()
    graft.streaming.SketchStreams.runHistToCompletion(spark, srcDir,
      histDir, chkDir, valueCol, width, nbins)
    val counts = graft.operators.Sketches
      .histogramCountsFromArtifact(spark, histDir)
    val qs = graft.operators.Sketches
      .histogramQuantiles(counts, width, Seq(0.5, 0.95, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val batches = spark.read.parquet(histDir)
      .select("batch_id").distinct().count()
    println(s">>> [hist-stream] batches=$batches p50=${qs(0.5)} " +
      s"p95=${qs(0.95)} p99=${qs(0.99)}")
    spark.stop()
  }

  /** Dataset-overlap estimate by HLL set algebra ([[graft.operators
    * .Sketches]], the q214 mechanism): |A∩B| ≈ Â + B̂ - Û from p=12
    * portable registers — the two inputs are sketched independently
    * and never joined. Writes the one-row estimate to `outDir`. */
  private def runOverlap(aPath: String, bPath: String, keyCol: String,
      outDir: String): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.{col, round}
    val sk = graft.operators.Sketches
    val ra = sk.hllRegisters(spark.read.parquet(aPath), keyCol, p = 12)
    val rb = sk.hllRegisters(spark.read.parquet(bPath), keyCol, p = 12)
    val ru = sk.hllMergeRegisters(ra, rb)
    def est(r: org.apache.spark.sql.DataFrame, name: String) =
      sk.hllEstimate(r, p = 12).select(col("est").as(name))
    val out = est(ra, "est_a").crossJoin(est(rb, "est_b"))
      .crossJoin(est(ru, "est_u"))
      .withColumn("est_overlap",
        round(col("est_a") + col("est_b") - col("est_u"), 4))
    Sinks.writeParquet(out, outDir)
    val row = spark.read.parquet(outDir).head()
    println(s">>> [overlap] est_a=${row.getDouble(0)} " +
      s"est_b=${row.getDouble(1)} est_u=${row.getDouble(2)} " +
      s"est_overlap=${row.getDouble(3)}")
    spark.stop()
  }

  /** Int8 scalar quantization audit: per-vector code checksum +
    * reconstruction error ([[graft.operators.ScalarQuant]]). */
  private def runQuantize(input: String, outDir: String): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.{avg, round}
    val emb = spark.read.parquet(input)
    val rep = graft.operators.ScalarQuant.quantizeReport(
      emb, "vec_id", "embedding")
    Sinks.writeParquet(rep, outDir)
    val mean = spark.read.parquet(outDir)
      .agg(round(avg("recon_err"), 6)).head().getDouble(0)
    println(s">>> [quantize] vectors=${emb.count()} meanReconErr=$mean")
    spark.stop()
  }

  /** Hybrid BM25 + cosine retrieval with RRF fusion
    * ([[graft.operators.Retrieval.hybridTopK]]). */
  private def runHybridSearch(docs: String, emb: String, outDir: String,
      rest: List[String]): Unit = {
    def opt(flag: String): Option[String] =
      rest.sliding(2).collectFirst { case List(`flag`, v) => v }
    val terms = rest.takeWhile(!_.startsWith("--"))
    require(terms.nonEmpty, "hybrid-search needs at least one query term")
    val spark = session()
    val vecId = opt("--vec").map(_.toLong).getOrElse(0L)
    val k = opt("--k").map(_.toInt).getOrElse(10)
    // --rerank re-scores the fused candidates pairwise from the stored
    // embeddings (the q224 two-stage face)
    val out =
      if (rest.contains("--rerank"))
        graft.operators.Retrieval.rerankTopK(
          spark.read.parquet(docs), spark.read.parquet(emb),
          queryTerms = terms, queryVecId = vecId, k = k)
      else
        graft.operators.Retrieval.hybridTopK(
          spark.read.parquet(docs), spark.read.parquet(emb),
          queryTerms = terms, queryVecId = vecId, k = k)
    Sinks.writeParquet(out, outDir)
    println(s">>> [hybrid-search] results=" +
      s"${spark.read.parquet(outDir).count()}")
    spark.stop()
  }

  /** Architecture-contrast exhibits (q31/q32 spark.ml backends):
    * runnable on demand, out of the timed registry (VERDICT r11 #7 —
    * their by-design spark.ml per-job overhead measured nothing new
    * at 11 s per capture). Writes one parquet dir per exhibit. */
  private def runExhibits(sfDir: String, outDir: String): Unit = {
    val spark = session()
    Registry.exhibits.foreach { q =>
      val t0 = System.nanoTime()
      val res = q.run(spark, sfDir)
      res.write.mode("overwrite").parquet(s"$outDir/${q.name}")
      System.err.println(f"[exhibit] ${q.name} " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }

  private def runScore(input: String, outDir: String): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.{col, round}
    val docs = spark.read.parquet(input)
    val tf = graft.functions.TextFunctions
    val signals = docs.select(
      col("doc_id"),
      tf.tokenCount(col("text")).as("n_tokens"),
      tf.langId(col("text")).as("lang_id"),
      round(tf.qualityScore(col("text")), 6).as("quality"),
      round(tf.dupBigramFrac(col("text")), 6).as("dup_bigram_frac"))
    val lm = tf.unigramLogProb(docs, "doc_id", "text")
      .select(col("doc_id"), round(col("avg_logprob"), 6).as("avg_logprob"))
    val out = signals.join(lm, Seq("doc_id"), "left_outer")
    Sinks.writeParquet(out, outDir)
    // count the written files, not the scoring DAG (which would re-run
    // the LM counts shuffle end to end)
    println(s">>> [score] docs=${spark.read.parquet(outDir).count()}")
    spark.stop()
  }

  /** PCA moments lifecycle from the command line — the model twin of
    * ann-index/ann-ingest: train starts the append-only moments
    * artifact, ingest appends a batch's moments (no old data re-read),
    * project fits from the artifact alone and writes pc columns. The
    * embedding width is read from the data. */
  private def embDim(df: org.apache.spark.sql.DataFrame): Int =
    df.select(org.apache.spark.sql.functions
      .size(org.apache.spark.sql.functions.col("embedding"))).head()
      .getInt(0)

  private def runPcaTrain(input: String, momentsDir: String): Unit = {
    val spark = session()
    val emb = spark.read.parquet(input)
    val dim = embDim(emb)
    graft.ml.Pca.writeMoments(emb, "embedding", dim, momentsDir)
    println(s">>> [pca-train] dim=$dim rows=${emb.count()}")
    spark.stop()
  }

  private def runPcaIngest(batch: String, momentsDir: String): Unit = {
    val spark = session()
    val emb = spark.read.parquet(batch)
    graft.ml.Pca.appendMoments(emb, "embedding", embDim(emb), momentsDir)
    println(s">>> [pca-ingest] appended=${emb.count()}")
    spark.stop()
  }

  private def runPcaProject(input: String, momentsDir: String,
      outDir: String, k: Int): Unit = {
    val spark = session()
    val model = graft.ml.Pca.fitFromMoments(spark, momentsDir, k)
    val emb = spark.read.parquet(input)
    Sinks.writeParquet(model.transform(emb, "embedding"), outDir)
    println(s">>> [pca-project] k=$k explained=" +
      f"${model.explainedVariance.sum}%.4f")
    spark.stop()
  }

  private def runDedupIngest(gc: GraftConfig, batch: String,
      indexDir: String, outDir: String): Unit = {
    val spark = session()
    val (cross, inBatch, kept) = graft.operators.Dedup.ingest(spark,
      spark.read.parquet(batch), indexDir, outDir,
      numHashes = gc.minhashNumHashes, bands = gc.minhashBands,
      threshold = gc.dedupThreshold, shingleN = gc.shingleN,
      maxBucket = gc.maxBucket)
    println(s">>> [dedup-ingest] cross=$cross in_batch=$inBatch kept=$kept")
    spark.stop()
  }

  private def loadConf(rest: List[String]): GraftConfig = rest match {
    case path :: _ => GraftConfig.fromFile(path)
    case Nil       => GraftConfig()
  }

  def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.sparkLocalDir)
      // serialized sort writer for every exchange (the 100 TB writer;
      // see SparkTuning — bypass's per-reduce file concat mmap-thrashed
      // 32-core runs)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        SparkTuning.bypassMergeThreshold)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def run(gc: GraftConfig, interval: String, input: String,
      outDir: String, searchK: Boolean): Unit = {
    val spark = session()
    val date = java.time.LocalDate.now().toString
    val raw =
      if (input.endsWith(".csv")) Sources.readCsv(spark, input)
      else spark.read.parquet(input)
    // S4: interval row-limit as a sampling threshold, not LIMIT
    val limit = gc.args.get(interval).map(_.limit)
      .getOrElse(gc.args(gc.optimalKarg).limit)
    val df = Sources.downsample(raw, limit, seed = 42L)

    def runTask(task: (String, String, String, String, String)): Unit = {
      val (macroCol, microCol, xCol, yCol, alg) = task
      val conf = EngineConf(
        macroCol = macroCol, microCol = microCol, xCol = xCol, yCol = yCol,
        algorithm = alg, startK = gc.startK, stopK = gc.stopK,
        iterNum = gc.iterNum, thresholdedIterNum = gc.thresholdedIterNum,
        silhouetteThreshold = gc.silhouetteThreshold,
        oldSilhouetteThreshold = gc.oldSilhouetteThreshold,
        d3NormalizeMax = gc.d3NormalizeMax, dontScale = gc.dontScale)
      val taskTag = s"$alg-$macroCol-$microCol-$xCol-$yCol"
      val kStorePath = s"$outDir/kstore"
      if (searchK) {
        val results = ClusterEngine.run(df, conf).persist()
        try {
          KStore.write(KStore.fromResults(results, conf, date), kStorePath)
          println(s">>> [optimal-k] $taskTag: ${results.count()} segments")
        } finally results.unpersist()
      } else {
        val cached =
          try KStore.read(spark, kStorePath, conf)
          catch { case _: Exception => Map.empty[(String, String), graft.engine.KEntry] }
        val results = ClusterEngine.run(df, conf, cached).persist()
        try {
          Sinks.writeJson(ResultDocs.original(results, conf, date),
            s"$outDir/${interval}_originalCollection/$taskTag")
          Sinks.writeJson(ResultDocs.d3(results, conf, date),
            s"$outDir/${interval}_d3Collection/$taskTag")
          println(s">>> [cluster] $taskTag: ${results.count()} segments")
        } finally results.unpersist()
      }
    }

    // G3: the reference fans the grid over threadNum driver threads
    // (conf.json:24) to hide its per-segment job storms. With one-shuffle
    // segmentation a task is one job, so concurrency only overlaps
    // scheduling gaps — still honored via a Future pool + FAIR scheduler
    // when threadNum > 1. The k-store writes stay race-free either way
    // (each task overwrites only its own partition).
    val grid = gc.taskGrid
    if (gc.threadNum > 1 && grid.size > 1) {
      spark.sparkContext.setLocalProperty("spark.scheduler.mode", "FAIR")
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(gc.threadNum, grid.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(
        Future.sequence(grid.map(t => Future(runTask(t)))), Duration.Inf)
      finally pool.shutdown()
    } else grid.foreach(runTask)
    spark.stop()
  }

  /** Cardinality-sketch artifact lifecycle (`operators/Sketches.scala`):
    * ingest appends one tiny per-(source)-group HLL row per batch —
    * never reading old data — and report answers "distinct docs ever
    * seen" from the artifact alone. */
  private def runSketchIngest(batch: String, sketchDir: String,
      batchId: Long): Unit = {
    val spark = session()
    graft.operators.Sketches.appendSketches(
      spark.read.parquet(batch), "source", "doc_id", sketchDir, batchId)
    println(s">>> [sketch-ingest] batch=$batchId dir=$sketchDir")
    spark.stop()
  }

  private def runSketchReport(sketchDir: String, outDir: String): Unit = {
    val spark = session()
    val report = graft.operators.Sketches.estimateFromArtifact(spark, sketchDir)
      .orderBy(org.apache.spark.sql.functions.col("group"))
    Sinks.writeParquet(report, outDir)
    println(s">>> [sketch-report] groups=${spark.read.parquet(outDir).count()}")
    spark.stop()
  }

  /** Content-keyed incremental diff: only `added` rows need dedup +
    * scoring downstream; `removed` feeds retention bookkeeping. */
  private def runSnapshotDiff(oldPath: String, newPath: String,
      outDir: String): Unit = {
    val spark = session()
    val diff = graft.operators.Dedup.snapshotDiff(
      spark.read.parquet(oldPath), spark.read.parquet(newPath), "text")
    Sinks.writeParquet(diff, outDir)
    val n = spark.read.parquet(outDir)
      .groupBy("diff_status").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    println(s">>> [snapshot-diff] $n")
    spark.stop()
  }

  /** fastText-style quality gate: train the hashed-bigram logistic
    * classifier against the `en` slice as the quality target, score
    * everything, keep rows at or above the threshold. */
  private def runQualityFilter(input: String, outDir: String,
      threshold: Double): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(input)
    val model = graft.ml.QualityClassifier.train(docs, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 1024, seed = 42L,
      maxSample = 200, iters = 60)
    val scored = docs.join(
      graft.ml.QualityClassifier.score(docs, "doc_id", "text", model),
      "doc_id")
    Sinks.writeParquet(scored.filter(col("quality_score") >= threshold),
      outDir)
    println(s">>> [quality-filter] kept=" +
      s"${spark.read.parquet(outDir).count()} of ${docs.count()}")
    spark.stop()
  }

  /** The nightly corpus build in ONE verb — see
    * [[graft.operators.Curation.curate]]; `--append` grows an existing
    * directory with new-content docs only
    * ([[graft.operators.Curation.curateAppend]]). */
  private def runCurate(input: String, outDir: String,
      rowsPerShard: Long, append: Boolean = false): Unit = {
    val spark = session()
    val docs = spark.read.parquet(input)
    val counts =
      if (append) graft.operators.Curation.curateAppend(spark, docs,
        outDir, rowsPerShard)
      else graft.operators.Curation.curate(spark, docs, outDir,
        rowsPerShard)
    val verb = if (append) "curate-append" else "curate"
    val summary = counts.toSeq.sortBy(_._1)
      .map { case (sp, n) => s"$sp=$n" }.mkString(" ")
    println(s">>> [$verb] in=${docs.count()} kept=${counts.values.sum} " +
      summary)
    spark.stop()
  }

  /** Small-files compaction for an ingest-grown parquet directory —
    * see [[graft.io.Sinks.compact]]. */
  private def runCompact(dir: String, targetBytes: Long): Unit = {
    val spark = session()
    val (before, after) = Sinks.compact(spark, dir, targetBytes)
    println(s">>> [compact] $dir files $before -> $after")
    spark.stop()
  }

  /** DSIR selection: importance-weight against the `en` target and keep
    * the Gumbel-top-k docs (`operators/Dsir.scala`). */
  private def runDsirSelect(input: String, outDir: String,
      k: Int): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(input)
    val weights = graft.operators.Dsir.importanceWeights(docs, "doc_id",
      "text", isTarget = col("lang") === "en", buckets = 1024, seed = 42L)
    // target docs inform the model but only the RAW pool is selected
    // from — otherwise the highest-weighted target docs fill the top-k
    val raw = docs.filter(col("lang") =!= "en").select(col("doc_id"))
    val picked = graft.operators.Dsir.resampleTopK(
      weights.join(raw, "doc_id"), "doc_id", k = k, seed = 7L)
    Sinks.writeParquet(docs.join(picked, "doc_id"), outDir)
    println(s">>> [dsir-select] kept=${spark.read.parquet(outDir).count()}")
    spark.stop()
  }
}
