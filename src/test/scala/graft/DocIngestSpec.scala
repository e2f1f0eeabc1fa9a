package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.DocIngest

/** The STREAMING ingest front door: document files arriving in a
  * directory are deduped per micro-batch against the growing persisted
  * index via foreachBatch — and a restarted query resumes from the
  * checkpoint against the index the previous run left behind. */
class DocIngestSpec extends GraftSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  /** Write df as ONE plain parquet file at `dest` (the file-arrival
    * granularity the stream source ingests). */
  private def writeOneFile(df: org.apache.spark.sql.DataFrame,
      dest: String): Unit = {
    val tmp = Files.createTempDirectory("graft_onefile").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    new java.io.File(dest).getParentFile.mkdirs()
    Files.move(part.toPath, java.nio.file.Paths.get(dest))
  }

  test("streaming quality monitor: per-batch reports, resumed checkpoint") {
    val root = Files.createTempDirectory("graft_qmon").toString
    val srcDir = s"$root/src"
    val reportDir = s"$root/report"
    val ckpt = s"$root/ckpt"
    val rules = Seq(
      graft.operators.Profiler.Rule("has_text", length($"text") > 0),
      graft.operators.Profiler.Rule("id_pos", $"doc_id" >= 0))
    writeOneFile(docs.filter($"doc_id" < 30), s"$srcDir/b1.parquet")
    writeOneFile(docs.filter($"doc_id" >= 30 && $"doc_id" < 50),
      s"$srcDir/b2.parquet")
    graft.streaming.QualityMonitor.runToCompletion(spark, srcDir,
      reportDir, ckpt, rules)
    val rep = spark.read.parquet(s"$reportDir/batch_*")
    // 2 batches × 2 rules, every row clean
    assert(rep.count() === 4)
    assert(rep.select(countDistinct($"batch_id")).head().getLong(0) === 2)
    assert(rep.agg(sum($"n_violations"), sum($"n_null")).head()
      .toSeq === Seq(0L, 0L))
    // per-rule row totals cover every ingested document exactly once
    val totals = rep.groupBy($"rule").agg(sum($"n_rows").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals === Map("has_text" -> 50L, "id_pos" -> 50L))
    // a late file appends ONLY its own batch report on restart
    writeOneFile(docs.filter($"doc_id" >= 50 && $"doc_id" < 60),
      s"$srcDir/b3.parquet")
    graft.streaming.QualityMonitor.runToCompletion(spark, srcDir,
      reportDir, ckpt, rules)
    val rep2 = spark.read.parquet(s"$reportDir/batch_*")
    assert(rep2.count() === 6)
    assert(rep2.agg(sum($"n_rows")).head().getLong(0) === 2L * 60)
  }

  test("file-per-batch stream dedups each batch against the index") {
    val root = Files.createTempDirectory("graft_stream_ing").toString
    val srcDir = s"$root/src"
    val indexDir = s"$root/idx"
    val outDir = s"$root/out"
    val ckpt1 = s"$root/ckpt" // shared across both runs: one logical query

    // batch 1 lands alone; the first run drains it
    writeOneFile(docs.filter($"doc_id" < 40), s"$srcDir/b1.parquet")
    DocIngest.runToCompletion(spark, srcDir, indexDir, outDir, ckpt1)
    val kept1 = spark.read.parquet(s"$outDir/batch_0/kept")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept1.nonEmpty)

    // batch 2 arrives later: 5 exact clones of batch-1 survivors (new
    // ids) + fresh docs. RESTART the stream — the checkpoint must skip
    // the already-ingested b1 file, and the clones must be caught from
    // the PERSISTED index alone.
    val cloneIds = kept1.toSeq.sorted.take(5)
    writeOneFile(
      docs.filter($"doc_id".isin(cloneIds.map(Long.box): _*))
        .select(($"doc_id" + 100000L).as("doc_id"), $"text")
        .unionAll(docs.filter($"doc_id" >= 40 && $"doc_id" < 60)),
      s"$srcDir/b2.parquet")
    DocIngest.runToCompletion(spark, srcDir, indexDir, outDir, ckpt1)

    // b1 was NOT re-ingested (no batch dir beyond batch_0 and batch_1)
    val batchDirs = new java.io.File(outDir).listFiles()
      .map(_.getName).sorted.toSeq
    assert(batchDirs === Seq("batch_0", "batch_1"))

    val crossNewIds = spark.read.parquet(s"$outDir/batch_1/cross_pairs")
      .select($"new_id").as[Long].collect().toSet
    assert(cloneIds.map(_ + 100000L).toSet.subsetOf(crossNewIds),
      s"clones not caught from the index: $crossNewIds")
    val kept2 = spark.read.parquet(s"$outDir/batch_1/kept")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept2.forall(_ < 100000L)) // clones dropped, fresh kept
    assert(kept2.nonEmpty)

    // index grew append-only across the restart
    assert(graft.operators.Dedup.readIndex(spark, indexDir).count()
      === (kept1.size + kept2.size).toLong)
  }

  test("streaming vector ingest grows every persisted index, restart-safe") {
    val root = Files.createTempDirectory("graft_stream_vec").toString
    val e = Tables.embeddings(spark, sf)
    val half1 = e.filter($"vec_id" % 2 === 0)
    val half2 = e.filter($"vec_id" % 2 === 1)
    // bootstrap indexes from batch 1 (what `ann-index` does)
    graft.operators.IvfIndex.writeIndex(half1, "vec_id", "embedding",
      s"$root/idx/ivf", nlist = 8, seed = 42L)
    graft.operators.PqIndex.writeIndex(half1, "vec_id", "embedding",
      s"$root/idx/pq", m = 8, k = 16, seed = 42L)
    // batch 2 arrives as a file; the stream appends it everywhere
    writeOneFile(half2, s"$root/src/b2.parquet")
    graft.streaming.VecIngest.runToCompletion(spark, s"$root/src",
      s"$root/idx", s"$root/ckpt")
    val (cents, buckets) =
      graft.operators.IvfIndex.readIndex(spark, s"$root/idx/ivf")
    val (_, codes) =
      graft.operators.PqIndex.readIndex(spark, s"$root/idx/pq")
    assert(buckets.count() === e.count())
    assert(codes.count() === e.count())
    // an ingested vector is served from the grown IVF index
    val probe = e.filter($"vec_id" === 7)
      .select(lit(-1L).as("query_id"), $"embedding".as("qv"))
    assert(graft.operators.IvfIndex.topKAgainstIndex(probe, cents,
      buckets, "query_id", "qv", k = 1, nprobe = 2)
      .select($"cand_id").head().getLong(0) === 7L)
    // restart with no new files: checkpoint skips b2, nothing re-appends
    graft.streaming.VecIngest.runToCompletion(spark, s"$root/src",
      s"$root/idx", s"$root/ckpt")
    assert(graft.operators.IvfIndex.readIndex(spark, s"$root/idx/ivf")
      ._2.count() === e.count())
  }

  /** Simulate the crash-before-commit window: remove batch 0's commit
    * marker (and its local-FS checksum shadow — a stale .crc would make
    * the restarted query's commit rename look like a concurrent writer)
    * while leaving the offsets log intact. */
  private def deleteCommitMarker(commitsDir: String): Unit = {
    val c = new java.io.File(s"$commitsDir/0")
    assert(c.exists, "expected commit marker for batch 0")
    assert(c.delete())
    val crc = new java.io.File(s"$commitsDir/.0.crc")
    if (crc.exists) crc.delete()
  }

  test("doc-ingest replay (crash before checkpoint commit) is a no-op") {
    // Streaming's at-least-once window: the foreachBatch body ran (index
    // appended, batch outputs written) but the query died BEFORE the
    // checkpoint commit landed. On restart the SAME batch is redelivered
    // with the same batch id. Simulated faithfully: drain, then delete
    // the commit marker while keeping the offsets file — exactly the
    // on-disk state the crash leaves.
    val root = Files.createTempDirectory("graft_replay_doc").toString
    val srcDir = s"$root/src"
    val indexDir = s"$root/idx"
    val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    writeOneFile(docs.filter($"doc_id" < 60), s"$srcDir/b1.parquet")
    DocIngest.runToCompletion(spark, srcDir, indexDir, outDir, ckpt)
    val keptBefore = spark.read.parquet(s"$outDir/batch_0/kept")
      .select($"doc_id").as[Long].collect().toSet
    val idxBefore = graft.operators.Dedup.readIndex(spark, indexDir)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(keptBefore.nonEmpty && idxBefore.nonEmpty)
    // a fresh probe batch the index should flag — the q44-family face
    def crossProbe(): Set[(Long, Long)] = {
      val probe = docs.filter($"doc_id" < 10)
        .select(($"doc_id" + 500000L).as("doc_id"), $"text")
      graft.operators.Dedup.minhashNearDupsAgainstIndex(
        graft.operators.Dedup.readIndex(spark, indexDir), probe,
        "doc_id", "text")
        .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    }
    val probeBefore = crossProbe()
    assert(probeBefore.nonEmpty, "probe clones should match the index")

    // crash window: commit marker gone, offsets intact
    deleteCommitMarker(s"$ckpt/commits")
    DocIngest.runToCompletion(spark, srcDir, indexDir, outDir, ckpt)

    // index cardinality and content unchanged — no duplicated signatures
    assert(graft.operators.Dedup.readIndex(spark, indexDir)
      .select($"id").as[Long].collect().sorted.toSeq === idxBefore)
    // batch outputs re-written identically: the replayed docs match
    // only THEMSELVES in the index (filtered), so kept is stable
    assert(spark.read.parquet(s"$outDir/batch_0/kept")
      .select($"doc_id").as[Long].collect().toSet === keptBefore)
    // and index-serving results (the q44 family) are unchanged
    assert(crossProbe() === probeBefore)
  }

  test("vector-index replay appends nothing and serves identical top-k") {
    val root = Files.createTempDirectory("graft_replay_vec").toString
    val e = Tables.embeddings(spark, sf)
    val half1 = e.filter($"vec_id" % 2 === 0)
    val half2 = e.filter($"vec_id" % 2 === 1)
    graft.operators.IvfIndex.writeIndex(half1, "vec_id", "embedding",
      s"$root/idx/ivf", nlist = 8, seed = 42L)
    graft.operators.PqIndex.writeIndex(half1, "vec_id", "embedding",
      s"$root/idx/pq", m = 8, k = 16, seed = 42L)
    writeOneFile(half2, s"$root/src/b1.parquet")
    graft.streaming.VecIngest.runToCompletion(spark, s"$root/src",
      s"$root/idx", s"$root/ckpt")
    def served(): Seq[(Long, Long)] = {
      val (cents, buckets) =
        graft.operators.IvfIndex.readIndex(spark, s"$root/idx/ivf")
      val probes = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.IvfIndex.topKAgainstIndex(probes, cents, buckets,
        "query_id", "qv", k = 3, nprobe = 3)
        .select($"query_id", $"cand_id")
        .as[(Long, Long)].collect().sorted.toSeq
    }
    val topkBefore = served()
    // crash window: redeliver batch 0 to BOTH index appends
    deleteCommitMarker(s"$root/ckpt/commits")
    graft.streaming.VecIngest.runToCompletion(spark, s"$root/src",
      s"$root/idx", s"$root/ckpt")
    assert(graft.operators.IvfIndex.readIndex(spark, s"$root/idx/ivf")
      ._2.count() === e.count())
    assert(graft.operators.PqIndex.readIndex(spark, s"$root/idx/pq")
      ._2.count() === e.count())
    assert(served() === topkBefore)
    // belt-and-braces: a THIRD direct re-append (no stream) is also inert
    graft.operators.IvfIndex.appendVectors(spark, s"$root/idx/ivf",
      half2, "vec_id", "embedding")
    graft.operators.PqIndex.appendVectors(spark, s"$root/idx/pq",
      half2, "vec_id", "embedding")
    assert(graft.operators.IvfIndex.readIndex(spark, s"$root/idx/ivf")
      ._2.count() === e.count())
    assert(graft.operators.PqIndex.readIndex(spark, s"$root/idx/pq")
      ._2.count() === e.count())
  }

  test("stateless shaping ops run unchanged on a stream") {
    // Chunker.chunk is a projection + explode — no state, no watermark:
    // the SAME operator code drives batch jobs and streams, and the
    // streaming replay must equal the batch result exactly.
    val root = Files.createTempDirectory("graft_stream_chunk").toString
    val batch = docs.filter($"doc_id" < 30)
    writeOneFile(batch, s"$root/src/d.parquet")
    val schema = spark.read.parquet(s"$root/src").schema
    val streamed = graft.operators.Chunker.chunk(
      spark.readStream.schema(schema).parquet(s"$root/src").toDF(),
      "doc_id", "text", chunkSize = 32, stride = 24)
    val q = streamed.writeStream.format("memory")
      .queryName("spec_stream_chunks").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("spec_stream_chunks")
    val want = graft.operators.Chunker.chunk(batch, "doc_id", "text",
      chunkSize = 32, stride = 24)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }
}
