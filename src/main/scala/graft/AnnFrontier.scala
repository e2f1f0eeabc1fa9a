package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, NnDescent, PqIndex, ScalarQuant,
  Similarity}

/** ANN recall/latency FRONTIER exhibit (VERDICT r12 #5): one table
  * tying the six index families together — recall@8 vs serve seconds
  * for flat / sign-LSH / IVF / PQ / IVF-PQ / SQ8 / NN-descent+beam,
  * measured on BOTH corpora the family's honest-recall story needs:
  *
  *  - `clustered`: 10 tight Gaussian clusters (the structure every
  *    pruning method exploits — where ANN is supposed to work);
  *  - `corpus`: the synthetic embeddings table — near-uniform 64-dim,
  *    whose exact top-8 is essentially unlearnable structure (the
  *    NN-descent 0.06-recall regime, BASELINE.md round 12). A method
  *    that looks fine here and bad there is broken; one that looks
  *    good there and bad here is honest pruning meeting structureless
  *    data.
  *
  * Protocol (the bench capture discipline): per method, BUILD once
  * (timed), then serve the same 50 stored-vector probes
  * `SPARK_GRAFT_FRONTIER_REPEATS` (default 3) times and report the
  * MEDIAN; recall@8 is measured against the exact baseline under the
  * method's OWN metric (cosine methods vs the exact-cosine top-8, L2
  * methods vs exact-L2) so no method is graded against a ranking it
  * never claimed to approximate. Geometries are the gated queries'
  * own (q179 bits=8, q66 nlist=16, q93 m=4/k=4, q94 nlist=4/nprobe=2,
  * q194 SQ8, q231/q232 k=8/cap=16/rounds=3/beam=4), so the frontier
  * describes the SHIPPED configurations, not tuned-for-the-exhibit
  * ones.
  *
  * Emits one JSON line per (dataset, method) on stdout plus a
  * markdown table on stderr; the committed table lives in BASELINE.md
  * next to the honest recall numbers it contextualizes.
  */
object AnnFrontier {

  private val K = 8
  private val NProbes = 50

  // shared recall-protocol kernel (AnnProbeUtil, r15): one definition
  // of the exact baseline, denominator rule, fixture, and timer
  // across the three ANN exhibits
  import AnnProbeUtil.{clustered, recallOf, timed}
  private def exactL2(vecs: DataFrame, probes: DataFrame): DataFrame =
    AnnProbeUtil.exactL2(vecs, probes, K)

  /** One frontier row: build once, serve `repeats` times (median),
    * recall against the metric-matched exact baseline. */
  private[graft] final case class Row(dataset: String, method: String,
      buildS: Double, serveS: Double, recall: Double)

  // serve() must return (query_id, cand_id) rows for the 50 probes
  private def measure(dataset: String, method: String, buildS: Double,
      exact: DataFrame, repeats: Int)(serve: () => DataFrame): Row = {
    val times = (1 to repeats).map(_ => timed(serve().count())._2)
    val r = recallOf(exact, serve())
    Row(dataset, method, buildS, times.sorted.apply(times.size / 2), r)
  }

  private[graft] def runDataset(spark: SparkSession, name: String,
      vecs0: DataFrame, repeats: Int): Seq[Row] = {
    import spark.implicits._
    val vecs = vecs0.select(col("id"), col("v")).persist()
    val n = vecs.count()
    // 50 evenly spaced stored vectors BY RANK in id order (ADVICE
    // r13: rank positions are not id values — a table with id gaps
    // would silently select fewer probes). The rank pass is the
    // projRanked pattern: range-partition + sort-within-partitions +
    // zipWithIndex, no single-partition window.
    val step = math.max(1L, n / NProbes)
    val targetRanks = (0 until NProbes).map(_ * step)
      .filter(_ < n).toSet
    val probeIds = vecs.select(col("id"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
      .rdd.map(_.getLong(0)).zipWithIndex
      .filter { case (_, rn) => targetRanks.contains(rn) }
      .map(_._1).collect().toSeq.sorted
    val probes = vecs.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
      .persist()
    probes.count()
    val cands = vecs.select(col("id").as("cand_id"),
      col("v").as("cv")).persist()
    cands.count()
    val qSeq = probes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toSeq.sortBy(_._1)

    val exL2 = exactL2(vecs, probes).persist(); exL2.count()
    val exCos = Similarity.bruteForceTopK(probes, cands, "query_id",
        "qv", "cand_id", "cv", K)
      .select(col("query_id"), col("cand_id")).persist()
    exCos.count()

    val out = Seq.newBuilder[Row]

    // flat scans — recall 1.0 by construction; the rows exist to give
    // the frontier its latency origin (and its 100 TB moral: this is
    // the full-corpus cost every other row prunes)
    out += measure(name, "flat_l2", 0.0, exL2, repeats)(() =>
      exactL2(vecs, probes))
    out += measure(name, "flat_cos", 0.0, exCos, repeats)(() =>
      Similarity.bruteForceTopK(probes, cands, "query_id", "qv",
        "cand_id", "cv", K))

    // sign-LSH (q179 geometry: bits=8, seed=42) — cosine family
    out += measure(name, "sign_lsh_b8", 0.0, exCos, repeats)(() =>
      Similarity.annTopK(probes, cands, "query_id", "qv", "cand_id",
        "cv", K, bits = 8, seed = 42L))

    // IVF against a PERSISTED index (q66 geometry: nlist=16, cosine),
    // nprobe sweeping the knob that draws the frontier
    val ivfDir = Scratch.dir(s"frontier_ivf_$name")
    val (_, ivfBuild) = timed(IvfIndex.writeIndex(
      vecs.select(col("id"), col("v")), "id", "v", ivfDir,
      nlist = 16, seed = 42L))
    val (cents, buckets0) = IvfIndex.readIndex(spark, ivfDir)
    val buckets = buckets0.persist(); buckets.count()
    for (np <- Seq(1, 2, 4))
      out += measure(name, s"ivf16_np$np", ivfBuild, exCos, repeats)(
        () => IvfIndex.topKAgainstIndex(probes, cents, buckets,
          "query_id", "qv", K, nprobe = np))

    // PQ/ADC (q93 geometry: m=4, k=4) — L2 family
    val (cb, pqTrainS) = timed(PqIndex.train(
      vecs.select(col("id"), col("v")), "id", "v", m = 4, k = 4,
      seed = 42L))
    val (encoded, pqEncS) = timed {
      val e = PqIndex.encode(vecs.select(col("id"), col("v")), "id",
        "v", cb).persist()
      e.count(); e
    }
    out += measure(name, "pq_m4", pqTrainS + pqEncS, exL2, repeats)(
      () => PqIndex.adcTopK(spark, qSeq, encoded, cb, K))

    // PQ at a PRODUCTION geometry (m=8, k=256 — the standard
    // memory-tier trade, VERDICT r13 #5): the m=4/k=4 row above is
    // the shipped q93 geometry and its 0.05 recall brands the toy
    // CONFIGURATION, not the method — this row ranks PQ the way a
    // deployment would size it (8 sub-quantizers, byte-sized
    // codebooks)
    val (cb8, pq8TrainS) = timed(PqIndex.train(
      vecs.select(col("id"), col("v")), "id", "v", m = 8, k = 256,
      seed = 42L))
    val (encoded8, pq8EncS) = timed {
      val e = PqIndex.encode(vecs.select(col("id"), col("v")), "id",
        "v", cb8).persist()
      e.count(); e
    }
    out += measure(name, "pq_m8k256", pq8TrainS + pq8EncS, exL2,
      repeats)(() => PqIndex.adcTopK(spark, qSeq, encoded8, cb8, K))

    // IVF-PQ (q94 geometry: nlist=4, nprobe=2, m=4) — coarse L2 prune
    // then ADC, from PREBUILT artifacts
    val (ivfpqArts, ivfpqBuild) = timed {
      val c2 = IvfIndex.trainCentroids(vecs.select(col("id"),
        col("v")), "id", "v", nlist = 4, seed = 42L)
      val idx = PqIndex.encode(vecs.select(col("id"), col("v")), "id",
          "v", cb)
        .join(vecs.select(col("id").as("cand_id"),
          IvfIndex.bucketOfL2(col("v"), c2).as("bucket")), "cand_id")
        .persist()
      idx.count()
      (c2, idx)
    }
    val (ivfpqCents, ivfpqIdx) = ivfpqArts
    out += measure(name, "ivfpq_n4_np2", ivfpqBuild, exL2, repeats) {
      () =>
        val qb = probes.select(col("query_id"),
          explode(IvfIndex.probeBucketsL2(col("qv"), ivfpqCents, 2))
            .as("bucket"))
        val pruned = qb.join(ivfpqIdx, "bucket")
          .filter(col("query_id") =!= col("cand_id"))
          .select(col("query_id"), col("cand_id"), col("code"))
        PqIndex.scoreAdc(spark, qSeq, pruned, cb, K)
    }

    // SQ8 (q194): serve = dequantize + exact L2 over the CODES — same
    // candidate count as flat, 4x smaller stored bytes; recall dips
    // only by quantization error
    val ((mns, mxs), sqBoundsS) = timed(ScalarQuant.bounds(
      vecs.select(col("id"), col("v")), "id", "v"))
    val mnL = typedLit(mns)
    val mxL = typedLit(mxs)
    val dim = mns.length
    val codeExpr = transform(sequence(lit(1), lit(dim)), i => {
      val x = element_at(col("v"), i)
      val mn = element_at(mnL, i)
      val mx = element_at(mxL, i)
      when(mx - mn > 0,
        round((x - mn) / (mx - mn) * 255.0).cast("long"))
        .otherwise(lit(0L))
    })
    val (codes, sqEncS) = timed {
      val c = vecs.select(col("id"), codeExpr.as("codes")).persist()
      c.count(); c
    }
    val decodeExpr = zip_with(col("codes"),
      sequence(lit(1), lit(dim)), (c, i) => {
        val mn = element_at(mnL, i)
        val mx = element_at(mxL, i)
        mn + c.cast("double") / 255.0 * (mx - mn)
      })
    out += measure(name, "sq8", sqBoundsS + sqEncS, exL2, repeats) {
      () =>
        codes.select(col("id"), decodeExpr.as("dv"))
          .crossJoin(broadcast(probes))
          .filter(col("id") =!= col("query_id"))
          .select(col("query_id"), col("id").as("cand_id"),
            graft.expressions.ArrayL2Sq(col("qv"), col("dv"))
              .as("d2"))
          .withColumn("rk", row_number().over(Window
            .partitionBy(col("query_id"))
            .orderBy(col("d2"), col("cand_id"))))
          .filter(col("rk") <= K)
    }

    // NN-descent graph + beam serving (q231/q232 geometry since r16:
    // k=16, cap=32, rounds=3; entries persisted with the graph),
    // beam sweeping the serve-side knob
    val (nnArts, nnBuild) = timed {
      val g = NnDescent.knnGraph(vecs, k = 16, cap = 32, rounds = 3)
        .select(col("u"), col("nb")).persist()
      g.count()
      val e = NnDescent.entryCandidates(vecs, entryCand = 32)
        .persist()
      e.count()
      (g, e)
    }
    val (nnGraph, nnEntries) = nnArts
    for (beam <- Seq(4, 8))
      out += measure(name, s"nnd_beam$beam", nnBuild, exL2, repeats)(
        () => NnDescent.beamTopK(nnGraph, vecs, probes, hops = 8,
          beam = beam, k = K, entries = nnEntries)
          .select(col("query_id"), col("node_id").as("cand_id")))
    // the r15 hot engine (RAM-replica, one job per batch) next to the
    // driver-walk rows it supersedes for serving — build cost is the
    // graph build plus the one-time broadcast
    val (nnHot, hotBuild) = timed(
      NnDescent.hotArtifacts(nnGraph, vecs, nnEntries))
    for (beam <- Seq(4, 8, 16))
      out += measure(name, s"nnd_hot_beam$beam", nnBuild + hotBuild,
        exL2, repeats)(() =>
        NnDescent.beamTopKHot(nnHot, probes, hops = 8, beam = beam,
          k = K)
          .select(col("query_id"), col("node_id").as("cand_id")))
    nnHot.destroy()

    Seq(vecs, probes, cands, exL2, exCos, buckets, encoded, encoded8,
      ivfpqIdx, codes, nnGraph, nnEntries).foreach(_.unpersist())
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val repeats = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_FRONTIER_REPEATS", "3").toInt)
    val spark = Main.session()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
    val rows =
      runDataset(spark, "clustered", clustered(spark), repeats) ++
        runDataset(spark, "corpus", corpus, repeats)
    // the serve column names its batch size (VERDICT r14 #7): these
    // are whole-batch seconds for NProbes probes, not per-probe cost —
    // the serve sweep (AnnServeSweep) is the per-probe exhibit
    System.err.println(
      s"| dataset | method | build_s | serve_s (${NProbes}-probe " +
        "batch) | recall@8 |")
    System.err.println("|---|---|---|---|---|")
    rows.foreach { r =>
      System.err.println(
        f"| ${r.dataset} | ${r.method} | ${r.buildS}%.2f " +
          f"| ${r.serveS}%.3f | ${r.recall}%.3f |")
    }
    val json = rows.map { r =>
      f""""${r.dataset}:${r.method}":{"build_s":${r.buildS}%.2f,""" +
        f""""serve_s":${r.serveS}%.3f,"recall_at8":${r.recall}%.3f}"""
    }.mkString("{\"metric\":\"ann_frontier\",\"k\":8,\"probes\":50,",
      ",", "}")
    println(json)
    spark.stop()
  }
}
