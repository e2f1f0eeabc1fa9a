package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, NnDescent, Similarity}

/** Append-path RECALL-DRIFT exhibit (VERDICT r14 #3): both index
  * ingest faces are honest about what append defers — the graph
  * (q240) postpones batch-internal new-new edges to the next full
  * refresh, IVF-grow (q208) never retrains its centroids — but
  * nothing measured how SERVE RECALL degrades as deferred debt
  * accumulates over repeated appends. This probe plants k = 5 append
  * batches of 5% of the corpus each (base = the other 75%), serves
  * the same probe set after every batch through BOTH the
  * append-maintained index and a from-scratch rebuild at the same
  * corpus, and reports recall@8 side by side — the drift is the gap
  * between the two columns, measured, not argued.
  *
  * Protocol details that keep the comparison honest:
  *  - batches are RANK-INTERLEAVED (rank mod 20: 0–14 base, 15+b =
  *    batch b), so every append batch draws from the whole data
  *    distribution — a contiguous split would let batch 5 carry an
  *    entire region the base index never saw and conflate coverage
  *    with drift;
  *  - probes are 50 rank-spaced BASE vectors, present in the index at
  *    every stage, and the exact top-8 baseline is recomputed over
  *    the CURRENT corpus per stage (append and rebuild grade against
  *    the same truth);
  *  - the append path keeps the BASE entry candidates (the graph
  *    face's stated behavior — appends refresh adjacency, not the
  *    entry frame); the rebuild line gets fresh entries, so the gap
  *    also prices the stale-entry effect;
  *  - both datasets of the frontier exhibit run (10-cluster Gaussian
  *    where recall is meaningful, and the near-uniform embeddings
  *    corpus where every neighbor-of-neighbor method honestly
  *    stalls), geometries are the gated queries' own (q231/q232
  *    k=8/cap=16/rounds=3, q240 beam=4/hops=4 ingest, q66 nlist=16
  *    IVF at nprobe=2).
  *
  * Emits one JSON line on stdout plus a markdown table on stderr; the
  * committed table lives in BASELINE.md (round 15) with the refresh
  * thresholds it justifies, which the two ingest faces' scaladocs
  * reference.
  */
object AnnDriftProbe {

  private val K = 8
  private val NProbes = 50
  private val Batches = 5

  import AnnProbeUtil.{clustered, recallOf}
  private def exactL2(vecs: DataFrame, probes: DataFrame): DataFrame =
    AnnProbeUtil.exactL2(vecs, probes, K)

  /** `recallAppendRefresh` (r16, VERDICT r15 #2): the append line
    * re-served with [[NnDescent.refreshEntries]] over the GROWN
    * corpus — same appended graph, fresh entry frame — so the column
    * isolates how much of the append-vs-rebuild gap is STALE ENTRIES
    * (the one rank pass the refresh operator buys) vs the graph
    * itself. NaN for the IVF family (no entry frame). */
  private final case class Row(dataset: String, family: String,
      batches: Int, n: Long, recallAppend: Double,
      recallAppendRefresh: Double, recallRebuild: Double)

  private def runDataset(spark: SparkSession, name: String,
      vecs0: DataFrame): Seq[Row] = {
    import spark.implicits._
    val vecs = vecs0.select(col("id"), col("v")).persist()
    vecs.count()
    // rank-interleaved split: rank mod 20 in [0,15) = base,
    // 15 + b = append batch b
    val ranked = vecs.select(col("id")).orderBy(col("id"))
      .collect().map(_.getLong(0)).zipWithIndex
    val baseIds = ranked.filter(_._2 % 20 < 15).map(_._1)
    val batchIds = (0 until Batches).map(b =>
      ranked.filter(_._2 % 20 == 15 + b).map(_._1))
    val base = vecs.filter(col("id").isin(baseIds: _*)).persist()
    val nBase = base.count()
    // probes: 50 rank-spaced base vectors, constant across stages
    val step = math.max(1, baseIds.length / NProbes)
    val probeIds = (0 until NProbes)
      .map(i => baseIds((i * step) % baseIds.length)).distinct
    val probes = base.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
      .persist()
    probes.count()

    val out = Seq.newBuilder[Row]

    // ---- graph family (q240 ingest protocol) ----
    // every long-lived frame in the batch loop is localCheckpoint'd
    // (materialized AND lineage-truncated): persist alone leaves the
    // logical plan growing per batch — knnGraph's unrolled rounds
    // plus five keyed merges re-analyzed inside every appendToGraph
    // hop OOM'd the driver at 16g before this (the q240
    // multi-referenced-subtree lesson, bitten again)
    val e0 = NnDescent.entryCandidates(base, entryCand = 32).persist()
    e0.count()
    def freshGraph(corpus: DataFrame): DataFrame = {
      val built = NnDescent.knnGraph(corpus, k = 16, cap = 32,
        rounds = 3)
      val flat = built.localCheckpoint()
      built.unpersist()
      flat
    }
    var g = freshGraph(base)
    // the growing corpus is re-derived from the one persisted vecs
    // table by id set — a filter, not a union chain
    var curIds = baseIds
    def corpusOf(ids: Array[Long]): DataFrame =
      vecs.filter(col("id").isin(ids: _*))
    var cur = corpusOf(curIds)
    def graphRecall(graph: DataFrame, corpus: DataFrame,
        entries: DataFrame): Double = {
      val hot = NnDescent.hotArtifacts(
        graph.select(col("u"), col("nb")), corpus, entries)
      val got = NnDescent.beamTopKHot(hot, probes, hops = 8,
          beam = 4, k = K)
        .select(col("query_id"), col("node_id").as("cand_id"))
      val ex = exactL2(corpus, probes).persist()
      val r = recallOf(ex, got)
      ex.unpersist()
      hot.destroy()
      r
    }
    // batch 0: append == refresh == rebuild by construction —
    // compute once
    val r0 = graphRecall(g, cur, e0)
    out += Row(name, "nnd", 0, nBase, r0, r0, r0)
    for (b <- 0 until Batches) {
      val newVecs = vecs.filter(col("id").isin(batchIds(b): _*))
        .select(col("id").as("nid"), col("v").as("qv"))
      val appended = NnDescent.appendToGraph(
        g.select(col("u"), col("nb"), col("d2")), cur, newVecs,
        k = 16, beam = 4, hops = 4, entries = e0)
      g = NnDescent.applyAppend(g, appended).localCheckpoint()
      appended.unpersist() // caller-owned
      curIds = curIds ++ batchIds(b)
      cur = corpusOf(curIds)
      // append+refresh line (VERDICT r15 #2): same appended graph,
      // entry frame re-derived from the grown corpus — the operator
      // the "schedule by entry-frame staleness" guidance schedules
      val eF = NnDescent.refreshEntries(cur, entryCand = 32).persist()
      eF.count()
      // rebuild line: fresh graph + fresh entries at the same corpus.
      // knnGraph's persisted output is used ONCE here and explicitly
      // released after its recall read (ADVICE r15: the
      // localCheckpoint'd rebuild graphs accumulated cached blocks
      // across the 2×5 loop; only the APPEND line's graph is
      // iterated and needs lineage truncation)
      val gR = NnDescent.knnGraph(cur, k = 16, cap = 32, rounds = 3)
      val eR = NnDescent.entryCandidates(cur, entryCand = 32)
        .persist()
      eR.count()
      out += Row(name, "nnd", b + 1, cur.count(),
        graphRecall(g, cur, e0), graphRecall(g, cur, eF),
        graphRecall(gR, cur, eR))
      gR.unpersist()
      eF.unpersist()
      eR.unpersist()
      System.err.println(s"[drift] $name nnd batch ${b + 1} done")
    }
    e0.unpersist()

    // ---- IVF family (q208 grow protocol: nlist=16, cosine, np=2) --
    val growDir = Scratch.dir(s"drift_ivf_grow_$name")
    IvfIndex.writeIndex(base, "id", "v", growDir, nlist = 16,
      seed = 42L)
    def ivfRecall(dir: String, corpus: DataFrame): Double = {
      val (cents, buckets) = IvfIndex.readIndex(spark, dir)
      val got = IvfIndex.topKAgainstIndex(probes, cents, buckets,
        "query_id", "qv", K, nprobe = 2)
      val ex = Similarity.bruteForceTopK(probes,
          corpus.select(col("id").as("cand_id"), col("v").as("cv")),
          "query_id", "qv", "cand_id", "cv", K)
        .select(col("query_id"), col("cand_id")).persist()
      val r = recallOf(ex, got)
      ex.unpersist()
      r
    }
    var ivfIds = baseIds
    var curIvf = corpusOf(ivfIds)
    val ivfR0 = ivfRecall(growDir, curIvf)
    out += Row(name, "ivf_grow", 0, nBase, ivfR0, Double.NaN, ivfR0)
    for (b <- 0 until Batches) {
      val newVecs = vecs.filter(col("id").isin(batchIds(b): _*))
      IvfIndex.appendVectors(spark, growDir, newVecs, "id", "v")
      ivfIds = ivfIds ++ batchIds(b)
      curIvf = corpusOf(ivfIds)
      val rebuildDir = Scratch.dir(s"drift_ivf_rb_${name}_$b")
      IvfIndex.writeIndex(curIvf, "id", "v", rebuildDir, nlist = 16,
        seed = 42L)
      out += Row(name, "ivf_grow", b + 1, curIvf.count(),
        ivfRecall(growDir, curIvf), Double.NaN,
        ivfRecall(rebuildDir, curIvf))
      // the per-batch rebuild scratch is read once for its recall —
      // release the disk now instead of letting 2×5 stale indexes
      // accumulate until the JVM-exit sweep (ADVICE r15)
      Scratch.drop(rebuildDir)
      System.err.println(s"[drift] $name ivf batch ${b + 1} done")
    }

    Seq(vecs, base, probes).foreach(_.unpersist())
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Main.session()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
    val rows = runDataset(spark, "clustered", clustered(spark)) ++
      runDataset(spark, "corpus", corpus)
    System.err.println(
      "| dataset | family | batches appended | corpus n " +
        "| recall@8 append | recall@8 append+refreshEntries " +
        "| recall@8 rebuild |")
    System.err.println("|---|---|---|---|---|---|---|")
    def fmt(d: Double): String =
      if (d.isNaN) "—" else f"$d%.3f"
    rows.foreach { r =>
      System.err.println(
        f"| ${r.dataset} | ${r.family} | ${r.batches} | ${r.n} " +
          f"| ${fmt(r.recallAppend)} | ${fmt(r.recallAppendRefresh)} " +
          f"| ${fmt(r.recallRebuild)} |")
    }
    val json = rows.map { r =>
      f""""${r.dataset}:${r.family}:${r.batches}":""" +
        f"""{"n":${r.n},"recall_append":${r.recallAppend}%.3f,""" +
        (if (r.recallAppendRefresh.isNaN) ""
        else
          f""""recall_append_refresh":${r.recallAppendRefresh}%.3f,""") +
        f""""recall_rebuild":${r.recallRebuild}%.3f}"""
    }.mkString(
      s"""{"metric":"ann_append_drift","k":$K,"probes":$NProbes,""" +
        s""""batch_pct":5,""", ",", "}")
    println(json)
    spark.stop()
  }
}
