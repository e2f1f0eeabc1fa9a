package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{NnDescent, Similarity}

/** BUILD-KNOB frontier (VERDICT r15 #5): the r15 quality sweep proved
  * serve is free (the hot engine holds 0.09–0.10 s at any beam) and
  * located the residual recall gap in the BUILD — knnGraph at the
  * gated geometry (k=8, cap=16, rounds=3) reaches ≈0.91 edge recall
  * on clustered data, and no serve-side knob can return a neighbor
  * the graph never linked. This probe sweeps the build geometry
  * (rounds 3→5, cap 16→32, k 8→16) × serve beam (4, 16) on both
  * standard datasets and reports, per geometry: build wall seconds,
  * EDGE recall@8 (the graph's own quality — exact top-8 membership in
  * the stored lists), and hot-engine SERVE recall@8 + median seconds
  * at 500 rank-spaced stored probes. The committed table (BASELINE.md
  * r16) is the tuning guide, and the upgrade-the-gated-geometry
  * decision cites it: a geometry "dominates" per the verdict's bar if
  * it buys ≥ +0.05 serve recall for ≤ 2× build.
  *
  * Protocol notes:
  *  - edge recall@8's denominator is the exact top-8 edge set of the
  *    WHOLE corpus (the NnDescentSpec recallAt8 rule), computed once
  *    per dataset;
  *  - serve probes are the qualitySweep's 500 rank-spaced stored
  *    vectors, the exact-L2 baseline computed once per dataset —
  *    every geometry is graded against the same truth;
  *  - builds run once per geometry (build time is a one-off artifact
  *    cost; the bench discipline of medians is for the serving path,
  *    measured here with `SPARK_GRAFT_SWEEP_REPEATS` repeats).
  */
object AnnBuildKnobProbe {

  private val ServeK = 8
  private val Hops = 8

  import AnnProbeUtil.{clustered, recallOf, timed}

  private final case class Row(dataset: String, k: Int, cap: Int,
      rounds: Int, buildS: Double, edgeRecall: Double,
      beam: Int, serveS: Double, serveRecall: Double)

  /** Exact top-8 neighbor edges (u, cand_id) for EVERY node — the
    * edge-recall denominator. */
  private def exactEdges(vecs: DataFrame): DataFrame =
    AnnProbeUtil.exactL2(vecs,
      vecs.select(col("id").as("query_id"), col("v").as("qv")),
      ServeK)
      .select(col("query_id").as("u"), col("cand_id"))

  private def runDataset(spark: SparkSession, name: String,
      vecs0: DataFrame, repeats: Int): Seq[Row] = {
    val vecs = vecs0.select(col("id"), col("v"))
      .repartition(8).persist()
    vecs.count()
    val exEdges = exactEdges(vecs).persist()
    val nExact = exEdges.count()
    val allIds = vecs.select(col("id")).orderBy(col("id"))
      .collect().map(_.getLong(0))
    val step = math.max(1, allIds.length / 500)
    val ids = (0 until 500).map(i => allIds((i * step) % allIds.length))
      .distinct
    val probes = vecs.filter(col("id").isin(ids: _*))
      .select(col("id").as("query_id"), col("v").as("qv")).persist()
    val nProbes = probes.count()
    val exProbes = AnnProbeUtil.exactL2(vecs, probes, ServeK).persist()
    exProbes.count()
    // the entry frame depends only on the corpus, not the build
    // geometry — one rank pass shared by every geometry in the loop
    val entries = NnDescent.entryCandidates(vecs, entryCand = 32)
      .persist()
    entries.count()
    val out = Seq.newBuilder[Row]
    val geos = Seq((8, 16, 3), (8, 16, 5), (8, 32, 3), (8, 32, 5),
      (16, 32, 3), (16, 32, 5))
    for ((k, cap, rounds) <- geos) {
      val (graph, buildS) =
        timed(NnDescent.knnGraph(vecs, k, cap, rounds))
      // edge recall@8: exact top-8 membership among the stored k
      // edges (k > 8 graphs hold more candidates — that is the point
      // of the knob)
      val edgeHits = exEdges.join(
        graph.select(col("u"), col("nb").as("cand_id")),
        Seq("u", "cand_id"), "left_semi").count()
      val edgeRecall = edgeHits.toDouble / nExact
      val hot = NnDescent.hotArtifacts(
        graph.select(col("u"), col("nb")), vecs, entries)
      for (beam <- Seq(4, 16)) {
        val times = (1 to repeats).map(_ =>
          timed(NnDescent.beamTopKHot(hot, probes, Hops, beam, ServeK)
            .count())._2)
        val med = times.sorted.apply(times.size / 2)
        val res = NnDescent.beamTopKHot(hot, probes, Hops, beam,
            ServeK)
          .withColumnRenamed("node_id", "cand_id").persist()
        val rec = recallOf(exProbes, res)
        res.unpersist()
        out += Row(name, k, cap, rounds, buildS, edgeRecall, beam,
          med, rec)
      }
      hot.destroy()
      graph.unpersist()
      System.err.println(
        s"[buildknob] $name k=$k cap=$cap rounds=$rounds done " +
          f"(build $buildS%.1f s)")
    }
    Seq(vecs, exEdges, probes, exProbes, entries)
      .foreach(_.unpersist())
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val repeats = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_SWEEP_REPEATS", "3").toInt)
    val spark = Main.session()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
    val rows = runDataset(spark, "clustered", clustered(spark),
      repeats) ++ runDataset(spark, "corpus", corpus, repeats)
    System.err.println(
      "| dataset | k | cap | rounds | build_s | edge_recall@8 " +
        "| beam | serve_s (500 probes) | serve_recall@8 |")
    System.err.println("|---|---|---|---|---|---|---|---|---|")
    rows.foreach { r =>
      System.err.println(
        f"| ${r.dataset} | ${r.k} | ${r.cap} | ${r.rounds} " +
          f"| ${r.buildS}%.1f | ${r.edgeRecall}%.3f | ${r.beam} " +
          f"| ${r.serveS}%.3f | ${r.serveRecall}%.3f |")
    }
    val json = rows.map { r =>
      f""""${r.dataset}:k${r.k}c${r.cap}r${r.rounds}b${r.beam}":""" +
        f"""{"build_s":${r.buildS}%.1f,""" +
        f""""edge_recall":${r.edgeRecall}%.3f,""" +
        f""""serve_s":${r.serveS}%.3f,""" +
        f""""serve_recall":${r.serveRecall}%.3f}"""
    }.mkString(
      s"""{"metric":"ann_build_knob","serve_k":$ServeK,""" +
        s""""hops":$Hops,"probes":500,""", ",", "}")
    println(json)
    spark.stop()
  }
}
