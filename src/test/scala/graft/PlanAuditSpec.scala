package graft

/** Global plan-quality gate: NO registry query may silently plan a
  * quadratic join. Every query's physical plan is checked for
  * CartesianProduct / BroadcastNestedLoopJoin; the few deliberate
  * all-pairs kernels are whitelisted with their justification. A new
  * query that accidentally loses its equi-join key fails here, not on
  * the 100 TB run.
  */
class PlanAuditSpec extends GraftSuite {

  /** Queries whose build step executes Spark jobs eagerly (ML fits,
    * streaming replays, iterative loops) — their plan is not a single
    * DataFrame and they are covered by their own specs. */
  private val eager = Set(
    "q31_cluster_ml", "q32_cluster_gmm_ml", "q41_stream_hourly",
    "q81_word2vec", "q85_dedup_components", "q89_stream_interval_join",
    "q47_ann_recall", "q66_ivf_recall", "q80_sample_split",
    "q93_pq_recall") // codebook training collects a bounded sample

  /** Deliberate all-pairs kernels: tiny, explicitly-bounded sides where
    * the quadratic shape IS the semantics (exact-scoring baselines). */
  private val nlAllowed = Set(
    "q25_cosine_pairs",     // 50×50 exact cosine matrix (bounded probe set)
    "q26_knn_brute_force",  // brute-force baseline the ANN path is judged by
    "q43_ngram_jaccard",    // exact Jaccard on a bounded 30-doc slice
    "q83_topk_agg_knn",     // same probe set through the aggregator path
    "q115_pca_ann_recall",  // 5-probe reduced-space scoring + 1-row floor gate
    "q154_exact_l2_topk",   // 5-probe exact-L2 ground truth (q26's L2 twin)
    "q158_kmeans_lloyd",    // n×k assignment vs the k=4-row centroid frame
                            // — |L|×k with tiny fixed k IS Lloyd's assign
                            // step, not a lost join key
    "q181_bisect_oracled",  // the same n×k=2 assign kernel, twice
    "q183_cms_oracled",     // tokens × the 4-row hash-row frame — |T|×d
                            // with constant d, the sketch-build shape
    "q184_semdedup_oracled", // the q158 assign kernel feeding the
                             // within-cluster (equi-join) pair scorer
    "q185_ivf_oracled",     // assign kernel + 5-query probe selection
                            // vs the 4-row centroid frame
    "q208_ivf_grow_oracled", // the same assign kernel, twice: the base
                             // fit and the append-time stored-centroid
                             // assignment (the ann-ingest mechanism)
    "q188_pq_oracled",      // the q158 assign kernel per 16-dim
                            // subspace (4× |L|×k=4) — PQ codebook
                            // training IS repeated Lloyd assignment
    "q195_ivfpq_oracled",   // the same kernels + the coarse 64-dim
                            // assign — the IVF-PQ composite
    "q213_cms_stream_oracled", // the q183 |T|×d sketch-probe shape over
                               // the artifact + a 1-row batch count
    "q217_hist_quantiles_oracled", // |qs|=3 rank probes × ≤40
                                   // cumulative-histogram rows — the
                                   // rank-containment range join IS
                                   // the quantile lookup
    "q219_f2_sketch_oracled", // the q183 |T|×d sketch-build shape +
                              // 1-row est × 1-row exact
    "q222_hist_stream_oracled", // the q217 rank-containment lookup
                                // over the artifact + 1-row batch count
    "q220_join_size_oracled", // two |T|×d sketch builds; the sketches
                              // then join equi on (j, bucket)
    "q197_semantic_decon",  // train × BROADCAST eval side: the eval
                            // set is benchmark-sized by definition, so
                            // |train|×|eval| is linear in the corpus —
                            // the compliance screen's exact-recall shape
    "q200_dataset_similarity", // the |sources|² pair matrix (the `<`
                               // range self-join on the SOURCE list —
                               // tens of rows at any corpus size; the
                               // shingle/signature joins stay equi)
    "q239_dbscan_oracled")     // points × the 9-row grid-offset frame
                               // (|P|×9 map-side) + × the 1-row
                               // min/max scaling bounds — the grid
                               // join IS the ε-neighborhood prune

  /** crossJoin(broadcast(global aggregate)) — a 1-row side, |L|×1 and
    * linear; Spark renders it as BroadcastNestedLoopJoin but it is the
    * scalar-subquery pattern, not a quadratic join. */
  private val scalarBroadcast = Set(
    "q14_entropy",            // ÷ corpus total
    "q38_tfidf_norm",         // × corpus doc count (idf)
    "q62_inter_cluster_dist", // global scaling bounds
    "q86_histogram",          // global min/max bucket bounds
    "q91_heavy_hitters",      // ÷ total rows (share %)
    "q119_unigram_logprob",   // ÷ (N + V) Laplace denominator
    "q128_bigram_logprob",    // same (N + V) backoff denominator
    "q234_trigram_kn_oracled", // ÷ 1-row bigram-type total (KN base)
    "q133_dsir_resample",     // ÷ corpus gram totals (DSIR smoothing)
    "q160_bm25_topk",         // × 1-row (N, avgdl) corpus stats
    "q177_dsir_oracled",      // same DSIR smoothing ÷ 1-row totals
    "q192_hybrid_rrf",        // × the 1-row query-embedding side
    "q224_rerank_oracled",    // same 1-row query vector × k candidates
    "q209_hll_oracled",       // 1-row sketch summary × 1-row exact count
    "q211_hll_stream_oracled", // same 1-row faces + 1-row batch count
    "q212_bloom_stream_oracled", // × the 1-row batch count
    "q214_hll_overlap_oracled") // 1-row estimate × 1-row exact faces

  test("no registry query plans an unintended quadratic join") {
    val offenders = Registry.all
      .filterNot(q => eager.contains(q.name))
      .flatMap { q =>
        val plan = q.run(spark, sf).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin") &&
          !nlAllowed.contains(q.name) && !scalarBroadcast.contains(q.name)
        if (cart || bnl)
          Some(s"${q.name}: ${if (cart) "CartesianProduct " else ""}" +
            s"${if (bnl) "BroadcastNestedLoopJoin" else ""}")
        else None
      }
    assert(offenders.isEmpty,
      s"quadratic joins in:\n${offenders.mkString("\n")}")
  }

  /** Global (empty-partitionSpec) windows whose INPUT is bounded by
    * construction, so the single-partition sort is over a small frame,
    * not the data: whitelisted with the bound. */
  private val globalWindowBounded = Set(
    "q224_rerank_oracled",  // stage-2 re-rank over the stage-1 top-k
                            // candidate frame — k rows by contract
                            // (the k-bound rides a rank filter the
                            // bounded() walk can't see through a join)
    "q217_hist_quantiles_oracled", // cumulative sum over the ≤40-row
                                   // equi-width histogram (bins are
                                   // the GROUP KEYS of a bounded-
                                   // cardinality aggregate)
    "q222_hist_stream_oracled")    // the same ≤40-bin cumulative frame
                                   // read back from the artifact

  test("no registry query sorts an unbounded relation through a " +
      "single-partition window — the NnDescent ring-init class " +
      "(VERDICT r12 #2): a Window with empty partitionSpec funnels " +
      "its whole input through ONE task unless an optimizer limit " +
      "(WindowGroupLimit / Limit) prunes it or the input is bounded") {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
      Window => LWindow, GlobalLimit, LocalLimit, Aggregate,
      WindowGroupLimit, LocalRelation, OneRowRelation}
    // a subtree is "bounded" when every path to a leaf passes a limit,
    // a grand (no-key) aggregate, or a local (literal) relation
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit | _: WindowGroupLimit => true
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case _: LocalRelation => true
      case _: OneRowRelation => true
      case other if other.children.isEmpty => false
      case other => other.children.forall(bounded)
    }
    val offenders = Registry.all
      .filterNot(q => eager.contains(q.name))
      .filterNot(q => globalWindowBounded.contains(q.name))
      .flatMap { q =>
        val plan = q.run(spark, sf).queryExecution.optimizedPlan
        plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
              !bounded(w.child) =>
            s"${q.name}: global window over unbounded child\n" +
              w.simpleString(3)
        }
      }
    assert(offenders.isEmpty,
      s"single-partition sorts in:\n${offenders.mkString("\n")}")
  }

  test("q162's budget take is ONE shuffle (the per-source window)") {
    val p = Registry.byName("q162_token_budget").run(spark, sf)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles in:\n$p")
  }

  test("q44's signature exchange is REUSED, not recomputed") {
    // The round-6 MinHash A/B resolved in favor of the explode+
    // aggregate signature form precisely BECAUSE its exchange is
    // reused by the downstream banded-join branches — a refactor that
    // silently breaks the reuse (e.g. perturbing the signature
    // expression per branch) would multiply the most expensive scan in
    // the dedup family by the consumer count. Pin it.
    val df = Registry.byName("q44_minhash_neardups").run(spark, sf)
    df.collect() // AQE materializes exchange reuse only in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("(reused)"),
      s"q44 plan lost its signature-exchange reuse:\n$plan")
  }

  test("q154's textbook HOF squared-L2 is FUSED to the native kernel") {
    val qe = Registry.byName("q154_exact_l2_topk").run(spark, sf)
      .queryExecution
    val optimized = qe.optimizedPlan.toString
    assert(optimized.contains("arrayl2sq"),
      s"L2Fusion did not fire:\n$optimized")
    assert(!optimized.contains("zip_with"),
      "unfused zip_with survived in the optimized plan")
  }

  test("q148's textbook HOF cosine is FUSED to the native kernel") {
    val qe = Registry.byName("q148_array_hof").run(spark, sf)
      .queryExecution
    val optimized = qe.optimizedPlan.toString
    assert(optimized.contains("arraycosine"),
      s"CosineFusion did not fire:\n$optimized")
    // the naive composition's four HOF evaluations are gone from the
    // cosine column (transform/aggregate remain for the OTHER columns,
    // so assert on zip_with — only the cosine used it)
    assert(!optimized.contains("zip_with"),
      "unfused zip_with survived in the optimized plan")
  }
}
