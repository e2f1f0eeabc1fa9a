package graft.engine

/** Engine configuration — semantic mirror of the reference's config doc
  * (`/root/reference/conf.json:1-44` overlaid on the defaults in
  * `scripts/clustering_vars.py:19-63`), plus knobs the Spark-native design
  * needs (seed injection, per-segment point cap).
  *
  * Unlike the reference (mutable global dict), this is an immutable case
  * class; the Mongo overlay becomes [[graft.config.GraftConfig]] JSON
  * loading.
  */
final case class EngineConf(
    macroCol: String,
    microCol: String,
    xCol: String,
    yCol: String,
    algorithm: String = "KMeans", // KMeans | BisectingKMeans | GaussianMixture
    startK: Int = 2,
    stopK: Int = 10,
    iterNum: Int = 3,                    // seeds tried per k (conf.json:22)
    thresholdedIterNum: Int = 6,         // re-cluster retry budget (conf.json:23)
    silhouetteThreshold: Double = 0.9,   // conf.json:25
    oldSilhouetteThreshold: Double = 0.8, // conf.json:26
    d3NormalizeMax: Double = 50.0,       // clustering_vars.py:45
    seed: Long = 42L,
    /** When set, skip the k-search (the reference's cached-k fast path,
      * `scripts/cluster.py:98-128`). */
    fixedK: Option[Int] = None,
    /** Upper bound on points materialized per segment inside a task —
      * segments larger than this are deterministically down-sampled before
      * the local fit (the reference samples whole files on ingest,
      * `scripts/preprocess.py:59-63`; per-segment is the scale-safe spot). */
    maxPointsPerSegment: Int = 100000,
    dontScale: Seq[String] = Nil,
    /** Iteration cap for the spark.ml backend's fits ([[ClusterEngine.runMl]]).
      * None = the library defaults (KMeans 20, GaussianMixture 100), which
      * match the reference's unset-maxIter behavior on PySpark
      * (`requirements.txt:1` pins 2.4.4, same defaults). Demo/bench runs can
      * lower it: on small-per-segment data the per-iteration Spark job
      * overhead dominates long before convergence quality changes. */
    mlMaxIter: Option[Int] = None)
