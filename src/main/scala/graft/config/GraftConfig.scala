package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Engine run configuration — same document shape as the reference's
  * config (`/root/reference/conf.json:1-44`), loaded as
  * defaults-overlaid-by-JSON exactly like `setConf()`
  * (`scripts/clustering_vars.py:67-105`, which overlays the latest Mongo
  * doc on `defaultConf`). JSON here; a different store can feed
  * [[GraftConfig.fromJson]] the same way.
  */
final case class IntervalArgs(limit: Long)

final case class GraftConfig(
    args: Map[String, IntervalArgs] = Map(
      "daily" -> IntervalArgs(100), "weekly" -> IntervalArgs(200),
      "monthly" -> IntervalArgs(300), "yearly" -> IntervalArgs(400)),
    optimalKarg: String = "monthly",
    fileName: String = "data.csv",
    startK: Int = 2,
    stopK: Int = 10,
    iterNum: Int = 3,
    thresholdedIterNum: Int = 6,
    threadNum: Int = 12,
    silhouetteThreshold: Double = 0.9,
    oldSilhouetteThreshold: Double = 0.8,
    d3NormalizeMax: Double = 50.0,
    png: Boolean = false,
    algorithms: Seq[String] = Seq("KMeans"),
    /** macro column → micro columns (conf.json:31-35). */
    filteringColumns: Map[String, Seq[String]] = Map(
      "customer_id" -> Seq("application_id")),
    /** x column → y columns (conf.json:36-42). */
    columns: Map[String, Seq[String]] = Map(
      "cpu_percent" -> Seq("ram_usage")),
    /** n-D EXTENSION beyond the reference's pairwise shape: when
      * non-empty, each entry is a full metric-column set clustered
      * together through [[graft.engine.ClusterEngine.runNd]] (the local
      * kernels are dimension-agnostic); `columns` pairs are ignored for
      * grid building in that case. */
    metricSets: Seq[Seq[String]] = Nil,
    dontScale: Seq[String] = Seq("cpu_percent"),
    /** NORTH-STAR EXTENSION knobs — the dedup / similarity-index
      * parameters, overlayable through the same JSON document as the
      * reference's clustering knobs (defaults mirror the operator
      * defaults in `operators/Dedup` / `IvfIndex` / `PqIndex`). The
      * minhash/threshold/bucket knobs drive the `graft.Main dedup` CLI;
      * the ANN/PQ knobs parameterize index builds the same way. */
    minhashNumHashes: Int = 32,
    minhashBands: Int = 8,
    dedupThreshold: Double = 0.5,
    shingleN: Int = 3,
    maxBucket: Int = 1000,
    annNlist: Int = 16,
    annNprobe: Int = 4,
    pqSubspaces: Int = 8,
    pqCentroids: Int = 16) {

  /** The task grid (G3, `scripts/cluster.py:276-287`): every
    * (macro, micro) × (x, y) × algorithm combination. */
  def taskGrid: Seq[(String, String, String, String, String)] =
    for {
      (macroCol, micros) <- filteringColumns.toSeq
      microCol <- micros
      (xCol, ys) <- columns.toSeq
      yCol <- ys
      alg <- algorithms
    } yield (macroCol, microCol, xCol, yCol, alg)

  /** n-D task grid: (macro, micro, metricCols, algorithm) — the shape
    * [[metricSets]] drives. Falls back to the pairwise grid's (x, y)
    * sets when no metric sets are configured. */
  def taskGridNd: Seq[(String, String, Seq[String], String)] = {
    val sets = if (metricSets.nonEmpty) metricSets
      else columns.toSeq.flatMap { case (x, ys) => ys.map(y => Seq(x, y)) }
    for {
      (macroCol, micros) <- filteringColumns.toSeq
      microCol <- micros
      set <- sets
      alg <- algorithms
    } yield (macroCol, microCol, set, alg)
  }
}

object GraftConfig {
  private implicit val formats: Formats = DefaultFormats

  /** Overlay semantics of `setConf()` (`clustering_vars.py:78-105`): a
    * top-level field present in the JSON REPLACES the default wholesale
    * (the reference reads whole values out of the Mongo doc per key);
    * absent fields keep defaults. Deliberately not json4s `merge`, which
    * would concatenate arrays instead of replacing them. */
  def fromJson(json: String): GraftConfig = {
    val defaults = Extraction.decompose(GraftConfig()).asInstanceOf[JObject]
    val parsed = JsonMethods.parse(json) match {
      case o: JObject => o
      case other => throw new IllegalArgumentException(s"config must be a JSON object, got $other")
    }
    val overlaid = JObject(defaults.obj.map { case (k, v) =>
      k -> parsed.obj.collectFirst { case (`k`, pv) => pv }.getOrElse(v)
    })
    overlaid.extract[GraftConfig]
  }

  def fromFile(path: String): GraftConfig =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
