package graft.engine

/** Per-cluster result — shape of one element of `clusters` in the
  * reference's `originalCollection` documents
  * (`/root/reference/scripts/cluster.py:157-164`). `radius` is the
  * reference's L2 radius: sqrt of the MAX squared distance to the center
  * (`scripts/metrics.py:12-29` — preserved exactly).
  */
final case class ClusterInfo(
    name: Int,
    center: Seq[Double],
    clusterSize: Long,
    radius: Double)

/** One micro-segment's clustering outcome — the engine's flat result row.
  * The nested `originalCollection` / `d3Collection` documents (§1.4 of
  * SURVEY.md) are structural aggregations of this dataset (ResultDocs).
  */
final case class SegmentResult(
    macroId: String,
    microId: String,
    algorithm: String,
    k: Int,
    silhouette: Double,
    entropy: Double,
    clusters: Seq[ClusterInfo])

/** Cached k + the silhouette it achieved — one k-store entry per
  * (macro, micro) segment (the reference's `kCollection` leaf,
  * `/root/reference/scripts/optimal_k.py:216-249`). The silhouette feeds
  * the degradation re-check (M11). */
final case class KEntry(k: Int, silhouette: Double)
