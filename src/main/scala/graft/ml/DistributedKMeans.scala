package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-corpus Lloyd's k-means as pure DataFrame algebra — the
  * 100 TB complement to [[LocalKMeans]] (which collects a SEGMENT's
  * points to the driver and is the right tool when segments are small
  * and numerous). Here nothing is ever collected: per round,
  * assignment is a broadcast join of the points against the k-row
  * centroid frame and the update is ONE aggregation of (cluster, dim)
  * partial means — the same shuffle key every round.
  *
  * Determinism contract (what makes the fit oracle-able, q158):
  *  - init is explicit (caller-supplied frame or the first k points by
  *    id) — no seeded sampling;
  *  - every centroid coordinate is re-quantized to `roundDp` decimals
  *    at each round boundary, so the one order-sensitive reduction
  *    (the mean) cannot leak partition-order FP wobble into the next
  *    round: any two runs — or two engines — agree bit-for-bit on the
  *    quantized centroids;
  *  - argmin ties break on cluster id (min_by on the (d2, c) struct).
  *
  * Lineage: a fixed unroll builds one join+agg per round; past
  * `checkpointEvery` rounds the centroid frame is localCheckpoint'ed,
  * the PageRank cadence reasoning ([[graft.operators.Graph]]) applied
  * to the k-row frame — cheap at any k, and the plan depth stays
  * bounded by the cadence window.
  */
object DistributedKMeans {

  /** Squared L2 between two array<double> columns as the textbook
    * zip_with/aggregate fold — rewritten to the fused native kernel by
    * [[graft.expressions.L2Fusion]] when the rule is ensured. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Fit: returns (assignments, centroids) where assignments =
    * (id, cluster, d2) for every input row against the FINAL centroids
    * and centroids = (c, cv) after `iterations` rounds.
    *
    * `points` must carry (`idCol`: long-castable, `vecCol`:
    * array<double>). `init` defaults to the first k points by id — the
    * explicit, replayable choice; pass a frame (c, cv) for k-means++
    * or any other seeding computed elsewhere. */
  def fit(points: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int, init: Option[DataFrame] = None,
      roundDp: Int = 6, checkpointEvery: Int = 5)
      : (DataFrame, DataFrame) = {
    require(k >= 1, "k must be >= 1")
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val spark = points.sparkSession
    org.apache.spark.sql.GraftExprBridge.ensureOptimization(spark,
      graft.expressions.L2Fusion)
    val vecs = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val c0 = init.getOrElse {
      // first k by id: explicit and replayable (SQL: WHERE id < kth id)
      vecs.orderBy(col("id")).limit(k)
        .select(col("id").as("c"), col("v").as("cv"))
    }
    var cents = c0
    for (iter <- 1 to iterations) {
      cents = vecs.crossJoin(broadcast(cents))
        .withColumn("d2", sqDist(col("v"), col("cv")))
        .groupBy(col("id"))
        .agg(min_by(struct(col("c"), col("v")),
          struct(col("d2"), col("c"))).as("a"))
        .select(col("a.c").as("c"), posexplode(col("a.v")).as(Seq("p", "x")))
        .groupBy(col("c"), col("p"))
        .agg(round(avg(col("x")), roundDp).as("m"))
        .groupBy(col("c"))
        .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("pm"))
        .select(col("c"), transform(col("pm"), e => e.getField("m")).as("cv"))
      if (iter % checkpointEvery == 0 && iter < iterations)
        cents = cents.localCheckpoint(true)
    }
    val assignments = vecs.crossJoin(broadcast(cents))
      .withColumn("d2", sqDist(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(min_by(struct(col("c"), col("d2")),
        struct(col("d2"), col("c"))).as("a"))
      .select(col("id"), col("a.c").as("cluster"), col("a.d2").as("d2"))
    (assignments, cents)
  }
}
