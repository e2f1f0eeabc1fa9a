package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Builders for the reference's nested result documents (SURVEY.md §1.4):
  *
  *  - `originalCollection` doc
  *    (`/root/reference/scripts/cluster.py:145-164,197`):
  *    {algorithm, macro, micro, firstColumn, secondColumn, date,
  *     list: [{<macroCol>, <microCol>_List: [{<microCol>, entropy,
  *     silhouette, clusters: [{name, center, clusterSize, radius}]}]}]}
  *
  *  - `d3Collection` doc (`scripts/cluster.py:202-211` + `scaleD3`
  *    `scripts/metrics.py:151-171`): same tree with name/children fields
  *    and a `size` = radius min–max-normalized into [1, d3NormalizeMax].
  *
  * Divergence (deliberate, SURVEY.md §1.4): the reference produces the d3
  * doc by TEXT-replacing field names in the JSON string, which corrupts
  * data values containing the column-name substring; ours is a structural
  * transform. Also its scaleD3 min/max scan has an `elif` bug that can
  * miss the true max; we compute true min/max.
  */
object ResultDocs extends Serializable {

  /** One row = one document, matching the per-(algorithm, macro, micro,
    * x, y) task granularity of the reference. Aggregation is two
    * collect_lists (micro under macro, macro under root) — fine because a
    * document is bounded by #segments of one run; at 100 TB you keep the
    * flat Dataset[SegmentResult] (the engine's real output) and emit docs
    * only for the segments a consumer asks for. */
  def original(results: Dataset[SegmentResult], conf: EngineConf,
      date: String): DataFrame = {
    val microList = results
      .groupBy(col("macroId"))
      .agg(sort_array(collect_list(struct(
        col("microId").as(conf.microCol),
        col("entropy"),
        col("silhouette"),
        col("clusters")))).as(s"${conf.microCol}_List"))
    microList
      .agg(sort_array(collect_list(struct(
        col("macroId").as(conf.macroCol),
        col(s"${conf.microCol}_List")))).as("list"))
      .select(
        lit(algName(conf)).as("algorithm"),
        lit(conf.macroCol).as("macro"),
        lit(conf.microCol).as("micro"),
        lit(conf.xCol).as("firstColumn"),
        lit(conf.yCol).as("secondColumn"),
        lit(date).as("date"),
        col("list"))
  }

  /** d3 circle-packing doc: structural rename + radius→size scaling. */
  def d3(results: Dataset[SegmentResult], conf: EngineConf,
      date: String): DataFrame = {
    val spark = results.sparkSession
    // global radius bounds (an aggregate of an already-aggregated, small
    // dataset — the collect is 2 doubles, not data rows)
    val bounds = results
      .select(explode(col("clusters")).as("c"))
      .agg(min(col("c.radius")).as("rmin"), max(col("c.radius")).as("rmax"))
      .collect()(0)
    val (rmin, rmax) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = rmax - rmin
    val sizeExpr =
      if (span <= 0) lit(1.0)
      else (col("c.radius") - lit(rmin)) / lit(span) *
        lit(conf.d3NormalizeMax - 1.0) + lit(1.0)

    // size needs the global bounds → compute over exploded clusters
    val sized = results
      .select(col("macroId"), col("microId"), col("entropy"),
        col("silhouette"), explode(col("clusters")).as("c"))
      .select(col("macroId"), col("microId"), col("entropy"),
        col("silhouette"),
        struct(col("c.name").as("name"), col("c.center").as("center"),
          col("c.clusterSize").as("clusterSize"),
          col("c.radius").as("radius"),
          sizeExpr.as("size")).as("cluster"))
      .groupBy(col("macroId"), col("microId"), col("entropy"),
        col("silhouette"))
      .agg(sort_array(collect_list(col("cluster"))).as("children"))
    val microLevel = sized
      .groupBy(col("macroId"))
      .agg(sort_array(collect_list(struct(
        col("microId").as("name"),
        col("entropy"), col("silhouette"),
        col("children")))).as("children"))
    microLevel
      .agg(sort_array(collect_list(struct(
        col("macroId").as("name"),
        col("children")))).as("children"))
      .select(
        lit("clusters").as("name"),
        col("children"),
        lit(algName(conf)).as("algorithm"),
        lit(conf.macroCol).as("macro"),
        lit(conf.microCol).as("micro"),
        lit(conf.xCol).as("firstColumn"),
        lit(conf.yCol).as("secondColumn"),
        lit(date).as("date"))
  }

  /** The GUI's read path (reference `project_gui/gui/views.py:31-35`):
    * fetch the LATEST doc for (algorithm, macro, micro, x, y) where the
    * (x, y) column pair is UNORDERED — the reference retries its lookup
    * with the two columns swapped when the first orientation misses.
    * Engine-side equivalent over a doc table ([[original]] or [[d3]]
    * rows): one filter accepting both orientations, ranked exactly like
    * the reference — the EXACT orientation's newest doc wins even when
    * a newer swapped-orientation doc exists (the reference only falls
    * back to the swap when the exact lookup misses entirely); `date` is
    * the injected run stamp, ISO-sortable. */
  def latestFor(docs: DataFrame, algorithm: String, macroName: String,
      microName: String, xCol: String, yCol: String): DataFrame =
    docs.filter(col("algorithm") === algorithm &&
        col("macro") === macroName && col("micro") === microName &&
        ((col("firstColumn") === xCol && col("secondColumn") === yCol) ||
          (col("firstColumn") === yCol && col("secondColumn") === xCol)))
      .orderBy((col("firstColumn") === xCol &&
        col("secondColumn") === yCol).desc, col("date").desc)
      .limit(1)

  private def algName(conf: EngineConf): String = conf.algorithm
}
