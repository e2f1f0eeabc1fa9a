package graft.preprocess

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column scaling with the reference's three-way semantics
  * (`/root/reference/scripts/preprocess.py:85-106`):
  *   1. column listed in `dontScale`            → passed through as-is;
  *   2. a matching `<prefix>_limit` column exists → `x * 100 / limit`;
  *   3. otherwise min–max                        → `(x-min)/(max-min)*100`,
  *      or literal 0.0 when the column is constant (max == min).
  *
  * Divergences (SURVEY.md §7.4, intentional):
  *  - scaled columns are named `<fullColumn>_scaled`, not the reference's
  *    `<prefix-before-first-underscore>_scaled` (which collides for any
  *    two columns sharing a prefix, e.g. l_quantity/l_extendedprice);
  *  - min/max are computed per (macro, micro) segment in ONE groupBy
  *    (then broadcast-joined back), not 2 Spark jobs per segment
  *    (`scripts/preprocess.py:99-100` + the §2.10 job storm) — same
  *    values, O(1) jobs instead of O(#segments).
  */
object Scaling {

  def scaledName(col: String): String = s"${col}_scaled"

  /** Reference-compatible limit-column lookup: `ram_usage` matches
    * `ram_limit` (prefix before first '_', `clustering_vars.py:16`); we
    * also accept the unambiguous `<fullColumn>_limit`. */
  def limitColFor(col: String, allCols: Seq[String]): Option[String] = {
    val prefix = col.takeWhile(_ != '_')
    Seq(s"${prefix}_limit", s"${col}_limit").find(allCols.contains)
  }

  /** Null-drops the metric columns (`preprocess.py:89`) and appends one
    * `<col>_scaled` per metric column, scaled within each (macro, micro)
    * segment. One shuffle (the bounds agg); bounds are #segments rows →
    * broadcast join back.
    */
  def scaleSegments(df: DataFrame, macroCol: String, microCol: String,
      metricCols: Seq[String], dontScale: Seq[String] = Nil): DataFrame = {
    val clean = df.na.drop(metricCols)
    val allCols = df.columns.toSeq

    val minMaxCols = metricCols.filterNot(dontScale.contains)
      .filter(c => limitColFor(c, allCols).isEmpty)

    val base =
      if (minMaxCols.isEmpty) clean
      else {
        val aggs = minMaxCols.flatMap { c =>
          Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
        }
        val bounds = clean.groupBy(col(macroCol), col(microCol))
          .agg(aggs.head, aggs.tail: _*)
        clean.join(broadcast(bounds), Seq(macroCol, microCol))
      }

    val withScaled = metricCols.foldLeft(base) { (acc, c) =>
      val out = scaledName(c)
      if (dontScale.contains(c)) acc.withColumn(out, col(c).cast("double"))
      else limitColFor(c, allCols) match {
        case Some(limCol) =>
          acc.withColumn(out, col(c) * 100.0 / col(limCol))
        case None =>
          val (mn, mx) = (col(s"__min_$c"), col(s"__max_$c"))
          acc.withColumn(out,
            when(mx - mn > 0, (col(c) - mn) / (mx - mn) * 100.0)
              .otherwise(lit(0.0)))
      }
    }
    withScaled.drop(minMaxCols.flatMap(c =>
      Seq(s"__min_$c", s"__max_$c")): _*)
  }
}
