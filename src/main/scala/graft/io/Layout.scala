package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton-curve) clustering for
  * multi-dimensional data skipping — the write-side half of predicate
  * pushdown. Sorting a table by the interleaved bits of its filter
  * columns makes every output file cover a narrow range of EACH column,
  * so parquet min/max statistics prune most files for range predicates
  * on ANY of the dimensions (a plain sort only helps its leading column).
  *
  * Pure built-in expressions (shift/mask/or — codegen'd): the only full
  * pass is the per-column min/max aggregation, broadcast back.
  */
object Layout {

  private val Bits = 16 // rank resolution per dimension

  /** Bit-interleaved Z-value of `cols`, each min-max normalized to a
    * 16-bit rank. Up to 4 columns (64-bit z-value). */
  def zvalue(df: DataFrame, cols: Seq[String]): (DataFrame, Column) = {
    require(cols.nonEmpty && cols.size <= 4,
      s"z-order supports 1..4 columns, got ${cols.size}")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val withBounds = df.crossJoin(broadcast(bounds))
    val maxRank = (1 << Bits) - 1
    val ranks = cols.map { c =>
      val lo = col(s"__min_$c")
      val hi = col(s"__max_$c")
      val span = hi - lo
      val norm = when(span > 0.0,
        (col(c).cast("double") - lo) / span).otherwise(0.0)
      // A NULL value must rank explicitly: least() SKIPS null arguments,
      // so without the guard null rows would rank maxRank and interleave
      // with the max-value corner of the curve, widening every file's
      // min/max span. Rank 0 clusters all-null rows together at the
      // curve origin instead.
      when(col(c).isNull, lit(0L)).otherwise(
        least(lit(maxRank), floor(norm * maxRank).cast("long")))
    }
    val z = (0 until Bits).foldLeft(lit(0L)) { (acc, b) =>
      ranks.zipWithIndex.foldLeft(acc) { case (a, (r, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(r, b).bitwiseAND(lit(1L)), b * cols.size + i))
      }
    }
    (withBounds, z)
  }

  /** Rewrite `df` Z-ordered on `cols` into `numFiles` range-partitioned,
    * internally sorted files at `path`. Each file then covers ~1/numFiles
    * of the CURVE — a narrow slice of every dimension. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int): Unit = {
    val (withBounds, z) = zvalue(df, cols)
    withBounds.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop(("__z" +: cols.flatMap(c =>
        Seq(s"__min_$c", s"__max_$c"))): _*)
      .write.mode("overwrite").parquet(path)
  }
}
