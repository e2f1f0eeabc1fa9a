package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the most recent right row with
  * `rightTs <= leftTs` and equal keys.
  *
  * Spark has no as-of operator; the composed-built-ins realization here is
  * the union-and-window trick: tag both sides, union, and run a single
  * `last(..., ignoreNulls)` window over (key, ts) — ONE shuffle on the
  * key, no range-condition join. A join-based formulation
  * (`l.join(r, key && r.ts <= l.ts).groupBy(l.*).agg(max)`) explodes to
  * |l|×|r| per key before aggregating; this one is linear in the union
  * size, which is what survives skewed hot keys at 100 TB.
  */
object AsOfJoin extends Serializable {

  /** @param rightCols right-side payload columns carried to the output
    *                   (as `<name>_asof`); the match timestamp arrives as
    *                   `<rightTs>_asof`. Unmatched left rows keep nulls
    *                   (left-outer semantics).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Seq[String] = Nil): DataFrame = {
    val payload = (rightTs +: rightCols).distinct
    // Left rows carry null payloads; right rows only key+payload.
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__isLeft", lit(1))
      .withColumns(payload.map(c => s"__p_$c" -> lit(null)).toMap)
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__isLeft", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // At equal ts the right row must sort BEFORE the left row (<= match).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (acc, c) =>
      acc.withColumn(s"${c}_asof",
        last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__isLeft") === 1)
      .drop(("__ts" +: "__isLeft" +: payload.map(c => s"__p_$c")): _*)
  }

  /** Forward as-of join: the EARLIEST right row with `rightTs >= leftTs`.
    * Same union+window mechanics with the scan direction flipped (the
    * window looks at following rows, `first(..., ignoreNulls)`). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Seq[String] = Nil): DataFrame = {
    val payload = (rightTs +: rightCols).distinct
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__isLeft", lit(1))
      .withColumns(payload.map(c => s"__p_$c" -> lit(null)).toMap)
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__isLeft", lit(2))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // at equal ts the right row (tag 2) sorts AFTER the left row, and the
    // forward-looking frame includes it (>= match)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isLeft").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = payload.foldLeft(unioned) { (acc, c) =>
      acc.withColumn(s"${c}_asof",
        first(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__isLeft") === 1)
      .drop(("__ts" +: "__isLeft" +: payload.map(c => s"__p_$c")): _*)
  }
}
