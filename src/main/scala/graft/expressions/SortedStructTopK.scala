package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Native fusion of `slice(array_distinct(sort_array(arr)), 1, k)`
  * for `arr: array<struct<double, long>>` — the per-node
  * cap/keep-k kernel of [[graft.operators.NnDescent.knnGraph]]
  * (r17 optimization round; guide §1.2 per-task work).
  *
  * The generic chain was the q231 build's dominant executor cost
  * (all-thread sampler: ~50% of busy ticks under
  * `SpecificUnsafeProjection.Slice_0$` + `InternalRow$.getAccessor` —
  * sort_array's interpreted struct ordering, array_distinct's O(n²)
  * equivalence scan, and slice's per-element BOXED copy of struct
  * elements). This kernel unpacks the (d2, id) pairs into primitive
  * arrays once, sorts them with the SAME total order Spark's
  * PhysicalDataType gives struct<double, long> — lexicographic
  * (java.lang.Double.compare, Long.compare); Double.compare is
  * exactly Catalyst's double ordering (NaN greatest, −0.0 < 0.0) —
  * dedups adjacent compare-equal pairs in the same pass
  * (array_distinct's equivalence on a struct IS ordering
  * equivalence: Spark's ArrayDistinct falls back to `ordering.equiv`
  * for non-atomic elements, and compare == 0 on (double, long) means
  * bit-identical fields), and emits at most `k` rows. Identical
  * output, one pass, zero boxing until the ≤ k result rows.
  *
  * Contract (the SortedLongIntersect pattern): elements and both
  * struct fields are non-null — the only callers build the array
  * with `collect_list(struct(d2, id))` over join outputs whose
  * fields are never null. `k` must be a positive literal. Output
  * type = input type, so the downstream `explode` + field reads are
  * untouched.
  */
case class SortedStructTopK(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == DoubleType &&
          s(1).dataType == LongType && k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sorted_struct_topk expects array<struct<double, long>> and a " +
        s"positive k, got ${child.dataType.simpleString} / k=$k")
  }

  override def dataType: DataType = child.dataType

  override def nullSafeEval(a: Any): Any =
    SortedStructTopK.run(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the kernel lives in one audited Scala method; codegen calls
      // it through the module instance (always Janino-visible, unlike
      // static forwarders)
      s"""
        ${ev.value} = graft.expressions.SortedStructTopK$$.MODULE$$
          .run($c, $k);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SortedStructTopK = copy(child = newChild)
}

object SortedStructTopK {
  /** Column-API entry. */
  def apply(arr: Column, k: Int): Column =
    GraftExprBridge.column(
      SortedStructTopK(GraftExprBridge.expression(arr), k))

  /** The fused kernel: sort by (Double.compare, Long.compare), drop
    * adjacent equal pairs, keep the first `k`. */
  def run(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val d = new Array[Double](n)
    val y = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      d(i) = row.getDouble(0)
      y(i) = row.getLong(1)
      i += 1
    }
    if (n > 1) sort(d, y, 0, n - 1)
    // dedup adjacent (compare-equal ⇒ bit-identical fields) + cap
    val outRows = new java.util.ArrayList[InternalRow](math.min(n, k))
    i = 0
    while (i < n && outRows.size < k) {
      if (i == 0 || java.lang.Double.compare(d(i), d(i - 1)) != 0 ||
          y(i) != y(i - 1)) {
        outRows.add(new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](d(i), y(i))))
      }
      i += 1
    }
    new GenericArrayData(outRows.toArray)
  }

  private def less(d1: Double, y1: Long, d2: Double, y2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && y1 < y2)
  }

  /** In-place quicksort over the parallel (d, y) arrays by the
    * lexicographic (Double.compare, Long.compare) order — insertion
    * sort below 16 elements, median-of-three pivot. */
  private def sort(d: Array[Double], y: Array[Long],
      lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      if (hi - lo < 16) {
        var i = lo + 1
        while (i <= hi) {
          val dv = d(i); val yv = y(i)
          var j = i - 1
          while (j >= lo && less(dv, yv, d(j), y(j))) {
            d(j + 1) = d(j); y(j + 1) = y(j); j -= 1
          }
          d(j + 1) = dv; y(j + 1) = yv
          i += 1
        }
        return
      }
      // median-of-three pivot to the middle
      val mid = lo + (hi - lo) / 2
      if (less(d(mid), y(mid), d(lo), y(lo))) swap(d, y, lo, mid)
      if (less(d(hi), y(hi), d(lo), y(lo))) swap(d, y, lo, hi)
      if (less(d(hi), y(hi), d(mid), y(mid))) swap(d, y, mid, hi)
      val pd = d(mid); val py = y(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (less(d(i), y(i), pd, py)) i += 1
        while (less(pd, py, d(j), y(j))) j -= 1
        if (i <= j) { swap(d, y, i, j); i += 1; j -= 1 }
      }
      // recurse into the smaller half, loop on the larger (bounded depth)
      if (j - lo < hi - i) {
        if (lo < j) sort(d, y, lo, j)
        lo = i
      } else {
        if (i < hi) sort(d, y, i, hi)
        hi = j
      }
    }
  }

  private def swap(d: Array[Double], y: Array[Long],
      i: Int, j: Int): Unit = {
    val td = d(i); d(i) = d(j); d(j) = td
    val ty = y(i); y(i) = y(j); y(j) = ty
  }
}
