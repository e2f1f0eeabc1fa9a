package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: intersection of two SORTED,
  * duplicate-free long arrays by a single merge scan — the
  * per-edge closure kernel of [[graft.operators.Graph.triangleCounts]]
  * (r16 optimization round, "Not yet optimized" #3 banked early).
  *
  * `array_intersect` is semantics-general: per ROW it builds an
  * OpenHashSet over the left array, then probes every right element —
  * one hash-set allocation + build per edge, which on a 1.2M-edge
  * closure join is the stage's dominant allocation (q166's GC band).
  * The adjacency arrays are produced by this codebase under a stronger
  * contract — `sort_array(collect_list(dst))` over DISTINCT oriented
  * edges: ascending, duplicate-free, null-free — and under that
  * contract the intersection is a two-pointer merge: zero per-row
  * allocation beyond the result array, no hashing.
  *
  * EQUIVALENCE (spec-pinned against `array_intersect` on random
  * sorted inputs): on duplicate-free inputs `array_intersect` returns
  * the common elements in LEFT-array order — which for a sorted left
  * array is ascending — exactly what the merge scan emits. Every
  * consumer downstream of q166's closure is order-insensitive anyway
  * (size(ws) and a per-element sum aggregation).
  *
  * The sortedness precondition is the CALLER's (like ArrayL2Sq's
  * equal-length contract): unsorted input silently under-reports — so
  * the only production caller builds its arrays with `sort_array` in
  * the same expression tree, and the spec + q166's 3-SF oracle hash
  * gate pin the pairing end-to-end. Inputs must be array<bigint> with
  * non-nullable elements (the collect_list shape); a NULL array yields
  * NULL like every BinaryExpression.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_long_intersect expects array<bigint> inputs with " +
        s"non-nullable elements, got ${left.dataType.simpleString} / " +
        s"${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val out = new Array[Long](math.min(nx, ny))
    var i = 0
    var j = 0
    var k = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { out(k) = xv; k += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val out = ctx.freshName("out")
      s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        final long[] $out = new long[$nx < $ny ? $nx : $ny];
        int $i = 0; int $j = 0; int $k = 0;
        while ($i < $nx && $j < $ny) {
          final long $xv = $a.getLong($i);
          final long $yv = $b.getLong($j);
          if ($xv == $yv) { $out[$k] = $xv; $k++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions
          .UnsafeArrayData.fromPrimitiveArray(
            java.util.Arrays.copyOf($out, $k));
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  /** Column-API entry: `sorted_long_intersect(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftExprBridge.column(SortedLongIntersect(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
