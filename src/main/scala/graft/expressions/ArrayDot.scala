package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double arrays in a
  * single fused whole-stage-codegen pass — the inner-product sibling of
  * [[ArrayL2Sq]], built for the word2vec gradient job (q191) where the
  * composed HOF form `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)`
  * runs INTERPRETED (higher-order functions have no codegen) and boxes
  * every element — measured as the dominant GC source of the training
  * round (VERDICT r13 #1).
  *
  * Bit-compatibility: per element the kernel computes m = x·y then
  * acc += m — the same two IEEE operations in the same left-to-right
  * order as the zip_with product array folded by aggregate, so results
  * are bit-for-bit equal and the q191 DuckDB parity (list_sum of
  * list_transform products) is unchanged. Empty arrays fold to 0.0 in
  * both forms; ragged inputs and null elements yield NULL in both
  * forms (zip_with pads / poisons the aggregate).
  *
  * Inputs must be array<double> (callers cast float arrays first).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  // static null-sweep gating — the ArrayL2Sq pattern: the per-element
  // null test only exists when the schema says elements can be null,
  // and runs as a separate branch-trivial sweep so the arithmetic loop
  // stays free of control flow
  private lazy val elemsNullable: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elemsNullable) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val nullSweep =
        if (!elemsNullable) ""
        else s"""
           |if (!${ev.isNull}) {
           |  for (int $j = 0; $j < $n; $j++) {
           |    if ($a.isNullAt($j) || $b.isNullAt($j)) {
           |      ${ev.isNull} = true; break;
           |    }
           |  }
           |}
         """.stripMargin
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |}
         |$nullSweep
         |if (!${ev.isNull}) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object ArrayDot {
  /** Column-API entry: `array_dot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftExprBridge.column(ArrayDot(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** SQL registration: `SELECT array_dot(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
}
