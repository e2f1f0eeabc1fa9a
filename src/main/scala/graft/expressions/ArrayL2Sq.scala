package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance of two double arrays
  * in a single fused pass with whole-stage codegen — the metric kernel
  * of the PQ/IVF-L2 similarity stack ([[graft.operators.PqIndex]]'s
  * exact side, q154's ground-truth face). The composed HOF formulation
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, +)` builds an
  * intermediate difference array and walks it again; this walks both
  * inputs once with no allocation.
  *
  * Bit-compatibility: per element the kernel computes d = x−y then
  * acc += d·d — the same two IEEE operations in the same left-to-right
  * order as the HOF fold, so results are bit-for-bit equal and DuckDB
  * oracle parity is unchanged (L2ParitySpec). Unlike the cosine fusion
  * there is no division, so there is NO ANSI divergence anywhere: empty
  * arrays fold to 0.0 in both forms, ragged inputs and null elements
  * yield NULL in both forms (zip_with pads / poisons the aggregate).
  *
  * Inputs must be array<double> (callers cast float arrays first —
  * [[graft.operators.Similarity.asDouble]]).
  */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_l2sq expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  // same static gating as ArrayCosine: the per-element null test only
  // exists when the schema says elements can be null, and runs as a
  // separate branch-trivial sweep so the arithmetic loop stays free of
  // control flow (the q46 lesson — a null branch in the fused loop
  // cost ~9% at sf0.1)
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
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
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
      val d = ctx.freshName("d")
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
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object ArrayL2Sq {
  /** Column-API entry: `array_l2sq(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftExprBridge.column(ArrayL2Sq(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** SQL registration: `SELECT array_l2sq(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_l2sq", exprs => ArrayL2Sq(exprs(0), exprs(1)), "built-in")
}
