package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays in a
  * SINGLE fused pass (dot product and both norms in one loop), with full
  * whole-stage codegen — the hot kernel of the similarity/near-dup
  * operators. The composed higher-order-function formulation
  * (zip_with + 3× aggregate, [[graft.operators.Similarity.cosineHof]])
  * walks both arrays four times; this walks them once. Accumulation order
  * is identical (left-to-right), so results are bit-for-bit equal and the
  * DuckDB oracle parity is unchanged.
  *
  * Inputs must be array<double> (callers cast float arrays first —
  * [[graft.operators.Similarity.asDouble]]). Zero-norm and empty inputs
  * yield IEEE NaN (0/0 in double arithmetic) — NOT the ANSI
  * DIVIDE_BY_ZERO error the composed HOF form raises; see the
  * [[GraftOptimizations]] CosineFusion note.
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_cosine expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // NULL on ragged input or a null element (not a min-length/skip-null
  // score): matches the composed HOF formulation exactly — zip_with pads
  // the shorter side with nulls and any null poisons the aggregate — so
  // the CosineFusion rewrite is semantics-preserving on every input
  // shape, not just the well-formed fixed-width one
  override def nullable: Boolean = true

  // The per-element null test is only emitted when the STATIC schema
  // says an element can be null (`containsNull`). Embedding columns
  // read from parquet with non-nullable elements get the r4-era tight
  // loop back — the null branch in the hot loop cost q46's blocked
  // cosine ~9% (r4-vs-r5 A/B at sf0.1). When elements may be null, the
  // scan is SPLIT: a branch-trivial null sweep first (never-taken
  // branch, no FP dependencies), then the clean arithmetic loop —
  // keeping the accumulation loop free of control flow the JIT must
  // carry through its unrolling.
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
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
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
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object ArrayCosine {
  /** Column-API entry: `array_cosine(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftExprBridge.column(ArrayCosine(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** SQL registration: `SELECT array_cosine(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_cosine", exprs => ArrayCosine(exprs(0), exprs(1)), "built-in")
}
