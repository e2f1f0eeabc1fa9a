package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) with whole-stage codegen — the first cleaning pass of a
  * web-crawl pipeline, where the same visible text arrives in composed
  * ("á") and decomposed ("a" + U+0301) forms and everything downstream
  * (hash dedup, content-keyed splits, shingles) treats them as
  * DIFFERENT bytes unless normalization runs first. Exact-dedup misses
  * and eval-leakage through the content-keyed split are the concrete
  * failure modes.
  *
  * Semantics are the Unicode standard's — `java.text.Normalizer`
  * (ICU-compatible NFC), which is also what DuckDB's `nfc_normalize`
  * implements, so queries over normalized text stay oracle-checkable.
  * NULL in → NULL out; the expression is deterministic and codegen'd
  * (a static library call in the generated code — no UDF boxing, stays
  * inside WholeStageCodegen spans).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan that avoids
    // allocating a new string for the overwhelmingly-ASCII common case
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String
         |    .fromString(java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object NfcNormalize {
  /** Column-API entry: `nfc_normalize(s)`. */
  def apply(c: Column): Column =
    GraftExprBridge.column(NfcNormalize(GraftExprBridge.expression(c)))

  /** SQL registration: `SELECT nfc_normalize(s)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs(0)), "built-in")
}
