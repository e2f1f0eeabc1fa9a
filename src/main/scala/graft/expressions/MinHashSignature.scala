package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full MinHash signature of a shingle
  * array in ONE pass — `numHashes` running minima kept in local
  * registers while the shingles stream by once.
  *
  * Bit-compatibility contract: each value equals the composed built-in
  * formulation `min(xxhash64(xxhash64(sh), i))` exactly —
  * `xxhash64(sh)` is XXH64(bytes, seed=42) and `xxhash64(h, i)` chains
  * `hashLong(i, hashLong(h, 42))` — so signatures written by either
  * path join against the same persisted LSH index (MinHashParitySpec
  * gates this; a silent hash-family drift would orphan every index on
  * disk).
  *
  * Why not the explode → 32×min-aggregate formulation the index used
  * before: that shape pushes one ROW per shingle occurrence through the
  * hash-aggregate machinery (explode, 33 aggregate buffers, a shuffle
  * of partial minima) and recomputes the loop-invariant inner hash
  * `hashLong(base, 42)` for every one of the 32 rehashes. Here the
  * whole signature is a PROJECTION — no explode, no aggregate, no
  * shuffle — and the invariant hash is computed once per shingle,
  * halving the hash arithmetic that dominates MinHash cost. Empty
  * arrays yield NULL (the exploded form emitted no row for an empty
  * doc — callers drop those docs, and a MaxValue-filled signature
  * would instead band-collide every empty doc into one bucket). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with Serializable {
  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val base = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val inner = XXH64.hashLong(base, 42L)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(i.toLong, inner)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val inner = ctx.freshName("inner")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$c.isNullAt($j)) {
         |      org.apache.spark.unsafe.types.UTF8String $s =
         |        $c.getUTF8String($j);
         |      long $inner = $xxh.hashLong($xxh.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(),
         |        $s.numBytes(), 42L), 42L);
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        long $v = $xxh.hashLong((long) $i, $inner);
         |        if ($v < $mins[$i]) $mins[$i] = $v;
         |      }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSignature {
  /** Column-API entry: `minhash_signature(shingles, numHashes)`. */
  def apply(shingles: Column, numHashes: Int): Column =
    GraftExprBridge.column(
      MinHashSignature(GraftExprBridge.expression(shingles), numHashes))
}
