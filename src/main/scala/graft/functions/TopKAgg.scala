package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Heap-based top-k-per-group aggregate: keeps the k largest
  * (score, payload) pairs per group with MAP-SIDE partial aggregation.
  *
  * The ranking-window formulation (`row_number().over(partitionBy(key)
  * .orderBy(desc)) <= k`) shuffles and SORTS every row of every group;
  * this aggregator shuffles at most k rows per (group × map partition) —
  * at 100 TB with hot groups that is the difference between a top-k and a
  * full sort. Results are identical (deterministic tie-break on payload).
  */
object TopKAgg {

  type Pair = (Double, Long) // (score, payload id)

  private class TopK(k: Int) extends Aggregator[Pair, Seq[Pair], Seq[Pair]] {
    override def zero: Seq[Pair] = Nil

    // keep the k best; ties prefer the SMALLER id (stable, deterministic)
    private def trim(items: Seq[Pair]): Seq[Pair] =
      items.sortBy { case (s, id) => (-s, id) }.take(k)

    override def reduce(b: Seq[Pair], a: Pair): Seq[Pair] = trim(a +: b)

    override def merge(b1: Seq[Pair], b2: Seq[Pair]): Seq[Pair] =
      trim(b1 ++ b2)

    override def finish(r: Seq[Pair]): Seq[Pair] =
      r.sortBy { case (s, id) => (-s, id) }

    override def bufferEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** Column form: `top_k(score, id) → array<struct<_1: double, _2: bigint>>`,
    * best first. Use with groupBy(key).agg(topK(k)(score, id)). */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopK(k), Encoders.product[Pair]).apply(score, id)
}
