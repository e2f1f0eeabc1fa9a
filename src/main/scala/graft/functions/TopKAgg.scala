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

    // strict "x outranks y": higher score wins; ties prefer the SMALLER
    // id (stable, deterministic)
    private def outranks(x: Pair, y: Pair): Boolean =
      x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)

    // Buffer invariant: WORST-FIRST sorted, at most k entries. The
    // per-row hot path is a single comparison against the current worst
    // (`b.head`) — once the buffer is full, almost every row of a huge
    // group is rejected in O(1); an accepted row costs one O(k) ordered
    // insertion (no re-sort), and acceptances thin out as the running
    // top-k tightens. This is what makes the aggregator the 100 TB
    // top-k path rather than a per-row k·log k re-sort.
    override def reduce(b: Seq[Pair], a: Pair): Seq[Pair] =
      if (b.size >= k && !outranks(a, b.head)) b
      else {
        val (notBetter, better) = b.span(x => !outranks(x, a))
        val inserted = (notBetter :+ a) ++ better
        if (inserted.size > k) inserted.tail else inserted
      }

    // linear merge of two worst-first buffers, keeping the best k
    override def merge(b1: Seq[Pair], b2: Seq[Pair]): Seq[Pair] = {
      val out = Seq.newBuilder[Pair]
      var x = b1.toList
      var y = b2.toList
      while (x.nonEmpty && y.nonEmpty) {
        if (outranks(x.head, y.head)) { out += y.head; y = y.tail }
        else { out += x.head; x = x.tail }
      }
      x.foreach(out += _)
      y.foreach(out += _)
      val merged = out.result()
      merged.drop(math.max(0, merged.size - k))
    }

    override def finish(r: Seq[Pair]): Seq[Pair] = r.reverse

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
