package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution,
  IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Whole-operator Catalyst integration of the as-of join (SURVEY.md §4.3's
  * "custom pieces" ladder, rung (c)): a custom [[LogicalPlan]] node, a
  * planner [[SparkStrategy]], and a physical [[AsOfJoinExec]] that executes
  * the join as ONE co-partitioned sorted merge.
  *
  * The composed-built-ins realization ([[graft.operators.AsOfJoin]],
  * union+window) already has the right shuffle shape; this native operator
  * removes the union+filter detour entirely: each side is hash-partitioned
  * on the key and sorted (key, ts) — both requirements are DECLARED, so
  * Catalyst plans the exchanges (and can elide them if the data is already
  * bucketed/sorted, which no UDF-level realization can express) — then a
  * two-pointer per-partition merge emits exactly one output row per left
  * row. Left-outer semantics, O(|L|+|R|) per partition, no window buffer.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → a physical realization chosen like
  * Spark's own join planning — broadcast the right side when its
  * estimated size fits under `spark.sql.autoBroadcastJoinThreshold`
  * (zero shuffles on EITHER side: the big fact is never moved),
  * otherwise the co-partitioned sorted merge. Registered via
  * [[graft.expressions.GraftExtensions]] or lazily through
  * [[NativeAsOf.join]] (spark.experimental.extraStrategies). */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold >= 0 && p.right.stats.sizeInBytes <= threshold)
          BroadcastAsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
            p.forward, planLater(p.left), planLater(p.right))
        else
          AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
            p.forward, planLater(p.left), planLater(p.right))
      exec :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge as-of join.
  *
  * Declared requirements (Catalyst inserts/elides the exchanges+sorts):
  *  - distribution: both children clustered on their join keys
  *  - ordering: (keys…, ts) ascending on both children
  *
  * Per partition, a single forward sweep:
  *  - backward: consume right rows up to the left key/ts, remembering the
  *    latest `rts <= lts` row per key (the candidate) — one copy per
  *    candidate update, nothing else buffered;
  *  - forward: drop right rows behind the left cursor; the right head is
  *    the match iff it has the same key and `rts >= lts` (not consumed —
  *    later left rows may match it too).
  *
  * Null keys / null timestamps never match (SQL semantics); unmatched left
  * rows are emitted with a null right side (left outer).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def ordering(keys: Seq[Expression], ts: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+ SortOrder(ts, Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(ordering(leftKeys, leftTs), ordering(rightKeys, rightTs))

  override def outputOrdering: Seq[SortOrder] = ordering(leftKeys, leftTs)

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val fwd = forward
    val nRight = rOut.size
    val outAttrs = output // right side forced nullable — see below
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(tsType))
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // Parents consume UnsafeRow (e.g. direct collect) — project results.
      // The INPUT schema must mark the right side nullable (BindReferences
      // takes nullability from the input attribute): bound to a
      // non-nullable child attribute, the projection would skip the null
      // check and write 0/garbage for unmatched left rows.
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // backward-join candidate state: full-row + key copies (the child's
      // row objects are reused across next() calls, so candidates must own
      // their bytes)
      var cand: UnsafeRow = null
      var candKey: UnsafeRow = null

      lIter.map { l =>
        val lk = lKeyProj(l) // valid until the next lKeyProj call
        val lts = lTsProj(l)
        if (lk.anyNull || lts.isNullAt(0)) {
          resultProj(joined(l, nullRight))
        } else if (fwd) {
          // drop right rows strictly behind the (key, ts) cursor
          var done = false
          while (!done && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) rBuf.next()
            else if (c == 0) {
              val rts = rTsProj(rBuf.head)
              if (rts.isNullAt(0) || tsOrd.compare(rts, lts) < 0) rBuf.next()
              else done = true
            } else done = true
          }
          val matched = rBuf.hasNext && {
            val rk = rKeyProj(rBuf.head)
            keyOrd.compare(rk, lk) == 0 && {
              val rts = rTsProj(rBuf.head)
              !rts.isNullAt(0) && tsOrd.compare(rts, lts) >= 0
            }
          }
          // head not consumed: later left rows may match the same right row
          resultProj(if (matched) joined(l, rBuf.head) else joined(l, nullRight))
        } else {
          // backward: consume right rows with key < lk, or key == lk and
          // rts <= lts (each such row supersedes the previous candidate)
          var done = false
          while (!done && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) rBuf.next()
            else if (c == 0) {
              val rts = rTsProj(rBuf.head)
              if (rts.isNullAt(0)) rBuf.next()
              else if (tsOrd.compare(rts, lts) <= 0) {
                val r = rBuf.next()
                cand = r.asInstanceOf[UnsafeRow].copy()
                candKey = rKeyProj(cand).copy()
              } else done = true
            } else done = true
          }
          resultProj(
            if (cand != null && keyOrd.compare(candKey, lk) == 0)
              joined(l, cand)
            else joined(l, nullRight))
        }
      }
    }
  }
}

/** Broadcast as-of join: the whole (small) right side ships to every
  * task as an identity broadcast; each partition builds a per-key
  * ts-sorted index once, then answers every left row with a binary
  * search. NO exchange on either side — the realization for a huge fact
  * stream against a small dimension timeline (model-version history,
  * config rollouts), where shuffling the fact just to co-partition it
  * would dominate the query.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val tsType = leftTs.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val fwd = forward
    val nRight = rOut.size
    val outAttrs = output
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(tsType))
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      // per-key index: ts-sorted arrays of (tsRow, row) — built once per
      // partition from the broadcast rows (copies: projections reuse
      // their buffers)
      val index = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]()
      bcast.value.foreach { r =>
        val k = rKeyProj(r)
        val ts = rTsProj(r)
        if (!k.anyNull && !ts.isNullAt(0)) {
          var bucket = index.get(k)
          if (bucket == null) {
            bucket = scala.collection.mutable.ArrayBuffer
              .empty[(UnsafeRow, InternalRow)]
            index.put(k.copy(), bucket)
          }
          bucket += ((ts.copy(), r))
        }
      }
      index.values().forEach { b =>
        b.sortInPlace()(
          Ordering.by[(UnsafeRow, InternalRow), InternalRow](_._1)(tsOrd))
        ()
      }
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lts = lTsProj(l)
        val bucket = if (lk.anyNull || lts.isNullAt(0)) null else index.get(lk)
        if (bucket == null) resultProj(joined(l, nullRight))
        else {
          // binary search: last rts <= lts (backward) / first rts >= lts
          var lo = 0
          var hi = bucket.length - 1
          var found = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val c = tsOrd.compare(bucket(mid)._1, lts)
            if (fwd) {
              if (c >= 0) { found = mid; hi = mid - 1 } else lo = mid + 1
            } else {
              if (c <= 0) { found = mid; lo = mid + 1 } else hi = mid - 1
            }
          }
          if (found < 0) resultProj(joined(l, nullRight))
          else resultProj(joined(l, bucket(found)._2))
        }
      }
    }
  }
}

/** User-facing builder for the native as-of join. Resolves the key/ts
  * columns by name against the analyzed child plans and wires the custom
  * logical node into a DataFrame. Registers the planner strategy on the
  * session idempotently (spark.experimental.extraStrategies), so it works
  * on sessions built without [[graft.expressions.GraftExtensions]] too.
  *
  * Output = left columns ++ right columns (right side nullable): rename
  * right-side columns beforehand if names collide.
  */
object NativeAsOf {
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    GraftExprBridge.ensureStrategy(spark, new AsOfJoinStrategy)
    GraftExprBridge.ensureOptimization(spark,
      graft.expressions.AsOfJoinPushdown)
    val lPlan = GraftExprBridge.analyzed(left)
    val rAnalyzed = GraftExprBridge.analyzed(right)
    // Self-join hygiene: the analyzer's DeduplicateRelations only rewrites
    // nodes it knows (Join etc.), so when both sides read the same source
    // the raw plans share exprIds and optimizer rules (column pruning)
    // mis-resolve across sides. Re-alias every right column to fresh
    // exprIds before building the node.
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rAnalyzed.outputSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rAnalyzed.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          rAnalyzed)
      else rAnalyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column '$n' not found on $side side " +
          s"(have: ${p.output.map(_.name).mkString(", ")})"))
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _, "left")), keys.map(attr(rPlan, _, "right")),
      attr(lPlan, leftTsCol, "left"), attr(rPlan, rightTsCol, "right"),
      forward)
    GraftExprBridge.ofRows(spark, node)
  }
}
