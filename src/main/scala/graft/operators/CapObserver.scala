package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-extra-pass logging for bucket-occupancy caps: the capped-bucket
  * counts are attached to the plan as a `CollectMetrics` node
  * (`Dataset.observe`), so they are computed during the SAME job that
  * builds the candidates — no second scan, no eager `count()` inside an
  * operator — and a session-level [[QueryExecutionListener]] logs them
  * after each action that touched a capped operator.
  */
object CapObserver {

  private val seq = new AtomicLong()
  // Weak keys: a GC'd session releases its entry, so a NEW session that
  // happens to reuse the old identity hash still gets a listener (keying
  // on identityHashCode strings both leaked entries and could silently
  // skip registration after such a reuse).
  private val sessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Attach capped-bucket metrics to a per-bucket size DataFrame (one row
    * per bucket, occupancy in column `n`). Metric names are unique per
    * call so several capped operators can share one query plan. */
  def observeCapped(sizes: DataFrame, tag: String, maxBucket: Int): DataFrame = {
    ensureListener(sizes)
    sizes.observe(s"graft_cap_${tag}_${seq.incrementAndGet()}",
      sum(when(col("n") > maxBucket, 1L).otherwise(0L)).as("capped_buckets"),
      sum(when(col("n") > maxBucket, col("n")).otherwise(0L)).as("capped_rows"),
      max(col("n")).as("max_occupancy"),
      lit(maxBucket.toLong).as("max_bucket"))
  }

  private def ensureListener(df: DataFrame): Unit = {
    val spark = df.sparkSession
    if (sessions.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            // sum()/max() over ZERO observed rows (empty corpus) yield
            // null metrics — read boxed and null-guard, never unbox
            def metric(col: String): Long =
              Option(row.getAs[java.lang.Long](col)).map(_.longValue)
                .getOrElse(0L)
            if (name.startsWith("graft_cap_") && metric("capped_buckets") > 0L)
              log.warn(s"$name: capped ${metric("capped_buckets")} " +
                s"bucket(s) holding ${metric("capped_rows")} rows " +
                s"(max occupancy ${metric("max_occupancy")} > " +
                s"cap ${metric("max_bucket")}) — oversized buckets " +
                "degraded to star candidates around their min-id representative")
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    }
  }
}
