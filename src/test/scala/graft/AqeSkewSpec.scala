package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime skew handling: AQE must split a pathologically hot join key
  * into multiple tasks (the zero-code-change complement to the explicit
  * salting in [[graft.operators.SkewJoin]]). Asserted on the FINAL
  * adaptive plan, because skew handling only exists at runtime.
  */
class AqeSkewSpec extends GraftSuite {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val dir = Files.createTempDirectory("graft_skew").toString
    // one white-hot key (100k rows) + 50 cold keys; written to parquet so
    // sizes are real (in-memory LocalRelation bypasses AQE estimation)
    spark.range(100000).select(lit(0L).as("k"), $"id".as("payload"))
      .union(spark.range(2500)
        .select(($"id" % 50 + 1).as("k"), $"id".as("payload")))
      .write.parquet(s"$dir/big")
    spark.range(51).select($"id".as("k"), ($"id" * 10).as("dim"))
      .write.parquet(s"$dir/small")

    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val j = spark.read.parquet(s"$dir/big")
        .join(spark.read.parquet(s"$dir/small"), "k")
      // collect() executes THIS QueryExecution (count() would build its
      // own), so the adaptive plan below is the final one
      assert(j.collect().length === 102500)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE skew split is MEASURED: the hot partition becomes many " +
      "tasks (partition counts recorded in BASELINE.md)") {
    // the quantified version of the marker assertion above: run the
    // same skewed join with skew handling OFF and ON and read the
    // shuffle-read partition specs from the FINAL adaptive plan — the
    // hot key's single reduce partition must fan out into multiple
    // PartialReducer slices, which is exactly what un-straggles a
    // q63-style hot-key join at 100 TB without code changes
    val dir = Files.createTempDirectory("graft_skew_m").toString
    spark.range(200000).select(lit(0L).as("k"), $"id".as("payload"))
      .union(spark.range(2500)
        .select(($"id" % 50 + 1).as("k"), $"id".as("payload")))
      .write.parquet(s"$dir/big")
    spark.range(51).select($"id".as("k"), ($"id" * 10).as("dim"))
      .write.parquet(s"$dir/small")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val keys = confs.map(_._1) :+ "spark.sql.adaptive.skewJoin.enabled"
    val prev = keys.map(k => k -> spark.conf.get(k))
    def partitionSpecCounts(skew: Boolean): Seq[Int] = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      val j = spark.read.parquet(s"$dir/big")
        .join(spark.read.parquet(s"$dir/small"), "k")
      assert(j.collect().length === 202500)
      val finalPlan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // QueryStageExec nodes are LEAVES whose subtree lives in .plan —
      // a plain TreeNode collect never descends into them
      def reads(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[Int] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          reads(q.plan)
        case r: org.apache.spark.sql.execution.adaptive
            .AQEShuffleReadExec =>
          r.partitionSpecs.size +: r.children.flatMap(reads)
        case other => other.children.flatMap(reads)
      }
      reads(finalPlan)
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val off = partitionSpecCounts(skew = false)
      val on = partitionSpecCounts(skew = true)
      // without skew handling (and coalescing off) no AQE read wrapper
      // is inserted at all — every reduce task reads exactly one of the
      // static partitions; with skew handling the join's reads grow by
      // the split slices of the hot partition
      val staticParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val offMax = if (off.isEmpty) staticParts else off.max
      assert(on.nonEmpty, "no AQEShuffleRead in the skew=on final plan")
      assert(on.max > offMax,
        s"skew split did not add partition slices: off=$off on=$on")
      info(s"shuffle-read partition specs: static=$staticParts " +
        s"off=$off on=$on")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("writeParquetSized bounds rows per file") {
    val dir = Files.createTempDirectory("graft_sized").toString
    val df = spark.range(10000).toDF("id")
    graft.io.Sinks.writeParquetSized(df, s"$dir/out",
      expectedRows = 10000, targetRowsPerFile = 1000)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 10, s"expected >=10 files, got ${files.length}")
    // no file exceeds the target
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 1000, s"${f.getName} has $n rows")
    }
    assert(spark.read.parquet(s"$dir/out").count() === 10000)
  }
}
