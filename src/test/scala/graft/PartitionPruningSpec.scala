package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partitioned dataset layout: writing a corpus partitioned by a filter
  * column makes later scans read only matching directories (partition
  * pruning) — at 100 TB, the difference between scanning a language's
  * slice and scanning the world. */
class PartitionPruningSpec extends GraftSuite {

  test("write partitioned by lang; filtered read prunes partitions") {
    val out = Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val en = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)

    // pruning actually works: the scan only touches the en directory
    val allLangs = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(en.count() === allLangs)
    val scannedFiles = en.queryExecution.executedPlan.collectLeaves()
      .head.toString()
    assert(!scannedFiles.contains("lang=de"), scannedFiles)
  }

  test("coalesced write bounds output file count (small-files control)") {
    val out = Files.createTempDirectory("graft_coal").toString
    Tables.lineitem(spark, sf).repartition(16)
      .coalesce(2).write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 2)
  }
}
