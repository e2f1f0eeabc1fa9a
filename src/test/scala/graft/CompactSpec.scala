package graft

import org.apache.spark.sql.functions._

import graft.io.Sinks

/** Parquet-directory compaction ([[Sinks.compact]]): file-count
  * reduction with content identity, idempotence, and the mid-swap
  * crash recovery inherited from the streaming upsert sink. */
class CompactSpec extends GraftSuite {
  import spark.implicits._

  /** Order-invariant content checksum + row count of a directory. */
  private def fingerprint(dir: String): (Long, Long) = {
    val r = spark.read.parquet(dir)
      .agg(count(lit(1)),
        sum(pmod(xxhash64(col("doc_id"), col("text")),
          lit(1000000007L))))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).toSeq

  test("compact: many small files fold into few, content identical, " +
      "re-compaction is a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact").toString + "/t"
    // simulate ingest accretion: many tiny appends
    val docs = Tables.documents(spark, sf)
    (0 until 6).foreach { i =>
      docs.filter($"doc_id" % 6 === i).repartition(4)
        .write.mode("append").parquet(dir)
    }
    val before = fingerprint(dir)
    val nBefore = partFiles(dir).length
    assert(nBefore >= 20, s"fixture should be fragmented, got $nBefore")
    val (b, a) = Sinks.compact(spark, dir, targetFileBytes = 4L * 1024 * 1024)
    assert(b === nBefore && a < b, s"no reduction: $b -> $a")
    assert(partFiles(dir).length === a)
    assert(fingerprint(dir) === before, "compaction changed content")
    // already compact: returns early without rewriting
    val modBefore = partFiles(dir).map(_.lastModified()).sorted
    val (b2, a2) = Sinks.compact(spark, dir, targetFileBytes = 4L * 1024 * 1024)
    assert(b2 === a && a2 === a)
    assert(partFiles(dir).map(_.lastModified()).sorted === modBefore,
      "no-op compaction rewrote files")
  }

  test("compact: a crash between the two swap renames heals on the " +
      "next run (recoverStore protocol)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact2").toString
    val dir = s"$root/t"
    val docs = Tables.documents(spark, sf).limit(200)
    docs.repartition(8).write.parquet(dir)
    val before = fingerprint(dir)
    // simulate: compacted tmp fully committed, original renamed away,
    // crash before tmp -> dir (the only window where dir is missing)
    spark.read.parquet(dir).coalesce(1)
      .write.parquet(dir + "__tmp")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    // next compaction first recovers the committed tmp, then compacts
    val (b, a) = Sinks.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(a <= b)
    assert(fingerprint(dir) === before, "recovery lost rows")
    assert(!new java.io.File(dir + "__tmp").exists())
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("compact: a file landing mid-compaction aborts the swap and " +
      "keeps every row") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact3").toString
    val dir = s"$root/t"
    val docs = Tables.documents(spark, sf)
    (0 until 4).foreach { i =>
      docs.filter($"doc_id" % 4 === i).repartition(3)
        .write.mode("append").parquet(dir)
    }
    val late = docs.limit(10)
    val e = intercept[IllegalStateException] {
      Sinks.compactHooked(spark, dir,
        targetFileBytes = 4L * 1024 * 1024,
        // a concurrent writer appends inside the snapshot→swap window
        beforeSwap = () => late.coalesce(1)
          .write.mode("append").parquet(dir))
    }
    assert(e.getMessage.contains("changed during compaction"))
    // NOTHING lost: original files + the late append are all readable,
    // and the aborted tmp output was cleaned up
    assert(spark.read.parquet(dir).count()
      === docs.count() + late.count())
    assert(!new java.io.File(dir + "__tmp").exists())
    assert(!new java.io.File(dir + "__old").exists())
  }
}
