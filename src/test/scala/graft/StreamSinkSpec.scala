package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The streaming MERGE sink: micro-batches upsert by key into a parquet
  * store (foreachBatch + upsertByKey + atomic dir swap). Three files
  * with overlapping key ranges stream one-per-trigger; the store must
  * converge to the keyed merge with later batches overwriting earlier
  * ones.
  */
class StreamSinkSpec extends GraftSuite {
  import spark.implicits._

  test("multi-batch replay of the hourly aggregation equals batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_mb").toString
    // split events into 4 time-ordered files so the stream sees 4
    // micro-batches; the watermark logic must still converge to the
    // batch answer in complete mode
    val ev = Tables.events(spark, sf).orderBy($"ts")
    val n = ev.count()
    val parts = 4
    val slice = (n / parts + 1).toInt
    val rows = ev.collect()
    rows.grouped(slice).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toSeq, 1), ev.schema)
        .write.parquet(s"$root/f$i")
    }
    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/*")
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start").as("hr_ms"), $"event_type", $"n")
    val q = stream.writeStream
      .outputMode("complete").format("memory").queryName("mb_hourly")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("mb_hourly")
    val batch = Tables.events(spark, sf)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start").as("hr_ms"), $"event_type", $"n")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming upsert sink converges to the keyed merge of all batches") {
    val root = Files.createTempDirectory("graft_ssink").toString
    val in = s"$root/in"
    // slice i marks its rows with batch=i; ranges overlap on purpose
    def slice(ids: Range, marker: Int) =
      ids.map(i => (i.toLong, marker)).toDF("id", "batch")
    slice(0 until 1000, 0).write.parquet(s"$in/f0")
    slice(500 until 1500, 1).write.parquet(s"$in/f1")
    slice(1000 until 2000, 2).write.parquet(s"$in/f2")

    val schema = spark.read.parquet(s"$in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    val q = graft.io.Sinks.streamUpsertByKey(stream, s"$root/store",
      Seq("id"), s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()

    val store = spark.read.parquet(s"$root/store")
    assert(store.count() === 2000)
    assert(store.select($"id").distinct().count() === 2000)
    // disjoint ranges keep their only writer...
    assert(store.filter($"id" < 500 && $"batch" =!= 0).count() === 0)
    assert(store.filter($"id" >= 1500 && $"batch" =!= 2).count() === 0)
    // ...and overlaps resolve to the later batch (files stream in order)
    assert(store.filter($"id" >= 500 && $"id" < 1000 && $"batch" =!= 1)
      .count() === 0)
    assert(store.filter($"id" >= 1000 && $"id" < 1500 && $"batch" =!= 2)
      .count() === 0)
  }

  test("upsert store recovers after a crash at any point of the swap") {
    val root = Files.createTempDirectory("graft_recover").toString
    val storePath = s"$root/store"
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeAt(path: String, marker: Int): Unit =
      Seq((1L, marker)).toDF("id", "batch")
        .write.mode("overwrite").parquet(path)
    def markerAt(path: String): Int =
      spark.read.parquet(path).select($"batch").first().getInt(0)

    // crash BETWEEN rename(store, old) and rename(tmp, store): the store
    // is gone, __old holds the previous state, __tmp the newly merged
    // state — recovery must reinstate __tmp (the newest complete state)
    writeAt(s"${storePath}__old", 1)
    writeAt(s"${storePath}__tmp", 2)
    graft.io.Sinks.recoverStore(fs, storePath)
    assert(markerAt(storePath) === 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${storePath}__tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${storePath}__old")))

    // crash with only __old left (tmp already promoted then store lost is
    // impossible; this models rename(store, old) then driver death before
    // the tmp write finished in a REDELIVERED batch): fall back to __old
    fs.delete(new org.apache.hadoop.fs.Path(storePath), true)
    writeAt(s"${storePath}__old", 3)
    graft.io.Sinks.recoverStore(fs, storePath)
    assert(markerAt(storePath) === 3)

    // store present: recovery is a no-op and stale scratch is left for
    // the normal path to clobber
    writeAt(s"${storePath}__tmp", 9)
    graft.io.Sinks.recoverStore(fs, storePath)
    assert(markerAt(storePath) === 3)

    // an UNCOMMITTED __tmp (no _SUCCESS — the write died mid-flight on a
    // first-ever batch) must NOT be promoted; __old wins instead
    fs.delete(new org.apache.hadoop.fs.Path(storePath), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"${storePath}__tmp"), true)
    writeAt(s"${storePath}__tmp", 4)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${storePath}__tmp/_SUCCESS"), false)
    writeAt(s"${storePath}__old", 5)
    graft.io.Sinks.recoverStore(fs, storePath)
    assert(markerAt(storePath) === 5)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${storePath}__tmp")))

    // uncommitted __tmp with NO fallback: nothing is promoted (the
    // checkpoint re-delivers the batch into an absent store)
    fs.delete(new org.apache.hadoop.fs.Path(storePath), true)
    writeAt(s"${storePath}__tmp", 6)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${storePath}__tmp/_SUCCESS"), false)
    graft.io.Sinks.recoverStore(fs, storePath)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(storePath)))
  }
}
