package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** [[Tables.events]] / [[graft.streaming.EventStream.source]] contract:
  * `ts` normalizes to a session-zone TimestampType column regardless of
  * which physical type the testdata generation shipped. The driver has
  * regenerated events.parquet across rounds with different `ts`
  * encodings — the five covered here are TIMESTAMP(NANOS)-read-as-long /
  * raw int64 nanos, int64 micros, int64 millis (the three tick units are
  * type-indistinguishable and resolved by magnitude), TIMESTAMP(MICROS)
  * without UTC adjustment → TIMESTAMP_NTZ, and plain UTC-adjusted
  * TIMESTAMP. A loader pinned to any single one breaks the entire events
  * query family on the next regeneration, which is exactly what round
  * 7's restart surfaced. Each generation here is synthesized on disk and
  * must load to identical values.
  *
  * The streaming source must additionally accept BOTH physical layouts
  * of the table: the driver ships `events.parquet` as a flat file, while
  * `df.write.parquet` produces a directory of part files — round 7's red
  * test was the directory layout silently matching nothing through
  * `pathGlobFilter`.
  */
class TablesSpec extends GraftSuite {
  import spark.implicits._

  // one wall-clock instant, expressed per generation
  private val ms = 1700000000123L

  private def base: DataFrame =
    Seq((1L, 7L, "click", 0.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")

  /** Directory-shaped table: `$dir/events.parquet/part-*.parquet`. */
  private def writeGen(build: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("graft_events_gen").toString
    build(base).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Flat-file table: `$dir/events.parquet` is a single parquet file —
    * the driver's testdata layout. Written via a staging directory, then
    * the single part file is moved into place. */
  private def writeGenFlat(build: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("graft_events_flat").toString
    val stage = s"$dir/_stage"
    build(base).coalesce(1).write.mode("overwrite").parquet(stage)
    val part: Path = Files.list(Paths.get(stage)).filter(p =>
      p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.move(part, Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  private def loaded(dir: String): (String, Long) = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    val row = df.select(unix_millis(col("ts"))).head()
    (dir, row.getLong(0))
  }

  test("events ts: nanos-as-long generation normalizes to timestamp") {
    val dir = writeGen(_.withColumn("ts", lit(ms * 1000000L)))
    assert(loaded(dir)._2 === ms)
  }

  test("events ts: epoch-micros int64 generation normalizes to timestamp") {
    val dir = writeGen(_.withColumn("ts", lit(ms * 1000L)))
    assert(loaded(dir)._2 === ms)
  }

  test("events ts: epoch-millis int64 generation normalizes to timestamp") {
    val dir = writeGen(_.withColumn("ts", lit(ms)))
    assert(loaded(dir)._2 === ms)
  }

  test("events ts: TIMESTAMP_NTZ generation normalizes to timestamp") {
    val dir = writeGen(_.withColumn("ts",
      timestamp_micros(lit(ms * 1000L)).cast(TimestampNTZType)))
    assert(loaded(dir)._2 === ms)
  }

  test("events ts: UTC-adjusted timestamp generation passes through") {
    val dir = writeGen(_.withColumn("ts", timestamp_micros(lit(ms * 1000L))))
    assert(loaded(dir)._2 === ms)
  }

  test("events ts: an unsupported ts type fails fast at load") {
    val dir = writeGen(_.withColumn("ts", lit("2023-11-14T22:13:20Z")))
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("StringType"))
  }

  private def streamOnce(dir: String, name: String): Long = {
    val src = graft.streaming.EventStream.source(spark, dir)
    assert(src.schema("ts").dataType === TimestampType)
    val q = src.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).select(unix_millis(col("ts"))).head().getLong(0)
  }

  test("streaming source: directory-shaped events.parquet streams " +
      "through the batch dispatch") {
    val dir = writeGen(_.withColumn("ts",
      timestamp_micros(lit(ms * 1000L)).cast(TimestampNTZType)))
    assert(streamOnce(dir, "tables_spec_src_dir") === ms)
  }

  test("streaming source: flat-file events.parquet (driver layout) " +
      "streams through the batch dispatch") {
    val dir = writeGenFlat(_.withColumn("ts", lit(ms)))
    assert(streamOnce(dir, "tables_spec_src_flat") === ms)
  }
}
