package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** [[Tables.events]] / [[graft.streaming.EventStream.source]] contract:
  * `ts` normalizes to a session-zone TimestampType column regardless of
  * which physical type the testdata generation shipped. The driver has
  * regenerated events.parquet across rounds with three different `ts`
  * encodings (TIMESTAMP(NANOS) → read as long, epoch-like int64,
  * TIMESTAMP(MICROS) without UTC adjustment → TIMESTAMP_NTZ, and plain
  * UTC-adjusted TIMESTAMP) — a loader pinned to any single one breaks
  * the entire events query family on the next regeneration, which is
  * exactly what round 7's restart surfaced. Each generation here is
  * synthesized on disk and must load to identical values.
  */
class TablesSpec extends GraftSuite {
  import spark.implicits._

  // one wall-clock instant, expressed per generation
  private val ms = 1700000000123L

  private def writeGen(build: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("graft_events_gen").toString
    val base = Seq((1L, 7L, "click", 0.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    build(base).write.mode("overwrite").parquet(s"$dir/events.parquet")
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

  test("events ts: TIMESTAMP_NTZ generation normalizes to timestamp") {
    val dir = writeGen(_.withColumn("ts",
      timestamp_micros(lit(ms * 1000L)).cast(TimestampNTZType)))
    assert(loaded(dir)._2 === ms)
  }

  test("events ts: UTC-adjusted timestamp generation passes through") {
    val dir = writeGen(_.withColumn("ts", timestamp_micros(lit(ms * 1000L))))
    assert(loaded(dir)._2 === ms)
  }

  test("streaming source applies the same dispatch as the batch loader") {
    val dir = writeGen(_.withColumn("ts",
      timestamp_micros(lit(ms * 1000L)).cast(TimestampNTZType)))
    val src = graft.streaming.EventStream.source(spark, dir)
    assert(src.schema("ts").dataType === TimestampType)
    val q = src.writeStream.format("memory").queryName("tables_spec_src")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("tables_spec_src")
      .select(unix_millis(col("ts"))).head().getLong(0)
    assert(got === ms)
  }
}
