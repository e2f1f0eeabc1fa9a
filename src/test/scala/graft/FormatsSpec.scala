package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: ORC, CSV, JSON round-trip
  * the same frame losslessly; MERGE-style upsert emulation. */
class FormatsSpec extends GraftSuite {

  private lazy val base = Tables.customer(spark, sf)
    .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  test("orc / csv / json round-trips preserve the data") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    base.write.mode("overwrite").orc(s"$dir/orc")
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    base.write.mode("overwrite").json(s"$dir/json")

    val orc = spark.read.orc(s"$dir/orc")
    val csv = spark.read.option("header", "true")
      .schema(base.schema).csv(s"$dir/csv")
    val json = spark.read.schema(base.schema).json(s"$dir/json")
    for (df <- Seq(orc, csv, json)) {
      assert(df.count() === base.count())
      assert(df.exceptAll(base).count() === 0, df.schema.simpleString)
    }
  }

  test("parquet schema evolution: mergeSchema unifies an added column") {
    // the 100 TB ingest reality: batch N+1 ships a column batch N never
    // had; mergeSchema must surface the union schema with NULLs for the
    // old files, and a plain read pinned to the old schema must still
    // work (no rewrite of historical data)
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_evo").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/b=0")
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score")
      .write.parquet(s"$dir/b=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("b", "id", "score", "v"))
    val rows = merged.select($"id", $"score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) === None && rows(4L) === Some(0.7))
    // old-schema read of the union dir still answers old-schema queries
    val pinned = spark.read
      .schema("id bigint, v string").parquet(s"$dir/b=0", s"$dir/b=1")
    assert(pinned.count() === 4)
  }

  test("upsertByKey: updates replace, inserts append, others untouched") {
    val s = spark
    import s.implicits._
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "x")
    val updates = Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("k", "v", "x")
    val merged = graft.io.Sinks.upsertByKey(existing, updates, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(merged.toSeq === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }
}
