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
