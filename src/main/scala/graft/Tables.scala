package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor directory.
  * All queries take the directory as a parameter so the same code runs at
  * sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) — and, on a real
  * cluster, against an arbitrarily large partitioned dataset: nothing here
  * assumes single-file input.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read nanos as long and convert to a real
    * TimestampType column (integer `div` — no double round-trip, so no
    * sub-microsecond precision loss).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** SQL surface: registers every table as a temp view (events with the
    * nanos→timestamp conversion applied) and the engine's native SQL
    * functions, so the whole dataset is queryable via `spark.sql` —
    * including `array_cosine` inside plain SQL. */
  def createViews(s: SparkSession, d: String): Unit = {
    names.foreach {
      case "events" => events(s, d).createOrReplaceTempView("events")
      case n        => load(s, d, n).createOrReplaceTempView(n)
    }
    graft.expressions.ArrayCosine.register(s)
  }
}
