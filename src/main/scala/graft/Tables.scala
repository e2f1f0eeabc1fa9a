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
  /** events.parquet has shipped `ts` under three physical types across
    * testdata generations: parquet TIMESTAMP(NANOS) (read as long via the
    * legacy conf, since the vectorized reader rejects nanos), plain
    * TIMESTAMP(MICROS) without UTC adjustment (Spark reads TIMESTAMP_NTZ),
    * and epoch-millis int64. All three normalize to one logical contract —
    * a session-zone TimestampType column — by dispatching on the type
    * actually read, so every downstream query sees the same `ts` no matter
    * which generation of testdata is on disk. The session zone is UTC
    * everywhere (Main/Verify/Bench/specs), so the NTZ→TZ cast is
    * value-preserving.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long generation: integer div, no double round-trip
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
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
