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
  /** events.parquet has shipped `ts` under several physical types across
    * testdata generations: parquet TIMESTAMP(NANOS) (read as long via the
    * legacy conf, since the vectorized reader rejects nanos), plain
    * TIMESTAMP(MICROS) without UTC adjustment (Spark reads TIMESTAMP_NTZ),
    * UTC-adjusted TIMESTAMP, and raw int64 epoch ticks (nanos, micros or
    * millis — type-indistinguishable, so the unit is resolved by
    * magnitude in [[normalizeTs]]). All normalize to one logical
    * contract — a session-zone TimestampType column — by dispatching on
    * the type actually read, so every downstream query sees the same `ts`
    * no matter which generation of testdata is on disk. The session zone
    * is UTC everywhere (Main/Verify/Bench/specs), so the NTZ→TZ cast is
    * value-preserving.
    *
    * The legacy nanosAsLong conf is scoped: it is restored after the load
    * unless the generation actually read as int64 — in that case the conf
    * must stay set through execution of the (lazy) returned frame, since
    * a TIMESTAMP(NANOS) footer is re-converted at scan time and would
    * throw without it.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType != LongType) prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
    normalizeTs(raw)
  }

  /** The single ts-normalization dispatch shared by the batch loader and
    * [[graft.streaming.EventStream.source]] — one code path so the
    * batch/stream contract cannot drift.
    *
    * int64 ticks are disambiguated by magnitude; the bands are unit-
    * consistent for any instant between ~1973 and ~5000 CE:
    * abs ≥ 1e17 → nanos (1e17 ns ≈ 1973; micros would be year 5138+),
    * abs ≥ 1e14 → micros (1e14 µs ≈ 1973), else → millis (1e14 ms ≈ year
    * 5138). Any other ts type fails fast here rather than deep inside
    * query code.
    */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // integer arithmetic throughout — no double round-trip
        raw.withColumn("ts", timestamp_micros(expr(
          "CASE WHEN abs(ts) >= 100000000000000000 THEN ts div 1000 " +
          "WHEN abs(ts) >= 100000000000000 THEN ts " +
          "ELSE ts * 1000 END")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other; expected int64 epoch " +
          "ticks, TIMESTAMP_NTZ, or TIMESTAMP")
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
