package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Input-side operators (SURVEY.md §2.1 S1–S4).
  *
  * The reference reads header+inferSchema CSV from HDFS through a py4j
  * gateway (`/root/reference/scripts/preprocess.py:31-71`); here the
  * Hadoop FileSystem API is a direct JVM call. PERMISSIVE mode plus a
  * corrupt-record quarantine column covers its dirty-data behavior (BOM
  * header, 17 shifted rows, `14E+31` customer — FIXTURES.md).
  */
object Sources {

  val CorruptRecordCol = "_corrupt_record"

  /** S1: CSV scan. With an explicit schema, malformed rows land in
    * [[CorruptRecordCol]] instead of being silently truncated. */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptRecordCol)
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  /** JSONL scan — the training-data interchange format (one JSON doc
    * per line): PERMISSIVE with the same corrupt-record quarantine
    * contract as [[readCsv]] — a malformed line lands whole in
    * [[CorruptRecordCol]] (schema'd reads) instead of killing the read
    * or silently vanishing; `splitQuarantine` separates clean rows
    * from the evidence. Explicit schema recommended at scale (schema
    * inference is an extra full pass). */
  def readJsonl(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptRecordCol)
    schema match {
      case Some(s) =>
        // the quarantine column must be part of the read schema or
        // Spark drops corrupt lines silently under PERMISSIVE
        val withQ =
          if (s.fieldNames.contains(CorruptRecordCol)) s
          else s.add(CorruptRecordCol, "string")
        base.schema(withQ).json(path)
      case None => base.json(path)
    }
  }

  /** (clean rows, quarantined rows) from a [[readJsonl]]/[[readCsv]]
    * frame — the corrupt column is dropped from the clean side and the
    * raw line preserved on the quarantine side for the audit trail.
    *
    * Spark contract: an action on the QUARANTINE side that prunes to
    * the corrupt column alone (e.g. `bad.count()` straight off the
    * raw file) raises QUERY_ONLY_CORRUPT_RECORD_COLUMN — cache the
    * parsed frame first, or write it out and count the artifact (the
    * `jsonl-ingest` verb does the latter; JsonlEdgeSpec pins the
    * cached recipe). */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) =
    if (!df.columns.contains(CorruptRecordCol)) (df, df.limit(0))
    else {
      import org.apache.spark.sql.functions.col
      (df.filter(col(CorruptRecordCol).isNull).drop(CorruptRecordCol),
        df.filter(col(CorruptRecordCol).isNotNull))
    }

  /** ORC scan — the other columnar format lake corpora arrive in.
    * Spark's native vectorized ORC reader has the same pushdown
    * surface as parquet: predicates and column pruning reach the scan
    * (IoSpec asserts PushedFilters + a pruned readSchema on the
    * physical plan), so an ORC-resident corpus pays shard-pruned IO,
    * not a full read. No schema parameter: ORC files carry their own
    * typed schema (unlike [[readCsv]]/[[readJsonl]] there is no
    * permissive text-parse stage to quarantine). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S2: existence probe before read (`preprocess.py:50-56`). */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** S3: at-most-once input consumption — delete after a successful run
    * (`cluster.py:292-308`). */
  def delete(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), false)

  /** S4: ingest down-sampling (`preprocess.py:59-63`): when the row count
    * exceeds `limit`, Bernoulli-sample fraction = limit/count. The
    * reference passes no seed (nondeterministic); we require one. */
  def downsample(df: DataFrame, limit: Long, seed: Long): DataFrame = {
    val n = df.count()
    if (n > limit) df.sample(withReplacement = false,
      fraction = limit.toDouble / n, seed = seed)
    else df
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
