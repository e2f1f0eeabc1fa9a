package graft

import org.apache.spark.sql.functions._

import graft.engine.{ClusterEngine, EngineConf}

/** Scale experiment: cluster the same events data with increasing segment
  * counts (1×5 → ~1000×5 buckets) through the one-shuffle backend and
  * print per-run timings as one JSON line. The point being measured: cost
  * is a function of DATA SIZE, not SEGMENT COUNT (the reference's cost is
  * linear in segment count — O(segments) driver jobs).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Main.session()
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_sec", unix_timestamp($"ts").cast("double"))
      .persist()
    ev.count() // materialize once; probe measures engine cost only
    val timings = Seq(1, 10, 50, 100, 200).map { buckets =>
      val bucketed = ev.withColumn("bucket",
        ($"user_id" % buckets).cast("string"))
      val conf = EngineConf("event_type", "bucket", "value", "ts_sec",
        fixedK = Some(3), iterNum = 1, seed = 42L)
      val t0 = System.nanoTime()
      val n = ClusterEngine.run(bucketed, conf).count()
      val secs = (System.nanoTime() - t0) / 1e9
      s""""segments_$n":$secs"""
    }
    println(timings.mkString("{", ",", "}"))
    spark.stop()
  }
}
