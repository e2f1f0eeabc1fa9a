package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler: times labeled sub-steps of the heaviest bench
  * queries so optimization targets the real cost, not a guess. Not part of
  * the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile"
  */
object Profile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.sparkLocalDir)
      // serialized sort writer for every exchange (the 100 TB writer;
      // see SparkTuning — bypass's per-reduce file concat mmap-thrashed
      // 32-core runs)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        SparkTuning.bypassMergeThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    // ---- q31 internals: runMl on lineitem[returnflag=A]
    val li = time("lineitem read+count")(
      { val d = Tables.lineitem(spark, sfDir); d.count(); d })
    val scaled = time("scaleSegments") {
      val s = graft.preprocess.Scaling.scaleSegments(
        li.filter($"l_returnflag" === "A"), "l_returnflag", "l_linestatus",
        Seq("l_quantity", "l_extendedprice"))
      s.count(); s
    }
    val assembled = time("assemble+persist") {
      val a = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array(
          graft.preprocess.Scaling.scaledName("l_quantity"),
          graft.preprocess.Scaling.scaledName("l_extendedprice")))
        .setOutputCol("features").transform(scaled).persist()
      a.count(); a
    }
    val model = time("spark.ml KMeans fit k=3") {
      new org.apache.spark.ml.clustering.KMeans()
        .setFeaturesCol("features").setK(3).setSeed(7L).fit(assembled)
    }
    val pred = time("transform+persist") {
      val p = model.transform(assembled).persist(); p.count(); p
    }
    time("distinct prediction count")(
      pred.select("prediction").distinct().count())
    time("ClusteringEvaluator silhouette") {
      new org.apache.spark.ml.evaluation.ClusteringEvaluator()
        .setPredictionCol("prediction").setFeaturesCol("features")
        .evaluate(pred)
    }
    time("stats agg")(pred.groupBy($"prediction")
      .agg(count(lit(1)),
        avg(col(graft.preprocess.Scaling.scaledName("l_quantity"))))
      .collect())
    pred.unpersist(); assembled.unpersist()

    // ---- q32 internals: GMM fit cost
    val ev = time("events read") {
      val e = Tables.events(spark, sfDir)
        .filter($"event_type" === "purchase")
        .withColumn("user_bucket", ($"user_id" % 2).cast("string"))
        .withColumn("ts_sec", unix_timestamp($"ts").cast("double"))
      println(s"[profile] purchase rows: ${e.count()}")
      e
    }
    val evScaled = graft.preprocess.Scaling.scaleSegments(ev,
      "event_type", "user_bucket", Seq("value", "ts_sec"))
    val evAsm = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array(
        graft.preprocess.Scaling.scaledName("value"),
        graft.preprocess.Scaling.scaledName("ts_sec")))
      .setOutputCol("features").transform(evScaled)
      .filter($"user_bucket" === "0").persist()
    time("evAsm count")(evAsm.count())
    time("spark.ml GMM fit k=2 (1 segment)") {
      new org.apache.spark.ml.clustering.GaussianMixture()
        .setFeaturesCol("features").setK(2).setSeed(7L).fit(evAsm)
    }
    evAsm.unpersist()

    // ---- q85 internals
    // ---- native vs union+window as-of at scale
    val evAll = Tables.events(spark, sfDir)
    val purchases = evAll.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = evAll.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"))
    time("as-of union+window") {
      graft.operators.AsOfJoin.backward(purchases,
        clicks.withColumnRenamed("c_ts", "ts"),
        Seq("user_id"), "ts", "ts").count()
    }
    time("as-of native plan") {
      graft.plans.NativeAsOf.join(purchases, clicks, Seq("user_id"),
        "ts", "c_ts").count()
    }

    val docs = Tables.documents(spark, sfDir)
    time("minhash idx only") {
      graft.operators.Dedup.minhashIndex(docs, "doc_id", "text").count()
    }
    time("minhash cands only") {
      graft.operators.Dedup.lshCandidates(
        graft.operators.Dedup.minhashIndex(docs, "doc_id", "text"),
        bands = 8, numHashes = 32).count()
    }
    val pairs = time("minhashNearDups pairs") {
      val p = graft.operators.Dedup.minhashNearDups(
        docs, "doc_id", "text", threshold = 0.5).persist()
      println(s"[profile] pairs: ${p.count()}")
      p
    }
    time("connectedComponents") {
      graft.operators.Dedup.connectedComponents(pairs).count()
    }
    spark.stop()
  }
}
