package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sketches}

/** DSIR importance resampling and the HLL sketch-artifact lifecycle. */
class DsirSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("dsir: target-language docs get higher importance weights") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 1024, seed = 42L)
    val byLang = docs.join(w, "doc_id")
      .groupBy($"lang").agg(avg($"log_weight").as("mw"))
      .as[(String, Double)].collect().toMap
    val others = byLang.filterNot(_._1 == "en").values
    assert(byLang("en") > others.max,
      s"en mean weight ${byLang("en")} should beat all of $byLang")
  }

  test("dsir: the replayable variant carries the same target tilt and " +
      "is partition-invariant") {
    def run(parts: Int) = Dsir.importanceWeightsReplayable(
        docs.repartition(parts), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = run(3)
    assert(w === run(8)) // exact decimal sums: bit-equal at any layout
    val lang = docs.select($"doc_id", $"lang")
      .as[(Long, String)].collect().toMap
    val byLang = w.toSeq.groupBy { case (id, _) => lang(id) }
      .map { case (l, v) => l -> v.map(_._2).sum / v.size }
    val others = byLang.filterNot(_._1 == "en").values
    assert(byLang("en") > others.max,
      s"replayable tilt missing: $byLang")
  }

  test("dsir: resampling tilts selection toward the target distribution") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 1024, seed = 42L)
    val sel = Dsir.resampleTopK(w, "doc_id", k = 100, seed = 7L)
    val selEn = sel.join(docs, "doc_id")
      .filter($"lang" === "en").count().toDouble / 100.0
    val corpusEn = docs.filter($"lang" === "en").count().toDouble /
      docs.count().toDouble
    assert(selEn > corpusEn,
      s"selected en fraction $selEn should exceed corpus $corpusEn")
  }

  test("dsir: weights and selection are partition-count invariant") {
    def run(parts: Int): Map[Long, Double] =
      Dsir.importanceWeights(docs.repartition(parts), "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 256, seed = 1L)
        .as[(Long, Double)].collect().toMap
    assert(run(3) === run(8))
  }

  test("dsir: selecting from the raw pool only excludes target docs " +
      "(the q133 / dsir-select caller discipline)") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 1024, seed = 42L)
    val raw = docs.filter($"lang" =!= "en").select($"doc_id")
    val sel = Dsir.resampleTopK(w.join(raw, "doc_id"), "doc_id",
      k = 100, seed = 7L)
    assert(sel.count() === 100)
    // no target doc occupies a selection slot
    assert(sel.join(docs, "doc_id").filter($"lang" === "en")
      .count() === 0)
  }

  test("dsir: k beyond the corpus keeps everything") {
    val w = Dsir.importanceWeights(docs.limit(20), "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 64, seed = 1L)
    assert(Dsir.resampleTopK(w, "doc_id", k = 1000, seed = 2L)
      .count() === w.count())
  }

  test("count-min: never undercounts, bound holds, per-source sketches " +
      "merge into the global one") {
    val toks = docs.select(explode(split($"text", " ")).as("t"))
    val (cms, n) = Sketches.countMinSketchOf(toks, "t")
    val exact = toks.groupBy($"t").count()
      .as[(String, Long)].collect().toMap
    val bound = math.ceil(0.001 * n).toLong
    exact.foreach { case (t, e) =>
      val est = cms.estimateCount(t)
      assert(est >= e, s"undercount on $t: $est < $e")
      assert(est - e <= bound, s"overcount beyond eps·N on $t")
    }
    // mergeability: sketch(A) ++ sketch(B) estimates like sketch(A∪B)
    val (ca, _) = Sketches.countMinSketchOf(
      docs.filter($"doc_id" % 2 === 0)
        .select(explode(split($"text", " ")).as("t")), "t")
    val (cb, _) = Sketches.countMinSketchOf(
      docs.filter($"doc_id" % 2 =!= 0)
        .select(explode(split($"text", " ")).as("t")), "t")
    ca.mergeInPlace(cb)
    exact.keys.take(50).foreach { t =>
      assert(ca.estimateCount(t) === cms.estimateCount(t),
        s"merged estimate differs on $t") }
  }

  test("sketches: append(A)+append(B) estimates like sketch(A∪B)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch").toString
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    Sketches.appendSketches(a, "lang", "doc_id", dir, batchId = 1L)
    Sketches.appendSketches(b, "lang", "doc_id", dir, batchId = 2L)
    val fromArtifact = Sketches.estimateFromArtifact(spark, dir)
      .select($"group", $"distinct_estimate")
      .as[(String, Long)].collect().toMap
    val direct = Sketches.groupSketches(docs, "lang", "doc_id")
      .select($"group", hll_sketch_estimate($"sketch"))
      .as[(String, Long)].collect().toMap
    assert(fromArtifact === direct)
    // Estimates are within HLL error of the exact per-group counts.
    val exact = docs.groupBy($"lang").agg(countDistinct($"doc_id"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(fromArtifact(g) - n).toDouble / n < 0.05,
        s"group $g estimate ${fromArtifact(g)} too far from $n") }
    // Batch bookkeeping rides along.
    val nb = Sketches.estimateFromArtifact(spark, dir)
      .select($"n_batches").distinct().as[Long].collect().toSeq
    assert(nb === Seq(2L))
  }

  test("streaming sketch ingest: artifact matches batch path, " +
      "checkpoint restart appends nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_sksteam").toString
    val srcDir = s"$root/src"
    val sketchDir = s"$root/sketch"
    val ckpt = s"$root/ckpt"
    def writeOne(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_onefile").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      new java.io.File(dest).getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dest))
    }
    writeOne(docs.filter($"doc_id" < 250), s"$srcDir/b1.parquet")
    writeOne(docs.filter($"doc_id" >= 250), s"$srcDir/b2.parquet")
    graft.streaming.SketchIngest.runToCompletion(spark, srcDir,
      sketchDir, ckpt)
    val streamed = Sketches.estimateFromArtifact(spark, sketchDir)
      .select($"group", $"distinct_estimate", $"n_batches")
      .as[(String, Long, Long)].collect().map(t => t._1 -> t).toMap
    // Two micro-batches landed per group that spans both halves.
    assert(streamed.values.exists(_._3 === 2L))
    // Exact per-group distinct ids are within HLL error.
    docs.groupBy($"source").agg(countDistinct($"doc_id"))
      .as[(String, Long)].collect().foreach { case (g, n) =>
        assert(math.abs(streamed(g)._2 - n).toDouble / n < 0.05) }
    // Restart with the same checkpoint: backlog already processed,
    // nothing appended.
    graft.streaming.SketchIngest.runToCompletion(spark, srcDir,
      sketchDir, ckpt)
    val after = Sketches.estimateFromArtifact(spark, sketchDir)
      .agg(sum($"n_batches")).head().getLong(0)
    assert(after === streamed.values.map(_._3).sum)
  }

  test("sketches: re-ingesting the same batch never double-counts") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch2").toString
    Sketches.appendSketches(docs, "lang", "doc_id", dir, batchId = 1L)
    val once = Sketches.globalEstimate(spark, dir)
    Sketches.appendSketches(docs, "lang", "doc_id", dir, batchId = 2L)
    val twice = Sketches.globalEstimate(spark, dir)
    // Union is max-per-register: the estimate may wobble within sketch
    // error across union shapes but can never approach 2× (a
    // double-count would read ~1000 here against 500 true distinct).
    assert(math.abs(twice - once).toDouble / once < 0.05,
      s"re-ingest moved estimate $once -> $twice")
  }

  test("sketches: replaying the SAME batch id is idempotent (exact " +
      "n_rows too, not just the estimate)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch3").toString
    Sketches.appendSketches(docs, "lang", "doc_id", dir, batchId = 1L)
    val before = Sketches.estimateFromArtifact(spark, dir)
      .select($"group", $"distinct_estimate", $"n_rows", $"n_batches")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // foreachBatch's at-least-once window: crash after the write,
    // before the checkpoint commit → the batch replays with the same id
    Sketches.appendSketches(docs, "lang", "doc_id", dir, batchId = 1L)
    val after = Sketches.estimateFromArtifact(spark, dir)
      .select($"group", $"distinct_estimate", $"n_rows", $"n_batches")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after === before) // overwrite-per-partition replaced, not dup'd
  }

  test("sketches: a legacy flat-layout artifact is rejected, not wedged") {
    // Pre-round-6 artifacts were flat parquet with batch_id as a data
    // column; one new-format batch beside them breaks partition
    // discovery for every future reader. The append must refuse the
    // directory up front with a migrate-or-rebuild message.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch_legacy").toString
    Sketches.groupSketches(docs, "lang", "doc_id")
      .withColumn("batch_id", lit(1L))
      .write.mode("overwrite").parquet(dir) // the legacy flat shape
    val e = intercept[IllegalArgumentException] {
      Sketches.appendSketches(docs, "lang", "doc_id", dir, batchId = 2L)
    }
    assert(e.getMessage.contains("flat data file"))
    // untouched: the legacy artifact still reads as it did
    assert(spark.read.parquet(dir).count() > 0)
    // and a clean partitioned dir still appends fine
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_sketch_clean").toString
    Sketches.appendSketches(docs, "lang", "doc_id", dir2, batchId = 1L)
    Sketches.appendSketches(docs, "lang", "doc_id", dir2, batchId = 2L)
    assert(Sketches.estimateFromArtifact(spark, dir2).count() > 0)
  }

  test("dsir gram stream: degenerate docs emit no spurious bigrams") {
    val d = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"))
      .toDF("doc_id", "text")
    val counts = Dsir.gramRows(d, "doc_id", "text", buckets = 64,
        seed = 1L)
      .groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    // 1 token → exactly its unigram (no self-duplicated "bigram");
    // empty text → ONE "" unigram (tokens()'s split contract), no
    // longer the doubled ""+"" the unguarded bigram branch emitted;
    // 2 tokens → 2 unigrams + 1 bigram
    assert(counts.get(1L) === Some(1L))
    assert(counts.get(2L) === Some(1L))
    assert(counts.get(3L) === Some(3L))
  }

  test("portable buckets are seedless by contract: non-zero seed throws " +
      "instead of being silently ignored") {
    val d = Seq((1L, "some text")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dsir.gramRows(d, "doc_id", "text", buckets = 64, seed = 7L,
        portable = true)
    }
    // seed = 0 is the documented portable form and still works
    // (2 unigrams + 1 bigram)
    assert(Dsir.gramRows(d, "doc_id", "text", buckets = 64, seed = 0L,
      portable = true).count() === 3L)
  }

  test("portable HLL: rho hand-check against a known md5") {
    // md5('hello') = 5d41402abc4b2a76... → bucket 0x5d = 93,
    // w = 0x41402abc (31 bits) → rho = 33 - 31 = 2
    val one = Seq("hello").toDF("k")
    val r = Sketches.hllRegisters(one, "k").collect()
    assert(r.length === 1)
    assert(r.head.getInt(0) === 93 && r.head.getInt(1) === 2)
  }

  test("portable HLL: registers are partition-invariant and duplicate-" +
      "insensitive; estimate lands within the 256-register error band") {
    val keys = Tables.orders(spark, sf).select($"o_orderkey")
    val regs = Sketches.hllRegisters(keys, "o_orderkey")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val shuffled = Sketches.hllRegisters(
        keys.repartition(11), "o_orderkey")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(regs === shuffled)
    val doubled = Sketches.hllRegisters(
        keys.union(keys), "o_orderkey")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(regs === doubled) // register-max: re-ingest is a no-op
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(keys, "o_orderkey"))
      .select($"est").head().getDouble(0)
    val exact = keys.distinct().count().toDouble
    // 3 sigma of 1.04/sqrt(256) ≈ 19.5%
    assert(math.abs(est - exact) / exact < 0.195,
      s"est $est vs exact $exact")
  }

  test("portable HLL: linear-counting branch engages on a tiny key set " +
      "and beats the raw estimate there") {
    val tiny = spark.range(20).select($"id".cast("string").as("k"))
    val row = Sketches.hllEstimate(Sketches.hllRegisters(tiny, "k"))
      .select($"lc_used", $"est", $"zero_regs").head()
    assert(row.getBoolean(0), "expected linear counting at n=20, m=256")
    assert(math.abs(row.getDouble(1) - 20.0) < 2.0,
      s"LC estimate ${row.getDouble(1)} should be near 20")
  }

  test("portable HLL: p=4 uses the exact small-m alpha (0.673), not " +
      "the asymptotic constant") {
    // 500 distinct keys over m=16 registers: every bucket is occupied
    // (P[empty] ≈ (15/16)^500 ≈ 1e-14), so the raw branch is exercised
    val keys = spark.range(500).select($"id".cast("string").as("k"))
    val regs = Sketches.hllRegisters(keys, "k", p = 4)
    val row = Sketches.hllEstimate(regs, p = 4)
      .select($"zero_regs", $"est").head()
    assert(row.getLong(0) === 0L, "all 16 buckets should be occupied")
    // rebuild the raw estimate by hand with the paper's m=16 constant
    val sum = regs.collect()
      .map(r => math.pow(2.0, -r.getInt(1))).sum
    val expected = math.round(0.673 * 16.0 * 16.0 / sum * 1e4) / 1e4
    assert(row.getDouble(1) === expected,
      s"est ${row.getDouble(1)} != hand 0.673-estimate $expected")
  }

  test("portable bloom: zero false negatives by construction; FPR " +
      "stays inside the sizing bound at this m/k") {
    val docs = Tables.documents(spark, sf)
    val eval = docs.filter($"doc_id" % 17 === 0)
    val bits = Sketches.bloomBits(eval.select($"text"), "text")
    val flagged = Sketches.bloomScreen(docs, "doc_id", "text", bits)
      .collect().map(_.getLong(0)).toSet
    val exact = docs
      .join(eval.select($"text").distinct(), Seq("text"), "left_semi")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged),
      s"bloom missed ${(exact -- flagged).size} true hits")
    val nonHits = docs.count() - exact.size
    val fpr = (flagged -- exact).size.toDouble / math.max(nonHits, 1L)
    assert(fpr < 0.05, s"FPR $fpr over $nonHits clean docs at m=4096 k=3")
  }

  test("portable bloom: screening against a filter of OTHER keys flags " +
      "almost nothing (the filter carries real information)") {
    val docs = Tables.documents(spark, sf)
    val otherBits = Sketches.bloomBits(
      spark.range(1000, 1030).select($"id".cast("string").as("k")), "k")
    val flagged = Sketches.bloomScreen(docs, "doc_id", "text", otherBits)
      .count()
    assert(flagged.toDouble / docs.count() < 0.05,
      s"$flagged docs hit a 30-key unrelated filter")
  }

  test("streaming HLL: artifact merge equals the batch sketch, and " +
      "re-ingesting counted keys cannot inflate it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hllstream").toString
    val keys = Tables.orders(spark, sf).select($"o_orderkey")
    keys.repartition(3).write.mode("overwrite").parquet(s"$root/src")
    graft.streaming.HllStream.runToCompletion(spark, s"$root/src",
      s"$root/hll", s"$root/chk", "o_orderkey")
    def merged(): Map[Int, Int] =
      Sketches.hllRegistersFromArtifact(spark, s"$root/hll")
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val fromArtifact = merged()
    val direct = Sketches.hllRegisters(keys, "o_orderkey")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(fromArtifact === direct,
      "register-max merge across batches must equal the one-pass sketch")
    // re-ingesting already-counted keys in a LATER batch cannot
    // inflate a register (register-max merge) — the duplicate-delivery
    // face of the artifact lifecycle
    Sketches.upsertHllBatch(keys, "o_orderkey", s"$root/hll",
      batchId = 99L)
    assert(merged() === direct, "re-ingest inflated the merged sketch")
  }

  test("streaming bloom: artifact union equals the one-pass bits, and " +
      "re-ingesting seen keys cannot change the filter") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bloomstream").toString
    val docs = Tables.documents(spark, sf)
    val eval = docs.filter($"doc_id" % 17 === 0).select($"text")
    eval.repartition(3).write.mode("overwrite").parquet(s"$root/src")
    graft.streaming.SketchStreams.runBloomToCompletion(spark,
      s"$root/src", s"$root/bloom", s"$root/chk", "text")
    def merged(): Set[Int] =
      Sketches.bloomBitsFromArtifact(spark, s"$root/bloom")
        .collect().map(_.getInt(0)).toSet
    val fromArtifact = merged()
    val direct = Sketches.bloomBits(eval, "text")
      .collect().map(_.getInt(0)).toSet
    assert(fromArtifact === direct,
      "set-union merge across batches must equal the one-pass filter")
    // bits only turn on: a duplicate delivery in a LATER batch is a
    // no-op on the merged filter (union is idempotent per bit)
    Sketches.upsertBloomBatch(eval, "text", s"$root/bloom",
      batchId = 99L)
    assert(merged() === direct, "re-ingest changed the merged filter")
  }

  test("streaming cms: artifact sum equals the one-pass counters; a " +
      "REPLAYED batch id replaces (idempotent upsert) while a NEW batch " +
      "id adds (sum merge)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cmsstream").toString
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
    toks.repartition(3).write.mode("overwrite").parquet(s"$root/src")
    graft.streaming.SketchStreams.runCmsToCompletion(spark,
      s"$root/src", s"$root/cms", s"$root/chk", "t")
    def merged(): Map[(Int, Long), Long] =
      Sketches.cmsCountersFromArtifact(spark, s"$root/cms")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fromArtifact = merged()
    val direct = Sketches.cmsCounters(toks, "t")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fromArtifact === direct,
      "sum merge across batches must equal the one-pass counter table")
    // the non-idempotent merge law is exactly why the upsert is keyed
    // by batch id — shown on a hand-built artifact where the batch ↔
    // input mapping is certain: REPLAYING a batch id with its own input
    // leaves the totals unchanged, while the SAME input under a NEW
    // batch id ADDS its mass
    val slice = toks.limit(500).cache()
    val manual = s"$root/cms_manual"
    Sketches.upsertCmsBatch(slice, "t", manual, batchId = 0L)
    Sketches.upsertCmsBatch(toks, "t", manual, batchId = 1L)
    def total(): Long = Sketches.cmsCountersFromArtifact(spark, manual)
      .agg(org.apache.spark.sql.functions.sum($"c")).head().getLong(0)
    val before = total()
    Sketches.upsertCmsBatch(slice, "t", manual, batchId = 0L)
    assert(total() === before,
      "replaying an already-ingested batch id must not change totals")
    Sketches.upsertCmsBatch(slice, "t", manual, batchId = 2L)
    assert(total() === before + slice.count() * 4,
      "a new batch id must ADD exactly its d x rows mass (sum merge)")
  }

  test("hll set algebra: union registers dominate each side pointwise, " +
      "and the inclusion-exclusion overlap lands near the exact count") {
    val row = Registry.byName("q214_hll_overlap_oracled")
      .run(spark, sf).head()
    val (estA, estB, estU) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    val exactOverlap = row.getLong(6)
    val relErr = row.getDouble(7)
    // union cardinality can never exceed the sum of the sides, and the
    // estimator preserves that at the register level (pointwise max ⇒
    // smaller inverse-power sum ⇒ larger estimate than either side)
    assert(estU <= estA + estB + 1e-6, s"U=$estU > A+B=${estA + estB}")
    assert(estU >= math.max(estA, estB) - 1e-6,
      s"U=$estU < max(A,B)=${math.max(estA, estB)}")
    assert(exactOverlap > 0, "fixture slices must overlap")
    // p=12 ⇒ ~1.6% per-estimate error; three estimates compound into
    // the overlap, so gate loosely — the ORACLE gates the exact bits,
    // this gates that the estimator is actually informative
    assert(math.abs(relErr) < 0.35,
      s"overlap rel_err $relErr vs exact $exactOverlap")
  }

  test("grouped hll: per-group registers and estimate equal the solo " +
      "sketch of each group's slice") {
    val docs = Tables.documents(spark, sf)
    val grouped = Sketches
      .hllRegistersByGroup(docs, Seq("source"), "text")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val src = "src3"
    val solo = Sketches
      .hllRegisters(docs.filter($"source" === src), "text")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val slice = grouped.collect { case ((s, b), reg) if s == src =>
      b -> reg }
    assert(slice === solo,
      "grouped registers must equal the solo sketch per group")
    val est = Sketches.hllEstimateByGroup(
        Sketches.hllRegistersByGroup(docs, Seq("source"), "text"),
        Seq("source"))
      .filter($"source" === src).select($"est").head().getDouble(0)
    val soloEst = Sketches.hllEstimate(
        Sketches.hllRegisters(docs.filter($"source" === src), "text"))
      .select($"est").head().getDouble(0)
    assert(est === soloEst,
      "grouped estimate must equal the solo estimate per group")
  }

  test("overlap matrix: every pair's union dominates its sides and " +
      "the overlap estimates stay informative") {
    val rows = Registry.byName("q216_overlap_matrix_oracled")
      .run(spark, sf).collect()
    assert(rows.length === 6, "4 slices make 6 pairs")
    rows.foreach { r =>
      val (estA, estB, estU) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(estU <= estA + estB + 1e-6,
        s"pair (${r.getInt(0)},${r.getInt(1)}): U > A+B")
      assert(estU >= math.max(estA, estB) - 1e-6,
        s"pair (${r.getInt(0)},${r.getInt(1)}): U < max(A,B)")
      assert(r.getLong(6) > 0, "fixture slices must overlap")
      assert(math.abs(r.getDouble(7)) < 0.35,
        s"pair (${r.getInt(0)},${r.getInt(1)}) rel_err ${r.getDouble(7)}")
    }
  }

  test("histogram quantiles: shard histograms SUM-merge into the " +
      "global one, and estimates stay within one bin width of exact") {
    val docs = Tables.documents(spark, sf)
    val whole = Sketches.histogramCounts(docs, "n_chars", 16L, 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = Sketches.histogramCounts(
      docs.filter($"doc_id" % 2 === 0), "n_chars", 16L, 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sketches.histogramCounts(
      docs.filter($"doc_id" % 2 =!= 0), "n_chars", 16L, 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === whole,
      "per-shard histograms must add into the global histogram")
    Registry.byName("q217_hist_quantiles_oracled").run(spark, sf)
      .collect().foreach { r =>
        assert(r.getDouble(3) <= 16.0,
          s"q=${r.getDouble(0)}: abs_err ${r.getDouble(3)} beyond " +
            "one bin width")
      }
  }

  test("bloom-accelerated semi-join: result equals the direct exact " +
      "join, and the prescreen passes only a candidate sliver") {
    val li = Tables.lineitem(spark, sf)
    val ref = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 41 === 0).select($"o_orderkey")
    val direct = li.join(ref, li("l_orderkey") === ref("o_orderkey"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(2))).toMap
    val viaBloom = Registry.byName("q218_bloom_join_oracled")
      .run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaBloom === direct,
      "the bloom path must be result-identical to the exact join")
    // prescreen effectiveness: the candidate set is within 2× the true
    // key population (bloom FPs only), far below the distinct corpus
    val bits = Sketches.bloomBits(ref, "o_orderkey", 65536, 3)
    val cand = Sketches.bloomScreen(li.select($"l_orderkey").distinct(),
      "l_orderkey", "l_orderkey", bits, 65536, 3).count()
    val trueKeys = li.select($"l_orderkey").distinct()
      .join(ref, $"l_orderkey" === $"o_orderkey", "left_semi")
      .count()
    val allKeys = li.select($"l_orderkey").distinct().count()
    assert(cand >= trueKeys, "bloom can never drop a true key")
    assert(cand <= trueKeys * 2 + 16,
      s"prescreen too leaky: $cand candidates vs $trueKeys true keys")
    assert(cand < allKeys, "prescreen must actually prune")
  }

  test("F2 sketch: the counter table stays bounded, the estimate " +
      "never undercounts, and collisions stay inside the (sum c)^2/w " +
      "expectation band") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
    val counters = Sketches.cmsCounters(toks, "t", d = 4, w = 8192)
    assert(counters.count() <= 4L * 8192L, "counter table unbounded")
    val row = Registry.byName("q219_f2_sketch_oracled")
      .run(spark, sf).head()
    val (est, exact) = (row.getLong(0), row.getLong(1))
    assert(row.getBoolean(2) && est >= exact,
      s"F2 estimate $est undercounts exact $exact")
    val n = toks.count().toDouble
    // E[overcount per row] = (sum c)^2 / w; min over d rows sits well
    // inside a few multiples of that
    val band = 8.0 * n * n / 8192.0
    assert(est - exact <= band,
      s"overcount ${est - exact} beyond the collision band $band")
  }

  test("join-size sketch: two independently-built sketches estimate " +
      "the cross join size without undercounting, inside the band") {
    val row = Registry.byName("q220_join_size_oracled")
      .run(spark, sf).head()
    val (est, exact) = (row.getLong(0), row.getLong(1))
    assert(exact > 0, "fixture slices must share tokens")
    assert(row.getBoolean(2) && est >= exact,
      s"join-size estimate $est undercounts exact $exact")
    val docs = Tables.documents(spark, sf)
    def n(m: Int) = docs.filter($"doc_id" % 2 === m)
      .select(explode(split($"text", " "))).count().toDouble
    val band = 8.0 * n(0) * n(1) / 8192.0
    assert(est - exact <= band,
      s"overcount ${est - exact} beyond the collision band $band")
  }

  test("null keys are IGNORED by the portable sketches (the " +
      "count(DISTINCT) convention), never folded into phantom rows") {
    val df = spark.range(100).select(
      when($"id" % 10 === 0, lit(null))
        .otherwise($"id".cast("string")).as("k"))
    val clean = df.filter($"k".isNotNull)
    def regMap(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(d, "k").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(regMap(df) === regMap(clean),
      "a NULL key must not perturb the register set")
    val grouped = Sketches.hllRegistersByGroup(
      df.withColumn("g", lit("x")), Seq("g"), "k")
    assert(grouped.filter($"bucket".isNull).count() === 0,
      "no NULL-bucket row may reach the grouped estimate")
    val bits = Sketches.bloomBits(df, "k")
    assert(bits.filter($"pos".isNull).count() === 0,
      "a NULL key has no bits to set")
    assert(bits.count() ===
      Sketches.bloomBits(clean, "k").count())
  }

  test("streaming histogram: the artifact's per-bin sum equals the " +
      "one-pass histogram through a real checkpoint") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_histstream").toString
    val docs = Tables.documents(spark, sf)
    docs.select($"n_chars").repartition(3)
      .write.mode("overwrite").parquet(s"$root/src")
    graft.streaming.SketchStreams.runHistToCompletion(spark,
      s"$root/src", s"$root/hist", s"$root/chk", "n_chars", 16L, 40)
    val fromArtifact = Sketches
      .histogramCountsFromArtifact(spark, s"$root/hist")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Sketches.histogramCounts(docs, "n_chars", 16L, 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromArtifact === direct,
      "per-bin sum across batches must equal the one-pass histogram")
  }

  test("sketch jaccard/containment: nested slices read as contained, " +
      "estimates track the exact set ratios") {
    val rows = Registry.byName("q223_sketch_jaccard_oracled")
      .run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // A4 ⊂ A2 exactly (doc_id % 4 = 0 ⇒ % 2 = 0): exact containment
    // of the d2 slice is 1, and the sketch estimate must land near it
    val (j24, xj24, c24, xc24) = rows((2, 4))
    assert(xc24 === 1.0, s"exact containment of A4 in A2 is 1, got $xc24")
    assert(math.abs(c24 - 1.0) < 0.15, s"sketch containment $c24 off 1")
    assert(math.abs(j24 - xj24) < 0.1,
      s"sketch jaccard $j24 vs exact $xj24")
    // a non-nested pair must NOT read as contained
    val (_, _, c23, xc23) = rows((2, 3))
    assert(xc23 < 0.8 && c23 < 0.9,
      s"non-nested pair reads contained: est $c23 exact $xc23")
    rows.foreach { case (p, (j, xj, _, _)) =>
      assert(math.abs(j - xj) < 0.1, s"pair $p jaccard $j vs $xj") }
  }

  test("daily-user profile: every day present, estimates informative " +
      "at this regime") {
    val rows = Registry.byName("q221_daily_users_oracled")
      .run(spark, sf).collect()
    assert(rows.length === 30, s"expected 30 days, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(4) > 0, "fixture days must have users")
      assert(math.abs(r.getDouble(5)) < 0.15,
        s"day ${r.getLong(0)}: rel_err ${r.getDouble(5)}")
    }
  }
}
