package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** Training-data shaping operators: sliding-window chunking,
  * concat-and-chunk sequence packing, exactly-once stream restoration. */
class PipelineSpec extends GraftSuite {

  test("chunk: windows, stride, short-doc and exact-boundary cases") {
    val s = spark
    import s.implicits._
    // 10 tokens, size 4 / stride 3: starts 0,3,6 — [6,10) reaches the
    // end, so the contained tail start 9 is NOT emitted
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y"), // shorter than one chunk → exactly one chunk
      (3L, "p q r s") // exactly chunkSize → one chunk (covers all)
    ).toDF("doc_id", "text")
    val out = Chunker.chunk(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .orderBy($"doc_id", $"chunk_id")
      .select($"doc_id", $"chunk_id", $"start_tok", $"n_tok", $"chunk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 0, 0, 4, "a b c d"),
      (1L, 1, 3, 4, "d e f g"),
      (1L, 2, 6, 4, "g h i j"),
      (2L, 0, 0, 2, "x y"),
      (3L, 0, 0, 4, "p q r s")))
  }

  test("chunk: every token is covered and overlaps equal size - stride") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    val chunks = Chunker.chunk(docs, "doc_id", "text",
      chunkSize = 32, stride = 24)
    // non-final chunks contribute exactly `stride` new tokens; the union
    // of [start, start+n_tok) intervals tiles [0, n) without gaps
    val bad = chunks
      .withColumn("next_start", lead($"start_tok", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"chunk_id")))
      .filter($"next_start".isNotNull &&
        ($"next_start" =!= $"start_tok" + 24 ||
          $"start_tok" + $"n_tok" < $"next_start"))
      .count()
    assert(bad === 0)
    // reconstruction: stride-prefix of each chunk + full last chunk
    // re-concatenates to the original text
    val rebuilt = chunks
      .withColumn("is_last", lead($"chunk_id", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"chunk_id")).isNull)
      .withColumn("piece", when($"is_last", $"chunk")
        .otherwise(array_join(slice(split($"chunk", " "), 1, 24), " ")))
      .groupBy($"doc_id")
      .agg(array_join(collect_list($"piece"), " ").as("rebuilt"))
    val diff = rebuilt.join(docs, "doc_id")
      .filter($"rebuilt" =!= $"text").count()
    assert(diff === 0)
  }

  test("packSequences: occupancy, token conservation, straddle flags") {
    val s = spark
    import s.implicits._
    // token counts 3,4,5,2 in one group, seqLen 6:
    // offsets 0,3,7,12 → seq ids 0,0,1,2; straddle: doc2 ([3,6]) crosses
    // 6-boundary? tokens 3..6 end at 6 → (3+4-1)=6 → floor(6/6)=1 > 0 yes
    val docs = Seq(
      (1L, "a a a", "g1"), (2L, "b b b b", "g1"),
      (3L, "c c c c c", "g1"), (4L, "d d", "g1")
    ).toDF("doc_id", "text", "source")
    val out = Chunker.packSequences(docs, "doc_id", "text", "source",
        seqLen = 6)
      .orderBy($"seq_id")
      .select($"seq_id", $"n_docs", $"n_tokens", $"n_straddle")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // doc 3 occupies tokens 7..11, ending exactly at the seq-1 boundary
    // (floor(11/6)=1): no straddle
    assert(out.toSeq === Seq((0L, 2L, 7L, 1L), (1L, 1L, 5L, 0L),
      (2L, 1L, 2L, 0L)))
    // conservation: packed token total == corpus token total
    val corpus = Tables.documents(spark, sf)
    val packed = Chunker.packSequences(corpus, "doc_id", "text",
      "source", seqLen = 512)
    val total = packed.agg(sum($"n_tokens")).head().getLong(0)
    val direct = corpus.agg(sum(size(split($"text", " "))))
      .head().getLong(0)
    assert(total === direct)
  }

  test("packSequences subShards: token conservation, disjoint seq ids") {
    val s = spark
    import s.implicits._
    val corpus = Tables.documents(spark, sf)
    val sharded = Chunker.packSequences(corpus, "doc_id", "text",
      "source", seqLen = 512, subShards = 4)
    val flat = Chunker.packSequences(corpus, "doc_id", "text",
      "source", seqLen = 512)
    // every token is packed exactly once regardless of sharding
    assert(sharded.agg(sum($"n_tokens")).head().getLong(0)
      === flat.agg(sum($"n_tokens")).head().getLong(0))
    assert(sharded.agg(sum($"n_docs")).head().getLong(0)
      === flat.agg(sum($"n_docs")).head().getLong(0))
    // seq ids are unique per group (sub-shard spaces interleave,
    // never collide)
    assert(sharded.groupBy($"source", $"seq_id").count()
      .filter($"count" > 1).count() === 0)
    // the parallelism trade is bounded: at most subShards partial tail
    // sequences per group → sequence count grows by < 4 per source
    val nFlat = flat.count()
    val nSharded = sharded.count()
    val nSources = corpus.select($"source").distinct().count()
    assert(nSharded >= nFlat)
    assert(nSharded <= nFlat + 4 * nSources)
  }

  test("deterministicShuffle: same order at any partitioning, new seed reshuffles") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      graft.operators.Sampling.deterministicShuffle(df, "doc_id", seed)
        .select($"doc_id").collect().map(_.getLong(0)).toSeq
    val o3 = order(docs.repartition(3), 42L)
    val o8 = order(docs.repartition(8), 42L)
    assert(o3 === o8) // placement-independent, unlike orderBy(rand)
    assert(o3.toSet === docs.select($"doc_id").collect()
      .map(_.getLong(0)).toSet) // a permutation, nothing dropped
    assert(o3 !== o3.sorted) // actually shuffled
    assert(order(docs, 43L) !== o3) // epoch reshuffle = new seed
  }

  test("mixtureRates: binding source kept whole, shares hit the target") {
    val counts = Map("en" -> 600L, "de" -> 100L, "fr" -> 300L)
    // target 50/25/25: de can only supply 100 → total T = 400,
    // en → 200/600, fr → 100/300, de kept whole
    val rates = graft.operators.Sampling.mixtureRates(counts,
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
    assert(math.abs(rates("de") - 1.0) < 1e-12)
    assert(math.abs(rates("en") - 200.0 / 600) < 1e-12)
    assert(math.abs(rates("fr") - 100.0 / 300) < 1e-12)
    // expected kept mass realizes the target mixture exactly
    val kept = rates.map { case (s, r) => s -> r * counts(s) }
    val tot = kept.values.sum
    assert(math.abs(kept("en") / tot - 0.5) < 1e-12)
    // zero- and missing-weight sources are dropped from the rate map
    val partial = graft.operators.Sampling.mixtureRates(counts,
      Map("en" -> 1.0, "de" -> 0.0))
    assert(partial.keySet === Set("en"))
  }

  test("sampleByMixture: deterministic, placement-invariant, near-target") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
    val weights = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2,
      "es" -> 0.1, "zh" -> 0.1)
    val counts = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = graft.operators.Sampling.mixtureRates(counts, weights)
    def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.Sampling.sampleByMixture(df, "doc_id", "lang",
        rates, seed = 7L).select($"doc_id").collect()
        .map(_.getLong(0)).toSet
    val k3 = keptIds(docs.repartition(3))
    val k8 = keptIds(docs.repartition(8))
    assert(k3 === k8) // pure function of (id, seed, rates)
    assert(k3.nonEmpty && k3.size < counts.values.sum)
    // every kept row existed (a filter, never an upsample)
    val all = docs.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(k3.subsetOf(all))
    // rate-1.0 languages are kept whole
    val whole = rates.filter { case (_, r) => r >= 1.0 }.keySet
    if (whole.nonEmpty) {
      val wholeIds = docs.filter($"lang".isin(whole.toSeq: _*))
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(wholeIds.subsetOf(k3))
    }
  }

  test("sampleByMixtureSha: same semantics under the portable hash") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
    val weights = Map("en" -> 0.5, "de" -> 0.125, "fr" -> 0.125,
      "es" -> 0.125, "zh" -> 0.125)
    val counts = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = graft.operators.Sampling.mixtureRates(counts, weights)
    def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.Sampling.sampleByMixtureSha(df, "doc_id", "lang",
        rates, seed = 42L).select($"doc_id").collect()
        .map(_.getLong(0)).toSet
    val k3 = keptIds(docs.repartition(3))
    val k8 = keptIds(docs.repartition(8))
    assert(k3 === k8) // pure function of (id, seed, rates)
    // a filter, never an upsample
    val all = docs.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(k3.subsetOf(all) && k3.nonEmpty && k3.size < all.size)
    // binding language kept whole (1e-9 slack: (c/share)*share/c can
    // land one ulp under 1.0; sampleByMixtureSha's keep-all guard is
    // wider at 1e-6 so these are all kept whole regardless)
    val whole = rates.filter { case (_, r) => r >= 1.0 - 1e-9 }.keySet
    assert(whole.nonEmpty) // the binding source always has rate ~1
    val wholeIds = docs.filter($"lang".isin(whole.toSeq: _*))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(wholeIds.subsetOf(k3))
    // per-language kept mass tracks rate*count (sha buckets uniform)
    val perLang = graft.operators.Sampling.sampleByMixtureSha(
      docs, "doc_id", "lang", rates, seed = 42L)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (lang, r) =>
      val expect = r * counts(lang)
      val got = perLang.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - expect) <= math.max(10.0, 0.15 * expect),
        s"$lang: got $got expect $expect (rate $r)")
    }
    // the spark-side cut matches a driver-side sha recomputation for a
    // sample of ids (portable-hash contract: any engine can replay it)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def bucket(id: Long): String = {
      val h = md.digest(s"$id:42".getBytes("UTF-8"))
      h.take(2).map(b => f"${b & 0xff}%02x").mkString
    }
    val langOf = docs.select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val probe = all.take(200)
    val keptProbe = probe.filter { id =>
      val r = rates(langOf(id))
      r >= 1.0 - 1e-6 || bucket(id) < graft.operators.Sampling.shaCut(r)
    }
    assert(probe.filter(k3.contains) === keptProbe)
  }

  test("writeShuffledShards: contiguous hash ranges, nothing lost") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString + "/shards"
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val n = graft.operators.Sampling.writeShuffledShards(
      docs, "doc_id", dir, seed = 42L, rowsPerShard = 120)
    val back = spark.read.parquet(dir)
    assert(back.count() === n) // a permutation on disk, nothing dropped
    assert(back.select($"doc_id").exceptAll(docs.select($"doc_id"))
      .count() === 0)
    // each shard file is a CONTIGUOUS slice of the global shuffled
    // order: per-file [min,max] hash-key intervals must not overlap
    val intervals = back
      .withColumn("f", input_file_name())
      .withColumn("k", xxhash64($"doc_id", lit(42L)))
      .groupBy($"f")
      .agg(min($"k").as("lo"), max($"k").as("hi"),
        count(lit(1)).as("rows"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(intervals.length >= 4) // 500 docs / 120 per shard
    intervals.foreach { case (_, _, rows) => assert(rows <= 120L) }
    intervals.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("exactly-once restoration equals the batch table") {
    val s = spark
    import s.implicits._
    val streamed = graft.streaming.EventStream
      .runExactlyOnce(spark, sf, queryName = "spec_exactly_once")
      .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
        $"event_type", $"value")
    val batch = Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
        $"event_type", $"value")
    assert(streamed.count() === batch.count()) // each id exactly once
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }
}
