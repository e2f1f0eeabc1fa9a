package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}

/** Content-keyed split ([[Sampling.contentSplit]]) and token-block
  * duplication profile ([[Dedup.blockDupProfile]]). */
class SplitSpec extends GraftSuite {
  import spark.implicits._

  test("tokenBudgetTake: budget respected, take is maximal, and " +
      "membership is partitioning-invariant") {
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        lit(700L).as("budget"))
    def kept(parts: Int) =
      Sampling.tokenBudgetTake(base.repartition(parts), "doc_id",
          "source", "n_tok", "budget", seed = 7L)
        .collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2),
          r.getLong(4)))
    val k3 = kept(3)
    assert(k3.toSet === kept(8).toSet) // pure function of (ids, seed)
    // per source: within budget, nonempty, and MAXIMAL — the first
    // excluded doc in hash order must overflow what was kept
    val bySrc = k3.groupBy(_._1)
    assert(bySrc.nonEmpty)
    val order = base.select(col("source"), col("doc_id"), col("n_tok"))
      .withColumn("bkt", substring(sha2(
        concat(col("doc_id").cast("string"), lit(":7")).cast("binary"),
        256), 1, 4))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    for ((src, rows) <- bySrc) {
      val tot = rows.map(_._3).sum
      assert(tot <= 700L, s"$src over budget: $tot")
      val keptIds = rows.map(_._2).toSet
      val firstExcluded = order.filter(_._1 == src)
        .sortBy(t => (t._4, t._2)).find(t => !keptIds.contains(t._2))
      firstExcluded.foreach { t =>
        assert(tot + t._3 > 700L, s"$src not maximal") }
    }
  }

  test("weightedSamplePerGroup: dominant weight wins, k cutoff holds, " +
      "non-positive weights excluded, partitioning-invariant") {
    val rows = (1L to 50L).map(i => (i, "g", 1.0)) :+
      ((99L, "g", 1e9)) :+ ((98L, "g", 0.0)) :+ ((97L, "g", -3.0))
    val d = rows.toDF("doc_id", "grp", "w")
    def sample(parts: Int) =
      Sampling.weightedSamplePerGroup(d.repartition(parts), "doc_id",
          "grp", "w", k = 5, seed = 9L)
        .collect().map(r => (r.getLong(0), r.getInt(3)))
    val s3 = sample(3)
    assert(s3.toSet === sample(7).toSet) // pure function of (ids, seed)
    assert(s3.length === 5)
    // ln(u)/1e9 ≈ 0 beats every weight-1 key (ln(u) ≤ ln(65535.5/65536)
    // < 0 for all buckets) — the dominant-weight row must rank first
    assert(s3.find(_._2 == 1).map(_._1).contains(99L))
    assert(!s3.exists(t => t._1 == 98L || t._1 == 97L))
    // inclusion tilts toward weight: over the uniform-weight rows the
    // kept ids are a fixed pseudo-random subset — spot-check stability
    assert(s3.map(_._1).forall(id => id == 99L || (1L to 50L).contains(id)))
  }

  test("tokenBudgetTake: an unbinding budget keeps every document") {
    val d = Seq((1L, "s", 5L, 100L), (2L, "s", 5L, 100L))
      .toDF("doc_id", "source", "n_tok", "budget")
    val out = Sampling.tokenBudgetTake(d, "doc_id", "source", "n_tok",
      "budget", seed = 1L)
    assert(out.count() === 2L)
    assert(out.agg(max(col("cum_tok"))).head().getLong(0) === 10L)
  }

  test("contentSplit: exact duplicates always land in the same split") {
    val docs = Tables.documents(spark, sf)
    // Plant duplicates across "sources": two extra copies of every 7th doc.
    val dupes = docs.filter($"doc_id" % 7 === 0)
      .withColumn("source", lit("planted_a"))
      .union(docs.filter($"doc_id" % 7 === 0)
        .withColumn("source", lit("planted_b")))
    val split = Sampling.contentSplit(docs.union(dupes), "text")
    val straddlers = split
      .groupBy($"text").agg(countDistinct($"split").as("n"))
      .filter($"n" > 1).count()
    assert(straddlers === 0L)
    // Every row is assigned, and all three splits are populated.
    assert(split.filter($"split".isNull).count() === 0L)
    val names = split.select($"split").distinct().as[String].collect().toSet
    assert(names === Set("train", "val", "test"))
  }

  test("contentSplit: assignment is a pure function of the text bytes") {
    val a = Sampling.contentSplit(Tables.documents(spark, sf), "text")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = Sampling.contentSplit(
      Tables.documents(spark, sf).repartition(7), "text")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a === b)
  }

  test("contentSplit: train fraction tracks the 12/2/2 nibble budget") {
    val split = Sampling.contentSplit(Tables.documents(spark, sf), "text")
    val n = split.count().toDouble
    val train = split.filter($"split" === "train").count().toDouble
    // 12/16 = 0.75 expected; generous tolerance for a small corpus.
    assert(train / n > 0.55 && train / n < 0.95)
  }

  test("blockDupProfile: planted shared block is counted on both sides") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      ("a", shared + " " + (11 to 20).map(i => s"x$i").mkString(" ")),
      ("b", shared + " " + (11 to 20).map(i => s"y$i").mkString(" ")),
      ("c", "short doc under one block")
    ).toDF("source", "text")
    val prof = Dedup.blockDupProfile(df, "source", "text", blockLen = 10)
      .orderBy($"source")
      .as[(String, Long, Long, Long, Double)].collect()
    // Source c emits nothing (under blockLen tokens).
    assert(prof.map(_._1).toSeq === Seq("a", "b"))
    // Each of a and b contributes 2 blocks; exactly 1 instance each is
    // duplicated (the shared prefix block).
    assert(prof.forall { case (_, nb, nd, dup, rate) =>
      nb === 2L && nd === 2L && dup === 1L && rate === 0.5 })
  }

  test("snapshotDiff: content identity, not id identity") {
    val oldDf = Seq((1L, "alpha text", "s"), (2L, "beta text", "s"))
      .toDF("doc_id", "text", "source")
    val newDf = Seq((9L, "beta text", "s"), (3L, "gamma text", "s"))
      .toDF("doc_id", "text", "source")
    val diff = Dedup.snapshotDiff(oldDf, newDf, "text")
      .select($"doc_id", $"diff_status").as[(Long, String)].collect().toMap
    // beta re-crawled under a new id is common; gamma is new; alpha gone.
    assert(diff === Map(9L -> "common", 3L -> "added", 1L -> "removed"))
  }

  test("clusterKeyedSplit: a near-dup family always shares one split") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s"),
      (2L, "alpha beta gamma DELTA2", "s"), // near-dup of 1
      (3L, "totally different text here", "s")
    ).toDF("doc_id", "text", "source")
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    val out = Sampling.clusterKeyedSplit(docs, "doc_id", "text", comps)
      .select($"doc_id", $"rep_id", $"split")
      .as[(Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(out(1L)._2 === 1L && out(2L)._2 === 1L && out(3L)._2 === 3L)
    // Both family members take the REPRESENTATIVE's split.
    assert(out(2L)._3 === out(1L)._3)
    // The lone doc keeps its own content split.
    val own = Sampling.contentSplit(docs.filter($"doc_id" === 3L), "text")
      .select($"split").as[String].head()
    assert(out(3L)._3 === own)
  }

  test("degenerate inputs: nulls and empties stay explicit, never crash") {
    val withNull = Seq((1L, "some text", "s"), (2L, null, "s"))
      .toDF("doc_id", "text", "source")
    // Null text -> null split, not a silent bucket.
    val splits = Sampling.contentSplit(withNull, "text")
      .select($"doc_id", $"split").as[(Long, Option[String])]
      .collect().toMap
    assert(splits(1L).isDefined && splits(2L).isEmpty)
    // Null text never matches content: unique to each snapshot side.
    val d = Dedup.snapshotDiff(withNull, withNull, "text")
      .filter($"doc_id" === 2L)
      .select($"diff_status").as[String].collect().sorted
    assert(d.toSeq === Seq("added", "removed"))
    // Null text emits no blocks; an empty frame yields an empty profile.
    assert(Dedup.blockDupProfile(withNull, "source", "text", 10)
      .count() === 0L)
    assert(Dedup.blockDupProfile(withNull.limit(0), "source", "text", 10)
      .count() === 0L)
  }

  test("blockDupProfile: tail fragments are dropped, not hashed") {
    val df = Seq(("s", (1 to 25).map(i => s"t$i").mkString(" ")))
      .toDF("source", "text")
    val prof = Dedup.blockDupProfile(df, "source", "text", blockLen = 10)
      .select($"n_blocks").as[Long].collect()
    assert(prof.toSeq === Seq(2L)) // 25 tokens -> 2 full blocks, tail of 5 dropped
  }
}
