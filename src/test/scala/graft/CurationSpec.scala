package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** End-to-end corpus build ([[Curation.curate]]): split integrity,
  * artifact completeness, and byte-deterministic rebuilds. */
class CurationSpec extends GraftSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("curate: disjoint splits, complete artifacts, deterministic rebuild") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate").toString
    val counts = Curation.curate(spark, docs, out, rowsPerShard = 100L)
    assert(counts.keySet === Set("train", "val", "test"))
    // Shards hold exactly the per-split counts, ids disjoint across
    // splits, and no doc appears twice anywhere.
    val all = counts.keys.toSeq.sorted.map { sp =>
      sp -> spark.read.parquet(s"$out/split=$sp")
        .select($"doc_id").as[Long].collect().toSeq
    }
    all.foreach { case (sp, ids) =>
      assert(ids.length.toLong === counts(sp))
      assert(ids.distinct.length === ids.length) }
    val union = all.flatMap(_._2)
    assert(union.distinct.length === union.length, "a doc straddles splits")
    // Every kept doc passed the gate and is its content group's min id.
    assert(union.length.toLong === counts.values.sum)
    // Manifests cover the shards: row counts sum to the split counts.
    counts.foreach { case (sp, n) =>
      val m = spark.read.parquet(s"$out/manifest_$sp")
      assert(m.agg(sum($"n_rows")).head().getLong(0) === n) }
    // Dataset card rides along, and its CURATED profile describes the
    // artifacts beside it: the splits must equal the returned counts
    // (the input profile describes the raw corpus under its own key).
    val card = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/card.json"))
    assert(card.contains(""""input_profile":{"""))
    assert(card.contains(""""curated_profile":{"""))
    val curated = card.split(""""curated_profile":""", 2)(1)
    val splitJson = counts.toSeq.sortBy(_._1)
      .map { case (sp, n) => s""""$sp":$n""" }.mkString("{", ",", "}")
    assert(curated.contains(s""""splits":$splitJson"""),
      s"curated card splits disagree with shipped counts $counts")
    assert(curated.contains(s""""n_docs":${counts.values.sum}"""))
    // Re-run into a fresh directory: manifests (order-invariant content
    // checksums) must be IDENTICAL — the build is a pure function.
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_curate2").toString
    val counts2 = Curation.curate(spark, docs, out2, rowsPerShard = 100L)
    assert(counts2 === counts)
    counts.keys.foreach { sp =>
      val m1 = spark.read.parquet(s"$out/manifest_$sp")
        .orderBy($"shard").collect().map(_.toSeq)
      val m2 = spark.read.parquet(s"$out2/manifest_$sp")
        .orderBy($"shard").collect().map(_.toSeq)
      assert(m1.toSeq === m2.toSeq, s"manifest drift on $sp") }
  }

  test("curate --append: processes only added content, and the grown " +
      "card equals a full rebuild's") {
    val initial = docs.filter($"doc_id" % 3 =!= 0)
    val grown = docs // the new snapshot: initial + every 3rd doc
    val out = java.nio.file.Files
      .createTempDirectory("graft_capp").toString
    val base = Curation.curate(spark, initial, out, rowsPerShard = 100L)
    val appended = Curation.curateAppend(spark, grown, out,
      rowsPerShard = 100L)
    // the appended counts are the NEW content only, not a re-ship
    assert(appended.values.sum > 0)
    assert(appended.values.sum < base.values.sum + appended.values.sum)
    // full rebuild over the grown snapshot for comparison
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_capp_full").toString
    val full = Curation.curate(spark, grown, out2, rowsPerShard = 100L)
    // shipped sets are content-identical (ids may differ among exact
    // duplicates: append keeps the incumbent canonical)
    def shippedTexts(dir: String): Map[String, Long] =
      full.keys.map(sp => spark.read.parquet(s"$dir/split=$sp"))
        .reduce(_ unionAll _)
        .groupBy($"text").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shippedTexts(out) === shippedTexts(out2))
    // per-split totals agree (split is a pure function of content)
    full.foreach { case (sp, n) =>
      assert(base.getOrElse(sp, 0L) + appended.getOrElse(sp, 0L) === n,
        s"split $sp: ${base.get(sp)} + ${appended.get(sp)} != $n") }
    // the dataset card's curated profile is IDENTICAL to the rebuild's
    // (every stat is content-derived)
    def cardOf(dir: String): String = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$dir/card.json"))
    def curatedProfile(dir: String): String =
      cardOf(dir).split(""""curated_profile":""", 2)(1)
        .split(""","provenance":""", 2)(0)
    assert(curatedProfile(out) === curatedProfile(out2))
    // provenance tells the two histories apart: the incremental dir
    // records both batches and the last batch's admissions, the
    // rebuild records one batch that admitted everything
    assert(cardOf(out).contains(""""n_batches":2"""))
    assert(cardOf(out).contains(
      s""""last_batch_added":${appended.values.sum}"""))
    assert(cardOf(out2).contains(""""n_batches":1"""))
    // manifests still cover the grown shards exactly
    full.foreach { case (sp, n) =>
      val m = spark.read.parquet(s"$out/manifest_$sp")
      assert(m.agg(sum($"n_rows")).head().getLong(0) === n) }
    // re-appending the same snapshot is a no-op (all content now seen)
    val again = Curation.curateAppend(spark, grown, out,
      rowsPerShard = 100L)
    assert(again.isEmpty || again.values.sum === 0L)
    assert(shippedTexts(out) === shippedTexts(out2))
  }

  test("curate: empty corpus yields an explicit empty card, no splits") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_empty").toString
    val counts = Curation.curate(spark, docs.limit(0), out,
      rowsPerShard = 100L)
    assert(counts.isEmpty)
    val card = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/card.json"))
    assert(card.contains(""""n_docs":0"""))
    assert(card.contains(""""splits":{}"""))
  }
}
