package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Z-order layout: after the rewrite, every parquet file must cover a
  * narrow range of EACH z-ordered column (that is what lets min/max
  * stats prune files for range predicates on any dimension). Compared
  * against the same data written in insertion order, where every file
  * spans nearly the full domain of the non-leading column.
  */
class LayoutSpec extends GraftSuite {
  import spark.implicits._

  private def perFileAvgSpan(dir: String, column: String): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 8, s"expected >=8 files in $dir")
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(column)).cast("double"),
          max(col(column)).cast("double")).head()
      r.getDouble(1) - r.getDouble(0)
    }
    spans.sum / spans.length
  }

  test("z-ordered files cover narrow ranges of both dimensions") {
    val root = Files.createTempDirectory("graft_zorder").toString
    // deterministic pseudo-random uniform 2-D data
    val df = spark.range(40000).select(
      (xxhash64($"id").cast("double") / Long.MaxValue.toDouble)
        .as("x"),
      (xxhash64($"id", lit(1)).cast("double") / Long.MaxValue.toDouble)
        .as("y"))
    df.write.parquet(s"$root/naive") // insertion order, same partitions
    graft.io.Layout.writeZOrdered(df, s"$root/zorder",
      Seq("x", "y"), numFiles = 16)

    assert(spark.read.parquet(s"$root/zorder").count() === 40000)
    // global span ~2.0 (x,y in [-1,1]); 16 z-ordered files ≈ 4×4 grid →
    // per-file span ≈ 1/4 of the domain in EACH dimension
    val zx = perFileAvgSpan(s"$root/zorder", "x")
    val zy = perFileAvgSpan(s"$root/zorder", "y")
    assert(zx < 1.0 && zy < 1.0, s"z-order spans too wide: x=$zx y=$zy")
    // unordered baseline: every file spans nearly the full domain
    val nx = perFileAvgSpan(s"$root/naive", "x")
    assert(nx > 1.5, s"baseline unexpectedly clustered: $nx")
    assert(zx < nx / 2 && zy < nx / 2,
      s"z-order not better than baseline: zx=$zx zy=$zy naive=$nx")
  }

  test("z-ordered layout skips row groups for a 2-D range predicate") {
    val root = Files.createTempDirectory("graft_zskip").toString
    val df = spark.range(200000).select(
      (xxhash64($"id").cast("double") / Long.MaxValue.toDouble).as("x"),
      (xxhash64($"id", lit(1)).cast("double") / Long.MaxValue.toDouble)
        .as("y"))
    // small row groups so statistics pruning has granularity to work with
    spark.conf.set("parquet.block.size", (64 * 1024).toString)
    try {
      df.write.parquet(s"$root/naive")
      graft.io.Layout.writeZOrdered(df, s"$root/zorder",
        Seq("x", "y"), numFiles = 16)
    } finally spark.conf.unset("parquet.block.size")

    def scannedRows(dir: String): Long = {
      val q = spark.read.parquet(dir)
        .filter(col("x").between(0.0, 0.1) && col("y").between(0.0, 0.1))
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val naive = scannedRows(s"$root/naive")
    val zord = scannedRows(s"$root/zorder")
    // same answer, far fewer rows surfaced by the scan: row-group
    // min/max stats prune on BOTH dimensions only under the z layout
    assert(zord < naive / 2,
      s"z-order did not reduce scanned rows: zorder=$zord naive=$naive")
  }

  test("z-value interleaves bits monotonically per dimension") {
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))
      .toDF("x", "y")
    val (withBounds, z) = graft.io.Layout.zvalue(df, Seq("x", "y"))
    val zs = withBounds.select($"x", $"y", z.as("z")).collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    assert(zs((0.0, 0.0)) === 0L)
    // corner (max, max) has all 32 interleaved bits set
    assert(zs((1.0, 1.0)) === (1L << 32) - 1)
    // x and y occupy complementary bit positions (even/odd interleave)
    assert(zs((1.0, 0.0)) + zs((0.0, 1.0)) === (1L << 32) - 1)
    assert((zs((1.0, 0.0)) & zs((0.0, 1.0))) === 0L)
  }

  test("null values rank 0: null rows cluster at the curve origin") {
    val df = Seq((Some(0.0), 0.0), (Some(1.0), 0.0), (None, 0.0),
      (None, 1.0)).toDF("x", "y")
    val (withBounds, z) = graft.io.Layout.zvalue(df, Seq("x", "y"))
    val zs = withBounds.select($"x", $"y", z.as("z")).collect()
      .map(r => ((Option(r.get(0)), r.getDouble(1)), r.getLong(2))).toMap
    // least() skips nulls, so an unguarded rank would send null rows to
    // the maxRank corner; the guard pins them to rank 0 = same z as the
    // column minimum
    assert(zs((None, 0.0)) === zs((Some(0.0), 0.0)))
    // null x contributes NO x-bits (rank 0), not the maxRank corner —
    // x occupies the even interleaved bit positions
    assert((zs((None, 1.0)) & 0x5555555555555555L) === 0L)
  }
}

/** writeSorted: the output files must form one totally ordered run —
  * file i's max key ≤ file i+1's min key, rows sorted within each file
  * — so any path-based reader gets a global sorted run without a
  * catalog. */
class SortedExportSpec extends GraftSuite {
  import spark.implicits._

  test("sorted export forms a totally ordered run across files") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sorted").toString
    val rnd = new scala.util.Random(178)
    val df = (1 to 20000).map(_ => (rnd.nextLong(), rnd.nextInt(100)))
      .toDF("k", "v")
    graft.io.Sinks.writeSorted(df, dir, files = 8, "k")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted // part-NNNNN order = range order
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f).select($"k")
        .collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"file $f not internally sorted")
      (ks.head, ks.last)
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"file boundary out of order: $hi > $lo")
    }
    // nothing lost, nothing duplicated
    assert(spark.read.parquet(dir).count() === 20000)
    assert(spark.read.parquet(dir).select(sum($"v")).head().getLong(0)
      === df.select(sum($"v")).head().getLong(0))
  }
}
