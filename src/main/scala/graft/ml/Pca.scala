package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an `array<float|double>` embedding
  * column, Spark-first (north-star extension — dimensionality reduction
  * ahead of ANN indexing / semantic dedup):
  *
  *  1. ONE distributed pass accumulates the Gramian (Σ xᵢxⱼ), the column
  *     sums, and the count per input partition — the same shape as
  *     `mllib.linalg.distributed.RowMatrix.computeCovariance` (a d×d
  *     partial per partition, no shuffle of pair rows; at 100 TB the
  *     driver sees numPartitions × d² doubles, never the data).
  *  2. The d×d sample covariance is eigensolved ON THE DRIVER (cyclic
  *     Jacobi — d is embedding width, 64 here; the matrix is tiny even
  *     when the corpus is not).
  *  3. Projection is pure built-in expressions (`zip_with` +
  *     `aggregate` against a literal component array), so transform
  *     stays inside whole-stage codegen — no UDF, model broadcast as
  *     literals.
  *
  * Determinism: partition partials are combined IN PARTITION-INDEX ORDER
  * (a plain `reduce` merges in task-completion order, which would make
  * the low bits of the covariance — and so the components — depend on
  * scheduling). This holds for [[fit]], [[covarianceLong]] and the
  * persisted-moments lifecycle; [[fitPerGroup]] trades it for bounded
  * driver traffic and documents its own caveat. Eigenvector sign is
  * fixed so each component's largest-|coordinate| is positive.
  */
object Pca extends Serializable {

  final case class Model(
      dim: Int,
      k: Int,
      means: Array[Double],
      /** k rows, each a unit-norm component of length dim,
        * eigenvalue-descending. */
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double) {
    def explainedVariance: Array[Double] =
      eigenvalues.map(_ / totalVariance)

    /** Append pc1..pck — centered projections, pure expressions. */
    def transform(df: DataFrame, vecCol: String): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      components.zipWithIndex.foldLeft(df) { case (acc, (comp, j)) =>
        val lits = array(comp.map(lit): _*)
        val offset = comp.zip(means).map { case (c, m) => c * m }.sum
        acc.withColumn(s"pc${j + 1}",
          aggregate(zip_with(v, lits, (x, c) => x * c),
            lit(0.0), (s, x) => s + x) - lit(offset))
      }
    }
  }

  /** Driver payload cap for the Gramian combine: below it, every
    * partition's d×d partial is collected directly (the exact combine
    * order rounds 1-4 shipped, so persisted d=64 artifacts stay
    * bit-identical); above it, a grouped pre-combine level runs on the
    * executors first. 64 MB covers d=64 up to ~2048 partitions and
    * d=512 up to 32 — one grouped level extends each by another
    * ×(budget/partial) factor, plenty for d≈1k-4k embeddings at
    * 100k-partition scans. */
  private val maxDriverCombineBytes = 64L << 20

  /** Element-wise merge of moments partials in the ITERATION ORDER of
    * `parts` — callers sort by partition/group index first, which is
    * what makes every fit path a pure function of (data, partitioning)
    * rather than of task scheduling. */
  private def mergeOrdered(dim: Int,
      parts: Iterator[(Long, Array[Double], Array[Double])])
      : (Long, Array[Double], Array[Double]) = {
    val gsize = dim * (dim + 1) / 2
    var n = 0L
    val s = new Array[Double](dim)
    val g = new Array[Double](gsize)
    parts.foreach { case (pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < dim) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < gsize) { g(i) += pg(i); i += 1 }
    }
    (n, s, g)
  }

  /** (count, sums[d], gram[d][d] upper triangle filled symmetric) —
    * one job, partials merged in partition-index order. When the flat
    * collect would exceed [[maxDriverCombineBytes]] (high dim × many
    * partitions — the driver-OOM shape at production embedding widths),
    * partitions are pre-combined on the executors in CONTIGUOUS
    * index-range groups, each group merged in partition-index order and
    * the driver merging groups in group-index order — still
    * deterministic, just a different (but fixed) association of the
    * same sums. */
  private def moments(df: DataFrame, vecCol: String,
      dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val gsize = dim * (dim + 1) / 2
    val rows = df.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0))
    val partials = rows.mapPartitionsWithIndex { (idx, it) =>
      var n = 0L
      val s = new Array[Double](dim)
      val g = new Array[Double](gsize)
      it.foreach { v =>
        require(v.length == dim,
          s"vector length ${v.length} != dim $dim")
        n += 1
        var i = 0
        var gi = 0
        while (i < dim) {
          val vi = v(i)
          s(i) += vi
          var j = i
          while (j < dim) { g(gi) += vi * v(j); gi += 1; j += 1 }
          i += 1
        }
      }
      Iterator.single((idx, (n, s, g)))
    }
    val numParts = math.max(1, rows.getNumPartitions)
    val partialBytes = (dim.toLong + gsize) * 8
    // The same budget bounds BOTH the driver collect and each combine
    // TASK (a task materializes one group of partials): levels repeat —
    // each shrinking the partial count by groupSize ≥ 2 — until the
    // survivors fit the driver. One level suffices up to budget²/bytes²
    // partials (d=64: ~4M; d=2048: ~12), two levels cover any realistic
    // scan, and the association is a pure function of (numParts, dim) —
    // never of scheduling.
    val groupSize =
      math.max(2L, maxDriverCombineBytes / partialBytes).toInt
    var level = partials
    var remaining = numParts.toLong
    // remaining > 1: at dim large enough that ONE d×d partial exceeds
    // the budget, combining cannot shrink below a single partial — the
    // driver pays that one buffer (d=2900 ≈ 67 MB) and the loop must
    // not spin on it
    while (remaining > 1 &&
        remaining * partialBytes > maxDriverCombineBytes) {
      level = level
        .map { case (idx, p) => (idx / groupSize, (idx, p)) }
        .groupByKey(math.max(1, (remaining / groupSize).toInt))
        .map { case (gid, ps) =>
          (gid, mergeOrdered(dim,
            ps.toArray.sortBy(_._1).iterator.map(_._2)))
        }
      remaining = (remaining + groupSize - 1) / groupSize
    }
    val collected = level.collect()
    val (n, s, gUpper) =
      mergeOrdered(dim, collected.sortBy(_._1).iterator.map(_._2))
    val g = Array.ofDim[Double](dim, dim)
    var i = 0
    var gi = 0
    while (i < dim) {
      var j = i
      while (j < dim) { g(i)(j) = gUpper(gi); g(j)(i) = gUpper(gi)
        gi += 1; j += 1 }
      i += 1
    }
    (n, s, g)
  }

  /** Sample covariance matrix: cov(i,j) = (Σxᵢxⱼ − n·μᵢ·μⱼ)/(n−1). */
  def covariance(df: DataFrame, vecCol: String,
      dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val (n, s, g) = moments(df, vecCol, dim)
    require(n >= 2, s"covariance needs >=2 rows, got $n")
    val mu = s.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      (g(i)(j) - n * mu(i) * mu(j)) / (n - 1))
    (n, mu, cov)
  }

  /** Long-form (i, j, cov) DataFrame of the upper triangle — the
    * oracle-checkable face of the Gramian pass.
    *
    * Rounding fragility note (q110): the oracle compares this naive
    * (Σxx − nμμ)/(n−1) formula against DuckDB's numerically-stable
    * covar_samp through round-to-`roundTo` equality. The two values
    * differ in the last fp bits, so an entry landing within that fp
    * noise of a half-way rounding boundary could round apart even
    * though both are correct — more likely as n grows (cancellation in
    * the naive form grows with Σxx). If q110 ever hash-fails at a
    * larger SF with near-boundary values, lower the query's roundTo
    * before suspecting the engine. */
  def covarianceLong(df: DataFrame, vecCol: String, dim: Int,
      roundTo: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, _, cov) = covariance(df, vecCol, dim)
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield (i + 1L, j + 1L, cov(i)(j))
    // Spark's round(), not BigDecimal — identical half-up semantics to
    // the oracle side, like every other oracled double in the registry.
    rows.toDF("i", "j", "cov")
      .withColumn("cov", round(col("cov"), roundTo))
  }

  /** Top principal component via UNROLLED POWER ITERATION — the
    * SQL-replayable face of the PCA family (the q158-Lloyd determinism
    * contract applied to an eigensolve). The production path is the
    * driver Jacobi ([[fit]], q111, rows-only); this one is built so a
    * SQL engine can recompute every stage bit-for-bit:
    *
    *  - the covariance enters the iteration already ROUNDED to
    *    `covRound` dp ([[covarianceLong]] — the grid q110 proves equal
    *    to DuckDB's covar_samp), as do the column means, so both
    *    engines iterate on IDENTICAL matrices;
    *  - v₀ = round(1/√dim, vecRound) on every coordinate; each round
    *    computes u = C·v with an ascending-j left-to-right sum (the
    *    list_sum order), normalizes by √(Σuᵢ²) (ascending i), and
    *    RE-QUANTIZES each coordinate to `vecRound` dp with Spark's
    *    round semantics (BigDecimal HALF_UP — [[org.apache.spark.sql
    *    .catalyst.expressions.Round]]) before the next round consumes
    *    it;
    *  - the projection (x − μ)·v is the q154 zip_with/aggregate left
    *    fold, bit-identical to DuckDB's list kernels.
    *
    * The driver holds only the d×d rounded covariance (the same
    * bounded artifact the Jacobi path collects); the data-sized work is
    * the one Gramian pass + the one projection scan. Returns
    * (idCol, pc1) rounded to `vecRound`. */
  def powerIterationTopPc(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, iterations: Int = 5, covRound: Int = 8,
      vecRound: Int = 6): DataFrame = {
    val covRows = covarianceLong(df, vecCol, dim, roundTo = covRound)
      .collect()
    val c = Array.ofDim[Double](dim, dim)
    covRows.foreach { r =>
      val i = r.getLong(0).toInt - 1
      val j = r.getLong(1).toInt - 1
      val x = r.getDouble(2)
      c(i)(j) = x; c(j)(i) = x
    }
    val mu = df
      .select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("pos"))
      .agg(round(avg(col("col")), covRound).as("m"))
      .orderBy(col("pos"))
      .collect().map(_.getDouble(1))
    require(mu.length == dim, s"expected $dim dims, got ${mu.length}")
    // Spark round() semantics exactly (Round uses BigDecimal HALF_UP on
    // Double.toString's canonical decimal) — the oracle's round() must
    // agree on the same doubles, which q158 already established
    def rq(x: Double): Double = BigDecimal.valueOf(x)
      .setScale(vecRound, BigDecimal.RoundingMode.HALF_UP).toDouble
    var v = Array.fill(dim)(rq(1.0 / math.sqrt(dim.toDouble)))
    for (_ <- 1 to iterations) {
      val u = Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += c(i)(j) * v(j); j += 1 }
        s
      }
      var n2 = 0.0
      var i = 0
      while (i < dim) { n2 += u(i) * u(i); i += 1 }
      val norm = math.sqrt(n2)
      v = u.map(x => rq(x / norm))
    }
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedLit(mu.toSeq), (x, m) => x - m)
    val pc = aggregate(zip_with(centered, typedLit(v.toSeq),
      (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
    df.select(col(idCol), round(pc, vecRound).as("pc1"))
  }

  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    // one eigensolve/ordering/sign implementation for every fit path —
    // fit, fitPerGroup and fitFromMoments must never drift apart
    val (n, s, g) = moments(df, vecCol, dim)
    val upper = for { i <- 0 until dim; j <- i until dim } yield g(i)(j)
    modelFromMoments(n, s, upper.toArray, dim, k)
  }

  /** Build a Model from raw moments (n, Σx, Σxxᵀ upper triangle). */
  private def modelFromMoments(n: Long, sums: Array[Double],
      gramUpper: Array[Double], dim: Int, k: Int): Model = {
    require(n >= 2, s"covariance needs >=2 rows, got $n")
    val mu = sums.map(_ / n)
    val gram = Array.ofDim[Double](dim, dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        gram(i)(j) = gramUpper(idx); gram(j)(i) = gramUpper(idx)
        idx += 1; j += 1
      }
      i += 1
    }
    val cov = Array.tabulate(dim, dim)((a, b) =>
      (gram(a)(b) - n * mu(a) * mu(b)) / (n - 1))
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy { case (v, i2) => (-v, i2) }
      .map(_._2)
    val comps = order.take(k).map { c =>
      val vec = Array.tabulate(dim)(r => vectors(r)(c))
      val m = vec.maxBy(math.abs)
      if (m < 0) vec.map(-_) else vec
    }
    Model(dim, k, mu, comps, order.take(k).map(values), values.sum)
  }

  // ---- Persisted-moments lifecycle -----------------------------------
  //
  // The PCA twin of the dedup/ANN index story: moments (n, Σx, Σxxᵀ) are
  // ASSOCIATIVE, so a model over a growing corpus never re-reads old
  // data — each ingested batch appends ONE moments row (~d²/2 doubles)
  // and fitting sums the rows in batch order. At 100 TB the artifact is
  // a few KB per batch regardless of corpus size.

  /** One global moments row for `df` — the partition-index-ordered
    * [[moments]] pass (NOT the UDAF: its shuffle-merge order is
    * scheduling-dependent, and a PERSISTED artifact should be a
    * bit-stable function of the data). */
  private def momentsRow(df: DataFrame, vecCol: String,
      dim: Int): (Long, Seq[Double], Seq[Double]) = {
    val (n, s, g) = moments(df, vecCol, dim)
    val upper = for { i <- 0 until dim; j <- i until dim } yield g(i)(j)
    (n, s.toIndexedSeq, upper)
  }

  /** Start a persisted moments artifact at `dir` (batch_id 0). */
  def writeMoments(df: DataFrame, vecCol: String, dim: Int,
      dir: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, s, g) = momentsRow(df, vecCol, dim)
    Seq((0L, dim, n, s, g))
      .toDF("batch_id", "dim", "n", "sums", "gram_upper")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Append a batch's moments (batch_id = max + 1). Append-only: old
    * rows are never rewritten, exactly like the dedup index.
    * SINGLE-WRITER, like every ingest path here: for streaming ingest
    * wrap in foreachBatch (the DocIngest pattern), where the
    * checkpoint serializes batches; a redelivered batch would double
    * its moments, so exactly-once delivery must come from the stream. */
  def appendMoments(batch: DataFrame, vecCol: String, dim: Int,
      dir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val existing = spark.read.parquet(dir)
    val storedDim = existing.select(col("dim")).head().getInt(0)
    require(storedDim == dim,
      s"moments artifact has dim $storedDim, batch has $dim")
    val next = existing.agg(max(col("batch_id"))).head().getLong(0) + 1L
    val (n, s, g) = momentsRow(batch, vecCol, dim)
    Seq((next, dim, n, s, g))
      .toDF("batch_id", "dim", "n", "sums", "gram_upper")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  /** IDEMPOTENT per-stream-batch moments upsert — the streaming twin
    * of [[appendMoments]]: the row's batch_id is the CALLER'S id (a
    * Structured Streaming batchId, stable across redelivery) and the
    * write is a dynamic partitioned overwrite of exactly that
    * partition (the KStore/SketchIngest pattern), so an at-least-once
    * redelivered batch REPLACES its own row instead of double-counting
    * its moments — the gap that makes [[appendMoments]] single-writer/
    * exactly-once-delivery-only. [[fitFromMoments]]/
    * [[covarianceFromMoments]] read both layouts (flat and
    * partitioned) identically. */
  def upsertMomentsBatch(batch: DataFrame, vecCol: String, dim: Int,
      dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val (n, s, g) = momentsRow(batch, vecCol, dim)
    Seq((batchId, dim, n, s, g))
      .toDF("batch_id", "dim", "n", "sums", "gram_upper")
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)
  }

  /** Sum the persisted artifact's rows in batch_id order
    * (deterministic): (n, Σx, Σxxᵀ upper triangle, dim). */
  private def combinedMoments(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Array[Double], Array[Double], Int) = {
    val rows = spark.read.parquet(dir)
      .orderBy(col("batch_id"))
      .select(col("dim"), col("n"), col("sums"), col("gram_upper"))
      .collect()
    require(rows.nonEmpty, s"no moments rows at $dir")
    val dim = rows.head.getInt(0)
    val sums = new Array[Double](dim)
    val gram = new Array[Double](dim * (dim + 1) / 2)
    var n = 0L
    rows.foreach { r =>
      n += r.getLong(1)
      val s = r.getSeq[Double](2); val g = r.getSeq[Double](3)
      var i = 0
      while (i < sums.length) { sums(i) += s(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += g(i); i += 1 }
    }
    (n, sums, gram, dim)
  }

  /** Fit from the persisted artifact alone — no corpus read. */
  def fitFromMoments(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): Model = {
    val (n, sums, gram, dim) = combinedMoments(spark, dir)
    modelFromMoments(n, sums, gram, dim, k)
  }

  /** The [[covarianceLong]] grid served from the PERSISTED moments
    * artifact — the oracle-able face of the incremental lifecycle
    * (q206): a corpus ingested as several appended batches must yield
    * the SAME sample covariance as one pass over everything (moment
    * associativity made checkable). Only the artifact is read. */
  def covarianceFromMoments(spark: org.apache.spark.sql.SparkSession,
      dir: String, roundTo: Int = 6): DataFrame = {
    import spark.implicits._
    val (n, sums, gram, dim) = combinedMoments(spark, dir)
    require(n >= 2, s"covariance needs >=2 rows, got $n")
    val mu = sums.map(_ / n)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)]
    var i = 0
    var gi = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        rows += ((i + 1L, j + 1L,
          (gram(gi) - n * mu(i) * mu(j)) / (n - 1)))
        gi += 1; j += 1
      }
      i += 1
    }
    rows.toSeq.toDF("i", "j", "cov")
      .withColumn("cov", round(col("cov"), roundTo))
  }

  /** Per-group moments aggregator: buffer = [n, Σx (d), Σxxᵀ upper
    * triangle (d(d+1)/2)] — the Gramian pass as a map-side-combining
    * UDAF, so per-GROUP covariance costs one shuffle of one buffer per
    * (group × map partition), never a shuffle of rows. */
  private class MomentsAgg(dim: Int) extends org.apache.spark.sql
      .expressions.Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val gsize = dim * (dim + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + dim + gsize)
    override def reduce(b: Array[Double],
        v: Seq[Double]): Array[Double] = {
      require(v.length == dim, s"vector length ${v.length} != dim $dim")
      b(0) += 1
      var i = 0
      var g = 1 + dim
      while (i < dim) {
        val vi = v(i)
        b(1 + i) += vi
        var j = i
        while (j < dim) { b(g) += vi * v(j); g += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(b1: Array[Double],
        b2: Array[Double]): Array[Double] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    override def finish(r: Array[Double]): Seq[Double] =
      r.toIndexedSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Double]]()
  }

  /** PER-GROUP PCA (segment-wise dimensionality reduction, the
    * bridge between the engine's segmentation flagship and [[fit]]):
    * one distributed aggregation computes every group's moments
    * simultaneously (map-side combined — rows never shuffle, buffers
    * do), then each group's d×d covariance is eigensolved on the
    * driver. Driver traffic is #groups × (1 + d + d(d+1)/2) doubles —
    * the same bounded-by-construction class as the engine's segment
    * keys, NOT data rows. Groups with fewer than 2 rows are skipped
    * (no covariance). Keys are compared as strings.
    *
    * Determinism caveat: unlike [[fit]]/[[writeMoments]] (partition-
    * index-ordered combine), the UDAF's partial buffers merge in
    * shuffle-fetch order, so per-group covariances can vary in the last
    * ~1e-15 relative bits across schedules — the price of keeping
    * driver traffic at one buffer per GROUP rather than per
    * group×partition. Consumers round (q118 rounds to 6 decimals);
    * anything needing bit-stable models should fit per group via
    * [[fit]] on a filtered slice. */
  def fitPerGroup(df: DataFrame, groupCol: String, vecCol: String,
      dim: Int, k: Int): Map[String, Model] = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    val mom = udaf(new MomentsAgg(dim),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Double]]())
    val rows = df.select(col(groupCol).cast("string").as("g"),
        col(vecCol).cast("array<double>").as("v"))
      .groupBy(col("g")).agg(mom(col("v")).as("m"))
      .collect()
    rows.flatMap { r =>
      val g = r.getString(0)
      val m = r.getSeq[Double](1)
      val n = m(0).toLong
      if (n < 2) None
      else Some(g -> modelFromMoments(n,
        m.slice(1, 1 + dim).toArray,
        m.slice(1 + dim, m.length).toArray, dim, k))
    }.toMap
  }

  /** Project every row with ITS group's model: the per-group components
    * ride a broadcast join as literal-like arrays and the projection is
    * zip_with/aggregate — one broadcast, no shuffle, codegen'd. Rows
    * whose group has no model (under-sized) are dropped. Output adds a
    * `pcs` array column (k centered projections). */
  def transformPerGroup(df: DataFrame, models: Map[String, Model],
      groupCol: String, vecCol: String): DataFrame = {
    require(models.nonEmpty, "no group models")
    val spark = df.sparkSession
    import spark.implicits._
    val modelRows = models.toSeq.map { case (g, m) =>
      (g, m.components.map(_.toSeq).toSeq,
        m.components.map(c =>
          c.zip(m.means).map { case (a, b) => a * b }.sum).toSeq)
    }
    val mdf = broadcast(
      modelRows.toDF("__g", "__comps", "__offs"))
    df.join(mdf, col(groupCol).cast("string") === col("__g"))
      .withColumn("pcs", zip_with(
        // let-bound: the unbound cast would re-widen the vector per
        // component (HOF-CSE, BASELINE.md round 8)
        graft.functions.TextFunctions.bound(
          col(vecCol).cast("array<double>")) { v =>
          transform(col("__comps"), c =>
            aggregate(zip_with(v, c, (x, w) => x * w),
              lit(0.0), (s, x) => s + x))
        },
        col("__offs"), (p, o) => p - o))
      .drop("__g", "__comps", "__offs")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvector COLUMNS). O(sweeps·d³), driver-side; d is
    * the embedding width, not the corpus size. */
  def jacobiEigen(m: Array[Array[Double]], maxSweeps: Int = 50,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scale = math.max(1.0, a.indices.map(i => math.abs(a(i)(i))).max)
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            // smaller root of t² + 2tθ − 1 = 0 (zeroes a(p)(q))
            val t = if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            rotate(a, v, p, q, c, s, d)
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int, c: Double, s: Double, d: Int): Unit = {
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      i += 1
    }
    i = 0
    while (i < d) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }
}
