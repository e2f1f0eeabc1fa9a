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
  * scheduling). Eigenvector sign is fixed so each component's
  * largest-|coordinate| is positive.
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

  /** (count, sums[d], gram[d][d] upper triangle filled symmetric) —
    * one job, partials merged in partition-index order. */
  private def moments(df: DataFrame, vecCol: String,
      dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val rows = df.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0))
    val partials = rows.mapPartitionsWithIndex { (idx, it) =>
      var n = 0L
      val s = new Array[Double](dim)
      val g = Array.ofDim[Double](dim, dim)
      it.foreach { v =>
        require(v.length == dim,
          s"vector length ${v.length} != dim $dim")
        n += 1
        var i = 0
        while (i < dim) {
          val vi = v(i)
          s(i) += vi
          var j = i
          while (j < dim) { g(i)(j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      Iterator.single((idx, n, s, g))
    }.collect().sortBy(_._1)
    val n = partials.map(_._2).sum
    val s = new Array[Double](dim)
    val g = Array.ofDim[Double](dim, dim)
    partials.foreach { case (_, _, ps, pg) =>
      var i = 0
      while (i < dim) {
        s(i) += ps(i)
        var j = i
        while (j < dim) { g(i)(j) += pg(i)(j); j += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < dim) {
      var j = i + 1
      while (j < dim) { g(j)(i) = g(i)(j); j += 1 }
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
    * oracle-checkable face of the Gramian pass. */
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

  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    val (_, mu, cov) = covariance(df, vecCol, dim)
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy { case (v, i) => (-v, i) }
      .map(_._2)
    val comps = order.take(k).map { c =>
      val vec = Array.tabulate(dim)(r => vectors(r)(c))
      // sign convention: largest-|coordinate| positive
      val m = vec.maxBy(math.abs)
      if (m < 0) vec.map(-_) else vec
    }
    Model(dim, k, mu, comps, order.take(k).map(values),
      values.sum)
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
