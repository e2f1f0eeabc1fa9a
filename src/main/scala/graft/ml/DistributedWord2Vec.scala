package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** REPLAYABLE skip-gram-with-negative-sampling word2vec — the q187
  * logistic-regression contract applied to embedding training, closing
  * the last model family without an oracle-able fit face (q81's
  * spark.ml Word2Vec stays the seeded production path; its SGD visits
  * examples in stream order, which no relational engine can replay).
  *
  * What makes THIS face a pure function of the corpus, replayable by
  * any SQL engine (q191):
  *
  *  - vocabulary = words with count ≥ minCount, indexed by
  *    (count DESC, word) — a deterministic total order;
  *  - init: U/V matrices from md5 — component (w, j) is
  *    (md5int6("w|u|j") / 0xFFFFFF − 0.5) / dim (the q179 hyperplane
  *    trick shaped into small centred floats);
  *  - training set: forward-adjacent in-vocab token pairs; ONE negative
  *    per pair, drawn portably as vocab[md5int8(c|o|doc|pos) mod V] —
  *    deterministic negative sampling;
  *  - optimisation: full-BATCH gradient descent (not SGD) — per round,
  *    each pair contributes σ'(u_c·v_o)-shaped terms; per-(word, dim)
  *    contributions are quantized at 9 dp and summed as DECIMAL(28,9)
  *    (exact, order-insensitive — the q177/q189 reduction contract),
  *    then the update u ← u − lr·g re-quantizes at 6 dp (the q158
  *    round-boundary contract). Dots are quantized at 6 dp BEFORE the
  *    sigmoid so libm exp wobble is absorbed (the q182 precedent);
  *    both U and V update simultaneously from round-start values.
  *
  * 100 TB shape: ONE aggregation per round — every pair row emits its
  * U-terms and V-terms side-tagged into a single (side, word) group
  * (the q187 one-aggregation contract), so the corpus-sized training
  * set is scanned once per round and gradient traffic is vocab-sized,
  * never corpus-sized; the three vector joins per pair broadcast the
  * tiny vocab matrices. The exact decimal sum is order-insensitive,
  * so adding the side key to the grouping leaves every gradient
  * bit-identical to the two-aggregation form.
  *
  * Allocation shape (VERDICT r13 #1): embeddings stay array<double>
  * columns END-TO-END. The previous formulation exploded every pair
  * into 3·dim (side, word, j, t) struct rows per round and rebuilt
  * per-word arrays with array_sort(collect_list(struct)) — measured
  * GC-bound (gc = 80-90% of the slow bench repeats). Here a pair
  * emits THREE rows (one per gradient side), each carrying a
  * primitive dim-length term array built by zip_with/transform, and
  * the per-dimension decimal sums ride ONE codegen'd HashAggregate as
  * dim parallel sum columns — per element the SAME round(t,9) →
  * DECIMAL(28,9) → exact sum → double chain as the row form, so every
  * gradient (and therefore every trained component and the q191 hash)
  * is bit-identical; only the row volume (3 vs 3·dim per pair) and
  * the collect_list rebuilds changed.
  */
object DistributedWord2Vec {

  /** Dot product via the native codegen kernel — bit-equal to the
    * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)` HOF fold (same
    * mul-then-add order), but fused: the HOF form runs interpreted and
    * boxes every element, which made the dots the gradient job's
    * dominant allocation (VERDICT r13 #1). */
  private def dot(a: Column, b: Column): Column =
    graft.expressions.ArrayDot(a, b)

  /** σ(round(d, 6)) rounded to 6 dp — the replayable sigmoid. */
  private def sig6(d: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-round(d, 6))), 6)

  /** Train `rounds` batch-GD rounds; returns the final INPUT matrix
    * unrolled as (word, j, u) — every component 6-dp quantized, one row
    * per (vocab word, dimension). */
  def fitReplayable(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 8, minCount: Int = 5, rounds: Int = 2,
      lr: Double = 0.5): DataFrame = {
    val (u, v, pairs) = fitMatrices(docs, idCol, textCol, dim, minCount,
      rounds, lr)
    val spark = docs.sparkSession
    import spark.implicits._
    // u/v are LocalRelations (driver-resident matrices); the gradients
    // are baked in, so the training pairs can release their storage now
    pairs.unpersist()
    u.select($"w".as("word"), posexplode($"x").as(Seq("j", "c")))
      .select($"word", $"j", round($"c", 6).as("u"))
      .orderBy($"word", $"j")
  }

  /** Spark's `round(x, 6)` for doubles, replicated EXACTLY on the
    * driver (RoundBase: BigDecimal from Double.toString, HALF_UP, back
    * to double) — the driver-side half of the round-boundary contract.
    * java.math.BigDecimal.valueOf(x) IS new BigDecimal(
    * Double.toString(x)), the same construction Scala's
    * BigDecimal(Double) delegates to inside Spark's kernel. */
  private[ml] def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Both matrices (w, x: array<double>) + the training pairs, for
    * spec-side objective checks (mean positive-pair sigmoid must rise
    * across training).
    *
    * Job shape (VERDICT r13 #1, second half): the matrices are
    * DRIVER-RESIDENT between rounds — vocab-sized by the SAME bound
    * the previous formulation already assumed when it broadcast both
    * matrices into every round's joins, so nothing new is asked of the
    * driver. Each round is then exactly ONE Spark job: the corpus-
    * sized gradient aggregation, collected (2·V rows of dim decimal
    * sums + a count). The update u ← u − lr·(g/cnt) re-quantized at
    * 6 dp runs on the driver with [[round6]] — bit-identical to the
    * Catalyst `round(.., 6)` it replaces (q191's 3-SF hash is the
    * gate). The previous shape spent ~2/3 of its wall on per-round
    * persist/count/broadcast-build jobs over 31-row frames. */
  private[graft] def fitMatrices(docs: DataFrame, idCol: String,
      textCol: String, dim: Int, minCount: Int, rounds: Int,
      lr: Double): (DataFrame, DataFrame, DataFrame) = {
    require(dim >= 1 && rounds >= 1 && minCount >= 1 && lr > 0,
      s"bad hyperparameters: dim=$dim rounds=$rounds " +
        s"minCount=$minCount lr=$lr")
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .filter(length($"w") > 0)
    val vsorted = tok.groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
      .select($"w", (row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"n".desc, $"w")) - 1).as("idx"))
      .persist()
    val vCount = vsorted.count()
    require(vCount >= 2, s"vocabulary too small: $vCount")
    val js = sequence(lit(0), lit(dim - 1))
    // init vector for matrix tag ("u"/"v"): per component j an
    // md5-derived double in [-.5/dim, .5/dim) — same expression as the
    // historical per-(w, j) row form, built straight into the array
    // and collected ONCE (vocab-sized; Spark's own md5/conv kernels,
    // so no driver re-implementation of the hex derivation)
    def init(tag: String): Array[(String, Seq[Double])] = vsorted
      .select($"w", transform(js, j =>
        (conv(substring(md5(concat_ws("|", $"w", lit(tag),
            j.cast("string"))), 1, 6), 16, 10).cast("long")
          .cast("double") / lit(16777215.0) - lit(0.5))
          / lit(dim.toDouble)).as("x"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    // in-vocab forward-adjacent pairs + the portable negative draw
    val tv = tok.join(broadcast(vsorted), "w")
      .select($"doc_id", $"pos", $"w")
    val pairs = tv.as("a").join(tv.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + 1)
      .select(col("a.doc_id").as("doc_id"), col("a.pos").as("pos"),
        col("a.w").as("c"), col("b.w").as("o"))
      .withColumn("nidx", pmod(
        conv(substring(md5(concat_ws("|", $"c", $"o",
          $"doc_id".cast("string"), $"pos".cast("string"))), 1, 8),
          16, 10).cast("long"), lit(vCount)))
      .join(broadcast(vsorted.select($"idx".as("nidx"), $"w".as("nw"))),
        "nidx")
      .select($"c", $"o", $"nw")
      .persist()
    // no eager count: the first round's gradient job materializes the
    // pair cache on its way through (one scan fills both caches)
    var u = init("u")
    var v = init("v")
    // local matrix → broadcast-able LocalRelation: building the
    // broadcast needs NO cluster job (LocalTableScan collects on the
    // driver thread), so each round schedules exactly one job
    def matDf(m: Array[(String, Seq[Double])]): DataFrame =
      m.toSeq.toDF("w", "x")
    for (_ <- 1 to rounds) {
      val uDf = matDf(u)
      val vDf = matDf(v)
      val scored = pairs
        .join(broadcast(uDf.select($"w".as("c"), $"x".as("uc"))), "c")
        .join(broadcast(vDf.select($"w".as("o"), $"x".as("vo"))), "o")
        .join(broadcast(vDf.select($"w".as("nw"), $"x".as("vn"))),
          "nw")
        .select($"c", $"o", $"nw", $"uc", $"vo", $"vn",
          (sig6(dot($"uc", $"vo")) - lit(1.0)).as("gpos"),
          sig6(dot($"uc", $"vn")).as("gneg"))
      // ONE corpus-sized aggregation per round: each pair row emits
      // its u-term array (per j: gpos·vo[j] + gneg·vn[j], keyed by the
      // center word), its v-context terms (gpos·uc[j], keyed by o) and
      // its v-negative terms (gneg·uc[j], keyed by nw) as THREE
      // side-tagged rows, summed per (side, word) with dim parallel
      // decimal-sum columns. gpos/gneg are plain attributes here, so
      // the array lambdas re-read columns, not recomputed sigmoids
      // (the HOF-CSE trap).
      // Per-word MEAN gradients (sum/count): a summed batch gradient
      // scales with word frequency and lr·Σ overshoots (measured: the
      // positive sigmoid FELL 0.50 → 0.44 between rounds), while a
      // global 1/N would quantize rare words' updates to zero at 6 dp —
      // the per-word mean keeps every update O(lr·σ'·|v|) and stays
      // relational (count rides the same aggregation)
      val gAggs = (1 to dim).map(j =>
        sum(round(element_at($"t", j), 9).cast(DecimalType(28, 9)))
          .cast("double").as(s"g$j")) :+ count(lit(1)).as("cnt")
      // term arrays are built with codegen'd array(element_at(..))
      // children, NOT zip_with/transform lambdas: higher-order
      // functions run interpreted and box every element — the same GC
      // class as the dots above (and SimplifyExtractValueOps collapses
      // the downstream element_at(array(..), j) back to the scalar
      // product, so no intermediate array survives optimization)
      def elems(f: Int => Column): Column =
        array((1 to dim).map(f): _*)
      // the round's ONE corpus-sized job: aggregate and collect the
      // vocab-sized gradient table (2·V rows, dim sums + a count)
      val gRows = scored
        .select(explode(array(
          struct(lit("u").as("side"), $"c".as("w"),
            elems(j => $"gpos" * element_at($"vo", j) +
              $"gneg" * element_at($"vn", j)).as("t")),
          struct(lit("v").as("side"), $"o".as("w"),
            elems(j => $"gpos" * element_at($"uc", j)).as("t")),
          struct(lit("v").as("side"), $"nw".as("w"),
            elems(j => $"gneg" * element_at($"uc", j)).as("t")))).as("e"))
        .select($"e.side", $"e.w", $"e.t")
        .groupBy($"side", $"w")
        .agg(gAggs.head, gAggs.tail: _*)
        .collect()
      val gMap: Map[(String, String), (IndexedSeq[Double], Long)] =
        gRows.map { r =>
          ((r.getString(0), r.getString(1)),
            ((0 until dim).map(j => r.getDouble(2 + j)),
              r.getLong(2 + dim)))
        }.toMap
      // driver-side update — the exact op sequence of the Catalyst
      // form round(x − lr·coalesce(g/cnt, 0.0), 6): divide, multiply,
      // subtract, HALF_UP 6-dp re-quantize ([[round6]]); a word with
      // no gradient row keeps round6(x) (x − lr·0.0 ≡ x in IEEE)
      def step(m: Array[(String, Seq[Double])],
          side: String): Array[(String, Seq[Double])] =
        m.map { case (w, x) =>
          (w, gMap.get((side, w)) match {
            case Some((gj, cnt)) => (0 until dim).map(j =>
              round6(x(j) - lr * (gj(j) / cnt.toDouble)))
            case None => x.map(round6)
          })
        }
      u = step(u, "u")
      v = step(v, "v")
    }
    vsorted.unpersist()
    (matDf(u), matDf(v), pairs)
  }
}
