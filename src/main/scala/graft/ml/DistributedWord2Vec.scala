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
  * U-terms and V-terms side-tagged into a single (side, word, dim)
  * sum (the q187 one-aggregation contract), so the corpus-sized
  * training set is scanned once per round and gradient traffic is
  * vocab-sized, never corpus-sized; the three vector joins per pair
  * broadcast the tiny vocab matrices. The exact decimal sum is
  * order-insensitive, so adding the side key to the grouping leaves
  * every gradient bit-identical to the two-aggregation form.
  */
object DistributedWord2Vec {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, x) => acc + x)

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
    // u is persisted by the round loop; the gradients are baked in, so
    // the training inputs can release their storage now
    pairs.unpersist()
    v.unpersist()
    u.select($"w".as("word"), $"j", round($"x", 6).as("u"))
      .orderBy($"word", $"j")
  }

  /** Both matrices + the training pairs, for spec-side objective
    * checks (mean positive-pair sigmoid must rise across training). */
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
    // init component for matrix tag ("u"/"v"): md5-derived in [-.5/dim, .5/dim)
    def init(tag: String): DataFrame = vsorted
      .select($"w", explode(sequence(lit(0), lit(dim - 1))).as("j"))
      .select($"w", $"j",
        ((conv(substring(md5(concat_ws("|", $"w", lit(tag),
            $"j".cast("string"))), 1, 6), 16, 10).cast("long")
          .cast("double") / lit(16777215.0) - lit(0.5)) / lit(dim.toDouble))
          .as("x"))
    def asVec(m: DataFrame, vecName: String): DataFrame = m
      .groupBy($"w")
      .agg(array_sort(collect_list(struct($"j", $"x"))).as("px"))
      .select($"w", transform($"px", e => e.getField("x")).as(vecName))
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
    for (_ <- 1 to rounds) {
      val uv = asVec(u, "uc")
      val vv = asVec(v, "vv")
      val scored = pairs
        .join(broadcast(uv.select($"w".as("c"), $"uc")), "c")
        .join(broadcast(vv.select($"w".as("o"), $"vv".as("vo"))), "o")
        .join(broadcast(vv.select($"w".as("nw"), $"vv".as("vn"))), "nw")
        .select($"c", $"o", $"nw", $"uc", $"vo", $"vn",
          (sig6(dot($"uc", $"vo")) - lit(1.0)).as("gpos"),
          sig6(dot($"uc", $"vn")).as("gneg"))
      // ONE corpus-sized aggregation per round: each pair row emits
      // its u-terms (per j: gpos·vo[j] + gneg·vn[j], keyed by the
      // center word), its v-context terms (gpos·uc[j], keyed by o) and
      // its v-negative terms (gneg·uc[j], keyed by nw) into a single
      // side-tagged explode, summed per (side, word, j). gpos/gneg are
      // plain attributes here, so the transform lambdas re-read
      // columns, not recomputed sigmoids (the HOF-CSE trap).
      // Per-word MEAN gradients (sum/count): a summed batch gradient
      // scales with word frequency and lr·Σ overshoots (measured: the
      // positive sigmoid FELL 0.50 → 0.44 between rounds), while a
      // global 1/N would quantize rare words' updates to zero at 6 dp —
      // the per-word mean keeps every update O(lr·σ'·|v|) and stays
      // relational (count rides the same aggregation)
      val js = sequence(lit(0), lit(dim - 1))
      val g = scored
        .select(explode(concat(
          transform(js, j => struct(lit("u").as("side"), $"c".as("w"),
            j.as("j"), ($"gpos" * element_at($"vo", j + 1) +
              $"gneg" * element_at($"vn", j + 1)).as("t"))),
          transform(js, j => struct(lit("v").as("side"), $"o".as("w"),
            j.as("j"), ($"gpos" * element_at($"uc", j + 1)).as("t"))),
          transform(js, j => struct(lit("v").as("side"), $"nw".as("w"),
            j.as("j"), ($"gneg" * element_at($"uc", j + 1)).as("t")))))
          .as("e"))
        .select($"e.side", $"e.w", $"e.j", $"e.t")
        .groupBy($"side", $"w", $"j")
        .agg(sum(round($"t", 9).cast(DecimalType(28, 9)))
          .cast("double").as("g"), count(lit(1)).as("cnt"))
        .persist()
      g.count() // the round's one corpus-sized job
      def step(m: DataFrame, grad: DataFrame): DataFrame =
        m.join(grad.drop("side"), Seq("w", "j"), "left")
          .select($"w", $"j",
            round($"x" - lit(lr) * (coalesce($"g" /
              $"cnt".cast("double"), lit(0.0))), 6).as("x"))
      val (u0, v0) = (u, v)
      u = step(u0, g.filter($"side" === "u")).persist()
      v = step(v0, g.filter($"side" === "v")).persist()
      // vocab×dim-sized jobs: pin the new matrices, then release the
      // round's gradients and the superseded matrices
      u.count(); v.count()
      g.unpersist()
      u0.unpersist(); v0.unpersist()
    }
    vsorted.unpersist()
    (u, v, pairs)
  }
}
