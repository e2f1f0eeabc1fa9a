package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization — the storage-tier companion to
  * PQ ([[PqIndex]]): per dimension, the corpus min/max define a linear
  * [0, 255] code, cutting an fp32 embedding store 4× while keeping
  * per-dimension resolution (the faiss `SQ8` / vector-DB default).
  * Unlike PQ the codes decode independently per dimension, so filters
  * and partial scans stay cheap; PQ remains the ANN-search compression.
  *
  * Everything is min/max + affine arithmetic, so the whole pipeline —
  * bounds, every code, the reconstruction error — is exactly
  * SQL-replayable (q194). 100 TB shape: bounds are ONE aggregation
  * (64 rows out), codes are a map-side expression against the
  * broadcast bounds, and the audit (code checksum + reconstruction
  * error per vector) rides the same pass. */
object ScalarQuant {

  /** Per-dimension (min, max) of the embedding column — a bounded
    * dim-row artifact, collected like centroids. */
  def bounds(embeddings: DataFrame, idCol: String, vecCol: String)
      : (Seq[Double], Seq[Double]) = {
    // ragged vectors would silently alias dimensions in the posexplode
    // grouping (and decode garbage) — reject them up front
    val dims = embeddings
      .agg(countDistinct(size(col(vecCol)))).head().getLong(0)
    require(dims <= 1,
      s"embeddings must share one dimensionality, found $dims distinct")
    val rows = embeddings
      .select(posexplode(Similarity.asDouble(col(vecCol)))
        .as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("j"))
      .collect()
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  /** Quantize + audit in one map-side pass: (id, code_sum — exact int
    * checksum of all codes, recon_err — squared-L2 between the vector
    * and its dequantized self, 6 dp). Constant dimensions (max == min)
    * code to 0 and decode to their constant. */
  def quantizeReport(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val (mns, mxs) = bounds(embeddings, idCol, vecCol)
    val dim = mns.length
    val mnL = typedLit(mns)
    val mxL = typedLit(mxs)
    val q = graft.functions.TextFunctions.bound(
        Similarity.asDouble(col(vecCol))) { v =>
      val codes = transform(sequence(lit(1), lit(dim)), i => {
        val x = element_at(v, i)
        val mn = element_at(mnL, i)
        val mx = element_at(mxL, i)
        when(mx - mn > 0,
          round((x - mn) / (mx - mn) * 255.0).cast("long"))
          .otherwise(lit(0L))
      })
      graft.functions.TextFunctions.bound(codes) { cs =>
        val dq = transform(sequence(lit(1), lit(dim)), i => {
          val mn = element_at(mnL, i)
          val mx = element_at(mxL, i)
          mn + element_at(cs, i).cast("double") / 255.0 * (mx - mn)
        })
        val err = aggregate(
          zip_with(v, dq, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
        struct(
          aggregate(cs, lit(0L), (acc, x) => acc + x).as("code_sum"),
          round(err, 6).as("recon_err"))
      }
    }
    embeddings.select(col(idCol).cast("long").as("vec_id"), q.as("q"))
      .select(col("vec_id"), col("q.code_sum").as("code_sum"),
        col("q.recon_err").as("recon_err"))
      .orderBy(col("vec_id"))
  }
}
