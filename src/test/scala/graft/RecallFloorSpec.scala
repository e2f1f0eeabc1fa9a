package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The recall floor must gate at EXECUTION time (lazy plan, loud failure)
  * — round-3's eager collect version made the whole ANN pipeline run at
  * query-construction time. */
class RecallFloorSpec extends GraftSuite {
  import spark.implicits._

  private def recalls(vals: Double*) =
    vals.zipWithIndex.map { case (r, i) => (i.toLong, r) }
      .toDF("query_id", "recall")

  test("passing floor tags rows with min_recall and keeps values") {
    val out = Similarity.assertRecallFloor(recalls(0.4, 0.6), 0.3)
    val rows = out.orderBy("query_id").collect()
    assert(rows.map(_.getAs[Double]("recall")).toSeq === Seq(0.4, 0.6))
    assert(rows.map(_.getAs[Double]("min_recall")).toSeq === Seq(0.3, 0.3))
  }

  test("construction is lazy; failure surfaces on execution") {
    // construction must NOT throw even though the mean is below the floor
    val out = Similarity.assertRecallFloor(recalls(0.1, 0.1), 0.9)
    val e = intercept[Exception](out.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("recall regression")), e.getMessage)
  }

  test("per-SF floor table: catalogued SFs resolve, unknown corpora " +
      "fall back to the most conservative floor") {
    val F = Similarity.RecallFloors
    // every catalogued floor sits above its SF's chance level
    // (k/N = 0.02 at sf0.001/sf0.01 with N=500, 0.005 at sf0.1 N=2000)
    for (q <- Seq("q47", "q66", "q93", "q115");
         sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val chance = if (sf == "sf0.1") 0.005 else 0.02
      assert(F.floor(q, s"/root/testdata/$sf") > chance,
        s"$q@$sf floor not above chance")
    }
    // sf0.1's q115 floor is the scale-aware one that replaced the pin
    assert(F.floor("q115", "/root/testdata/sf0.1") === 0.04)
    assert(F.floor("q115", "/root/testdata/sf0.001") === 0.15)
    // unknown directory → the query's minimum catalogued floor
    assert(F.floor("q115", "/some/user/corpus") === 0.04)
    assert(F.floor("q66", "/some/user/corpus") === 0.25)
  }

  test("empty recall table yields empty output (caught by row counts)") {
    // AQE empty-relation propagation elides the gate join on empty input;
    // emptiness is the driver's rows>0 check's job, the gate guards values
    val out = Similarity.assertRecallFloor(recalls().limit(0), 0.1)
    assert(out.collect().isEmpty)
    assert(out.columns.contains("min_recall"))
  }
}
