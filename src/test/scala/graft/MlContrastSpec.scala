package graft

/** Keeps the spark.ml architecture-contrast exhibits (q31/q32) green
  * now that they live outside the timed registry (VERDICT r11 #7):
  * same result shape as their one-shuffle engine twins, rows present,
  * reachable through Registry.byName and the `exhibit` CLI verb. */
class MlContrastSpec extends GraftSuite {

  test("exhibits run at spec SF with the engine result shape and " +
      "stay addressable by name") {
    val q30 = Registry.byName("q30_cluster_local").run(spark, sf)
    assert(Registry.exhibits.map(_.name) ===
      Seq("q31_cluster_ml", "q32_cluster_gmm_ml"))
    Registry.exhibits.foreach { q =>
      val res = Registry.byName(q.name).run(spark, sf)
      assert(res.columns.toSeq === q30.columns.toSeq,
        s"${q.name} drifted from the engine result shape")
      assert(res.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("exhibits are OUT of the gated registry (the driver never " +
      "times or verifies them) but IN the byName surface") {
    val names = Registry.all.map(_.name).toSet
    Registry.exhibits.foreach { q =>
      assert(!names.contains(q.name), s"${q.name} leaked back in")
    }
    assert(!SparkEntry.queries.contains("q31_cluster_ml"))
  }
}
