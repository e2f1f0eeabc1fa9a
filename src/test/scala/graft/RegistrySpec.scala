package graft

/** Contract checks for the driver-facing registry: every query runs on the
  * smoke data, names are unique, and every oracle key has a query. */
class RegistrySpec extends GraftSuite {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracleSql key has a matching queries entry") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // schemas observed by the per-query run tests, reused by the nested-
  // output lint below so it doesn't re-run the whole ML workload (an
  // oracled q187 `run` executes six training rounds before returning
  // its DataFrame — r9 ADVICE)
  private val seenSchemas =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      seenSchemas.synchronized { seenSchemas(q.name) = df.schema }
      // force full execution, not just planning
      df.count()
    }
  }

  test("no oracled query exposes a top-level array/map/struct column") {
    // The driver's pandas comparison lexsorts result cells and dies on
    // nested cells ("unhashable type: numpy.ndarray" — q169, r8). Any
    // list-shaped output in an oracled query must be string-joined (the
    // q70 convention: array_join(sort_array(xs), '|')). Uses the
    // schemas cached by the run tests above; falls back to q.run only
    // when a query wasn't executed this session (e.g. `-z` test
    // filtering), so the lint itself stays cheap.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val oracled = SparkEntry.oracleSql.keySet
    val offenders = Registry.all.filter(q => oracled(q.name)).flatMap { q =>
      val schema = seenSchemas.synchronized {
        seenSchemas.getOrElseUpdate(q.name, q.run(spark, sf).schema)
      }
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      if (bad.isEmpty) None else Some(s"${q.name}: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"nested output columns in oracled queries: ${offenders.mkString("; ")}")
  }

  test("oracle-checked queries are deterministic across runs") {
    for (name <- Seq("q01_pricing_summary", "q05_window_topk",
        "q26_knn_brute_force")) {
      val q = Registry.byName(name)
      val a = q.run(spark, sf).collect().toSeq
      val b = q.run(spark, sf).collect().toSeq
      assert(a === b, s"$name not deterministic")
    }
  }
}
