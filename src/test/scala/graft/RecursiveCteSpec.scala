package graft

/** Engine-behavior pin for Spark 4.1 recursive CTEs (`WITH RECURSIVE`,
  * planned via UnionLoop): UNION ALL recursion works — including the
  * join-shaped recursive member — while UNION (distinct) recursion
  * raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE. The distinction decides
  * what the engine can express declaratively: acyclic (DAG) recursion
  * is safe, while fixpoint iteration over a CYCLIC graph (undirected
  * connected components) needs the dedup semantics UNION ALL lacks and
  * stays with the dedicated operator (Dedup.connectedComponents) and
  * the unrolled-round pattern (q120/q158). The registry's DuckDB
  * oracles CAN use UNION-distinct recursion (q85 does) — this spec is
  * why the Spark side of those queries is an operator, not the same
  * recursive SQL.
  */
class RecursiveCteSpec extends GraftSuite {

  test("UNION ALL recursion: series and join-shaped members evaluate") {
    val s = spark.sql(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL " +
        "SELECT n + 1 FROM t WHERE n < 5) SELECT sum(n) AS s FROM t")
      .head().getLong(0)
    assert(s === 15L)
    // DAG reachability via a join-shaped recursive member: chain
    // 1→2→3→4 plus a side edge 2→4; closure has all 6 ordered pairs
    spark.sql("DROP VIEW IF EXISTS rec_edges")
    spark.sql("CREATE TEMP VIEW rec_edges AS " +
      "SELECT * FROM VALUES (1,2),(2,3),(3,4),(2,4) AS e(src, dst)")
    val pairs = spark.sql(
      "WITH RECURSIVE reach(src, dst) AS (" +
        "SELECT src, dst FROM rec_edges UNION ALL " +
        "SELECT r.src, e.dst FROM reach r JOIN rec_edges e " +
        "ON e.src = r.dst) " +
        "SELECT DISTINCT src, dst FROM reach ORDER BY src, dst")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(pairs === Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)))
  }

  test("UNION (distinct) recursion is rejected with the documented error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("WITH RECURSIVE t(n) AS (SELECT 1 UNION " +
        "SELECT (n % 4) + 1 FROM t) SELECT count(*) FROM t").collect()
    }
    assert(e.getCondition === "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE")
  }
}
