package graft

/** Clustering-parity queries (SURVEY.md §2.9/§2.10) — filled in by the
  * engine milestone; ML fits are seed-pinned and exposed as rows-only
  * checks (no SQL oracle), metric formulas (entropy/radius/means) are
  * oracle-checked in RelationalQueries/MetricQueries instead.
  */
object MLQueries {
  def all: Seq[GraftQuery] = Seq.empty
}
