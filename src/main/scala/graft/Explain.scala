package graft

/** Plan-audit tool: prints the formatted physical plan of selected
  * registry queries so scan pushdown, broadcast choices, and codegen
  * spans can be reviewed (`sbt "runMain graft.Explain q02_filter_project ..."`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Main.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q04_multi_join_agg", "q13_minmax_scale")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
