package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, appName = "graft-bench")
    // warmup outside the timed region: without it the first measured query
    // absorbs several seconds of classloader + codegen-compiler startup and
    // its number is position-dependent, not workload-dependent. Best-effort:
    // a missing warmup table must not kill the run before the per-query
    // harness (which contains failures) even starts.
    try {
      spark.range(1000000).selectExpr("sum(id) AS s")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // optional args: bench only the named queries (local profiling aid)
    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.contains).toMap
      else SparkEntry.queries
    // each query runs twice and reports the MIN: single-run numbers on a
    // shared VM showed 8x phantom swings on unchanged trivial plans
    // (VERDICT r3), so one noisy descheduling event must not define a
    // query's round-over-round delta. A failed run is not retried.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = selected.map { case (name, fn) =>
      var best = Double.MaxValue
      var err: Option[String] = None
      var attempt = 0
      while (attempt < runs && err.isEmpty) {
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune every computed
        // column out of a map-only query, timing the scan instead of the work
        err =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable =>
            Some((e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse(""))
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
          }
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        attempt += 1
      }
      // a failed query reports NEGATIVE elapsed: visibly broken, never a
      // plausible "fast" measurement
      (name, if (err.isDefined) -best else best, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
