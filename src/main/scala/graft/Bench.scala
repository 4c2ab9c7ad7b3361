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
    // the suite runs as `runs` FULL PASSES and each query reports its MIN
    // across passes: single-run numbers on a shared VM showed 8x phantom
    // swings on unchanged trivial plans (VERDICT r3), and the observed
    // stalls last tens of seconds — so back-to-back attempts of one query
    // share a stall, while whole-suite passes separate the attempts by
    // minutes and reject it. A query that fails is not retried on later
    // passes.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val names = selected.keys.toSeq
    val best = scala.collection.mutable.Map[String, Double]()
    val errors = scala.collection.mutable.Map[String, String]()
    for (pass <- 1 to runs; name <- names if !errors.contains(name)) {
      val fn = selected(name)
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every computed
      // column out of a map-only query, timing the scan instead of the work
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some((e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse(""))
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
        }
      val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      err.foreach(errors(name) = _)
      // release the query's pinned state before the next query:
      // localCheckpoint blocks stay in the block manager until their RDD is
      // GC'd, so a 90-query suite otherwise accumulates every pinned
      // shingle tier / fixpoint state in storage memory and the late
      // queries measure GC pressure, not their own plan (observed: ALS
      // 22 s solo vs 78 s at the end of a full run)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    // a failed query reports NEGATIVE elapsed: visibly broken, never a
    // plausible "fast" measurement
    val results = names.map(n =>
      (n, if (errors.contains(n)) -best(n) else best(n), errors.get(n)))
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
