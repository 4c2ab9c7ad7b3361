package graft

/** Benchmark harness — the driver's per-round performance gate.
  *
  * Output protocol (r5, driven by the r4 driver-bench forensics): the
  * driver keeps only the LAST ~2 KB of stdout, so a single 91-query JSON
  * line gets its HEAD cut off and nothing parses (`BENCH_r04.json`:
  * `parsed: null`, 26 queries invisible). The harness now prints, in order:
  *   1. one `{"bench_pass":…}` line per query per pass (per-pass seconds,
  *      GC-time delta, storage-memory high-water) — the attribution trail
  *      for environment divergence; truncated away in the artifact, present
  *      in full logs;
  *   2. the full contract line `{"metric","value","unit","queries":<all>,
  *      "errors","sf"}` — parses completely whenever the consumer keeps
  *      whole stdout;
  *   3. LAST, a compact summary line with the same contract keys but only
  *      the top-10-slowest (plus every errored) query map, plus backend
  *      telemetry (`blas`, gc totals) — short enough that it ALWAYS
  *      survives a tail truncation, so a failing or pathological query can
  *      never be invisible in the artifact again.
  */
object Bench {

  /** Which netlib BLAS implementation spark.ml will actually use — loaded
    * once and stamped into the artifact: VectorBLAS (jdk.incubator.vector
    * present, the fast path build.sbt arranges) vs Java11BLAS/F2jBLAS
    * (silent scalar fallback when the invocation path drops the module).
    * ALS throughput differs ~3x between them (measured r4), so the bench
    * artifact must prove which solver ran. */
  lazy val blasBackend: String =
    try dev.ludovic.netlib.blas.BLAS.getInstance.getClass.getSimpleName
    catch { case _: Throwable => "unavailable" }

  /** Locale-pinned %.3f: the f-interpolator honors the JVM default
    * locale, and a comma-decimal locale would turn every numeric field
    * into `1,234` — invalid JSON, defeating the truncation-survivable
    * summary this protocol exists for. */
  private def f3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).filter(_ > 0).sum
  }

  /** Cross-pass stall detector (VERDICT r12 #7): two rounds in a row spent
    * a verdict cycle attributing environmental stalls from raw per-pass
    * lines (q_pagerank_filtered r10, q_als_recommend r11). A query whose
    * slowest pass exceeds `minSec` seconds AND ran > `ratio`× its fastest
    * pass is flagged `suspect_stall` in the summary artifact — the min is
    * what the query costs, the divergent max is shared-box noise, and the
    * attribution now ships IN the artifact instead of as a next-round
    * investigation. Pure over the recorded pass times so BenchSpec can pin
    * the boundary cases. */
  def suspectStalls(passTimes: Map[String, Seq[Double]],
                    ratio: Double = 3.0, minSec: Double = 5.0): Seq[String] =
    passTimes.toSeq.collect {
      case (name, ts) if ts.size >= 2 && ts.min > 0 &&
        ts.max > minSec && ts.max / ts.min > ratio => name
    }.sorted

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
    // storage-memory high-water sampler: a daemon polling the status
    // tracker, reset per query — post-hoc attribution for "late queries
    // measure GC pressure, not their plan" regressions
    val storagePeak = new java.util.concurrent.atomic.AtomicLong(0L)
    val sampler = new Thread(() => {
      while (true) {
        try {
          val used = spark.sparkContext.statusTracker.getExecutorInfos
            .map(i => i.usedOnHeapStorageMemory + i.usedOffHeapStorageMemory).sum
          storagePeak.getAndAccumulate(used, math.max)
        } catch { case _: Throwable => () }
        Thread.sleep(100)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
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
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    val names = selected.keys.toSeq
    val best = scala.collection.mutable.Map[String, Double]()
    // build/probe split from the best (min-total) pass of each composite
    // staged-index query — the attribution VERDICT r6 asked for: the gate
    // pays index BUILD per pass, so total alone can't show the probe win
    val bestBuild = scala.collection.mutable.Map[String, Double]()
    // GC-time delta of each query's best pass — surfaced for the top-10 in
    // the compact summary so an environmental stall (GC pressure, shared-VM
    // noise) is attributable from the truncation-surviving artifact alone
    // (VERDICT r7: two 3-9x driver regressions were unprovable either way)
    val bestGc = scala.collection.mutable.Map[String, Long]()
    val failedAt = scala.collection.mutable.Map[String, Double]()
    val errors = scala.collection.mutable.Map[String, String]()
    // every successful pass time per query — feeds the suspect_stall flag
    val passTimes =
      scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    // one-time standing-tier builds (EdgeTier etc.) drained under their own
    // telemetry key: attributed to the query that triggered them, so that
    // query's number is explainable and every later probe reads clean
    val tierBuilds = scala.collection.mutable.Map[String, (String, Double)]()
    // the inter-query System.gc() hygiene sweep is a FORCED full collection
    // — its cost is harness protocol, not query GC, and must be separable
    // in the artifact (VERDICT r9 "what's wrong" #2). r10 measured the
    // per-query-per-pass policy at 93.5 s of a 342 s suite (89% of all GC
    // time), so r11 amortizes it: sweep every K queries (default 4) OR
    // immediately when post-clearCache storage residency exceeds a budget
    // — broadcast blocks are reclaimed only by the ContextCleaner on GC,
    // and the residency trigger is what keeps a broadcast-heavy stretch
    // from accumulating for K queries. Both knobs are env-tunable and the
    // artifact records the policy (gc_sweep_every) plus the sweep count
    // (gc_sweeps), so the A/B vs the old per-query policy stays auditable.
    val gcSweepEvery = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_GC_SWEEP_EVERY", "4").toInt)
    // the residency budget is a SAFETY VALVE, not the cadence: unpersist
    // above is non-blocking, so the post-clear reading still counts
    // blocks whose release is in flight — a tight budget (A/B'd at 512 MB)
    // degenerates back to near-per-query sweeping on that phantom signal
    // (255/348 sweeps fired). 2 GiB only catches genuine multi-query
    // accumulation runaway.
    val gcSweepMb =
      sys.env.getOrElse("SPARK_GRAFT_GC_SWEEP_MB", "2048").toLong
    var sinceSweep = 0
    var gcSweeps = 0L
    var gcSweepMs = 0L
    val gcTotal0 = gcMillis
    Telemetry.drain() // discard warmup-era recordings
    for (pass <- 1 to runs; name <- names if !errors.contains(name)) {
      val fn = selected(name)
      storagePeak.set(0L)
      val gc0 = gcMillis
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
      val drained = Telemetry.drain()
      val buildSec = drained.get(name)
      (drained - name).foreach { case (k, sec) =>
        if (!tierBuilds.contains(k)) tierBuilds(k) = (name, sec)
      }
      if (err.isEmpty) passTimes(name) = dt :: passTimes(name)
      if (err.isEmpty && dt < best.getOrElse(name, Double.MaxValue)) {
        best(name) = dt
        bestGc(name) = gcMillis - gc0
        buildSec match {
          case Some(b) => bestBuild(name) = b
          case None => ()
        }
      }
      if (err.nonEmpty) failedAt(name) = dt
      err.foreach(errors(name) = _)
      println(s"""{"bench_pass":$pass,"q":"$name","sec":${f3(dt)},""" +
        s""""gc_ms":${gcMillis - gc0},""" +
        s""""storage_peak_mb":${storagePeak.get() / (1024 * 1024)}""" +
        buildSec.map(b => s""","build_sec":${f3(b)}""").getOrElse("") +
        (drained - name).toSeq.sortBy(_._1)
          .map { case (k, v) => s""","$k":${f3(v)}""" }.mkString +
        err.map(m => s""","err":"$m"""").getOrElse("") + "}")
      // release the query's pinned state before the next query:
      // localCheckpoint blocks stay in the block manager until their RDD is
      // GC'd, so a 90-query suite otherwise accumulates every pinned
      // shingle tier / fixpoint state in storage memory and the late
      // queries measure GC pressure, not their own plan (observed: ALS
      // 22 s solo vs 78 s at the end of a full run). Invariant this sweep
      // relies on: no cross-query persistent state — queries build their
      // own plans from the parquet sources each time (ContractSpec).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      // broadcast blocks are only reclaimed by the ContextCleaner on GC —
      // nudge it so broadcast-heavy fixpoints don't accumulate residency
      // across the suite (VERDICT r4 "what's wrong" #3), but amortized:
      // every K queries, or sooner when residual storage (pinned blocks
      // whose unpersist hasn't landed, broadcasts awaiting the cleaner)
      // stays above the budget after the cache clear
      sinceSweep += 1
      val residentMb =
        try spark.sparkContext.statusTracker.getExecutorInfos
          .map(i => i.usedOnHeapStorageMemory + i.usedOffHeapStorageMemory)
          .sum / (1024 * 1024)
        catch { case _: Throwable => 0L }
      if (sinceSweep >= gcSweepEvery || residentMb >= gcSweepMb) {
        val gcSweep0 = gcMillis
        System.gc()
        gcSweepMs += gcMillis - gcSweep0
        gcSweeps += 1
        sinceSweep = 0
      }
    }
    // a failed query reports NEGATIVE elapsed — visibly broken, never a
    // plausible "fast" measurement — using the FAILING attempt's own
    // elapsed (a query that succeeded on pass 1 and failed on pass 2 must
    // not report its successful time as the failure's)
    val results = names.map { n =>
      val v = if (errors.contains(n)) -failedAt.getOrElse(n, 0.0)
              else best.getOrElse(n, Double.NaN)
      (n, v, errors.get(n))
    }
    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v, _) => k -> v.toString })
    val errs = jmap(results.collect { case (k, _, Some(m)) => k -> ("\"" + m + "\"") })
    val total = results.collect { case (_, v, None) => v }.sum
    // full contract line: complete per-query map (parses when stdout is
    // kept whole; its head is what a 2 KB tail cut sacrifices)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    // compact summary LAST — inside any tail window: top-10 slowest plus
    // every errored query, totals, pass count and the BLAS backend proof
    val top = (results.filter(_._3.isDefined) ++
        results.filter(_._3.isEmpty).sortBy(-_._2).take(10)).distinct
    val topQs = jmap(top.map { case (k, v, _) => k -> f3(v) })
    // staged-index attribution: each composite gate's best pass split into
    // index build vs probe (probe = total − build) so the artifact shows
    // the standing-index probe cost round-over-round
    val split = jmap(bestBuild.toSeq.sortBy(_._1).map { case (k, b) =>
      k -> s"""{"build":${f3(b)},"probe":${f3(best(k) - b)}}"""
    })
    // per-query GC delta (best pass) for the same top-10 set — reads as
    // "this query's number includes N ms of GC" next to its seconds
    val topGc = jmap(top.collect { case (k, _, None) if bestGc.contains(k) =>
      k -> bestGc(k).toString })
    // one-time standing-tier builds, attributed to their triggering query
    val tiers = jmap(tierBuilds.toSeq.sortBy(_._1).map { case (k, (q, sec)) =>
      k -> s"""{"q":"$q","sec":${f3(sec)}}"""
    })
    // cross-pass stall attribution (see suspectStalls): queries whose pass
    // times diverged >3x with a >5 s slow pass — environmental noise the
    // min-of-passes protocol rejected, named in the artifact
    val stalls = suspectStalls(passTimes.toMap)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${names.size},"n_errors":${errors.size},"runs":$runs,"blas":"$blasBackend","gc_ms_total":${gcMillis - gcTotal0},"gc_ms_sweep":$gcSweepMs,"gc_sweeps":$gcSweeps,"gc_sweep_every":$gcSweepEvery,"suspect_stall":$stalls,"tier_build":$tiers,"index_split":$split,"gc_ms":$topGc,"queries":$topQs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
