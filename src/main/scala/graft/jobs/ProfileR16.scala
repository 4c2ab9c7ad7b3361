package graft.jobs

import org.apache.spark.sql.functions._

/** Round-16 measurement scratchpad (guide §1: measure first). Times the
  * building blocks of the bench heavies in isolation — noop-sunk, labeled
  * — so optimization targets are chosen from numbers, not guesses.
  * Usage: runMain graft.jobs.ProfileR16 <sfDir> <probe> [args...]
  */
object ProfileR16 {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probe = args.lift(1).getOrElse("pagerank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, appName = "graft-profile-r16")
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup (classloader + codegen)
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()

    probe match {
      case "pagerank" =>
        val edges = t("tier probe (count)") {
          val e = graft.graph.EdgeTier.coOccurrence(spark, sfDir)
          println(s"[profile] edges=${e.count()}")
          e
        }
        t("edge scan noop")(noop(edges))
        // the fixpoint's own prep, mirrored from PageRankOp.pageRank
        val vd = t("vertex+degree agg") {
          val v = edges.select(explode(array(
              struct(col("src").as("id"), lit(1L).as("c")),
              struct(col("dst").as("id"), lit(0L).as("c")))).as("x"))
            .select(col("x.id").as("id"), col("x.c").as("c"))
            .groupBy(col("id")).agg(sum(col("c")).as("outDeg"))
          println(s"[profile] vertices=${v.count()}")
          v
        }
        val outDeg = vd.filter(col("outDeg") > 0)
          .select(col("id").as("src"), col("outDeg"))
        import org.apache.spark.sql.expressions.Window
        def ewVariant(kind: String): org.apache.spark.sql.DataFrame = kind match {
          case "join" => edges.join(outDeg, Seq("src"))
            .select(col("src"), col("dst"), (lit(1.0) / col("outDeg")).as("w"))
            .repartition(col("src"))
          case "bcast" => edges.join(broadcast(outDeg), Seq("src"))
            .select(col("src"), col("dst"), (lit(1.0) / col("outDeg")).as("w"))
            .repartition(col("src"))
          case "window" => edges.select(col("src"), col("dst"),
            (lit(1.0) / count(lit(1)).over(Window.partitionBy(col("src"))))
              .as("w"))
        }
        val mins = scala.collection.mutable.Map[String, Double]()
        for (rep <- 1 to 3; kind <- Seq("join", "bcast", "window")) {
          val t0 = System.nanoTime()
          val w = ewVariant(kind).cache()
          w.count()
          val dt = (System.nanoTime() - t0) / 1e9
          w.unpersist(blocking = true)
          if (dt < mins.getOrElse(kind, 1e9)) mins(kind) = dt
          println(f"[profile] ew $kind%-8s rep$rep ${dt}%8.3f s")
        }
        println(s"[profile] ew mins: $mins")
        val ew = ewVariant("bcast").cache()
        ew.count()
        val init = vd.select(col("id")).distinct()
          .select(col("id"), lit(1.0).as("rank"))
        val vertsOnly = vd.select(col("id"))
        def fixpoint(label: String, ckptEvery: Int, aqe: Boolean): Unit = {
          val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
          spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
          var ranks = graft.Tier.pin(init.coalesce(1))
          val t0 = System.nanoTime()
          for (i <- 1 to 10) {
            val contribs = ew
              .join(broadcast(ranks.withColumnRenamed("id", "src")), Seq("src"))
              .groupBy(col("dst").as("id"))
              .agg(sum(col("w") * col("rank")).as("contrib"))
            val next = vertsOnly
              .join(broadcast(contribs), Seq("id"), "left")
              .select(col("id"),
                (lit(0.15) + lit(0.85) * coalesce(col("contrib"), lit(0.0)))
                  .as("rank"))
            ranks =
              if (i % ckptEvery == 0 || i == 10) graft.Tier.pin(next.coalesce(1))
              else next
          }
          val s = ranks.agg(sum(col("rank")), count(lit(1))).head()
          println(f"[profile] fixpoint $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  $s")
          spark.conf.set("spark.sql.adaptive.enabled", aqe0)
        }
        // one-join-per-round variant: rounds 2..n left-join the PREVIOUS
        // round's contribs (default rank = resetProb for vertices nobody
        // contributed to); the verts completion join runs once at the end
        def fixpoint1j(label: String, ckptEvery: Int): Unit = {
          var ranks = graft.Tier.pin(init.coalesce(1))
          val t0 = System.nanoTime()
          var contribs = ew
            .join(broadcast(ranks.withColumnRenamed("id", "src")), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(sum(col("w") * col("rank")).as("contrib"))
          for (i <- 2 to 10) {
            contribs = ew
              .join(broadcast(contribs.withColumnRenamed("id", "src")),
                Seq("src"), "left")
              .select(col("dst"), (col("w") *
                (lit(0.15) + lit(0.85) * coalesce(col("contrib"), lit(0.0))))
                .as("wc"))
              .groupBy(col("dst").as("id"))
              .agg(sum(col("wc")).as("contrib"))
            if (i % ckptEvery == 0)
              contribs = graft.Tier.pin(contribs.coalesce(1))
          }
          val ranksF = vertsOnly
            .join(broadcast(contribs), Seq("id"), "left")
            .select(col("id"),
              (lit(0.15) + lit(0.85) * coalesce(col("contrib"), lit(0.0)))
                .as("rank"))
          val s = ranksF.agg(sum(col("rank")), count(lit(1))).head()
          println(f"[profile] fixpoint $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  $s")
        }
        fixpoint("2j ckpt3 (warm1)", 3, aqe = true)
        for (rep <- 1 to 3) {
          fixpoint(s"2j ckpt3 rep$rep", 3, aqe = true)
          fixpoint1j(s"1j ckpt3 rep$rep", 3)
        }
      case "ivfpq" =>
        val emb = graft.model.Tables.embeddings(spark, sfDir)
        println(s"[profile] vectors=${emb.count()}")
        val stage = java.nio.file.Files
          .createTempDirectory("graft-prof-ivfpq").toFile.getAbsolutePath
        t("IvfPqIndex.build (full corpus)") {
          graft.sim.IvfPqIndex.build(emb, stage)
        }
        val codesDir = new java.io.File(s"$stage/v=1/codes")
        def countFiles(f: java.io.File): Int =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(countFiles).sum
          else 1
        println(s"[profile] codes files=${countFiles(codesDir)}")
        t("admit 1/3") {
          graft.sim.IvfPqIndex.admit(spark,
            emb.filter(pmod(col("vec_id"), lit(3)) === 0), stage)
        }
        println(s"[profile] codes files after admit=${countFiles(codesDir)}")
        t("probe") {
          noop(graft.sim.IvfPqIndex.probe(spark, stage, emb, 0L, 10))
        }
        new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
      case "kmeans" =>
        val emb = graft.model.Tables.embeddings(spark, sfDir)
        for (rep <- 1 to 2) {
          t(s"kMeansSphericalModel 16x3 rep$rep") {
            val m = graft.sim.Similarity.kMeansSphericalModel(emb, 16, 3)
            noop(m._1)
          }
          val (assign, cents) = graft.sim.Similarity.kMeansSphericalModel(emb, 16, 3)
          val resid = t(s"residuals rep$rep") {
            // mirror of Pq.residuals (private[sim])
            val r = emb
              .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
              .join(assign.select(col("vec_id"), col("cluster")), Seq("vec_id"))
              .join(broadcast(cents
                .select(col("cid").as("cluster"), col("centroid"))), Seq("cluster"))
              .select(col("vec_id"), col("cluster"),
                zip_with(col("emb"), col("centroid"), (a, b) => a - b).as("embedding"))
            val p = graft.Tier.pin(r); p.count(); p
          }
          val cb = t(s"Pq.train 4x8x2 rep$rep") {
            val c = graft.Tier.pin(graft.sim.Pq.train(resid))
            c.count(); c
          }
          val codes = t(s"Pq.encode rep$rep") {
            val c = graft.sim.Pq.encode(resid, cb)
              .join(resid.select(col("vec_id"), col("cluster")), Seq("vec_id"))
            noop(c); c
          }
          val stage = java.nio.file.Files
            .createTempDirectory("graft-prof-w").toFile.getAbsolutePath
          t(s"codes write rep$rep") {
            codes.select(col("vec_id"), col("codes"), col("cluster").as("cell"))
              .write.mode("overwrite").partitionBy("cell").parquet(s"$stage/codes")
          }
          new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
        }
      case "stream" =>
        val events = graft.model.Tables.events(spark, sfDir)
        println(s"[profile] events rows=${events.count()} " +
          s"partitions=${events.rdd.getNumPartitions}")
        val stage = java.nio.file.Files
          .createTempDirectory("graft-prof-stream").toFile.getAbsolutePath
        t("stage writes (no coalesce)") {
          events.filter(pmod(col("event_id"), lit(2)) === 0)
            .write.mode("overwrite").parquet(s"$stage/chunk=0")
          events.filter(pmod(col("event_id"), lit(2)) === 1)
            .write.mode("overwrite").parquet(s"$stage/chunk=1")
        }
        def pq(d: String): Int = Option(new java.io.File(d).listFiles())
          .toSeq.flatten.count(_.getName.endsWith(".parquet"))
        println(s"[profile] files chunk0=${pq(s"$stage/chunk=0")} chunk1=${pq(s"$stage/chunk=1")}")
        val prior = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t("drain complete-mode session agg") {
          val stream = spark.readStream
            .schema(events.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$stage/chunk=*")
          val q = stream
            .withWatermark("ts", "10 minutes")
            .groupBy(col("user_id"),
              session_window(col("ts"), "5 minutes").as("w"))
            .agg(count(lit(1)).as("n_events"))
            .writeStream.format("memory").queryName("prof_stream")
            .outputMode("complete").start()
          try q.processAllAvailable() finally q.stop()
          println(s"[profile] batches=${q.recentProgress.length} " +
            s"lastBatchId=${q.lastProgress.batchId}")
        }
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
