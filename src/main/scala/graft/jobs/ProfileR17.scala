package graft.jobs

import org.apache.spark.sql.functions._

/** Round-17 measurement scratchpad (guide §1: measure first) — the
  * ProfileR16 pattern pointed at this round's open attribution questions:
  *
  *  - `triangles`: decompose the q_triangles probe leg (×32: 126.7 s in
  *    BENCH_SF32_r16, untouched for two rounds — VERDICT r16 #4) into the
  *    wedge pipeline's stages with row counts, so the bloom FP rate and
  *    each exchange's contribution are numbers, not guesses. Mirrors
  *    [[graft.graph.Triangles.vertexTrianglesUnd]] stage for stage.
  *  - `components`: decompose the q_components_admit probe leg (×32:
  *    58.1 s — VERDICT r16 #5) into pair-tier derivation vs index build
  *    vs admission re-solve vs report.
  *
  * Usage: runMain graft.jobs.ProfileR17 <sfDir> <probe>
  */
object ProfileR17 {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probe = args.lift(1).getOrElse("triangles")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, appName = "graft-profile-r17")
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tier.PinOps
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()

    probe match {
      case "triangles" =>
        // mirror vertexTrianglesUnd stage for stage, pinning each
        // intermediate so the NEXT stage's timing is marginal cost
        val und = t("und tier (pin)") {
          val u = graft.graph.EdgeTier.undirected(spark, sfDir)
            .select(col("a"), col("b")).pinTier
          println(s"[profile] edges=${u.count()}")
          u
        }
        val nEdges = und.count()
        val deg = t("degree agg (pin)") {
          val d = und.select(col("a").as("id"))
            .unionAll(und.select(col("b").as("id")))
            .groupBy(col("id")).agg(count(lit(1)).as("degree")).pinTier
          println(s"[profile] vertices=${d.count()}")
          d
        }
        val bcastDeg = graft.graph.StateBroadcast.fits(deg, 2L * nEdges, "p17.deg")
        val bcastEdges = graft.graph.StateBroadcast.fits(und, nEdges, "p17.closure")
        println(s"[profile] bcastDeg=$bcastDeg bcastEdges=$bcastEdges")
        def mb(df: org.apache.spark.sql.DataFrame, b: Boolean) =
          if (b) broadcast(df) else df
        def mbh(df: org.apache.spark.sql.DataFrame, b: Boolean) =
          if (b) broadcast(df) else df.hint("shuffle_hash")
        val oriented = t("orientation joins + repartition (pin)") {
          val o = und
            .join(mb(deg.select(col("id").as("a"), col("degree").as("da")), bcastDeg), Seq("a"))
            .join(mb(deg.select(col("id").as("b"), col("degree").as("db")), bcastDeg), Seq("b"))
            .select(
              when(col("da") < col("db") ||
                (col("da") === col("db") && col("a") < col("b")),
                struct(col("a").as("u"), col("b").as("v")))
                .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
            .select(col("e.u").as("u"), col("e.v").as("v"))
            .pinTier
            .repartition(math.max(
                spark.sparkContext.defaultParallelism,
                spark.sessionState.conf.numShufflePartitions),
              col("u"))
          noop(o)
          o
        }
        val wedges = oriented
          .join(mbh(oriented.withColumnsRenamed(Map("v" -> "w")), bcastEdges),
            Seq("u"))
          .filter(col("v") < col("w"))
        t("wedge gen (noop, no bloom)")(noop(wedges))
        val nWedges = t("wedge count")(wedges.count())
        println(s"[profile] wedges=$nWedges")
        val bloom = t("bloom build") {
          graft.functions.BloomFunctions.buildBloom(
            und.select(struct(col("a").as("v"), col("b").as("w")).as("k")),
            col("k"), estItems = math.max(nEdges, 1L),
            numBits = math.min(1L << 26, math.max(1L << 23, 12L * nEdges)))
        }
        println(s"[profile] bloomBytes=${bloom.length}")
        val survivors =
          if (bcastEdges) wedges
          else wedges.filter(graft.functions.BloomFunctions.mightContain(
            bloom, struct(col("v"), col("w"))))
        t("wedge gen + bloom filter (noop)")(noop(survivors))
        val nSurv = t("survivor count")(survivors.count())
        println(s"[profile] survivors=$nSurv")
        val tris = survivors.join(
          mbh(und.select(col("a").as("v"), col("b").as("w")), bcastEdges),
          Seq("v", "w"), "leftsemi")
        t("gen + bloom + closure semi (noop)")(noop(tris))
        val nTris = t("triangle count")(tris.count())
        println(s"[profile] closedWedges=$nTris  bloomFPsurvived=${nSurv - nTris}")
        val perVertex = tris
          .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
          .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
        t("full pipeline incl. per-vertex agg (noop)")(noop(
          deg.join(mb(perVertex, bcastDeg), Seq("id"), "left")
            .select(col("id"), col("degree"),
              coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))))
        // the published operator end to end, for the cross-check
        t("vertexTrianglesUnd end-to-end (noop)")(noop(
          graft.graph.Triangles.vertexTrianglesUnd(
            graft.graph.EdgeTier.undirected(spark, sfDir))))

      case "components" =>
        val docs = graft.model.Tables.documents(spark, sfDir)
        val pairs = t("pair tier: ngramJaccardPairs (pin)") {
          val p = graft.dedup.Dedup.ngramJaccardPairs(docs)
            .select(col("doc_a"), col("doc_b")).pinTier
          println(s"[profile] pairs=${p.count()}")
          p
        }
        val base = pairs.filter(
          pmod(col("doc_a"), lit(7)) =!= 0 && pmod(col("doc_b"), lit(7)) =!= 0)
        val batch = pairs.join(base, Seq("doc_a", "doc_b"), "left_anti")
        val stage = java.nio.file.Files
          .createTempDirectory("graft-p17-cc").toFile.getAbsolutePath
        try {
          t("index build (star contraction + commit)") {
            graft.graph.ComponentsIndex.build(base, s"$stage/cc")
          }
          val merged = t("admit (affected re-solve + commit)") {
            graft.graph.ComponentsIndex.admit(spark, batch, s"$stage/cc")
          }
          t("doc report join (noop)")(noop(
            docs.select(col("doc_id"))
              .join(merged.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
              .select(col("doc_id"),
                coalesce(col("component"), col("doc_id")).as("cluster_id"))))
        } finally {
          new scala.reflect.io.Directory(new java.io.File(stage))
            .deleteRecursively()
          ()
        }

      case other => sys.error(s"unknown probe '$other'")
    }
    spark.stop()
  }
}
