package graft.sim

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def staged[A](f: String => A): A = {
    val stage = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-spec").toFile.getAbsolutePath
    try f(stage)
    finally {
      new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
      ()
    }
  }

  test("probe equals the recompute form row-for-row and prunes cell partitions") {
    val emb = Tables.embeddings(spark, sf)
    staged { path =>
      IvfPqIndex.build(emb, path)
      val probe = IvfPqIndex.probe(spark, path, emb, queryVecId = 0L)
      val got = probe.as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      val want = Pq.ivfPqTopK(emb, queryVecId = 0L)
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      assert(got == want, s"index probe diverged from recompute:\n$got\nvs\n$want")
      // the codes scan must be pruned to the probed cells' directories —
      // probe IO ∝ probed cells, not the corpus
      val plan = IvfPqIndex.probe(spark, path, emb, queryVecId = 0L)
        .queryExecution.executedPlan.toString
      val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r.findFirstIn(plan)
      assert(pf.isDefined, s"codes scan is not partition-pruned on cell:\n$plan")
    }
  }

  test("admit: frozen quantizers, idempotent replay, admitted vectors findable") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(pmod(col("vec_id"), lit(7)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(7)) === 0)
    staged { path =>
      IvfPqIndex.build(corpus, path)
      val cbBefore = spark.read.parquet(s"$path/v=1/codebooks")
        .orderBy(col("sub"), col("cid")).collect().toSeq
      val n = IvfPqIndex.admit(spark, batch, path)
      assert(n == batch.count(), s"admitted $n of ${batch.count()}")
      // replay admits nothing (exactly-once per vec_id)
      assert(IvfPqIndex.admit(spark, batch, path) == 0L, "replay re-admitted")
      // quantizers are frozen: the codebook sidecar is untouched
      val cbAfter = spark.read.parquet(s"$path/v=1/codebooks")
        .orderBy(col("sub"), col("cid")).collect().toSeq
      assert(cbBefore == cbAfter, "admission retrained the codebooks")
      // an admitted vector is served: vec 7 now exists in the index, and
      // probing with vec 7 itself as the query must surface its planted
      // stress-free nearest neighbours without error, k rows total
      val res = IvfPqIndex.probe(spark, path, emb, queryVecId = 7L)
      assert(res.count() == 10)
      // the admitted codes equal a frozen-codebook encode of the batch
      val centroids = spark.read.parquet(s"$path/v=1/centroids")
      val codebooks = spark.read.parquet(s"$path/v=1/codebooks")
      val assign = Similarity.assignSpherical(
        batch.select(col("vec_id"),
          col("embedding").cast("array<double>").as("emb")), centroids)
      val wantCodes = Pq.encode(
          Pq.residuals(batch, assign, centroids), codebooks)
        .as[(Long, Seq[Int])].collect().toMap
      val gotCodes = spark.read.parquet(s"$path/v=1/codes")
        .join(batch.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("codes"))
        .as[(Long, Seq[Int])].collect().toMap
      assert(gotCodes == wantCodes, "admitted codes diverge from frozen-codebook encode")
    }
  }

  test("readers ignore a crashed (un-pointed) rebuild; a committed one flips atomically") {
    val emb = Tables.embeddings(spark, sf)
    staged { path =>
      IvfPqIndex.build(emb, path)
      assert(IvfPqIndex.currentVersion(spark, path) == 1L)
      val before = IvfPqIndex.probe(spark, path, emb, queryVecId = 0L)
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      // simulate a crashed rebuild: a half-written v=2 directory that
      // never flipped the pointer — readers must keep serving v=1 for
      // ALL THREE parts (codes can never pair with foreign quantizers)
      val crashed = new java.io.File(s"$path/v=2/centroids")
      assert(crashed.mkdirs())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$path/v=2/centroids/part-junk.parquet"),
        Array[Byte](1, 2, 3))
      assert(IvfPqIndex.currentVersion(spark, path) == 1L,
        "an un-pointed version directory became visible")
      val after = IvfPqIndex.probe(spark, path, emb, queryVecId = 0L)
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      assert(after == before, "a torn rebuild changed probe results")
      // a real rebuild supersedes the orphan and commits v=2 whole
      IvfPqIndex.build(emb, path)
      assert(IvfPqIndex.currentVersion(spark, path) == 2L)
      val rebuilt = IvfPqIndex.probe(spark, path, emb, queryVecId = 0L)
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      assert(rebuilt == before, "an identical rebuild changed probe results")
    }
  }

  test("currentVersion recovers the highest complete version when _current is missing") {
    val emb = Tables.embeddings(spark, sf)
    staged { path =>
      IvfPqIndex.build(emb, path)
      IvfPqIndex.build(emb, path) // v=2 committed, v=1 retained
      assert(IvfPqIndex.currentVersion(spark, path) == 2L)
      // an operator rm (or a legacy delete-then-rename crash) loses the
      // pointer: resolution must fall back to the highest version whose
      // last-written part is complete, NOT to an outage at v=0
      assert(new java.io.File(s"$path/_current").delete())
      assert(IvfPqIndex.currentVersion(spark, path) == 2L)
      // and the index still serves
      assert(IvfPqIndex.probe(spark, path, emb, queryVecId = 0L).count() == 10)
    }
  }

  test("admitBatch ledger: redelivery skipped, crash before ledger write heals exactly-once") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
    val b1 = emb.filter(pmod(col("vec_id"), lit(3)) === 1)
    val b2 = emb.filter(pmod(col("vec_id"), lit(3)) === 2)
    staged { path =>
      IvfPqIndex.build(corpus, path)
      assert(IvfPqIndex.admitBatch(spark, b1, path, batchId = 0L) == b1.count())
      // redelivered batchId: ledger-skipped, nothing admitted
      assert(IvfPqIndex.admitBatch(spark, b1, path, batchId = 0L) == 0L)
      // crash window — batch 1's rows landed but the ledger write died:
      // simulate by admitting directly (no ledger), then redelivering
      // through the ledger path; the anti-join drops every duplicate and
      // the ledger heals forward
      assert(IvfPqIndex.admit(spark, b2, path) == b2.count())
      assert(IvfPqIndex.admitBatch(spark, b2, path, batchId = 1L) == 0L)
      // state is exactly-once: every vector indexed exactly once
      val counts = spark.read.parquet(s"$path/v=1/codes")
        .groupBy(col("vec_id")).count().filter(col("count") > 1).count()
      assert(counts == 0L, "a vector was double-indexed")
      assert(spark.read.parquet(s"$path/v=1/codes").count() == emb.count())
    }
  }

  test("maintainRebuild: metadata-only below threshold, republishes past it, probe equals fresh build") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
    staged { path =>
      IvfPqIndex.build(seed, path)
      assert(IvfPqIndex.currentVersion(spark, path) == 1L)
      // no admissions yet: fraction 0 — no rebuild, version unchanged
      assert(!IvfPqIndex.maintainRebuild(spark, emb, path))
      assert(IvfPqIndex.currentVersion(spark, path) == 1L)
      // admit 2x the base: fraction 2.0 > 0.5 — rebuild publishes v=2
      IvfPqIndex.admit(spark, emb.filter(pmod(col("vec_id"), lit(3)) =!= 0), path)
      assert(IvfPqIndex.maintainRebuild(spark, emb, path))
      assert(IvfPqIndex.currentVersion(spark, path) == 2L)
      // the base reset: immediately re-checking is a no-op again
      assert(!IvfPqIndex.maintainRebuild(spark, emb, path))
      assert(IvfPqIndex.currentVersion(spark, path) == 2L)
      // post-rebuild probe is byte-equal to a from-scratch corpus build
      val got = IvfPqIndex.probe(spark, path, emb, queryVecId = 0L)
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      val fresh = java.nio.file.Files
        .createTempDirectory("graft-ivfpq-fresh").toFile.getAbsolutePath
      try {
        IvfPqIndex.build(emb, fresh)
        val want = IvfPqIndex.probe(spark, fresh, emb, queryVecId = 0L)
          .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
        assert(got == want, "drift rebuild diverged from a fresh build")
      } finally {
        new scala.reflect.io.Directory(new java.io.File(fresh)).deleteRecursively()
        ()
      }
    }
  }

  test("streaming maintenance equals the one-shot grown index row-for-row") {
    val emb = Tables.embeddings(spark, sf)
    staged { path =>
      IvfPqIndex.build(emb.filter(pmod(col("vec_id"), lit(3)) === 0), path)
      IvfPqIndex.admit(spark, emb.filter(pmod(col("vec_id"), lit(3)) =!= 0), path)
      val oneShot = IvfPqIndex.probe(spark, path, emb, queryVecId = 0L)
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      val streamed = graft.streaming.Streams
        .annMaintenanceStreamGate(spark, sf)
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
      assert(streamed == oneShot,
        "micro-batched admission changed a probe score")
    }
  }
}
