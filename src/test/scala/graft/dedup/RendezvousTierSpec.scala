package graft.dedup

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The operational contract of the rendezvous-sharded tier layout
  * (VERDICT r12 #6): growing the shard count N → N+1 relocates only the
  * bucket FILES whose rendezvous argmax changed — expected ~1/(N+1) of
  * them, each by a metadata rename with zero bytes rewritten — where a
  * mod-N re-home moves ~N/(N+1); and placement is semantics-free: the
  * SAME verdicts come out of the tier before and after a reshard, and
  * they equal the unsharded index's verdicts. */
class RendezvousTierSpec extends SparkSpec {
  import spark.implicits._

  private def withBase(body: String => Unit): Unit = {
    val stage = java.nio.file.Files
      .createTempDirectory("graft-rdv-tier-spec").toFile.getAbsolutePath
    try body(s"$stage/tier")
    finally { new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively(); () }
  }

  private def verdicts(d: DataFrame): Seq[(Long, String, Any, Any)] =
    d.select(col("doc_id"), col("verdict"), col("match_id"), col("jaccard"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))

  test("grow 8 -> 9 moves exactly the argmax-changed buckets, ~1/9 of files, vs ~8/9 for mod") {
    val docs = Tables.documents(spark, sf)
    withBase { base =>
      ShingleIndex.buildSharded(docs, base, nShards = 8)
      val a8 = ShingleIndex.bucketAssignments(spark, 32, 8)
      val a9 = ShingleIndex.bucketAssignments(spark, 32, 9)
      val expectMoved = (0 until 32).count(b => a8(b) != a9(b))
      val (moved, present) = ShingleIndex.reshard(spark, base, toShards = 9)
      assert(present == 32L, "every bucket should be populated at this corpus size")
      assert(moved == expectMoved.toLong)
      // minimal movement: strictly fewer files than a mod-N re-home, and
      // within 3x of the 1/(N+1) expectation (32 buckets is a small sample)
      val modMoved = (0 until 32).count(b => b % 8 != b % 9)
      assert(moved < modMoved,
        s"rendezvous moved $moved of 32 vs mod's $modMoved — no stability win")
      assert(moved <= 3 * 32 / 9 + 1, s"moved $moved, expected ~${32 / 9}")
      // the pointer committed
      assert(ShingleIndex.currentShards(spark, base) == 9)
    }
  }

  test("reshard is a pure rename: per-bucket row counts are bit-identical") {
    val docs = Tables.documents(spark, sf)
    withBase { base =>
      ShingleIndex.buildSharded(docs, base, nShards = 8)
      val before = ShingleIndex.readSharded(spark, base)
        .groupBy("bucket").count().as[(Int, Long)].collect().toMap
      ShingleIndex.reshard(spark, base, toShards = 9)
      val after = ShingleIndex.readSharded(spark, base)
        .groupBy("bucket").count().as[(Int, Long)].collect().toMap
      assert(after == before)
      // and the physical placement now matches the grown argmax everywhere
      val placed = ShingleIndex.readSharded(spark, base)
        .select(col("bucket").cast("int"), col("shard").cast("int"))
        .distinct().as[(Int, Int)].collect().toMap
      val a9 = ShingleIndex.bucketAssignments(spark, 32, 9)
      assert(placed == a9.view.filterKeys(placed.contains).toMap)
    }
  }

  // ---- probe-during-reshard safety (VERDICT r13 #4): rename moves the
  // only copy, so old/new layouts can't coexist — the guarantee is
  // fail-loud-never-silent, in both race directions ----

  test("a probe snapshot resolved JUST BEFORE a reshard fails loudly, never silently partial") {
    val docs = Tables.documents(spark, sf)
    withBase { base =>
      ShingleIndex.buildSharded(docs, base, nShards = 8)
      // resolve the snapshot (captures the physical file listing), verify
      // it covers every committed bucket — this is the pre-reshard probe
      val snapshot = ShingleIndex.probeSharded(spark, base)
      val committed = ShingleIndex.committedBuckets(spark, base)
      assert(ShingleIndex.bucketCoverage(snapshot.inputFiles.toSeq) == committed)
      // the reshard lands while the probe is "mid-scan"
      val (moved, _) = ShingleIndex.reshard(spark, base, toShards = 9)
      assert(moved > 0, "grow must relocate at least one bucket for this test")
      // executing the stale snapshot now throws (FileNotFound wrapped in
      // Spark's execution exception) — the LOUD direction; a silent
      // partial result would be wrong verdicts
      val e = intercept[Exception](snapshot.count())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c =>
        c.isInstanceOf[java.io.FileNotFoundException] ||
          Option(c.getMessage).exists(_.contains("FileNotFound"))),
        s"expected a FileNotFound failure, got: $e")
      // recovery = re-probe: the fresh resolve covers the grown layout
      val healed = ShingleIndex.probeSharded(spark, base)
      assert(ShingleIndex.bucketCoverage(healed.inputFiles.toSeq) == committed)
      assert(healed.count() > 0)
    }
  }

  test("coverage check detects a listing that silently missed a bucket") {
    // pure-function pin: a raced partition discovery that lost bucket 7
    // (renamed away after its old shard dir was listed, before its new
    // shard dir was) yields a file list with no bucket=7 leaf — the
    // manifest subset check must catch exactly that
    val full = (0 until 32).map(b => s"/tier/shard=${b % 8}/bucket=$b/part-0.parquet")
    val raced = full.filterNot(_.contains("/bucket=7/"))
    assert(ShingleIndex.bucketCoverage(full) == (0 until 32).toSet)
    assert(ShingleIndex.bucketCoverage(raced) == (0 until 32).toSet - 7)
    assert(!(0 until 32).toSet.subsetOf(ShingleIndex.bucketCoverage(raced)))
  }

  test("probeSharded retries a partial resolve and gives a diagnosable error when it persists") {
    val docs = Tables.documents(spark, sf)
    withBase { base =>
      ShingleIndex.buildSharded(docs, base, nShards = 4)
      // simulate a PERSISTENTLY missing bucket (not a transient race):
      // physically remove one bucket dir the manifest still commits
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(base)
      val f = p.getFileSystem(conf)
      val victim = f.globStatus(
        new org.apache.hadoop.fs.Path(base, "shard=*/bucket=3")).head.getPath
      assert(f.delete(victim, true))
      val e = intercept[IllegalStateException](
        ShingleIndex.probeSharded(spark, base, maxAttempts = 2))
      assert(e.getMessage.contains("missed buckets 3"))
    }
  }

  test("verdicts are placement-blind: equal before/after reshard and vs the unsharded index") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    withBase { base =>
      ShingleIndex.buildSharded(corpus, base, nShards = 8)
      val vSharded = verdicts(ShingleIndex.admitSharded(spark, batch, base))
      ShingleIndex.reshard(spark, base, toShards = 9)
      val vResharded = verdicts(ShingleIndex.admitSharded(spark, batch, base))
      assert(vResharded == vSharded)
      // equals the plain (unsharded) standing index on the same split
      val plain = java.nio.file.Files
        .createTempDirectory("graft-rdv-plain").toFile.getAbsolutePath
      try {
        ShingleIndex.build(corpus, s"$plain/index")
        val vPlain = verdicts(ShingleIndex.admit(spark, batch, s"$plain/index"))
        assert(vSharded == vPlain)
      } finally {
        new scala.reflect.io.Directory(new java.io.File(plain)).deleteRecursively()
        ()
      }
    }
  }
}
