package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The maintenance contract of the standing shingle index
  * ([[ShingleIndex]]): a two-batch admission sequence must be
  * indistinguishable from a full re-tokenization, the admission join must
  * never touch corpus text, and a replayed batch must be a no-op — the
  * same dup-key-tolerant ingest promise as
  * [[graft.ingest.Ingest.dedupAppend]], at corpus scale.
  * (Reference anchor: YoutubeDataset_loader_final.py:111-123.)
  */
class ShingleIndexSpec extends SparkSpec {
  import spark.implicits._

  // fixture: 10-token docs, k=3 → 8 shingles; a one-word tail edit keeps
  // 7/8 shingles → jaccard 7/9 ≈ 0.78, comfortably over the 0.5 threshold
  private val corpusDocs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog today"),
    (11L, "entirely separate corpus material concerning parquet column pruning strategies here"))
  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"), // dup_corpus (≈10)
    (2L, "fresh passage about catalyst rule based optimizer plan rewrites engine"), // new
    (3L, "fresh passage about catalyst rule based optimizer plan rewrites design")) // dup_batch (≈2)
  private val batch2 = Seq(
    (4L, "fresh passage about catalyst rule based optimizer plan rewrites system"), // dup_corpus (≈2, now indexed)
    (5L, "unrelated notes regarding shingle index maintenance and admission economics"), // new
    (6L, "unrelated notes regarding shingle index maintenance and admission accounting")) // dup_batch (≈5)

  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

  private def withIndex(body: String => Unit): Unit = {
    val stage = java.nio.file.Files
      .createTempDirectory("graft-shingle-index-spec").toFile.getAbsolutePath
    try body(s"$stage/index")
    finally { new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively(); () }
  }

  private def collectVerdicts(d: DataFrame): Seq[(Long, String, Any, Any)] =
    d.select(col("doc_id"), col("verdict"), col("match_id"), col("jaccard"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))

  test("two-batch admission sequence equals the full recompute") {
    withIndex { path =>
      ShingleIndex.build(df(corpusDocs), path)
      val v1 = ShingleIndex.admit(spark, df(batch1), path)
      assert(collectVerdicts(v1).map(t => t._1 -> t._2) ==
        Seq(1L -> "dup_corpus", 2L -> "new", 3L -> "dup_batch"))
      assert(ShingleIndex.appendAdmitted(spark, df(batch1), v1, path) == 1L) // doc 2 only

      // batch 2 against the MAINTAINED index ≡ batch 2 against a fresh
      // re-tokenization of everything the index should now contain
      // (corpus + the one admitted batch-1 doc)
      val viaIndex = collectVerdicts(ShingleIndex.admit(spark, df(batch2), path))
      val recompute = collectVerdicts(ShingleIndex.classify(
        ShingleIndex.tier(df(batch2)),
        ShingleIndex.tier(df(corpusDocs ++ batch1.filter(_._1 == 2L)))))
      assert(viaIndex == recompute, s"index=$viaIndex recompute=$recompute")
      assert(viaIndex.map(t => t._1 -> t._2) ==
        Seq(4L -> "dup_corpus", 5L -> "new", 6L -> "dup_batch"))
    }
  }

  test("admission reads the index — the only file scan is the index parquet") {
    withIndex { path =>
      ShingleIndex.build(df(corpusDocs), path)
      val p = ShingleIndex.admit(spark, df(batch1), path)
        .queryExecution.explainString(FormattedMode)
      // batch side is in-memory, so any file scan in this plan is corpus
      // access: exactly ONE, and it is the index — no document re-read,
      // no re-tokenization of corpus text. Count formatted-mode DETAIL
      // headers "(n) Scan parquet" — the tree section renders each node a
      // second time, so a raw substring count would double.
      val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).toSeq
      assert(scans.size == 1, s"expected exactly the index scan, got:\n$p")
      assert(p.contains("shingle-index"), s"scan is not the staged index:\n$p")
    }
  }

  test("bucketed index: identical verdicts, and the index side of the admission join plans no exchange") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val table = "graft_spec_shingle_bucketed"
    withIndex { path =>
      ShingleIndex.buildBucketed(df(corpusDocs), table, path, buckets = 4)
      try {
        val viaBucketed =
          collectVerdicts(ShingleIndex.admitBucketed(spark, df(batch1), table))
        val recompute = collectVerdicts(ShingleIndex.classify(
          ShingleIndex.tier(df(batch1)), ShingleIndex.tier(df(corpusDocs))))
        assert(viaBucketed == recompute,
          s"bucketed=$viaBucketed recompute=$recompute")

        // the scale claim: with the batch past broadcast range the join is
        // sort-merge, and the bucketed scan ALONE satisfies the join's
        // required distribution — no shuffle anywhere above the index scan
        // (AQE off so the executed plan is concrete, broadcast off so the
        // small fixture takes the large-batch plan shape)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val plan = ShingleIndex.admitBucketed(spark, df(batch1), table)
            .queryExecution.executedPlan
          def bucketedScan(p: SparkPlan): Boolean =
            p.collectFirst { case s: FileSourceScanExec if s.bucketedScan => s }.isDefined
          def shuffles(p: SparkPlan): Boolean =
            p.collectFirst { case e: ShuffleExchangeExec => e }.isDefined
          // the join DIRECTLY over the index scan (no nested join below it
          // — outer joins transitively contain the scan too, but their
          // sides legitimately carry the aggregate/window exchanges)
          val indexSides = plan
            .collect { case j: SortMergeJoinExec => Seq(j.left, j.right) }
            .flatten
            .filter(side => bucketedScan(side) &&
              side.collectFirst { case jj: SortMergeJoinExec => jj }.isEmpty)
          assert(indexSides.nonEmpty,
            s"no sort-merge join consumed the bucketed index scan:\n$plan")
          indexSides.foreach(side => assert(!shuffles(side),
            s"exchange above the bucketed index scan:\n$side"))
        } finally {
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.unset("spark.sql.adaptive.enabled")
        }
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("bucketed maintenance loop: append admitted, compact, verdicts invariant, files shrink") {
    val table = "graft_spec_shingle_maint"
    withIndex { path =>
      val stagingBase = new java.io.File(path).getParent
      try {
        ShingleIndex.buildBucketed(df(corpusDocs), table, path, buckets = 4)
        val v1 = ShingleIndex.admitBucketed(spark, df(batch1), table)
        // append the one admitted doc into the bucketed table; replay no-op
        assert(ShingleIndex.appendAdmittedBucketed(
          spark, df(batch1), v1, table, buckets = 4) == 1L)
        assert(ShingleIndex.appendAdmittedBucketed(
          spark, df(batch1), v1, table, buckets = 4) == 0L, "replay re-appended")
        // batch 2 against the GROWN bucketed index ≡ a fresh recompute of
        // everything the index now contains (corpus + admitted doc 2)
        val viaIndex = collectVerdicts(
          ShingleIndex.admitBucketed(spark, df(batch2), table))
        val recompute = collectVerdicts(ShingleIndex.classify(
          ShingleIndex.tier(df(batch2)),
          ShingleIndex.tier(df(corpusDocs ++ batch1.filter(_._1 == 2L)))))
        assert(viaIndex == recompute, s"index=$viaIndex recompute=$recompute")
        // compaction folds the append's extra bucket files to one run per
        // bucket and must not change one verdict
        val before = graft.lake.BucketedTable.fileCount(spark, table)
        val (b, a) = ShingleIndex.compactBucketed(
          spark, table, stagingBase, buckets = 4)
        assert(b == before && a < b, s"compact did not shrink: $b -> $a")
        assert(a <= 4, s"more than one file per bucket after compact: $a")
        val after = collectVerdicts(
          ShingleIndex.admitBucketed(spark, df(batch2), table))
        assert(after == viaIndex, "compaction changed admission verdicts")
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $table")
        spark.sql(s"DROP TABLE IF EXISTS ${table}__compacting")
        ()
      }
    }
  }

  test("replayed batch: verdicts stay sane and appendAdmitted is a no-op") {
    withIndex { path =>
      ShingleIndex.build(df(corpusDocs), path)
      val v1 = ShingleIndex.admit(spark, df(batch1), path)
      ShingleIndex.appendAdmitted(spark, df(batch1), v1, path)

      // replay the same batch: doc 2 now sits in BOTH tiers — the grouped
      // m_batch key keeps jaccard ≤ 1 (no double-counted intersections)
      // and the corpus-side match wins the equal-jaccard tiebreak, so both
      // doc 2 (self-match) and doc 3 (its match is indexed now) report
      // dup_corpus — the verdict an operator replaying a crawl should see
      val replay = ShingleIndex.admit(spark, df(batch1), path)
      val got = collectVerdicts(replay)
      assert(got.map(t => t._1 -> t._2) ==
        Seq(1L -> "dup_corpus", 2L -> "dup_corpus", 3L -> "dup_corpus"))
      assert(got.find(_._1 == 2L).exists { t =>
        t._3 == 2L && t._4 == 1.0 }, s"self-match should be exact: $got")
      assert(got.forall(_._4.asInstanceOf[Double] <= 1.0), s"jaccard > 1: $got")

      // idempotence: nothing is appended, and the index is byte-stable
      val before = spark.read.parquet(path).count()
      assert(ShingleIndex.appendAdmitted(spark, df(batch1), replay, path) == 0L)
      assert(spark.read.parquet(path).count() == before)
    }
  }
}
