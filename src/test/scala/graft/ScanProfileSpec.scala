package graft

import org.apache.spark.sql.functions._

/** Pins the executed-plan scan decomposition the ×100 probe-leg
  * attribution rides on (VERDICT r15 #1): the reported numbers must be
  * the EXECUTED plan's — bucket pruning visible as selected_buckets AND
  * as the post-prune physical file set, rows as the post-pushdown scan
  * output — so BENCH_SF100 artifacts can assert "growth is postings
  * length, not scan breadth" from measurement. */
class ScanProfileSpec extends SparkSpec {

  test("bucketed point filter reports pruned buckets, files, and rows") {
    val wh = java.nio.file.Files.createTempDirectory("graft-scanprof").toFile
    try {
      val df = spark.range(10000)
        .select(concat(lit("k"), col("id") % 50).as("term"),
          col("id").as("v"))
      graft.serve.Bucketing.writeBucketed(
        df, "scanprof_t", s"${wh.getAbsolutePath}/t", "term", 8)
      val probe = spark.table("scanprof_t")
        .filter(col("term").isin("k7", "k13"))
      // the action must run probe's OWN QueryExecution (count() derives a
      // new one and would leave these metrics at zero — the rule
      // ProbeProfile's collect-based reps follow)
      assert(probe.collect().length == 400) // 2 keys x 200 rows each
      val scans = ScanProfile.perTable(probe)
      val s = scans.values.head
      assert(s.totalBuckets.contains(8L))
      // 2 terms hash to at most 2 (>=1) of the 8 buckets
      assert(s.selectedBuckets.exists(b => b >= 1 && b <= 2), s.toString)
      // the physical read set shrinks with the pruning: bucketAligned
      // wrote <=1 file per bucket, so selected files == selected buckets
      assert(s.selectedFiles == s.selectedBuckets, s.toString)
      // rows is what the scan READ: the selected buckets' rows at
      // row-group granularity (these tiny files are one row group each,
      // so the pushed In-filter can't skip inside them) — strictly
      // between the final-result rows and the table size, which is
      // exactly the "rows scanned" number the decomposition wants
      assert(s.rows >= 400 && s.rows < 10000, s.toString)
      assert(s.files > s.selectedFiles.get,
        "listing-level numFiles should exceed the pruned set on >2 buckets")
    } finally {
      spark.sql("DROP TABLE IF EXISTS scanprof_t")
      new scala.reflect.io.Directory(wh).deleteRecursively()
      ()
    }
  }

  test("unbucketed scan carries no bucket fields and sums re-reads") {
    val probe = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).limit(5)
    assert(probe.collect().length == 5)
    val s = ScanProfile.perTable(probe).values.head
    assert(s.selectedBuckets.isEmpty && s.totalBuckets.isEmpty &&
      s.selectedFiles.isEmpty)
    assert(s.files >= 1)
  }

  test("bucket id parses from bucketed file names only") {
    assert(ScanProfile.bucketIdOfFile(
      "/x/t/part-00000-abc-123_00007.c000.snappy.parquet").contains(7))
    assert(ScanProfile.bucketIdOfFile(
      "/x/t/part-00003-9f2.c000.snappy.parquet").isEmpty)
  }
}
