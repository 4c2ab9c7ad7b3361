package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshStage(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-scd-table-$tag").toFile.getAbsolutePath
  private def drop(stage: String): Unit = {
    new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
    ()
  }

  // dim: keys 1..6 current, key 2 carries v0 history
  private def dim = Seq(
    (1L, "A", 10L, 1L, Scd.OpenVersion, true),
    (2L, "B", 20L, 1L, Scd.OpenVersion, true),
    (2L, "B0", 20L, 0L, 1L, false),
    (3L, "C", 30L, 1L, Scd.OpenVersion, true),
    (4L, "D", 40L, 1L, Scd.OpenVersion, true),
    (5L, "E", 50L, 1L, Scd.OpenVersion, true),
    (6L, "F", 60L, 1L, Scd.OpenVersion, true)
  ).toDF("k", "seg", "nat", "version_from", "version_to", "is_current")

  // batch: key 1 changed, key 2 unchanged, key 9 new
  private def batch = Seq(
    (1L, "A2", 10L), (2L, "B", 20L), (9L, "N", 90L)
  ).toDF("k", "seg", "nat")

  private def collectDim(path: String) =
    ScdTable.dim(spark, path).orderBy(col("k"), col("version_from"))
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq

  test("ScdTable: build+admit equals the one-shot scd2Merge; history accretes; report counts") {
    val stage = freshStage("basic")
    try {
      ScdTable.build(dim, s"$stage/t", "k", Seq("seg", "nat"), nBuckets = 8)
      assert(ScdTable.currentVersion(spark, s"$stage/t") == 1L)
      val r = ScdTable.admit(spark, batch, s"$stage/t")
      assert(r.version == 2L && r.expired == 1L && r.opened == 2L,
        s"got $r") // key 1 expired; key 1 reopened + key 9 inserted
      val expected = Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), 2L)
        .orderBy(col("k"), col("version_from"))
        .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
      assert(collectDim(s"$stage/t") == expected,
        "standing table diverged from the one-shot merge")
      // the pre-existing history row is byte-identical in the table
      val hist = ScdTable.history(spark, s"$stage/t")
        .orderBy(col("k"), col("version_from"))
        .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
      assert(hist == Seq((1L, "A", 10L, 1L, 2L, false),
        (2L, "B0", 20L, 0L, 1L, false)), s"got $hist")
    } finally drop(stage)
  }

  test("ScdTable: untouched buckets carry forward as metadata (no rewrite), touched buckets rewrite") {
    val stage = freshStage("cow")
    try {
      ScdTable.build(dim, s"$stage/t", "k", Seq("seg", "nat"), nBuckets = 8)
      ScdTable.admit(spark, batch, s"$stage/t")
      val m = ScdTable.manifest(spark, s"$stage/t", 2L)
      val touched = m.buckets.filter(_._2 == 2L).keys.toSet
      val carried = m.buckets.filter(_._2 == 1L).keys.toSet
      assert(touched.nonEmpty && carried.nonEmpty,
        s"expected a genuine copy-on-write split, got buckets=${m.buckets}")
      // v=2 holds ONLY the touched buckets' directories
      val v2Dirs = new java.io.File(s"$stage/t/current/v=2").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(v2Dirs == touched.map(b => s"bucket=$b"),
        s"v2 rewrote $v2Dirs, expected exactly ${touched.map(b => s"bucket=$b")}")
      // reads stitch versions: every current row appears exactly once
      val cur = ScdTable.current(spark, s"$stage/t")
      assert(cur.count() == cur.select(col("k")).distinct().count())
    } finally drop(stage)
  }

  test("ScdTable: replaying the same batch expires nothing and leaves the dimension identical") {
    val stage = freshStage("replay")
    try {
      ScdTable.build(dim, s"$stage/t", "k", Seq("seg", "nat"), nBuckets = 8)
      ScdTable.admit(spark, batch, s"$stage/t")
      val before = collectDim(s"$stage/t")
      val r = ScdTable.admit(spark, batch, s"$stage/t")
      assert(r.expired == 0L && r.opened == 0L, s"replay mutated: $r")
      assert(collectDim(s"$stage/t") == before, "replay changed the dimension")
    } finally drop(stage)
  }

  test("ScdTable: a crashed admission is invisible and a DIFFERENT later batch heals") {
    val stage = freshStage("crash")
    try {
      ScdTable.build(dim, s"$stage/t", "k", Seq("seg", "nat"), nBuckets = 8)
      // simulate a crash mid-admission: v2 data legs AND manifest written,
      // pointer never flipped
      Seq((1L, "GARBAGE", 0L, 1L, 2L, false))
        .toDF("k", "seg", "nat", "version_from", "version_to", "is_current")
        .write.parquet(s"$stage/t/history/part_v=2")
      Seq((1L, "GARBAGE", 0L, 2L, Scd.OpenVersion, true, 3))
        .toDF("k", "seg", "nat", "version_from", "version_to", "is_current", "bucket")
        .write.partitionBy("bucket").parquet(s"$stage/t/current/v=2")
      val f = new java.io.FileWriter(s"$stage/t/manifest/v=2")
      try f.write("#key=k\n#attrs=seg,nat\n#buckets=8\n0\t2\n") finally f.close()
      // readers see only v1
      assert(ScdTable.currentVersion(spark, s"$stage/t") == 1L)
      assert(collectDim(s"$stage/t").map(_._2).forall(_ != "GARBAGE"))
      // a DIFFERENT batch admits on top of v1; leftovers are cleared
      val r = ScdTable.admit(spark,
        Seq((3L, "C9", 30L)).toDF("k", "seg", "nat"), s"$stage/t")
      assert(r.version == 2L && r.expired == 1L && r.opened == 1L, s"got $r")
      val got = collectDim(s"$stage/t")
      assert(!got.map(_._2).contains("GARBAGE"), s"crash garbage leaked: $got")
      val expected = Scd.scd2Merge(dim,
        Seq((3L, "C9", 30L)).toDF("k", "seg", "nat"),
        "k", Seq("seg", "nat"), 2L)
        .orderBy(col("k"), col("version_from"))
        .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
      assert(got == expected)
    } finally drop(stage)
  }

  test("ScdTable: version chains stitch across manifests; vacuum drops superseded buckets only") {
    val stage = freshStage("chain")
    try {
      ScdTable.build(dim, s"$stage/t", "k", Seq("seg", "nat"), nBuckets = 8)
      ScdTable.admit(spark, batch, s"$stage/t") // v2
      ScdTable.admit(spark,
        Seq((1L, "A3", 10L)).toDF("k", "seg", "nat"), s"$stage/t") // v3
      val got = collectDim(s"$stage/t")
      val expected = Scd.scd2Merge(
        Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), 2L),
        Seq((1L, "A3", 10L)).toDF("k", "seg", "nat"),
        "k", Seq("seg", "nat"), 3L)
        .orderBy(col("k"), col("version_from"))
        .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
      assert(got == expected, s"chained table diverged:\n$got\nvs\n$expected")
      // key 1's full lineage survives: v1 expired at 2, v2 expired at 3, v3 open
      assert(got.filter(_._1 == 1L).map(r => (r._4, r._5, r._6)) ==
        Seq((1L, 2L, false), (2L, 3L, false), (3L, Scd.OpenVersion, true)))
      val removed = ScdTable.vacuum(spark, s"$stage/t", keepVersions = 2)
      // v=1 buckets superseded by BOTH v2 and v3 rewrites are reclaimable;
      // the committed dimension must be unchanged afterwards
      assert(collectDim(s"$stage/t") == expected,
        s"vacuum broke the table (removed $removed)")
    } finally drop(stage)
  }

  test("ScdTable: dimAsOf time-travels the standing table identically to the operator") {
    val stage = freshStage("asof")
    try {
      ScdTable.build(dim, s"$stage/t", "k", Seq("seg", "nat"), nBuckets = 8)
      ScdTable.admit(spark, batch, s"$stage/t")
      val expected = Scd.asOf(
        Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), 2L), 1L)
        .orderBy(col("k"))
        .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
      val got = ScdTable.dimAsOf(spark, s"$stage/t", 1L).orderBy(col("k"))
        .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
      assert(got == expected, s"table as-of diverged:\n$got\nvs\n$expected")
    } finally drop(stage)
  }

  test("ScdTable: an all-new-keys batch inserts without touching standing buckets' content") {
    val stage = freshStage("insert")
    try {
      ScdTable.build(dim, s"$stage/t", "k", Seq("seg", "nat"), nBuckets = 8)
      val r = ScdTable.admit(spark,
        Seq((100L, "X", 1L), (101L, "Y", 2L)).toDF("k", "seg", "nat"),
        s"$stage/t")
      assert(r.expired == 0L && r.opened == 2L)
      assert(ScdTable.current(spark, s"$stage/t").count() == 8L)
    } finally drop(stage)
  }
}
