package graft.serve

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val li = Tables.lineitem(spark, sf)
    val or = Tables.orders(spark, sf)
    Bucketing.writeBucketed(
      li.select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
      "li_bucketed", s"$wh/li", "l_orderkey", 8)
    Bucketing.writeBucketed(
      or.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "or_bucketed", s"$wh/or", "l_orderkey", 8)

    // disable auto-broadcast so both plans are sort-merge joins: the only
    // difference left is whether the inputs need an Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_bucketed", "or_bucketed", "l_orderkey")
      assert(Bucketing.isShuffleFree(joined), "bucketed join must not shuffle:\n" +
        joined.queryExecution.executedPlan)
      // and it is still correct
      val expected = li.join(or, li("l_orderkey") === or("o_orderkey")).count()
      assert(joined.count() == expected)

      // the non-bucketed twin DOES shuffle (so the assertion above is meaningful)
      val plain = li.select(col("l_orderkey"), col("l_quantity"))
        .join(or.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"))
      assert(!Bucketing.isShuffleFree(plain))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS or_bucketed")
      // external-table data outlives the DROP — delete the temp
      // warehouse tree too (ADVICE r15: parquet leaked per test run)
      new scala.reflect.io.Directory(new java.io.File(wh)).deleteRecursively()
      ()
    }
  }

  test("bucketed write fed by many partitions emits one file per bucket") {
    // the ×32 small-file regression (BENCH_SF32_r14 → fixed r15): Spark's
    // bucketed writer emits one file per incoming TASK per bucket, so a
    // 64-partition input writing 4 buckets would leave up to 256 files;
    // bucketAligned pins it to ≤ 1 per bucket at any partition setting
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketal").toString
    val wide = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .repartition(64) // deliberately misaligned input
    Bucketing.writeBucketed(wide, "li_align", s"$wh/li", "l_orderkey", 4)
    try {
      val parts = new java.io.File(s"$wh/li").listFiles()
        .count(f => f.isFile && f.getName.startsWith("part-"))
      assert(parts <= 4, s"bucketed write left $parts files for 4 buckets")
      // and the table still carries the full data
      assert(spark.table("li_align").count() ==
        Tables.lineitem(spark, sf).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_align")
      new scala.reflect.io.Directory(new java.io.File(wh)).deleteRecursively()
      ()
    }
  }
}
