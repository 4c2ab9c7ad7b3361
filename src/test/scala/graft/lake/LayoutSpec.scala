package graft.lake

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft-layout").toFile
    try f(d.getAbsolutePath)
    finally { new scala.reflect.io.Directory(d).deleteRecursively(); () }
  }

  test("interleave is the Morton curve on the low bits") {
    // a=101b, b=011b with 3 bits: a's bits land at even positions
    // (1 + 16), b's at odd (2 + 8) -> 27
    val got = spark.range(1)
      .select(Layout.interleave(Seq(lit(5L), lit(3L)), 3).as("z"))
      .as[Long].head()
    assert(got == 27L)
  }

  test("z-ordered layout decodes far fewer scan rows than a shuffled one") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_extendedprice"))
    withDir { dir =>
      Layout.zorderWrite(li, Seq("l_partkey", "l_extendedprice"),
        s"$dir/z", numFiles = 8)
      // control: same rows, same file count, same row-group size, but
      // hash-scattered so every file's stats envelope spans both columns
      li.repartition(8, col("l_orderkey"))
        .write.option("parquet.block.size", (1L << 20).toString)
        .parquet(s"$dir/r")
      def box(path: String): DataFrame = spark.read.parquet(path)
        .filter(col("l_partkey").between(20, 40) &&
          col("l_extendedprice").between(20000d, 40000d))
      val zRows = Layout.scannedRows(box(s"$dir/z"))
      val rRows = Layout.scannedRows(box(s"$dir/r"))
      // identical content either way
      val key = (d: DataFrame) => d.select(col("l_orderkey"), col("l_linenumber"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(key(box(s"$dir/z")) == key(box(s"$dir/r")))
      assert(key(box(s"$dir/z")).nonEmpty)
      // the point of the layout: row-group skipping prunes on BOTH columns
      assert(zRows * 2 <= rRows,
        s"z-order bought no skipping: scanned $zRows vs $rRows (shuffled)")
    }
  }

  test("compact coalesces to the computed file count with content intact") {
    val ev = Tables.events(spark, sf)
    withDir { dir =>
      ev.repartition(32).write.parquet(s"$dir/small")
      val before = new java.io.File(s"$dir/small")
        .listFiles.count(_.getName.endsWith(".parquet"))
      assert(before == 32)
      val n = Layout.compact(spark, s"$dir/small", s"$dir/big",
        targetBytes = 256 * 1024)
      val after = new java.io.File(s"$dir/big")
        .listFiles.count(_.getName.endsWith(".parquet"))
      assert(after == n && after < before, s"got $after files, target $n")
      val sig = (p: String) => spark.read.parquet(p)
        .agg(count(lit(1)), expr("bit_xor(xxhash64(event_id, value))"))
        .as[(Long, Long)].head()
      assert(sig(s"$dir/small") == sig(s"$dir/big"))
    }
  }
}
