package graft.graph

import java.io.File

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class EdgeTierSpec extends SparkSpec {

  private def mtime(sfDir: String): Long = {
    val d = new File(s"${System.getProperty("java.io.tmpdir")}/graft-edge-tier")
    Option(d.listFiles()).getOrElse(Array.empty[File])
      .find(f => new File(f, "_meta").isFile &&
        f.getName.startsWith(new File(sfDir).getName))
      .map(f => new File(f, "_meta").lastModified()).getOrElse(0L)
  }

  test("tier content is identical to the direct partCoOccurrence derivation") {
    EdgeTier.invalidate(sf)
    val tier = EdgeTier.coOccurrence(spark, sf)
      .orderBy(col("src"), col("dst")).collect().toSeq
    val direct = Edges.partCoOccurrence(Tables.lineitem(spark, sf))
      .orderBy(col("src"), col("dst")).collect().toSeq
    assert(tier == direct, s"tier drifted: ${tier.take(3)} vs ${direct.take(3)}")
    assert(tier.nonEmpty)
  }

  test("undirected tier content equals Triangles.undirect over the directed tier") {
    EdgeTier.invalidate(sf)
    val tier = EdgeTier.undirected(spark, sf)
      .orderBy(col("a"), col("b")).collect().toSeq
    val direct = Triangles.undirect(EdgeTier.coOccurrence(spark, sf))
      .orderBy(col("a"), col("b")).collect().toSeq
    assert(tier == direct && tier.nonEmpty)
  }

  test("second probe reuses the committed tier; invalidate forces a rebuild") {
    EdgeTier.invalidate(sf)
    EdgeTier.coOccurrence(spark, sf).count()
    val built = mtime(sf)
    assert(built > 0L, "tier _meta missing after build")
    EdgeTier.coOccurrence(spark, sf).count()
    assert(mtime(sf) == built, "probe rebuilt an already-fresh tier")
    EdgeTier.invalidate(sf)
    EdgeTier.coOccurrence(spark, sf).count()
    assert(mtime(sf) > 0L, "invalidate did not trigger a rebuild")
  }

  test("source drift (fingerprint mismatch) forces a rebuild with the new data") {
    import spark.implicits._
    val stage = java.nio.file.Files
      .createTempDirectory("graft-edge-tier-spec").toFile.getAbsolutePath
    try {
      Seq((1L, 10L), (1L, 11L)).toDF("l_orderkey", "l_partkey")
        .withColumn("l_shipdate", lit("1995-01-01").cast("timestamp"))
        .write.mode("overwrite").parquet(s"$stage/lineitem.parquet")
      val v1 = EdgeTier.coOccurrence(spark, stage).count()
      assert(v1 == 2L) // one order, two parts -> both directed pairs
      // rewrite the source: three parts -> 6 directed pairs. The fresh
      // file listing (length/mtime) must invalidate the standing tier.
      Thread.sleep(5) // ensure a distinct mtime on fast filesystems
      Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("l_orderkey", "l_partkey")
        .withColumn("l_shipdate", lit("1995-01-01").cast("timestamp"))
        .write.mode("overwrite").parquet(s"$stage/lineitem.parquet")
      val v2 = EdgeTier.coOccurrence(spark, stage).count()
      assert(v2 == 6L, s"stale tier served after source drift: $v2")
    } finally {
      EdgeTier.invalidate(stage)
      new scala.reflect.io.Directory(new File(stage)).deleteRecursively()
      ()
    }
  }
}
