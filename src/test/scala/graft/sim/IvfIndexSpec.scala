package graft.sim

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The maintenance contract of the standing IVF index ([[IvfIndex]]):
  * querying the persisted structure must equal the retrain-per-call form,
  * probes must read only their cells' partitions, and admission must be
  * an idempotent no-retrain assignment — the [[graft.dedup.ShingleIndex]]
  * promises, for the ANN surface. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def withIndex(body: String => Unit): Unit = {
    val stage = java.nio.file.Files
      .createTempDirectory("graft-ivf-index-spec").toFile.getAbsolutePath
    try body(s"$stage/index")
    finally { new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively(); () }
  }

  private def queriesFor(emb: DataFrame, ids: Seq[Long]): DataFrame =
    emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  test("index topK equals the retrain-per-call ivfTopK exactly") {
    val emb = Tables.embeddings(spark, sf)
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    withIndex { path =>
      IvfIndex.build(spark, emb, path, nlist = 8)
      val viaIndex = IvfIndex.topK(spark, queriesFor(emb, ids), path,
          k = 10, nprobe = 4)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val retrain = Similarity.ivfTopK(spark, emb, ids,
          k = 10, nlist = 8, nprobe = 4)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(viaIndex == retrain,
        s"index=${viaIndex.take(5)}... retrain=${retrain.take(5)}...")
    }
  }

  test("probes read only their cells: postings scan is partition-pruned") {
    val emb = Tables.embeddings(spark, sf)
    withIndex { path =>
      IvfIndex.build(spark, emb, path, nlist = 8)
      val p = IvfIndex.topK(spark, queriesFor(emb, Seq(0L)), path,
          k = 5, nprobe = 2)
        .queryExecution.explainString(FormattedMode)
      val partFilters = p.linesIterator
        .filter(_.contains("PartitionFilters:")).mkString
      assert(partFilters.contains("cell"),
        s"postings scan not pruned by cell:\n$p")
      assert(!partFilters.replaceAll("\\s", "").contains("PartitionFilters:[]"),
        s"empty partition filter on the postings scan:\n$p")
    }
  }

  test("index topKSq equals the retrain-per-call ivfSqTopK exactly") {
    val emb = Tables.embeddings(spark, sf)
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    withIndex { path =>
      IvfIndex.build(spark, emb, path, nlist = 8)
      val viaIndex = IvfIndex.topKSq(spark, queriesFor(emb, ids), path,
          k = 10, nprobe = 4)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val retrain = Similarity.ivfSqTopK(spark, emb, ids,
          k = 10, nlist = 8, nprobe = 4)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(viaIndex == retrain,
        s"index=${viaIndex.take(5)}... retrain=${retrain.take(5)}...")
    }
  }

  test("compressed probe partition-prunes BOTH tiers (codes and exact refine)") {
    val emb = Tables.embeddings(spark, sf)
    withIndex { path =>
      IvfIndex.build(spark, emb, path, nlist = 8)
      val p = IvfIndex.topKSq(spark, queriesFor(emb, Seq(0L)), path,
          k = 5, nprobe = 2)
        .queryExecution.explainString(FormattedMode)
      val pruned = p.linesIterator
        .filter(_.contains("PartitionFilters:"))
        .filter(l => l.contains("cell") && !l.replaceAll("\\s", "").contains("PartitionFilters:[]"))
        .toSeq
      assert(pruned.size >= 2,
        s"expected cell-pruned scans of codes AND postings, got:\n$p")
    }
  }

  test("admit assigns without retraining, finds the clone, and replays as a no-op") {
    val emb = Tables.embeddings(spark, sf)
    withIndex { path =>
      // build WITHOUT the batch: vec_id >= 10 is the standing corpus
      IvfIndex.build(spark, emb.filter(col("vec_id") >= 10L), path, nlist = 8)
      val centroidsBefore = spark.read.parquet(s"$path/centroids").collect().toSet
      // the batch: vectors 0-9 plus an exact clone of vector 7 under a new id
      val clone = emb.filter(col("vec_id") === 7L)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"), col("label"))
      val batch = emb.filter(col("vec_id") < 10L).unionByName(clone)
      assert(IvfIndex.admit(spark, batch, path) == 11L)
      // no retrain: the quantizer's centroids are byte-identical
      assert(spark.read.parquet(s"$path/centroids").collect().toSet
        == centroidsBefore)
      // the admitted clone lands in its source's cell, so a probe for
      // vector 7 must surface it at rank 1 with cosine 1.0
      val got = IvfIndex.topK(spark, queriesFor(emb, Seq(7L)), path,
          k = 3, nprobe = 2)
        .as[(Long, Long, Long, Double)].collect()
      assert(got.head._3 == 10007L && got.head._4 == 1.0,
        s"clone not found at rank 1: ${got.toSeq}")
      // both tiers admitted together: the codes tier carries the batch too,
      // and the compressed probe surfaces the admitted clone identically
      assert(spark.read.parquet(s"$path/codes").count()
        == spark.read.parquet(s"$path/postings").count())
      val gotSq = IvfIndex.topKSq(spark, queriesFor(emb, Seq(7L)), path,
          k = 3, nprobe = 2)
        .as[(Long, Long, Long, Double)].collect()
      assert(gotSq.head._3 == 10007L && gotSq.head._4 == 1.0,
        s"clone not found via the compressed tier: ${gotSq.toSeq}")
      // idempotence: replaying the batch appends nothing to either tier
      val before = spark.read.parquet(s"$path/postings").count()
      assert(IvfIndex.admit(spark, batch, path) == 0L)
      assert(spark.read.parquet(s"$path/postings").count() == before)
      assert(spark.read.parquet(s"$path/codes").count() == before)
    }
  }
}
