package graft.multimodal

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).cache()

  test("media table: opaque binary payload + typed metadata, deterministic") {
    val r = media.head
    assert(Set("image", "audio", "video").contains(r.getString(r.fieldIndex("media_type"))))
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
    val again = Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).head
    assert(r.getLong(r.fieldIndex("media_id")) == again.getLong(again.fieldIndex("media_id")))
    assert(r.getInt(r.fieldIndex("width")) == again.getInt(again.fieldIndex("width")))
  }

  test("extractFeatures: mapPartitions plumbing yields fixed-dim deterministic features") {
    import spark.implicits._
    val f1 = Multimodal.extractFeatures(spark, media, featureDim = 8)
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    assert(f1.values.forall(_.length == 8))
    val f2 = Multimodal.extractFeatures(spark, media.repartition(7), featureDim = 8)
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    assert(f1 == f2) // partitioning must not change decoder output
    assert(f1.values.flatten.forall(v => v >= -1.0f && v < 1.0f))
  }

  test("metadata-only query prunes the content column from a stored media table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toFile
    val path = s"${dir.getAbsolutePath}/media"
    media.write.mode("overwrite").parquet(path)
    val plan = Multimodal.largeLandscapeImages(spark.read.parquet(path))
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(plan)
    assert(!readSchema.contains("content"), s"content not pruned: $readSchema")
    assert(readSchema.contains("width"))
  }

  test("resizeImages: aspect ratio kept, metadata and payload shrink together, non-images untouched") {
    import spark.implicits._
    val resized = Multimodal.resizeImages(media, maxWidth = 100).cache()
    val wide = resized.filter(col("media_type") === "image")
    assert(wide.filter(col("width") > 100).count() == 0)
    // aspect ratio preserved within integer rounding for resized rows
    val pairs = media.filter(col("media_type") === "image" && col("width") > 100)
      .select(col("media_id"), (col("height").cast("double") / col("width")).as("ar0"))
      .join(resized.select(col("media_id"),
        (col("height").cast("double") / col("width")).as("ar1")), Seq("media_id"))
      .select(abs(col("ar0") - col("ar1"))).as[Double].collect()
    assert(pairs.nonEmpty && pairs.forall(_ < 0.02))
    // non-image payloads byte-identical
    val untouched = media.filter(col("media_type") =!= "image")
      .select(col("media_id"), xxhash64(col("content")).as("h0"))
      .join(resized.select(col("media_id"), xxhash64(col("content")).as("h1")), Seq("media_id"))
      .filter(col("h0") =!= col("h1")).count()
    assert(untouched == 0)
  }

  test("sampleFrames keeps every 4th frame only") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media)
      .select("frame_no").as[Int].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 4 == 0))
  }
}
