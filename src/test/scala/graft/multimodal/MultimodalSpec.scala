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

  /** A real PNG payload: w×h with a left-black / right-white split. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A solid-color frame encoded in the given still format. */
  private def frameBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  test("real video decode: MJPEG stream yields every frame with true pixels") {
    import spark.implicits._
    // three concatenated JPEG frames: black, mid-gray, white
    val mjpeg = frameBytes(16, 8, 0x000000, "jpg") ++
      frameBytes(16, 8, 0x808080, "jpg") ++ frameBytes(16, 8, 0xFFFFFF, "jpg")
    val rows = Seq(Multimodal.MediaRecord(1L, "video", mjpeg, 16, 8, 0L))
    val frames = Multimodal.decodeVideoFrames(spark, rows.toDF())
      .collect().sortBy(_.frame_no)
    assert(frames.length == 3)
    assert(frames.forall(f => f.media_id == 1L && f.width == 16 && f.height == 8))
    assert(frames.map(_.frame_no).toSeq == Seq(0, 1, 2))
    // solid frames decode to their exact luma (JPEG is lossy but a solid
    // field round-trips within a count or two)
    assert(frames(0).mean_luma < 2.0f)
    assert(math.abs(frames(1).mean_luma - 128.0f) < 3.0f)
    assert(frames(2).mean_luma > 253.0f)
  }

  test("real video decode: PNG sequence, stride sampling, junk and non-video excluded") {
    import spark.implicits._
    val pngSeq = (0 until 4).map(i => frameBytes(8, 8, i * 0x111111, "png"))
      .reduce(_ ++ _)
    val rows = Seq(
      Multimodal.MediaRecord(1L, "video", pngSeq, 8, 8, 0L),
      Multimodal.MediaRecord(2L, "video", "no container here".getBytes, 0, 0, 0L),
      Multimodal.MediaRecord(3L, "image", pngSeq, 8, 8, 0L)) // not video
    val all = Multimodal.decodeVideoFrames(spark, rows.toDF()).collect()
    assert(all.forall(_.media_id == 1L)) // junk: 0 frames; image row excluded
    assert(all.map(_.frame_no).sorted.toSeq == Seq(0, 1, 2, 3))
    // PNG is lossless: solid frame i has exact luma i*17
    all.foreach(f => assert(f.mean_luma == f.frame_no * 17.0f))
    // stride keeps frames 0 and 2 only
    val strided = Multimodal.decodeVideoFrames(spark, rows.toDF(), stride = 2)
      .collect().map(_.frame_no).sorted.toSeq
    assert(strided == Seq(0, 2))
  }

  test("real video decode: truncated trailing frame is dropped, not fabricated") {
    import spark.implicits._
    val full = frameBytes(8, 8, 0x123456, "png")
    val cut = full ++ full.take(20) // second frame truncated mid-header
    val rows = Seq(Multimodal.MediaRecord(1L, "video", cut, 8, 8, 0L))
    val frames = Multimodal.decodeVideoFrames(spark, rows.toDF()).collect()
    assert(frames.map(_.frame_no).toSeq == Seq(0))
  }

  test("real JDK decode: PNG payloads yield pixel-true features, junk falls back to the stub") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(40, 20), 40, 20, 0L),
      Multimodal.MediaRecord(2L, "image", "not an image at all".getBytes, 0, 0, 0L))
    val feats = Multimodal.extractFeatures(spark, rows.toDF(), featureDim = 8)
      .collect().map(f => f.media_id -> f.features).toMap
    // real path: [w, h, meanR, meanG, meanB, ...luma hist]; half-black/half-white
    assert(feats(1L)(0) == 40.0f && feats(1L)(1) == 20.0f)
    assert(math.abs(feats(1L)(2) - 127.5f) < 1.0f) // mean of 0 and 255
    // junk payload: deterministic stub, values in [-1, 1)
    assert(feats(2L).forall(v => v >= -1.0f && v < 1.0f))
    assert(feats(2L).toSeq == Multimodal.decodeStub("not an image at all".getBytes, 8).toSeq)
  }

  test("extractFeatures dispatches real decoders per modality; stub only for junk") {
    import spark.implicits._
    val mjpeg = frameBytes(8, 8, 0x000000, "jpg") ++ frameBytes(8, 8, 0xFFFFFF, "jpg")
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(40, 20), 40, 20, 0L),
      Multimodal.MediaRecord(2L, "audio", wavBytes(8000f, 0.1, 0.5), 0, 0, 100L),
      Multimodal.MediaRecord(3L, "video", mjpeg, 8, 8, 0L),
      Multimodal.MediaRecord(4L, "video", "junk payload".getBytes, 0, 0, 0L))
    val feats = Multimodal.extractFeatures(spark, rows.toDF(), featureDim = 8)
      .collect().map(f => f.media_id -> f.features).toMap
    // image leg: [w, h, ...] pixel-true
    assert(feats(1L)(0) == 40.0f && feats(1L)(1) == 20.0f)
    // audio leg: [rms, peak, ...] — a 0.5-amplitude sine has rms ≈ 0.35
    assert(math.abs(feats(2L)(0) - 0.3535f) < 0.01f, s"rms=${feats(2L)(0)}")
    assert(math.abs(feats(2L)(1) - 0.5f) < 0.02f, s"peak=${feats(2L)(1)}")
    // video leg: [log-frames, luma_0/255, luma_1/255, ...] — the two
    // solid frames read back ~black then ~white (JPEG-lossy tolerance)
    assert(feats(3L)(1) < 0.1f && feats(3L)(2) > 0.9f,
      s"frame lumas=${feats(3L).toSeq}")
    // junk: the deterministic stub
    assert(feats(4L).toSeq == Multimodal.decodeStub("junk payload".getBytes, 8).toSeq)
    // dim contract holds on every leg; audio/video/stub legs are bounded
    feats.values.foreach(f => assert(f.length == 8))
    Seq(2L, 3L, 4L).foreach(id =>
      assert(feats(id).forall(v => v >= -1.0f && v <= 1.0f), s"row $id unbounded"))
  }

  test("real resize: decoded dimensions shrink with aspect kept; junk passes through") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(100, 60), 100, 60, 0L),
      // a real JPEG payload takes the same real decode -> scale -> PNG
      // re-encode path as PNG (ImageIO dispatches on content, not name)
      Multimodal.MediaRecord(3L, "image", frameBytes(80, 40, 0x336699, "jpg"), 80, 40, 0L),
      Multimodal.MediaRecord(2L, "image", "junk".getBytes, 0, 0, 0L))
    val resized = Multimodal.resizeImages(rows.toDF(), maxWidth = 50)
      .as[Multimodal.MediaRecord]
      .collect().map(r => r.media_id -> r).toMap
    val r1 = resized(1L)
    assert(r1.width == 50 && r1.height == 30)
    // the re-encoded payload really is a 50x30 image
    val back = Multimodal.decodeImage(r1.content).get
    assert(back.getWidth == 50 && back.getHeight == 30)
    val r3 = resized(3L)
    assert(r3.width == 50 && r3.height == 25)
    val back3 = Multimodal.decodeImage(r3.content).get
    assert(back3.getWidth == 50 && back3.getHeight == 25)
    assert(resized(2L).content.toSeq == "junk".getBytes.toSeq) // untouched
  }

  /** A real WAV payload: 16-bit mono PCM sine at the given amplitude. */
  private def wavBytes(sampleRate: Float, seconds: Double, amplitude: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val samples = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(samples).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n)
      bb.putShort((math.sin(2 * math.Pi * 440 * i / sampleRate) * amplitude * 32767).toShort)
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real JDK audio: WAV metadata and signal stats are pixel^W sample-true; junk flagged undecoded") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "audio", wavBytes(8000f, 0.5, 0.5), 0, 0, 0L),
      Multimodal.MediaRecord(2L, "audio", "definitely not audio".getBytes, 0, 0, 0L))
    val f = Multimodal.extractAudioFeatures(spark, rows.toDF())
      .collect().map(a => a.media_id -> a).toMap
    val a1 = f(1L)
    assert(a1.decoded && a1.sample_rate == 8000f && a1.channels == 1)
    assert(a1.duration_ms == 500L && a1.n_frames == 4000L)
    // RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.354
    assert(math.abs(a1.rms - 0.354f) < 0.01f, s"rms ${a1.rms}")
    assert(math.abs(a1.peak - 0.5f) < 0.01f)
    assert(!f(2L).decoded && f(2L).rms == 0.0f)
  }

  test("sampleFrames keeps every 4th frame only") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media)
      .select("frame_no").as[Long].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 4 == 0))
  }

  test("sampleFrames emits zero frames for an empty payload") {
    import spark.implicits._
    val empty = Seq((1L, "video", Array.emptyByteArray, 0, 0, 0L))
      .toDF("media_id", "media_type", "content", "width", "height", "duration_ms")
    assert(Multimodal.sampleFrames(empty).count() == 0)
  }

  test("metadata mix survives 64-bit ids (no ANSI overflow above 2^33)") {
    import spark.implicits._
    // ids far above 2^33: the raw Knuth multiply would overflow int64 and
    // throw under ANSI; the range-reduced mix must stay total and in-range
    val big = Seq((1L << 33) + 5L, (1L << 40) + 7L, Long.MaxValue - 3L)
      .map(id => (id, s"doc $id body"))
      .toDF("doc_id", "text")
    val rows = Multimodal.mediaFromDocuments(big).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080)
      assert(r.getAs[Long]("duration_ms") >= 0L)
    }
    // reduction is a no-op below 2^31: the fixture-scale metadata that the
    // oracle hash-matches must be byte-identical to the pre-fix values
    val small = Multimodal.mediaFromDocuments(
      Seq((42L, "x")).toDF("doc_id", "text")).head
    def rawMix(salt: Long) = (42L * 2654435761L + salt * 40503L) % 4294967296L
    assert(small.getAs[String]("media_type")
      == Seq("image", "audio", "video")((rawMix(0) % 3).toInt)
      && small.getAs[Int]("width") == (rawMix(1) % 1920L + 1L).toInt
      && small.getAs[Int]("height") == (rawMix(2) % 1080L + 1L).toInt)
  }
}
