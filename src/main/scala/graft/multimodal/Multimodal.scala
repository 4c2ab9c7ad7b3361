package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (north-star scope).
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct — the schema a 100 TB multimodal corpus actually uses (content
  * bytes inline or as object-store pointers; metadata queryable without
  * decoding). The Spark-side plumbing — schema, batch shape, partition-wise
  * processing via `mapPartitions` over a typed Dataset (the JVM analogue of
  * `mapInPandas`: one iterator per partition, amortizing per-batch decoder
  * init), frame sampling as a Generator — is real and tested.
  *
  * Image decode is REAL for every format the JDK's `javax.imageio` ships
  * codecs for (PNG, JPEG, BMP, GIF, WBMP) — [[decodeImage]],
  * [[imageFeatures]], [[resizeImages]]; no external libraries needed,
  * so the same jar decodes on any executor. Payloads ImageIO cannot parse
  * (audio, video, proprietary formats — this container ships no codecs for
  * those) fall back to [[decodeStub]], a clearly-marked deterministic fake
  * that keeps the pipeline contract testable end-to-end.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      media_type: String,        // "image" | "audio" | "video"
      content: Array[Byte],      // opaque payload (or object-store pointer)
      width: Int, height: Int, duration_ms: Long)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      features: Array[Float])    // decoder output embedding

  /** Salted 32-bit multiplicative mix of the doc id — plain int64
    * arithmetic, so the DuckDB oracle reproduces the fixture metadata
    * exactly (xxhash64, the previous derivation, exists only in Spark,
    * which kept every metadata query at the weaker rows-only gate).
    * The id is range-reduced to 2³¹ BEFORE the Knuth multiply: the raw
    * product overflows int64 for ids above ~3.4e9 (an ANSI runtime error,
    * not a silent wrap), while (2³¹−1)·2654435761 stays under 2⁶³. Ids
    * below 2³¹ — every fixture — are unchanged by the reduction. */
  private def mix(id: Column, salt: Int): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L) + lit(salt * 40503L),
      lit(4294967296L))

  /** Derive a media table from the documents fixture: text bytes as the
    * opaque payload, metadata from deterministic integer mixing. Stands in
    * for `spark.read.format("binaryFile")` over a media bucket. */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      get(array(lit("image"), lit("audio"), lit("video")),
        pmod(mix(col("doc_id"), 0), lit(3)).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      (pmod(mix(col("doc_id"), 1), lit(1920)) + 1).cast("int").as("width"),
      (pmod(mix(col("doc_id"), 2), lit(1080)) + 1).cast("int").as("height"),
      pmod(mix(col("doc_id"), 3), lit(600000)).as("duration_ms"))

  /** STUB decoder: a real implementation would hand `content` to an image /
    * audio codec. The fake derives `featureDim` floats in [-1, 1) from a
    * rolling FNV-style hash of the payload — deterministic, so the plumbing
    * (batching, schema, null-safety) is testable end-to-end. */
  def decodeStub(content: Array[Byte], featureDim: Int): Array[Float] = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < content.length) { h = (h ^ content(i)) * 0x100000001b3L; i += 1 }
    Array.tabulate(featureDim) { d =>
      val x = h ^ (0x9e3779b97f4a7c15L * (d + 1))
      ((x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
    }
  }

  /** Partition-wise feature extraction: typed `mapPartitions`, one decoder
    * "session" per partition (the expensive-init amortization pattern of
    * `mapInPandas`). REAL-decoder-first across all three modalities —
    * still images via ImageIO, JDK-readable audio (WAV/AIFF/AU) via
    * javax.sound, frame-sequence video (MJPEG / PNG sequence) via the
    * per-frame ImageIO split — with the deterministic stub only for
    * payloads no JDK codec parses, so the column is always total. The
    * audio/video legs emit bounded [−1, 1] floats; the image leg leads
    * with raw width/height (its established contract). The gate's
    * features_ok bound is exercised by the text-payload fixture, whose
    * rows all take the stub leg. */
  def extractFeatures(spark: SparkSession, media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // ImageIO plugin scan once per partition, not once per row
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        // multi-frame FIRST: ImageIO happily decodes the first frame of a
        // concatenated stream, so the still-image leg would otherwise
        // shadow every frame-sequence payload
        val feats = videoFeatureVector(m.content, featureDim)
          .orElse(decodeImage(m.content).map(img => imageFeatures(img, featureDim)))
          .orElse(audioFeatureVector(m.content, featureDim))
          .getOrElse(decodeStub(m.content, featureDim))
        MediaFeatures(m.media_id, m.media_type, m.content.length.toLong, feats)
      }
    }
  }

  /** Real audio features as a bounded [−1, 1] vector: [rms, peak,
    * channels/8, sample-rate/48k, log-scaled frame count, duration/10min,
    * 0-pad] — the [[extractAudioFeatures]] signal stats normalized into
    * the gate's feature contract. None when no JDK audio codec parses the
    * payload. */
  private[multimodal] def audioFeatureVector(content: Array[Byte],
                                             featureDim: Int): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val durMs = (frames * 1000L / fmt.getSampleRate.toLong).max(0L)
      var (sumSq, peak, n) = (0.0, 0.0f, 0L)
      if (fmt.getSampleSizeInBits == 16) {
        val bytes = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        while (bb.remaining() >= 2) {
          val s = bb.getShort / 32768.0f
          sumSq += s * s; if (math.abs(s) > peak) peak = math.abs(s); n += 1
        }
      }
      val rms = if (n > 0) math.sqrt(sumSq / n).toFloat else 0.0f
      def clip1(x: Double): Float = math.min(1.0, math.max(0.0, x)).toFloat
      Some(Array(rms, peak,
        clip1(fmt.getChannels / 8.0),
        clip1(fmt.getSampleRate / 48000.0),
        clip1(math.log1p(frames.max(0L).toDouble) / 20.0),
        clip1(durMs / 600000.0)).padTo(featureDim, 0.0f).take(featureDim))
    } catch { case _: Exception => None }

  /** Real frame-sequence video features as a bounded [−1, 1] vector:
    * [log-scaled frame count, then per-frame mean luma / 255 of the first
    * frames, 0-pad]. None unless the payload splits into TWO OR MORE
    * decodable frames — a single still image belongs to the image leg. */
  private[multimodal] def videoFeatureVector(content: Array[Byte],
                                             featureDim: Int): Option[Array[Float]] = {
    val frames = splitFrames(content).flatMap(decodeImage(_))
    if (frames.size < 2) None
    else {
      val lumas = frames.take(math.max(featureDim - 1, 1)).map { img =>
        var (sum, n) = (0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xFF) * 299 +
              ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        if (n > 0) sum.toFloat / n / 255.0f else 0.0f
      }
      Some((Array(math.min(1.0, math.log1p(frames.size.toDouble) / 10.0).toFloat)
        ++ lumas).padTo(featureDim, 0.0f).take(featureDim))
    }
  }

  // ---------------------------------------------------------------- real
  // JDK-codec image path (PNG/JPEG/BMP/GIF — javax.imageio, zero deps)

  /** Real decode: None when no installed ImageIO reader understands the
    * payload (then callers fall back to the stub or pass through). */
  def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
    catch { case _: Exception => None }

  /** Real features from decoded pixels: [width, height, meanR, meanG,
    * meanB, …luma histogram] padded/truncated to `featureDim`. Deterministic
    * — pure pixel arithmetic. */
  def imageFeatures(img: java.awt.image.BufferedImage, featureDim: Int): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    val lumaBuckets = new Array[Long](math.max(featureDim - 5, 1))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val (r, g, b) = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
        sr += r; sg += g; sb += b
        val luma = (r * 299 + g * 587 + b * 114) / 1000
        lumaBuckets((luma * lumaBuckets.length) / 256) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    val head = Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n)
    (head ++ lumaBuckets.map(_ / n)).padTo(featureDim, 0.0f).take(featureDim)
  }

  /** Real single-image resize: scale preserving aspect ratio (bilinear),
    * re-encode PNG. Pure pixel work — shared by [[resizeImages]]'s real
    * path and callers holding an already-decoded frame. */
  def scaleToWidth(img: java.awt.image.BufferedImage,
                   maxWidth: Int): (Array[Byte], Int, Int) = {
    val newW = maxWidth
    val newH = math.max(1, (img.getHeight.toLong * maxWidth / img.getWidth).toInt)
    val scaled = new java.awt.image.BufferedImage(
      newW, newH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, newW, newH, null)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(scaled, "png", out)
    (out.toByteArray, newW, newH)
  }

  // ---------------------------------------------------------------- real
  // JDK audio path (WAV/AIFF/AU — javax.sound.sampled, zero deps)

  case class AudioFeatures(
      media_id: Long, decoded: Boolean, sample_rate: Float, channels: Int,
      n_frames: Long, duration_ms: Long, rms: Float, peak: Float)

  /** Real audio parse: format metadata + signal features (RMS and peak of
    * the normalized 16-bit PCM signal). `decoded=false` rows carry zeros —
    * the payload had no JDK-readable audio header (MP3/OGG need external
    * codecs; WAV/AIFF/AU do not). */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { m =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.content))
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val durMs = (frames * 1000L / fmt.getSampleRate.toLong).max(0L)
          // signal stats over 16-bit signed PCM (the common WAV shape)
          var (sumSq, peak, n) = (0.0, 0.0f, 0L)
          if (fmt.getSampleSizeInBits == 16) {
            val bytes = in.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            while (bb.remaining() >= 2) {
              val s = bb.getShort / 32768.0f
              sumSq += s * s; if (math.abs(s) > peak) peak = math.abs(s); n += 1
            }
          }
          val rms = if (n > 0) math.sqrt(sumSq / n).toFloat else 0.0f
          AudioFeatures(m.media_id, decoded = true, fmt.getSampleRate,
            fmt.getChannels, frames, durMs, rms, peak)
        } catch {
          case _: Exception =>
            AudioFeatures(m.media_id, decoded = false, 0.0f, 0, 0L, 0L, 0.0f, 0.0f)
        }
      }
    }
  }

  /** Metadata-only pruning query: the win of carrying typed metadata beside
    * the blob — selects never touch `content`, so the columnar reader skips
    * the heavy column entirely (check ReadSchema in the plan). */
  def largeLandscapeImages(media: DataFrame): DataFrame =
    media
      .filter(col("media_type") === "image" && col("width") > col("height"))
      .select(col("media_id"), col("width"), col("height"))
      .orderBy(col("media_id"))

  /** Image resize, REAL-decoder-first: rows whose payload the JDK's
    * ImageIO can decode get a true decode → bilinear scale → PNG
    * re-encode with metadata updated from the ACTUAL output pixels; only
    * payloads no installed codec understands fall back to the marked
    * deterministic STUB (proportional byte truncation — the fixture
    * path: its "image" payloads are UTF-8 text). Already-narrow rows and
    * non-image types pass through untouched. Partition-wise like
    * [[extractFeatures]] (one codec-registry scan per partition, not per
    * row) — map-side, no shuffle, so it composes with any upstream
    * partitioning at scale. */
  def resizeImages(media: DataFrame, maxWidth: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        if (m.media_type != "image" || m.width <= maxWidth) m
        else decodeImage(m.content) match {
          case Some(img) if img.getWidth > maxWidth =>
            val (bytes, w, h) = scaleToWidth(img, maxWidth)
            m.copy(content = bytes, width = w, height = h)
          case Some(img) =>
            // decodable but already narrow in PIXELS: trust the pixels
            // over stale metadata and bring the latter in lockstep
            m.copy(width = img.getWidth, height = img.getHeight)
          case None =>
            // STUB fallback (undecodable payload): shrink the metadata by
            // the exact integer math of the former column-only stub and
            // truncate the payload proportionally to the pixel ratio
            val newH = (m.height.toLong * maxWidth / m.width).toInt
            val scale = (maxWidth.toDouble * newH) /
              (m.width.toDouble * m.height.toDouble)
            val newLen = math.max((m.content.length.toDouble * scale).toInt, 1)
            m.copy(content = m.content.take(newLen),
              width = maxWidth, height = newH)
        }
      }
    }.toDF()
  }

  /** Deterministic REAL-image fixture: one solid-color PNG per document,
    * dimensions from the same integer mixing as [[mediaFromDocuments]]
    * but bounded small (width 8–135, height 8–103) so synthesis stays
    * trivial at gate scale. This is the decodable twin of the text-
    * payload fixture — it lets the resize gate pin REAL decode → scale →
    * re-encode output dimensions against a pure-arithmetic oracle. */
  def syntheticImages(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        (pmod(mix(col("doc_id"), 1), lit(128)) + 8).cast("int").as("width"),
        (pmod(mix(col("doc_id"), 2), lit(96)) + 8).cast("int").as("height"))
      .as[(Long, Int, Int)].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          g.setColor(new java.awt.Color(((id * 2654435761L) & 0xFFFFFFL).toInt))
          g.fillRect(0, 0, w, h)
          g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRecord(id, "image", out.toByteArray, w, h, 0L)
        }
      }.toDF()
  }

  /** Decode-back report: the dimensions read from the payload's ACTUAL
    * pixels, not its metadata — what the resize gate pins (an arithmetic
    * oracle can only be matched if the re-encoded image really has the
    * expected size). Undecodable rows report (−1, −1) rather than
    * dropping out (the S2 sentinel rule — totality keeps row counts
    * comparable). */
  def decodedDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        decodeImage(m.content) match {
          case Some(img) => (m.media_id, img.getWidth, img.getHeight)
          case None      => (m.media_id, -1, -1)
        }
      }
    }.toDF("media_id", "width_px", "height_px")
  }

  // ---------------------------------------------------------------- real
  // JVM video path: frame-sequence containers (MJPEG = concatenated JPEGs,
  // PNG sequence = concatenated PNGs) decode with the same zero-dep
  // javax.imageio codecs as still images — no native codec needed. This
  // retires the last documented decode stub for these container types;
  // inter-frame-compressed formats (H.264 etc.) still have no JVM codec
  // in this container and keep the [[sampleFrames]] fingerprint path.

  case class VideoFrame(
      media_id: Long, frame_no: Int, width: Int, height: Int,
      mean_luma: Float)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  private val JpegSig: Array[Byte] =
    Array(0xFF, 0xD8, 0xFF).map(_.toByte)

  private def matchesAt(content: Array[Byte], off: Int, sig: Array[Byte]): Boolean =
    off + sig.length <= content.length &&
      sig.indices.forall(i => content(off + i) == sig(i))

  /** Split a frame-sequence payload at each container signature. Every
    * frame of an MJPEG stream begins with the JPEG SOI marker (FFD8FF) and
    * of a PNG sequence with the 8-byte PNG signature; the entropy-coded
    * body byte-stuffs FF as FF00, so the start marker cannot occur inside
    * a frame's scan data — splitting on it is exact for codec-written
    * streams. Non-sequence payloads yield no frames (callers fall back to
    * the fingerprint path). */
  private[multimodal] def splitFrames(content: Array[Byte]): Seq[Array[Byte]] = {
    val sig =
      if (matchesAt(content, 0, PngSig)) PngSig
      else if (matchesAt(content, 0, JpegSig)) JpegSig
      else return Seq.empty
    val starts = (0 until content.length).filter(matchesAt(content, _, sig))
    starts.zip(starts.drop(1) :+ content.length).map { case (a, b) =>
      java.util.Arrays.copyOfRange(content, a, b)
    }
  }

  /** REAL frame decode for sequence containers: split → ImageIO per frame
    * → per-frame dimensions + mean luma. Map-side (typed mapPartitions,
    * same decoder-amortization shape as [[extractFeatures]]), `stride`
    * keeps every strideth frame — the keyframe-sampling access pattern.
    * Frames ImageIO cannot parse are dropped (a truncated trailing frame
    * in a corrupt stream), so the output carries only genuinely decoded
    * pixels. */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame,
                        stride: Int = 1): Dataset[VideoFrame] = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.filter(_.media_type == "video").flatMap { m =>
        splitFrames(m.content).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .flatMap { case (bytes, i) =>
            decodeImage(bytes).map { img =>
              var (sum, n) = (0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xFF) * 299 +
                    ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
                  n += 1
                  x += 1
                }
                y += 1
              }
              VideoFrame(m.media_id, i, img.getWidth, img.getHeight,
                if (n > 0) sum.toFloat / n else 0.0f)
            }
          }
      }
    }
  }

  /** Frame sampling as a Generator: split the payload into fixed-size
    * "frames" and emit every strideth one — the video-keyframe access
    * pattern, map-side, no shuffle. The frame fingerprint is an md5 prefix
    * (cross-engine, so the DuckDB oracle checks the whole pipeline); for a
    * true 100 TB video corpus swap in xxhash64 — 8 bytes and far cheaper
    * per frame, at the cost of the oracle. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame =
    media
      .filter(col("media_type") === "video")
      // an empty payload has no frames — and without the guard Spark's
      // sequence(0, -1) would auto-step DOWN and fabricate one
      .filter(length(col("content")) > 0)
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            floor((length(col("content")).cast("int") - 1) / frameBytes).cast("int")),
          // lambda-bound start position -> SQL substring via call_function
          i => call_function("substring", col("content"), i * frameBytes + 1, lit(frameBytes)))))
      .withColumnsRenamed(Map("pos" -> "frame_no", "col" -> "frame"))
      .filter(pmod(col("frame_no"), lit(stride)) === 0)
      .select(col("media_id"), col("frame_no").cast("bigint").as("frame_no"),
        substring(md5(col("frame")), 1, 16).as("frame_hash"))
      .orderBy(col("media_id"), col("frame_no"))
}
