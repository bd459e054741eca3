package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * partition passes.
  *
  * The Spark-side machinery — schema, partition sizing, batched
  * iteration shape (the Scala analog of `mapInPandas` batches), typed
  * Datasets — is real and tested. IMAGE decode is REAL (JDK
  * `javax.imageio`: PNG/JPEG/BMP/GIF, zero external deps) — dimensions
  * plus a downsampled-luminance grid embedding. Audio/video decoders
  * remain deterministic STUBS (clearly marked below): the JDK ships no
  * audio/video codec; swapping in a real one (ffmpeg bindings) changes
  * only the function body, not the pipeline.
  */
object Multimodal {

  // ImageIO's default decode path spools through a disk-backed
  // ImageInputStream cache — per-row temp-file churn on executors.
  // Payloads are already in memory; keep decode in memory too.
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      mime: String,
      content: Array[Byte])

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      embedding: Array[Float])

  final case class AudioFeatures(
      media_id: Long,
      sampleRate: Int,
      durationMs: Long,
      mfcc: Array[Float])

  final case class VideoFrameSample(
      media_id: Long,
      frameIndex: Int,
      frameHash: Long)

  /** Rows decoded per batch inside a partition — bounds peak memory
    * exactly like `mapInPandas` batch size does. */
  val BatchSize = 64

  // ==== IMAGE DECODE (real, JDK javax.imageio) ======================

  /** Decode an image payload (PNG/JPEG/BMP/GIF — whatever the JVM's
    * registered ImageReaders cover) into (width, height, embedding).
    * The embedding is a g×g mean-luminance grid (g = ceil(sqrt(dim)),
    * first `dim` cells, ITU-R BT.601 luma, normalized to [0,1]) — the
    * cheap classical stand-in for a model embedding; a real deployment
    * swaps the grid for a model forward pass at the same batch
    * boundary. Returns None when the bytes are not a decodable image.
    */
  def decodeImage(content: Array[Byte], dim: Int = 16): Option[(Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val sums = new Array[Double](g * g)
      val counts = new Array[Long](g * g)
      var y = 0
      while (y < h) {
        val cy = y * g / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          val c = cy * g + (x * g / w)
          sums(c) += luma / 255.0
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      val emb = Array.tabulate(dim) { j =>
        if (j < g * g && counts(j) > 0) (sums(j) / counts(j)).toFloat else 0f
      }
      Some((w, h, emb))
    }
  }

  // ==== STUB DECODERS (audio/video; image fallback) =================
  // The JDK ships no audio/video codec; a real deployment replaces
  // these bodies with one (e.g. ffmpeg bindings). Everything else —
  // schema, batching, partitioning — stays as-is.

  /** STUB image decode — retained as the deterministic fallback for
    * payloads [[decodeImage]] cannot parse (corrupt files, formats
    * without a registered reader): dimensions + embedding derived from
    * a rolling hash of the payload. Deterministic in content. */
  def decodeImageStub(content: Array[Byte], dim: Int = 16): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    val w = 64 + math.abs(h % 1024).toInt
    val ht = 64 + math.abs((h >> 10) % 1024).toInt
    val emb = Array.tabulate(dim) { j =>
      val hj = h * (j + 2654435761L)
      ((hj >>> 16) % 1000).toFloat / 1000f
    }
    (w, ht, emb)
  }

  /** STUB audio decode. */
  def decodeAudioStub(content: Array[Byte], coeffs: Int = 13): (Int, Long, Array[Float]) = {
    val h = content.foldLeft(17L)((a, b) => a * 31 + b)
    (44100, math.abs(h % 300000), Array.tabulate(coeffs)(j => ((h >> j) % 97).toFloat / 97f))
  }

  /** STUB video frame hash. */
  def frameHashStub(content: Array[Byte], frame: Int): Long =
    content.foldLeft(frame.toLong * 1099511628211L)((a, b) => a * 31 + b)

  // ==== pipeline operators ==========================================

  /** Decode + feature-extract images in batched partition passes.
    * `repartitionTo` caps rows per task so a partition of large blobs
    * fits in executor memory (the knob you size from payload stats —
    * at 100 TB of media this matters more than anything else here). */
  def imageFeatures(ds: Dataset[MediaRow], dim: Int = 16,
      repartitionTo: Option[Int] = None): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    val base = repartitionTo.map(ds.repartition(_)).getOrElse(ds)
    base.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = the amortization point for a real decoder
        // (model session init, JNI handle, GPU transfer, ...)
        batch.iterator.map { m =>
          val (w, h, emb) = decodeImage(m.content, dim)
            .getOrElse(decodeImageStub(m.content, dim))
          ImageFeatures(m.media_id, w, h, emb)
        }
      }
    }
  }

  def audioFeatures(ds: Dataset[MediaRow], coeffs: Int = 13): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.map { m =>
      val (sr, dur, mfcc) = decodeAudioStub(m.content, coeffs)
      AudioFeatures(m.media_id, sr, dur, mfcc)
    }))
  }

  /** Sample every `stride`-th frame (stub: hash per sampled index). */
  def sampleFrames(ds: Dataset[MediaRow], frames: Int, stride: Int): Dataset[VideoFrameSample] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      (0 until frames by stride).map(i => VideoFrameSample(m.media_id, i, frameHashStub(m.content, i)))
    }
  }

  /** Read a directory of binary media files with Spark's binaryFile
    * source (path/modificationTime/length/content schema), mapped into
    * [[MediaRow]]. Pushdown: `pathGlobFilter` prunes at listing time. */
  def readBinaryDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1).as("ext"),
        col("length"),
        col("content"))

  /** Deterministic tiny PNG: (8 + (seed%9)) × (8 + (seed/3%7)) pixels,
    * gradient + seed-hashed pattern. Real, ImageIO-decodable bytes. */
  def syntheticPng(seed: Long): Array[Byte] = {
    val w = 8 + (math.abs(seed) % 9).toInt
    val h = 8 + (math.abs(seed) / 3 % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (seed * 131 + y.toLong * w + x) * 2654435761L
        img.setRGB(x, y, (((v >>> 16) & 0xffffffL) | (x * 255 / w) << 16).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic media frame for tests/benches. Even
    * ids carry REAL tiny PNGs (exercise the ImageIO path); odd ids
    * carry opaque pseudo-audio payloads (exercise the stub fallback). */
  def syntheticMedia(spark: SparkSession, n: Int, payload: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      if (i % 2 == 0) MediaRow(i, "image/png", syntheticPng(i))
      else MediaRow(i, "audio/wav",
        Array.tabulate(payload)(j => ((i * 131 + j * 31) % 251).toByte))
    }
  }
}
