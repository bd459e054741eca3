package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * partition passes.
  *
  * The Spark-side machinery — schema, partition sizing, batched
  * iteration shape (the Scala analog of `mapInPandas` batches), typed
  * Datasets — is real and tested. The DECODERS are deterministic
  * STUBS (clearly marked below): this container has no image/audio
  * codec libraries, so the stub derives stable pseudo-features from
  * the bytes; swapping in a real codec changes only the function body,
  * not the pipeline.
  */
object Multimodal {

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

  // ==== STUB DECODERS ===============================================
  // A real deployment replaces these bodies with an actual codec
  // (e.g. javax.imageio / ffmpeg bindings). Everything else — schema,
  // batching, partitioning — stays as-is.

  /** STUB image decode: dimensions + embedding derived from a rolling
    * hash of the payload. Deterministic in content. */
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
          val (w, h, emb) = decodeImageStub(m.content, dim)
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

  /** Synthesize a deterministic media frame for tests/benches. */
  def syntheticMedia(spark: SparkSession, n: Int, payload: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val bytes = Array.tabulate(payload)(j => ((i * 131 + j * 31) % 251).toByte)
      MediaRow(i, if (i % 2 == 0) "image/png" else "audio/wav", bytes)
    }
  }
}
