package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode step is REAL for image payloads the JDK can read
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — no external codec needed):
  * it produces the decoded pixel dimensions and a luminance histogram.
  * Audio/video kinds and undecodable payloads fall back to a
  * clearly-marked deterministic byte-histogram STUB (this container has
  * no audio/video codecs). Everything around the decode — schema, Dataset
  * typing, per-partition batch shape, partitioning — is what any further
  * codec would plug into. `mapPartitions` is the Scala analog of
  * arrow-batched `mapInPandas`: user code sees an iterator per partition,
  * so per-batch decoder init is amortized. */
object MultimodalOps {

  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  /** `decoded_width`/`decoded_height` are the REAL dimensions read from
    * the pixel data (0 when the payload wasn't decodable as an image). */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      decoded_width: Int, decoded_height: Int, features: Array[Float])

  /** Storage schema for a media table: opaque binary + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Decode + feature extraction. Image payloads are REALLY decoded with
    * `javax.imageio` (PNG/BMP/GIF/JPEG ship with the JDK): features =
    * `dim`-bin luminance histogram normalized by pixel count, plus the
    * decoded width/height. Non-image kinds and undecodable payloads take
    * the deterministic byte-histogram fallback (STUB for audio/video —
    * no codecs in this container). Checksum is always over the raw bytes,
    * so it is decode-independent and stable across codec versions. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition scope: decoder context init amortized across the
      // batch. No ImageIO disk cache — executors shouldn't touch /tmp
      // for per-row decodes.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val payload = if (m.payload == null) Array.empty[Byte] else m.payload
        var checksum = 0L
        var i = 0
        while (i < payload.length) {
          checksum = (checksum * 131 + (payload(i) & 0xff)) % 2147483647L
          i += 1
        }
        val img =
          if (m.kind == "image" && payload.nonEmpty)
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
            catch { case _: java.io.IOException => None }
          else None
        val hist = new Array[Float](dim)
        img match {
          case Some(bi) =>
            val (w, h) = (bi.getWidth, bi.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = bi.getRGB(x, y)
                // integer Rec.601 luma; bins cover [0, 256)
                val luma = (((rgb >> 16 & 0xff) * 299 +
                  (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000)
                hist(luma * dim / 256) += 1f
                x += 1
              }
              y += 1
            }
            val n = (w * h).toFloat
            var j = 0
            while (j < dim) { hist(j) /= n; j += 1 }
            MediaFeatures(m.media_id, m.kind, payload.length.toLong,
              checksum, w, h, hist)
          case None =>
            i = 0
            while (i < payload.length) {
              hist((payload(i) & 0xff) % dim) += 1f
              i += 1
            }
            if (payload.nonEmpty) {
              var j = 0
              while (j < dim) { hist(j) /= payload.length; j += 1 }
            }
            MediaFeatures(m.media_id, m.kind, payload.length.toLong,
              checksum, 0, 0, hist)
        }
      }
    }
  }

  /** Aspect-preserving resize metadata (no pixel work — pure arithmetic,
    * codegen'd): longest side clamped to `maxSide`. */
  def withResizedDims(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    df.withColumn("out_width",
        greatest(lit(1), floor(col("width") * scale)).cast("int"))
      .withColumn("out_height",
        greatest(lit(1), floor(col("height") * scale)).cast("int"))
  }

  /** Evenly-spaced frame-sample offsets (ms) for video rows: `n` offsets
    * in [0, duration_ms), built with `sequence` — stays in codegen, and
    * explodes downstream without touching the binary payload. */
  def withFrameOffsets(df: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"frame count must be positive, got $n")
    df.withColumn("frame_offsets_ms",
      when(col("duration_ms") > 0,
        transform(sequence(lit(0), lit(n - 1)),
          i => floor((i * col("duration_ms")) / n).cast("long")))
        .otherwise(array().cast("array<long>")))
  }
}
