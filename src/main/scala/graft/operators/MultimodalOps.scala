package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode step is a clearly-marked STUB — this container has no
  * codec libraries, so `decodeFeatures` derives deterministic fake
  * features (byte histogram) instead of running a real decoder. Everything
  * around it — schema, Dataset typing, per-partition batch shape,
  * partitioning — is real and is what a production decoder would plug
  * into: swap the histogram loop for JNI/codec calls and nothing else
  * changes. `mapPartitions` is the Scala analog of arrow-batched
  * `mapInPandas`: user code sees an iterator per partition, so per-batch
  * decoder init is amortized. */
object MultimodalOps {

  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      features: Array[Float])

  /** Storage schema for a media table: opaque binary + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** STUB decode + feature extraction. Deterministic fake: `dim`-bin byte
    * histogram normalized by payload length, plus byte checksum. A real
    * implementation replaces the while-loop with a codec call; the
    * Dataset-in/Dataset-out contract and batching are unchanged. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition scope = where a real decoder would init its context
      rows.map { m =>
        val payload = if (m.payload == null) Array.empty[Byte] else m.payload
        val hist = new Array[Float](dim)
        var checksum = 0L
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xff
          hist(b % dim) += 1f
          checksum = (checksum * 131 + b) % 2147483647L
          i += 1
        }
        if (payload.nonEmpty) {
          var j = 0
          while (j < dim) { hist(j) /= payload.length; j += 1 }
        }
        MediaFeatures(m.media_id, m.kind, payload.length.toLong, checksum, hist)
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
