package graft.operators

import graft.SparkSpec
import graft.operators.MultimodalOps._

class MultimodalSpec extends SparkSpec {

  private def mediaDS(rows: Seq[MediaRow]) = {
    val sess = spark
    import sess.implicits._
    sess.createDataset(rows)
  }

  test("decodeFeatures really decodes a PNG payload (width/height/luminance)") {
    val bi = new java.awt.image.BufferedImage(
      6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6)
      bi.setRGB(x, y, if (x < 3) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val rows = mediaDS(Seq(MediaRow(9L, "image", bos.toByteArray, 0, 0, 0, 0L)))
    val f = decodeFeatures(rows, dim = 16).collect().head
    assert(f.decoded_width === 6 && f.decoded_height === 4,
      "dimensions must come from the decoded pixels, not metadata")
    assert(math.abs(f.features(0) - 0.5f) < 1e-6, "half the pixels are black")
    assert(math.abs(f.features(15) - 0.5f) < 1e-6, "half the pixels are white")
    assert(f.features.slice(1, 15).forall(_ === 0f))
  }

  test("decodeFeatures: deterministic histogram features + checksum") {
    val payload = Array.tabulate(64)(i => i.toByte) // bytes 0..63
    val rows = mediaDS(Seq(
      MediaRow(1L, "image", payload, 8, 8, 0, 0L),
      MediaRow(2L, "audio", Array.emptyByteArray, 0, 0, 16000, 1000L)))
    val out = decodeFeatures(rows, dim = 16).collect()
      .map(f => f.media_id -> f).toMap
    val img = out(1L)
    assert(img.n_bytes === 64L)
    assert(img.decoded_width === 0,
      "non-image bytes under an image kind take the fallback path")
    // bytes 0..63 over 16 bins → every bin gets exactly 4/64
    assert(img.features.forall(f => math.abs(f - 4f / 64f) < 1e-6))
    val img2 = decodeFeatures(rows, dim = 16).collect()
      .find(_.media_id == 1L).get
    assert(img.checksum === img2.checksum, "decode must be deterministic")
    val audio = out(2L)
    assert(audio.n_bytes === 0L)
    assert(audio.features.forall(_ === 0f))
  }

  test("withResizedDims clamps the longest side, preserving aspect") {
    val sess = spark
    import sess.implicits._
    val df = Seq((4000, 2000), (800, 600), (100, 300))
      .toDF("width", "height")
    val out = withResizedDims(df, 1000)
      .select("width", "height", "out_width", "out_height")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.contains((4000, 2000, 1000, 500)))
    assert(out.contains((800, 600, 800, 600)), "smaller media untouched")
    assert(out.contains((100, 300, 100, 300)))
  }

  test("withFrameOffsets yields n evenly spaced offsets in [0, duration)") {
    val sess = spark
    import sess.implicits._
    val df = Seq((1L, 1000L), (2L, 0L)).toDF("media_id", "duration_ms")
    val out = withFrameOffsets(df, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(out(1L) === Seq(0L, 250L, 500L, 750L))
    assert(out(2L) === Seq.empty)
    val odd = withFrameOffsets(df, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(odd(1L) === Seq(0L, 333L, 666L), "non-divisible durations floor to long ms")
  }

  test("round-trips through parquet with the declared media schema") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    val rows = Seq(MediaRow(7L, "video", Array[Byte](1, 2, 3), 640, 480, 0, 5000L))
    mediaDS(rows).toDF().write.mode("overwrite").parquet(dir)
    val back = spark.read.schema(mediaSchema).parquet(dir)
    assert(back.count() === 1L)
    val r = back.head()
    assert(r.getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 2, 3))
  }
}
