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

  test("decodeFeatures really decodes a WAV payload (rate/frames/duration/RMS)") {
    // 0.5 s of a 16 kHz mono square wave at amplitude 8192 (= 0.25 of
    // full scale): RMS is exactly 0.25 and energy is uniform in time
    val frames = 8000
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val s: Short = if (i % 2 == 0) 8192 else -8192
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rows = mediaDS(Seq(MediaRow(11L, "audio", bos.toByteArray, 0, 0, 0, 0L)))
    val f = decodeFeatures(rows, dim = 16).collect().head
    assert(f.decoded_sample_rate === 16000,
      "sample rate must come from the decoded header, not metadata")
    assert(f.decoded_frames === 8000L)
    assert(f.decoded_duration_ms === 500L)
    assert(math.abs(f.rms - 0.25f) < 1e-4)
    assert(f.features.forall(e => math.abs(e - 1f / 16) < 1e-3),
      "constant-amplitude signal must have uniform per-segment energy")
    // garbage bytes under an audio kind take the byte-histogram fallback
    val bad = mediaDS(Seq(
      MediaRow(12L, "audio", Array[Byte](1, 2, 3, 4), 0, 0, 0, 0L)))
    val g = decodeFeatures(bad, dim = 16).collect().head
    assert(g.decoded_sample_rate === 0 && g.rms === 0f)
    assert(g.features.sum > 0f, "fallback histogram still populated")
  }

  test("q147: wavBytes is a real container and audioEnvelopeFp matches hand-computed bits") {
    import graft.operators.MultimodalOps.{audioEnvelopeFp, wavBytes}
    // 32 samples = one sample per 32-bit-envelope window: 0..15 loud
    // (amplitude 100), 16..31 quiet (1); E_tot = 1616,
    // 32·100 > 1616 > 32·1 → exactly bits 0..15 set → fp = 0xffff
    val loudQuiet = new Array[Byte](32)
    for (i <- 0 until 32) {
      val amp = if (i < 16) 100 else 1
      loudQuiet(i) = (128 + amp).toByte
    }
    assert(audioEnvelopeFp(wavBytes(loudQuiet)) === Some(0xffffL))
    // the JDK audio stack really parses the container (header fields
    // round-trip), and silence/constant amplitude fingerprints to 0
    // (no window STRICTLY above the mean)
    val wav = wavBytes(Array.fill[Byte](64)((128 + 5).toByte))
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    try {
      assert(in.getFormat.getSampleRate === 8000f)
      assert(in.getFormat.getSampleSizeInBits === 8)
      assert(in.getFrameLength === 64L)
    } finally in.close()
    assert(audioEnvelopeFp(wav) === Some(0L))
    assert(audioEnvelopeFp(wavBytes(Array.emptyByteArray)) === Some(0L))
    // non-audio bytes must answer None, not a fabricated fingerprint
    assert(audioEnvelopeFp("not audio at all".getBytes("UTF-8")) === None)
  }

  test("q147: 2x16-bit banding is LOSSLESS at hamming <= 1 " +
      "(output equals the brute-force all-pairs recompute)") {
    // the banding invariant, re-pinned across both re-cuts (r12:
    // 4x4 -> 2x8; r17: 16-bit fp widened to 32, bands 2x16): radius 1
    // flips at most ONE band, so every true pair still shares the
    // other band exactly — the brute force is the contract. Runs at
    // sf0.1, the smallest scale where the 32-bit contract has pairs
    // (the sharper fp removed the 16-bit birthday collisions the old
    // sf0.001 run leaned on; the pin law below freezes those zeros).
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.1"
    val got = graft.SparkEntry.queries("q147_audio_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps = graft.operators.MultimodalQueries.audioFpRows(
        graft.Tables.tWide(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 1
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
    assert(brute.size === 14,
      "sf0.1 must carry the 14 measured 32-bit near-dup pairs")
    assert(got === brute, "banding must be lossless at radius 1")
    spark.catalog.clearCache()
  }

  test("q147: constructed hamming-0/1/2 envelope neighbors pair and drop exactly") {
    // 32-char texts = one sample per envelope window; ' ' decodes to
    // amplitude 96 (loud), '~' to 2 (quiet), so txt(k) fingerprints to
    // exactly bits 0..k-1 set (32·96 > E_tot > 32·2 for every mix
    // here) — adjacent k differ by ONE bit, k±2 by two. Deterministic
    // pair/drop structure across BOTH bands, with no reliance on
    // fixture content: (1,2) identical → ham 0; k=15/16/17 chains at
    // ham 1 (bit 15 = band 0's top bit, bit 16 = band 1's bottom —
    // the band boundary is exercised on both sides); ham-2 combos
    // (15↔17, 16↔18) must NOT appear.
    val sess = spark
    import sess.implicits._
    def txt(nLoud: Int) = " " * nLoud + "~" * (32 - nLoud)
    import graft.operators.MultimodalOps.{audioEnvelopeFp, wavBytes}
    assert(audioEnvelopeFp(wavBytes(txt(16).getBytes("UTF-8"))) ===
      Some(0xffffL), "hand-check: 16 loud windows = bits 0..15")
    val docs = Seq(1L -> txt(16), 2L -> txt(16), 3L -> txt(17),
      4L -> txt(18), 5L -> txt(15)).toDF("doc_id", "text")
    val got = graft.operators.MultimodalQueries.audioDedupPairs(
        graft.operators.MultimodalQueries.audioFpRows(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L), (1L, 5L, 1L), (2L, 5L, 1L)))
    spark.catalog.clearCache()
  }

  test("q147: band form is 2x16-bit and the upper band discriminates on fixture content") {
    // VERDICT r17 item 7: the widened 32-bit envelope's band shape,
    // pinned mechanically. A regression to the 16-bit floor would
    // leave bits 16..31 empty on every doc — the upper band collapses
    // to ONE all-zero bucket and candidates go ~n²/256 again. Two
    // tripwires: (1) the plan's band explode emits exactly bands
    // {0,1} with 16-bit masks; (2) on sf0.1 content the upper band is
    // populated AND discriminates (multiple distinct keys).
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.1"
    val p = graft.SparkEntry.queries("q147_audio_dedup")(spark, dir)
      .queryExecution.analyzed.toString
    assert(p.contains("sequence(0, 1"),
      s"band explode must emit exactly 2 bands:\n${p.take(4000)}")
    // the mask renders as `& cast(65535 as bigint)` in the analyzed plan
    assert(p.contains("65535"),
      s"band keys must be 16-bit:\n${p.take(4000)}")
    val upper = graft.operators.MultimodalQueries.audioFpRows(
        graft.Tables.tWide(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(1) >> 16) & 0xffffL)
    assert(upper.exists(_ != 0L),
      "upper band empty on fixture content => envelope regressed to 16 bits")
    assert(upper.distinct.length > 2,
      "upper band must discriminate (multiple distinct keys)")
    spark.catalog.clearCache()
  }

  test("q147: fixture pair counts per scale are pinned — the 32-bit zeros are intentional") {
    // the q210 discipline: the cross-engine gate can't catch a shared
    // hollow contract, so the counts are frozen independently
    // (measured DuckDB 2026-08-15 at the r17 widening): 0 / 0 pairs at
    // sf0.001 / sf0.01 — the 16-bit fp's small-scale pairs were
    // birthday collisions of UNRELATED docs (2^16 codes, 500 docs),
    // which the 32-bit fp correctly removes; content starts at sf0.1
    // (14 pairs, pinned in the lossless law above) and grows with the
    // fixtures' replica families (672 at sf1, asserted at close).
    for ((dir, want) <- Seq("/root/testdata/sf0.001" -> 0L,
        "/root/testdata/sf0.01" -> 0L)) {
      val got = graft.SparkEntry.queries("q147_audio_dedup")(spark, dir).count()
      assert(got === want, s"q147 at $dir: expected $want pairs")
    }
    spark.catalog.clearCache()
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

  test("decodeFeatures composites delta GIF frames onto the logical screen") {
    // Animated GIF, logical screen 4×2: frame 1 is a full gray frame
    // (luma 128), frame 2 a 2×1 WHITE delta patch. Composited, frame 2's
    // screen is 6 gray + 2 white pixels → mean (6·128 + 2·255)/8/255;
    // the pre-compositing bug measured the patch alone → mean 1.0. The
    // assertion distinguishes the two regardless of where the writer
    // places the patch (the mean only depends on the patch SIZE).
    import javax.imageio.{ImageIO, IIOImage, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    def rgbImage(w: Int, h: Int, rgb: Int) = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgb)
      bi
    }
    val frames = Seq(rgbImage(4, 2, 0x808080), rgbImage(2, 1, 0xffffff))
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      val p = writer.getDefaultWriteParam
      val md = writer.getDefaultImageMetadata(new ImageTypeSpecifier(img), p)
      val fmt = md.getNativeMetadataFormatName
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "doNotDispose")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10") // hundredths of a second
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      md.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, md), p)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    val rows = mediaDS(Seq(MediaRow(21L, "video", bos.toByteArray, 0, 0, 0, 0L)))
    val f = decodeFeatures(rows, dim = 2).collect().head
    assert(f.decoded_frames === 2L)
    assert(f.decoded_width === 4 && f.decoded_height === 2,
      "dimensions must be the logical screen, not the delta frame")
    assert(f.decoded_duration_ms === 200L, "2 frames × delayTime 10 cs")
    val m1 = 128.0 / 255.0
    val m2 = (6 * 128 + 2 * 255).toDouble / 8 / 255
    assert(math.abs(f.features(0) - m1 / (m1 + m2)) < 1e-3,
      s"frame 2 must be measured composited, got ${f.features.toSeq}")
    assert(math.abs(f.features(1) - m2 / (m1 + m2)) < 1e-3)
  }

  test("MJPEG-in-AVI decodes through the default codec chain: frames, dims, timing") {
    // build a real MJPEG AVI: RIFF('AVI ' LIST('hdrl' avih)
    // LIST('movi' 00dc...)) with each frame an ImageIO-encoded JPEG.
    // 6 frames fade 0 → 250 gray at 25 fps (40_000 µs/frame); the time
    // profile must RISE — a byte-histogram stub has no such structure.
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val size = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(body.length).array()
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ size ++ body ++ pad
    }
    val (w, h, n, usPerFrame) = (16, 8, 6, 40000)
    val jpegs = (0 until n).map { i =>
      val gray = i * 50
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, gray << 16 | gray << 8 | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "jpg", bos)
      bos.toByteArray
    }
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0, usPerFrame).putInt(16, n).putInt(32, w).putInt(36, h)
      .array()
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ chunk("avih", avih))
    val movi = chunk("LIST",
      "movi".getBytes("US-ASCII") ++ jpegs.flatMap(j => chunk("00dc", j)))
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = chunk("RIFF", riffBody)
    val rows = mediaDS(Seq(MediaRow(25L, "video", avi, 0, 0, 0, 0L)))
    val f = decodeFeatures(rows, dim = 3).collect().head
    assert(f.decoded_frames === n.toLong,
      s"every MJPEG frame must really decode, got $f")
    assert(f.decoded_width === w && f.decoded_height === h)
    assert(f.decoded_duration_ms === n.toLong * usPerFrame / 1000)
    // fade-in: 3 segments of 2 frames each, strictly rising energy
    assert(f.features(0) < f.features(1) && f.features(1) < f.features(2),
      s"time profile must rise for a fade-in, got ${f.features.toSeq}")
    assert(math.abs(f.features.sum - 1f) < 1e-5f, "profile is normalized")
    // a truncated AVI (headers only, no frames) must fall back, not fail
    val empty = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl)
    val g = decodeFeatures(
      mediaDS(Seq(MediaRow(26L, "video", empty, 0, 0, 0, 0L))), dim = 3)
      .collect().head
    assert(g.decoded_frames === 0L, "frameless AVI takes the fallback")
  }

  test("AVI walk survives adversarially deep LIST nesting (no stack overflow)") {
    // 50k nested LISTs (~12 bytes each) with one real JPEG frame at the
    // bottom: a recursive RIFF walk overflows the JVM stack here — and
    // StackOverflowError is NOT NonFatal, so it would escape the decode's
    // catch and fail the task. The iterative walk must both survive and
    // still find the frame in order. Headers are written forward with
    // precomputed sizes (building by repeated array concat would be
    // O(levels²)).
    val bi = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", jbos)
    val jpeg = jbos.toByteArray
    val padded = jpeg.length + (jpeg.length & 1)
    val inner = 8 + padded // the 00dc chunk
    val L = 50000
    val bos = new java.io.ByteArrayOutputStream()
    def u32le(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    // RIFF body = "AVI " + chain; chunkTotal(i) = 12*(L-i) + inner
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(u32le(4 + 12 * L + inner))
    bos.write("AVI ".getBytes("US-ASCII"))
    for (i <- 0 until L) {
      bos.write("LIST".getBytes("US-ASCII"))
      bos.write(u32le(12 * (L - i) + inner - 8)) // list body incl. type
      bos.write("lst ".getBytes("US-ASCII"))
    }
    bos.write("00dc".getBytes("US-ASCII"))
    bos.write(u32le(jpeg.length))
    bos.write(jpeg)
    if ((jpeg.length & 1) == 1) bos.write(0)
    val rows = mediaDS(Seq(MediaRow(27L, "video", bos.toByteArray, 0, 0, 0, 0L)))
    val f = decodeFeatures(rows, dim = 2).collect().head
    assert(f.decoded_frames === 1L,
      s"the frame under 50k nested LISTs must still decode, got $f")
    assert(f.decoded_width === 4 && f.decoded_height === 4)
  }

  test("MP4 metadata parses through the default chain: duration, dims, no fake frames") {
    // minimal conforming BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0) +
    // trak(tkhd v0 audio 0x0)) — duration 1200 at timescale 600 = 2 s,
    // video track 320x240 as 16.16 fixed point
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
      "isomiso2".getBytes("US-ASCII"))
    val mvhd = {
      val b = new Array[Byte](100) // v0 mvhd body is 100 bytes
      System.arraycopy(be32(600L), 0, b, 12, 4)  // timescale
      System.arraycopy(be32(1200L), 0, b, 16, 4) // duration
      box("mvhd", b)
    }
    def tkhd(w: Int, h: Int) = {
      val b = new Array[Byte](84) // v0 tkhd body is 84 bytes
      System.arraycopy(be32(w.toLong << 16), 0, b, 76, 4)
      System.arraycopy(be32(h.toLong << 16), 0, b, 80, 4)
      box("tkhd", b)
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd(320, 240)) ++
      box("trak", tkhd(0, 0)))
    val mp4 = ftyp ++ moov
    val rows = mediaDS(Seq(
      MediaRow(28L, "video", mp4, 0, 0, 0, 0L),
      // 'ftyp' present but no valid moov/mvhd → must NOT claim; the
      // byte-histogram fallback stays reachable for text-like bytes
      MediaRow(29L, "video",
        (be32(16L) ++ "ftypjunkjunkjunk".getBytes("US-ASCII")), 0, 0, 0, 0L)))
    val out = decodeFeatures(rows, dim = 4).collect()
      .map(f => f.media_id -> f).toMap
    val v = out(28L)
    assert(v.decoded_duration_ms === 2000L,
      s"duration must come from mvhd timescale+duration, got $v")
    assert(v.decoded_width === 320 && v.decoded_height === 240,
      "dims must be the video track's tkhd 16.16 values (audio 0x0 ignored)")
    assert(v.decoded_frames === 0L,
      "no codec = no decoded frames; metadata only, never fabricated")
    assert(v.features.forall(_ === 0f), "no pixels → zero luminance profile")
    val g = out(29L)
    assert(g.decoded_duration_ms === 0L && g.features.sum > 0f,
      "brand-only payloads keep the histogram fallback")
  }

  test("MP4 parse handles version-1 headers and 64-bit largesize boxes") {
    // v1 mvhd (u64 times: timescale at +20, u64 duration at +24), v1
    // tkhd (dims at +88/+92), and the moov wrapped in a size==1 box
    // whose real length rides the 8-byte largesize field
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    def largeBox(typ: String, body: Array[Byte]): Array[Byte] =
      be32(1L) ++ typ.getBytes("US-ASCII") ++ be64(body.length + 16L) ++ body
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mvhd1 = {
      val b = new Array[Byte](112) // v1 mvhd body
      b(0) = 1
      System.arraycopy(be32(1000L), 0, b, 20, 4) // timescale
      System.arraycopy(be64(90000L), 0, b, 24, 8) // duration -> 90 s
      box("mvhd", b)
    }
    val tkhd1 = {
      val b = new Array[Byte](96) // v1 tkhd body
      b(0) = 1
      System.arraycopy(be32(1920L << 16), 0, b, 88, 4)
      System.arraycopy(be32(1080L << 16), 0, b, 92, 4)
      box("tkhd", b)
    }
    val mp4 = ftyp ++ largeBox("moov", mvhd1 ++ box("trak", tkhd1))
    val f = decodeFeatures(mediaDS(Seq(
      MediaRow(30L, "video", mp4, 0, 0, 0, 0L))), dim = 2).collect().head
    assert(f.decoded_duration_ms === 90000L,
      s"v1 mvhd u64 duration must parse, got $f")
    assert(f.decoded_width === 1920 && f.decoded_height === 1080,
      "v1 tkhd dims sit 12 bytes deeper than v0")
  }

  // minimal EBML builders shared by the WebM tests: 1-byte sizes only
  // (bodies here are tiny), stored-form element ids big-endian
  private def ebmlElem(id: Long, body: Array[Byte]): Array[Byte] = {
    require(body.length <= 126, "test builder uses 1-byte sizes")
    val idW = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    val idB = (0 until idW).map(i => ((id >> (8 * (idW - 1 - i))) & 0xff).toByte)
    (idB :+ (0x80 | body.length).toByte).toArray ++ body
  }
  private def ebmlUint(id: Long, v: Long): Array[Byte] =
    ebmlElem(id, Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte))
  private def webmFixture: Array[Byte] = {
    def f32(v: Float): Array[Byte] = {
      val bits = java.lang.Float.floatToIntBits(v)
      Array((bits >> 24).toByte, (bits >> 16).toByte,
        (bits >> 8).toByte, bits.toByte)
    }
    val header = ebmlElem(0x1A45DFA3L,
      ebmlElem(0x4282L, "webm".getBytes("US-ASCII"))) // DocType
    val info = ebmlElem(0x1549A966L,
      ebmlUint(0x2AD7B1L, 1000000) ++              // TimestampScale (ns)
        ebmlElem(0x4489L, f32(2000f)))             // Duration: 2000 ticks
    val video = ebmlElem(0xE0L,
      ebmlUint(0xB0L, 640) ++ ebmlUint(0xBAL, 360)) // PixelWidth/Height
    val tracks = ebmlElem(0x1654AE6BL, ebmlElem(0xAEL, video))
    header ++ ebmlElem(0x18538067L, info ++ tracks) // Segment
  }

  test("WebM metadata parses through the default chain: duration, dims, no fake frames") {
    val rows = mediaDS(Seq(
      MediaRow(33L, "video", webmFixture, 0, 0, 0, 0L),
      // EBML magic but no DocType → must NOT claim; histogram fallback
      MediaRow(34L, "video",
        Array[Byte](0x1A, 0x45.toByte, 0xDF.toByte, 0xA3.toByte) ++
          "plausible garbage after the magic".getBytes("US-ASCII"),
        0, 0, 0, 0L)))
    val out = decodeFeatures(rows, dim = 4).collect()
      .map(f => f.media_id -> f).toMap
    val v = out(33L)
    assert(v.decoded_duration_ms === 2000L,
      s"2000 ticks at the default 1ms scale must be 2000 ms, got $v")
    assert(v.decoded_width === 640 && v.decoded_height === 360,
      "dims must come from Tracks→TrackEntry→Video PixelWidth/Height")
    assert(v.decoded_frames === 0L && v.features.forall(_ === 0f),
      "no codec = metadata only, never fabricated frames")
    val g = out(34L)
    assert(g.decoded_duration_ms === 0L && g.features.sum > 0f,
      "magic-only payloads keep the histogram fallback")
  }

  test("WebM parse survives unknown-size Segment and truncation") {
    // live-muxed files write the Segment with the reserved all-ones
    // size VINT (0xFF, 1-byte): it must extend to the payload end
    val header = ebmlElem(0x1A45DFA3L,
      ebmlElem(0x4282L, "matroska".getBytes("US-ASCII")))
    val info = ebmlElem(0x1549A966L,
      ebmlElem(0x4489L, { // Duration 1500 ticks as f32, default scale
        val bits = java.lang.Float.floatToIntBits(1500f)
        Array((bits >> 24).toByte, (bits >> 16).toByte,
          (bits >> 8).toByte, bits.toByte)
      }))
    val segId = Array(0x18, 0x53, 0x80.toByte, 0x67).map(_.toByte)
    val streamed = header ++ segId ++ Array(0xFF.toByte) ++ info
    val f = decodeFeatures(mediaDS(Seq(
      MediaRow(35L, "video", streamed, 0, 0, 0, 0L))), dim = 2)
      .collect().head
    assert(f.decoded_duration_ms === 1500L,
      s"unknown-size Segment must extend to payload end, got $f")
    // truncation mid-Tracks: Info already parsed must survive (the
    // tkhd lesson — adversarial tails must not void earlier metadata)
    val whole = webmFixture
    val cut = whole.take(whole.length - 6)
    val t = decodeFeatures(mediaDS(Seq(
      MediaRow(36L, "video", cut, 0, 0, 0, 0L))), dim = 2).collect().head
    assert(t.decoded_duration_ms === 2000L,
      s"duration parsed before the truncation point must survive, got $t")
  }

  test("zero-length trailing tkhd keeps already-parsed mvhd metadata") {
    // a tkhd whose (lying/truncated) size leaves NO body bytes, placed
    // at the very end of the payload: the version-byte read must be
    // guarded — an ArrayIndexOutOfBounds there lands in the NonFatal
    // catch and discards the mvhd already parsed, silently dropping the
    // whole file to the byte-histogram fallback
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mvhd = {
      val b = new Array[Byte](100)
      System.arraycopy(be32(600L), 0, b, 12, 4)  // timescale
      System.arraycopy(be32(1200L), 0, b, 16, 4) // duration → 2 s
      box("mvhd", b)
    }
    // header-only tkhd: size 8 ⇒ body == boxEnd == end of payload
    val emptyTkhd = be32(8L) ++ "tkhd".getBytes("US-ASCII")
    val mp4 = ftyp ++ box("moov", mvhd ++ box("trak", emptyTkhd))
    val f = decodeFeatures(mediaDS(Seq(
      MediaRow(32L, "video", mp4, 0, 0, 0, 0L))), dim = 2).collect().head
    assert(f.decoded_duration_ms === 2000L,
      s"mvhd must survive a zero-length trailing tkhd, got $f")
    assert(f.decoded_width === 0 && f.decoded_height === 0,
      "the empty tkhd contributes no dims")
  }

  test("a plugged VideoDecoder handles MP4 end-to-end; others unaffected") {
    // the codec-pluggable seam: a decoder registered for a format the
    // JDK can't read (MP4, by its real `ftyp` brand at offset 4) flows
    // through the SAME decodeFeatures pipeline — schema, mapPartitions
    // batch shape, and the segment fold are codec-agnostic — while
    // non-claimed payloads keep their existing behavior in the same run
    object FakeMp4Decoder extends VideoDecoder {
      def decode(p: Array[Byte]): Option[VideoFrames] =
        if (p.length >= 8 && p(4) == 'f' && p(5) == 't' &&
            p(6) == 'y' && p(7) == 'p')
          Some(VideoFrames(320, 240, 2000L, Array(0.2, 0.4, 0.6, 0.8)))
        else None
    }
    val mp4 = Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII")
    val garbage = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val rows = mediaDS(Seq(
      MediaRow(31L, "video", mp4, 0, 0, 0, 0L),
      MediaRow(32L, "video", garbage, 0, 0, 0, 0L)))
    val out = decodeFeatures(rows, dim = 2,
        videoDecoders = Seq(FakeMp4Decoder) ++ defaultVideoDecoders)
      .collect().map(f => f.media_id -> f).toMap
    val v = out(31L)
    assert(v.decoded_frames === 4L && v.decoded_duration_ms === 2000L)
    assert(v.decoded_width === 320 && v.decoded_height === 240)
    // frames (0.2,0.4 | 0.6,0.8) → segments (0.6, 1.4) / 2.0
    assert(math.abs(v.features(0) - 0.3f) < 1e-6)
    assert(math.abs(v.features(1) - 0.7f) < 1e-6)
    val g = out(32L)
    assert(g.decoded_frames === 0L,
      "unclaimed payloads must still take the byte-histogram fallback")
    assert(g.features.sum > 0f)
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

  test("dHash: perceptual near-dups cluster, unrelated images don't") {
    // NB a smooth gradient or a fine checkerboard is DEGENERATE for
    // dHash (every cell mean equal or monotone → hash ≈ 0); the
    // discriminative fixture is a seeded random 9×8 block image where
    // all 64 adjacent-cell comparisons carry signal
    def cellImage(w: Int, h: Int, seed: Int, noiseSeed: Int): Array[Byte] = {
      val lv = {
        val r = new scala.util.Random(seed)
        Array.fill(8, 9)(r.nextInt(256))
      }
      val rn = new scala.util.Random(noiseSeed)
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val base = lv(y * 8 / h)(x * 9 / w)
        val v = if (noiseSeed == 0) base
        else math.min(255, math.max(0, base + rn.nextInt(11) - 5))
        bi.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", bos)
      bos.toByteArray
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

    val base = MultimodalOps.dHash(cellImage(64, 48, 1, 0)).get
    val noisy = MultimodalOps.dHash(cellImage(64, 48, 1, 7)).get
    val resized = MultimodalOps.dHash(cellImage(96, 72, 1, 0)).get
    val other = MultimodalOps.dHash(cellImage(64, 48, 2, 0)).get
    assert(hamming(base, noisy) <= 6,
      s"mild noise must stay within a few bits, got ${hamming(base, noisy)}")
    assert(hamming(base, resized) <= 6,
      s"resize must stay within a few bits, got ${hamming(base, resized)}")
    assert(hamming(base, other) >= 16,
      s"unrelated structure must be far, got ${hamming(base, other)}")
    // not an image → None, never a bogus hash
    assert(MultimodalOps.dHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("q169: AVI frame hashes round-trip the container and order frames") {
    // two distinct 9×8 PNG frames with known-different content
    def frame(seed: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val v = (x * seed * 29 + y * 7) % 256
        bi.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", bos)
      bos.toByteArray
    }
    val f1 = frame(1); val f2 = frame(5)
    val avi = MultimodalOps.aviBytes(Seq(f1, f2), 9, 8)
    // the container round-trips each frame's bytes verbatim, so the
    // per-frame hashes equal direct dHash of the encoded frames, in order
    val hs = MultimodalOps.aviFrameDHashes(avi).get
    assert(hs === Seq(MultimodalOps.dHash(f1).get, MultimodalOps.dHash(f2).get))
    assert(hs.head != hs(1), "distinct frames must hash differently")
    // the REAL decoder also accepts the synthesized container
    val vf = MultimodalOps.aviMjpegDecoder.decode(avi).get
    assert(vf.frameMeanLuminance.length === 2 && vf.width === 9)
    // garbage and frameless containers → None, never a bogus sequence
    assert(MultimodalOps.aviFrameDHashes("nope".getBytes).isEmpty)
  }

  test("q169: identical texts collide at total hamming 0, shifted frames differ") {
    val sess = spark
    import sess.implicits._
    val text = (0 until 80).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq((1L, text), (2L, text), (3L, text.reverse))
      .toDF("doc_id", "text")
    val hs = MultimodalQueries.videoFrameHashes(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hs(1L) === hs(2L), "identical texts must fingerprint identically")
    assert(hs(1L) !== hs(3L), "different content must fingerprint apart")
    // frames within one video differ (the +f·7 shift is real)
    assert(hs(1L).distinct.length > 1,
      s"shifted frames must not collapse to one hash: ${hs(1L)}")
  }
}
