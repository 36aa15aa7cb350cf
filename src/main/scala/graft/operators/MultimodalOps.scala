package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode step is REAL for payloads the JDK can read:
  *  - images: PNG/BMP/GIF/JPEG via `javax.imageio` — decoded pixel
  *    dimensions + luminance histogram;
  *  - audio: WAV/AIFF/AU via `javax.sound.sampled` — decoded sample
  *    rate, frame count, duration, overall RMS, and a time-segment
  *    energy profile;
  *  - video: multi-frame containers the JDK's ImageIO readers can
  *    iterate (animated GIF) — real frame count, logical-screen
  *    dimensions, duration from per-frame delay metadata, and a
  *    per-frame-luminance time profile measured over frames COMPOSITED
  *    onto the logical screen (delta-encoded sub-rectangle frames are
  *    placed at their ImageDescriptor offsets with disposal honored).
  * MP4/QuickTime payloads get a REAL metadata parse (ISO BMFF box walk:
  * duration, track dimensions, track count — [[decodeMp4Metadata]]);
  * their frame pixels stay out of reach (no H.264/VP9 codecs in a JDK),
  * so their luminance features are zero. Other codec-less formats and
  * undecodable payloads fall back to a clearly-marked deterministic
  * byte-histogram STUB. Everything around the decode — schema, Dataset typing,
  * per-partition batch shape, partitioning — is what any further codec
  * would plug into. `mapPartitions` is the Scala analog of arrow-batched
  * `mapInPandas`: user code sees an iterator per partition, so per-batch
  * decoder init is amortized. */
object MultimodalOps {

  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  /** `decoded_width`/`decoded_height` are the REAL dimensions read from
    * the pixel data (0 when the payload wasn't decodable as an image);
    * `decoded_sample_rate`/`decoded_frames`/`decoded_duration_ms`/`rms`
    * come from real PCM decode (0 when not decodable as audio). */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      decoded_width: Int, decoded_height: Int,
      decoded_sample_rate: Int, decoded_frames: Long,
      decoded_duration_ms: Long, rms: Float, features: Array[Float])

  /** Pluggable video codec seam. The container ships no MP4/WebM codecs,
    * so those formats fall back to the byte histogram — but the PIPELINE
    * must not care: a real codec plugs in as a `VideoDecoder` without
    * touching schema, partitioning, or the feature fold. A decoder
    * returns None when the bytes aren't its format (the next decoder is
    * tried; after the last, the deterministic byte-histogram fallback).
    * Implementations must be Serializable — they ship to executors. */
  trait VideoDecoder extends Serializable {
    def decode(payload: Array[Byte]): Option[VideoFrames]
  }

  /** Codec-independent decode result: dimensions, total duration, and
    * one mean luminance in [0,1] per frame — everything downstream
    * (segment fold, normalization, schema) is codec-agnostic. */
  case class VideoFrames(width: Int, height: Int, durationMs: Long,
      frameMeanLuminance: Array[Double])

  /** The built-in decoder: multi-frame containers the JDK's ImageIO can
    * iterate (animated GIF), frames composited onto the logical screen. */
  val imageIoVideoDecoder: VideoDecoder = new VideoDecoder {
    def decode(payload: Array[Byte]): Option[VideoFrames] =
      decodeVideoImageIo(payload)
  }

  /** Pure-JDK MJPEG-in-AVI codec: RIFF container walk + per-frame JPEG
    * decode through `javax.imageio` — a REAL multi-frame video path with
    * no native dependencies, proving the [[VideoDecoder]] seam carries an
    * actual codec (MP4/WebM stay on the byte-histogram fallback; their
    * codecs don't ship in a JDK). See [[decodeAviMjpeg]]. */
  val aviMjpegDecoder: VideoDecoder = new VideoDecoder {
    def decode(payload: Array[Byte]): Option[VideoFrames] =
      decodeAviMjpeg(payload)
  }

  /** MP4/QuickTime METADATA decoder, pure JDK: an ISO BMFF box walk
    * (ftyp brand sniff, moov/mvhd timescale+duration, trak/tkhd track
    * dimensions) — real duration, dimensions and track count with no
    * codec work. The JDK ships no H.264/VP9 codecs, so frame luminance
    * stays out of reach: `frameMeanLuminance` is EMPTY (features all
    * zero, decoded_frames 0), but the metadata a curation pipeline
    * filters on (resolution, duration) is REAL — most of what the
    * byte-histogram fallback was standing in for. A sample decoder
    * plugs in ahead of this one without touching it. See
    * [[decodeMp4Metadata]]. */
  val mp4MetadataDecoder: VideoDecoder = new VideoDecoder {
    def decode(payload: Array[Byte]): Option[VideoFrames] =
      decodeMp4Metadata(payload)
  }

  /** WebM/Matroska METADATA decoder, pure JDK: an EBML element walk
    * (EBML-header magic + DocType sniff, Segment→Info TimestampScale +
    * Duration, Tracks→TrackEntry→Video PixelWidth/Height) — the
    * Matroska sibling of [[mp4MetadataDecoder]], same contract: real
    * duration/dimensions, no frames (the JDK ships no VP8/VP9/AV1
    * codec), and a plugged full codec wins first. See
    * [[decodeWebmMetadata]]. */
  val webmMetadataDecoder: VideoDecoder = new VideoDecoder {
    def decode(payload: Array[Byte]): Option[VideoFrames] =
      decodeWebmMetadata(payload)
  }

  /** Probe order: the AVI sniff is a 12-byte magic check, so it goes
    * first; ImageIO's reader iteration handles GIF and friends; the
    * MP4/WebM metadata parses come last so any plugged full codec wins
    * first (their magic sniffs are disjoint, so their mutual order is
    * immaterial). */
  val defaultVideoDecoders: Seq[VideoDecoder] =
    Seq(aviMjpegDecoder, imageIoVideoDecoder, mp4MetadataDecoder,
      webmMetadataDecoder)

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
    * decoded width/height. Audio payloads are REALLY decoded with
    * `javax.sound.sampled` (WAV/AIFF/AU ship with the JDK): decoded
    * sample rate / frame count / duration, overall RMS of the PCM signal
    * in [-1, 1], and features = `dim` time-segment energies normalized by
    * total energy. Video kinds and undecodable payloads take the
    * deterministic byte-histogram fallback (STUB for video — no codecs
    * in this container). Checksum is always over the raw bytes, so it is
    * decode-independent and stable across codec versions. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 16,
      videoDecoders: Seq[VideoDecoder] = defaultVideoDecoders): Dataset[MediaFeatures] = {
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
        val base = MediaFeatures(m.media_id, m.kind, payload.length.toLong,
          checksum, 0, 0, 0, 0L, 0L, 0f, new Array[Float](dim))
        val decoded: Option[MediaFeatures] = m.kind match {
          case "image" if payload.nonEmpty => decodeImage(payload, dim, base)
          case "audio" if payload.nonEmpty => decodeAudio(payload, dim, base)
          case "video" if payload.nonEmpty =>
            // first decoder that claims the bytes wins; the fold from
            // per-frame luminances to `dim` time segments is shared
            videoDecoders.iterator
              .flatMap(_.decode(payload))
              .nextOption()
              .map(videoFeatures(_, dim, base))
          case _ => None
        }
        decoded.getOrElse {
          // deterministic byte-histogram fallback (STUB for codec-less
          // video formats and undecodable payloads)
          val hist = base.features
          i = 0
          while (i < payload.length) {
            hist((payload(i) & 0xff) % dim) += 1f
            i += 1
          }
          if (payload.nonEmpty) {
            var j = 0
            while (j < dim) { hist(j) /= payload.length; j += 1 }
          }
          base
        }
      }
    }
  }

  /** Real image decode: dimensions + luminance histogram. None when the
    * bytes aren't a readable image (caller falls back). */
  private def decodeImage(payload: Array[Byte], dim: Int,
      base: MediaFeatures): Option[MediaFeatures] = {
    val img =
      // NonFatal (see dHash): corrupt-but-claimed payloads throw
      // unchecked reader exceptions; contract is the histogram
      // fallback, never a task failure
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { bi =>
      val hist = new Array[Float](dim)
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
      base.copy(decoded_width = w, decoded_height = h, features = hist)
    }
  }

  /** 64-bit difference hash (dHash) — the standard perceptual
    * fingerprint for IMAGE near-dup detection in a training-data
    * pipeline: decode, block-average to a 9×8 grayscale grid with
    * integer arithmetic (deterministic across JVMs — no
    * getScaledInstance, whose filtering is implementation-defined),
    * set bit r·8+c iff cell (r,c) is brighter than its right
    * neighbor. Re-encodes, mild noise and mild resizes land within a
    * few hamming bits; unrelated images differ in ~32. Downstream
    * clustering reuses the library's LSH machinery (band the 64 bits
    * exactly like q44's signature bands, or feed hamming pairs into
    * [[GraphQueries.minLabel]] for cluster ids). None when the bytes
    * aren't a decodable image. */
  def dHash(payload: Array[Byte]): Option[Long] = {
    val img =
      // NonFatal, not just IOException: JDK readers throw unchecked
      // exceptions (AIOOBE from the GIF/LZW decoder, IAE from
      // malformed headers) on corrupt payloads whose magic bytes a
      // reader claimed — the contract is None, never a task failure
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.filter(bi => bi.getWidth > 0 && bi.getHeight > 0).map { bi =>
      val (w, h) = (bi.getWidth, bi.getHeight)
      // integer block-average 9×8 luma grid: cell (gx, gy) covers
      // pixels x ∈ [gx·w/9, max(gx·w/9 + 1, (gx+1)·w/9)) etc. — the
      // +1 floor on the span means every cell reads at least one
      // pixel for any w, h >= 1 (cells can overlap when w < 9 or
      // h < 8, never be empty)
      val grid = Array.ofDim[Long](8, 9)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val x0 = gx * w / 9; val x1 = math.max(x0 + 1, (gx + 1) * w / 9)
          val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
          var sum = 0L; var n = 0L
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) {
              val rgb = bi.getRGB(x, y)
              sum += ((rgb >> 16 & 0xff) * 299 +
                (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              n += 1; x += 1
            }
            y += 1
          }
          grid(gy)(gx) = sum / n // n >= 1 by the span guard above
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (grid(r)(c) > grid(r)(c + 1)) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      hash
    }
  }

  /** Minimal RIFF/WAVE container around raw 8-bit unsigned mono PCM
    * samples @8 kHz — the audio analog of q115's synthetic PNG encode:
    * a REAL container the JDK audio stack parses, whose sample bytes
    * are exactly the input bytes (so the ASCII-fixture oracle can
    * replay them via `ascii()`). */
  def wavBytes(samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000).putInt(8000) // sample rate, byte rate
      .putShort(1) // block align
      .putShort(8) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(samples)
    bb.array()
  }

  /** Minimal RIFF/AVI container around pre-encoded image frames — the
    * video analog of [[wavBytes]]: a REAL container [[decodeAviMjpeg]]
    * (and [[aviFrameDHashes]]) walks, with each frame's encoded bytes
    * stored verbatim in a '00db' chunk so the frame content is exactly
    * the input (the q115 replayability discipline lifted to video).
    * Layout: RIFF('AVI ' LIST('hdrl' avih) LIST('movi' 00db…)) —
    * the public AVIMAINHEADER offsets decodeAviMjpeg reads. */
  def aviBytes(frames: Seq[Array[Byte]], width: Int, height: Int,
      usPerFrame: Int = 40000): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(usPerFrame)          // dwMicroSecPerFrame at +0
      bb.position(32)
      bb.putInt(width).putInt(height) // dwWidth/dwHeight at +32/+36
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi",
      frames.flatMap(f => chunk("00db", f).toSeq).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** Per-frame dHash sequence of an AVI payload: the SAME iterative
    * RIFF walk contract as [[decodeAviMjpeg]] (fourcc + u32-LE size,
    * even padding, LIST descent, '##dc'/'##db' = frame data), each
    * frame's encoded bytes handed to the REAL ImageIO decode inside
    * [[dHash]]. None unless the RIFF/AVI magic matches; frames whose
    * bytes don't decode are SKIPPED (the decodeAviMjpeg contract) —
    * the q169 synth path asserts count, so a silent skip there fails
    * loudly. */
  def aviFrameDHashes(payload: Array[Byte]): Option[Seq[Long]] =
    try {
      val b = payload
      def fourcc(off: Int): String =
        new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      def u32(off: Int): Long =
        (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
        (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24
      if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return None
      val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      // iterative walk with an explicit stack — the decodeAviMjpeg
      // SOE rationale applies verbatim
      val stack = scala.collection.mutable.ArrayDeque[(Int, Int)]()
      var off = 12
      var end = b.length
      while (off + 8 <= end || stack.nonEmpty) {
        if (off + 8 > end) {
          val (o, e) = stack.removeLast(); off = o; end = e
        } else {
          val id = fourcc(off)
          val size = math.min(u32(off + 4), (end - off - 8).toLong).toInt
          val body = off + 8
          val next = body + size + (size & 1)
          if (id == "LIST" && size >= 4) {
            stack.append((next, end))
            off = body + 4; end = body + size
          } else {
            if (size > 0 && (id.endsWith("dc") || id.endsWith("db")))
              frames += ((body, size))
            off = next
          }
        }
      }
      if (frames.isEmpty) None
      else Some(frames.toSeq.flatMap { case (o, len) =>
        dHash(java.util.Arrays.copyOfRange(b, o, o + len))
      })
    } catch { case scala.util.control.NonFatal(_) => None }

  /** q147's acoustic fingerprint: REAL `javax.sound.sampled` container
    * decode, then a 32-bit energy-envelope hash — bit j set iff window
    * j's summed amplitude exceeds the track mean (32·E_j > E_total,
    * ALL-INTEGER math so the DuckDB twin replays it exactly; the same
    * loudness-profile banding an audio-dedup service uses, scale-free
    * in track length). 32 windows (VERDICT r16 item 2 — widened from
    * 16): the fp bands as 2×16 bits, so the banded candidate floor is
    * ~n²/65536 instead of ~n²/256 — the q169 class, pushing the
    * join-dominates crossover from ~sf10 out past any plausible
    * corpus while hamming ≤ 1 banding stays lossless (one flipped bit
    * still leaves a full 16-bit band intact). The stream is read in
    * its NATIVE format — the synth path feeds 8-bit unsigned mono PCM,
    * so decoded bytes == sample bytes and amplitude = |byte − 128|.
    * Empty tracks and silent tracks fingerprint to 0. None when the
    * bytes aren't a readable audio container (decode failures must be
    * loud in the synth path, never a silent wrong hash). */
  def audioEnvelopeFp(payload: Array[Byte]): Option[Long] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val bytes = in.readAllBytes()
        val n = bytes.length
        val ej = new Array[Long](32)
        var tot = 0L
        var i = 0
        while (i < n) {
          val a = math.abs((bytes(i) & 0xff) - 128).toLong
          ej(((i.toLong * 32L) / n).toInt) += a
          tot += a
          i += 1
        }
        var fp = 0L
        var j = 0
        while (j < 32) { if (32L * ej(j) > tot) fp |= 1L << j; j += 1 }
        Some(fp)
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Real audio decode via `javax.sound.sampled` (WAV/AIFF/AU are
    * JDK-native): everything is converted to 16-bit signed PCM first, so
    * 8-bit/unsigned/big-endian sources all land on one sample path.
    * Features are `dim` time-segment mean-square energies normalized by
    * total energy (silent audio → all zeros). None when the bytes aren't
    * a readable audio container (caller falls back). */
  private def decodeAudio(payload: Array[Byte], dim: Int,
      base: MediaFeatures): Option[MediaFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels,
          f.getChannels * 2, f.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem
          .getAudioInputStream(target, in)
        try {
          val bytes = pcm.readAllBytes()
          val channels = target.getChannels
          val frames = bytes.length / target.getFrameSize
          val rate = target.getSampleRate.toDouble
          val segEnergy = new Array[Double](dim)
          var sumSq = 0.0
          var fi = 0
          while (fi < frames) {
            // average channels into one mono sample per frame
            var ch = 0
            var acc = 0.0
            while (ch < channels) {
              val off = fi * target.getFrameSize + ch * 2
              val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
              acc += s / 32768.0
              ch += 1
            }
            val mono = acc / channels
            val sq = mono * mono
            sumSq += sq
            segEnergy(((fi.toLong * dim) / math.max(frames, 1)).toInt) += sq
            fi += 1
          }
          val feats = new Array[Float](dim)
          if (sumSq > 0) {
            var j = 0
            while (j < dim) {
              feats(j) = (segEnergy(j) / sumSq).toFloat; j += 1
            }
          }
          val rms = if (frames > 0) math.sqrt(sumSq / frames).toFloat else 0f
          Some(base.copy(
            decoded_sample_rate = math.round(target.getSampleRate),
            decoded_frames = frames.toLong,
            decoded_duration_ms =
              if (rate > 0) (frames * 1000L / rate).toLong else 0L,
            rms = rms,
            features = feats))
        } finally pcm.close()
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      // AudioSystem.getAudioInputStream(target, in) signals a conversion
      // the JDK lacks (e.g. 24-bit PCM → 16-bit) as IllegalArgumentException
      // — those payloads must degrade to the fallback, not kill the task
      case _: IllegalArgumentException => None
    }

  /** Real video decode for multi-frame containers the JDK can iterate
    * (animated GIF — `ImageReader.getNumImages(true)` + `read(i)`):
    * decoded_frames = real frame count, decoded_width/height = the
    * LOGICAL SCREEN dimensions (stream metadata; first frame as
    * fallback), decoded_duration_ms = Σ per-frame
    * GraphicControlExtension delays, features = `dim` time-segment mean
    * luminances normalized by the total (the video analog of the audio
    * segment-energy profile: a fade-in shows as rising segments).
    *
    * Frames are COMPOSITED onto a logical-screen canvas before
    * measurement: delta-encoded GIFs store sub-rectangle frames at
    * ImageDescriptor offsets, so measuring each raster alone would
    * normalize a delta region by its own w×h and misrepresent the time
    * profile. Per frame: draw at (left, top) with src-over transparency
    * (untouched pixels persist from prior frames), measure the full
    * canvas, then honor the frame's disposal method
    * (`doNotDispose`/`none` keep, `restoreToBackgroundColor` clears the
    * frame's rect — to black, an approximation of the palette background
    * color — and `restoreToPrevious` reverts the canvas).
    *
    * None when no ImageIO reader claims the bytes or the container holds
    * no frames (caller falls back — MP4 and friends stay on the
    * documented byte-histogram STUB unless a [[VideoDecoder]] for them
    * is plugged in; this container ships no codecs for them). */
  private def decodeVideoImageIo(payload: Array[Byte]): Option[VideoFrames] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            // allowSearch: the stream is seekable, so a full frame count
            // is available even for formats without a frame-count header
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else {
              val first = reader.read(0)
              val (w, h) = logicalScreenSize(reader)
                .getOrElse((first.getWidth, first.getHeight))
              // RGB canvas (no alpha): src-over draws respect frame
              // transparency while reads always see an opaque composite
              val canvas = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = canvas.createGraphics()
              // TYPE_INT_RGB backs onto a DataBufferInt — read it once
              // per frame instead of W·H getRGB calls (each of which
              // pays a method dispatch + ColorModel conversion)
              val px = canvas.getRaster.getDataBuffer
                .asInstanceOf[java.awt.image.DataBufferInt].getData
              val means = new Array[Double](n)
              var durationMs = 0L
              var fi = 0
              while (fi < n) {
                val img = if (fi == 0) first else reader.read(fi)
                val (ox, oy, disposal) = frameGeometry(reader, fi)
                val saved =
                  if (disposal == "restoreToPrevious") copyCanvas(canvas)
                  else null
                g.drawImage(img, ox, oy, null)
                var lum = 0L
                var i = 0
                while (i < px.length) {
                  val rgb = px(i)
                  // integer Rec.601 luma, same formula as decodeImage
                  lum += (((rgb >> 16 & 0xff) * 299 +
                    (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000)
                  i += 1
                }
                means(fi) = lum.toDouble / (w.toLong * h) / 255.0
                durationMs += frameDelayMs(reader, fi)
                disposal match {
                  case "restoreToBackgroundColor" =>
                    val prevComposite = g.getComposite
                    g.setComposite(java.awt.AlphaComposite.Src)
                    g.setColor(java.awt.Color.BLACK)
                    g.fillRect(ox, oy, img.getWidth, img.getHeight)
                    g.setComposite(prevComposite)
                  case "restoreToPrevious" =>
                    g.drawImage(saved, 0, 0, null)
                  case _ => () // none / doNotDispose: canvas persists
                }
                fi += 1
              }
              g.dispose()
              Some(VideoFrames(w, h, durationMs, means))
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      // a reader that claimed the bytes but chokes mid-frame (truncated
      // payload) must degrade to the fallback, not kill the task
      case _: java.io.IOException => None
      case scala.util.control.NonFatal(_) => None
    }

  /** MJPEG-in-AVI decode, pure JDK: walk the RIFF chunk tree ('RIFF' /
    * 'AVI ' magic, chunks = fourcc + u32-LE size + even-padded body,
    * 'LIST' chunks nest behind a 4-byte list type), pull stream timing
    * and dimensions from the 'avih' main header (dwMicroSecPerFrame at
    * +0, dwWidth/dwHeight at +32/+36 — the public AVIMAINHEADER layout),
    * and decode every video-data chunk ('##dc'/'##db' — MJPEG frames are
    * standalone JPEGs) with the JDK's JPEG reader. Frame means use the
    * same integer Rec.601 luma as every other decode path. Dimensions
    * fall back to the first decoded frame when 'avih' is absent;
    * duration = decoded frames × µs/frame. None unless the RIFF/AVI
    * magic matches AND at least one frame chunk decodes — a claimed-but-
    * corrupt payload degrades to the caller's fallback, never a task
    * failure. Truncated chunk sizes are clamped to the buffer; the walk
    * is strictly forward (size+pad advance ≥ 8 guarded) and ITERATIVE
    * (explicit heap stack — deeply-nested LIST chunks can't overflow the
    * JVM stack), so adversarial headers can't loop or crash it. */
  private def decodeAviMjpeg(payload: Array[Byte]): Option[VideoFrames] =
    try {
      val b = payload
      def fourcc(off: Int): String =
        new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      def u32(off: Int): Long =
        (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
        (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24
      if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return None
      var usPerFrame = 0L
      var hdrW = 0
      var hdrH = 0
      val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (off, len)
      // Iterative depth-first walk with an explicit continuation stack —
      // NOT recursion: a crafted payload nesting thousands of LISTs
      // (~12 bytes each) would StackOverflow a recursive walk, and SOE
      // is not NonFatal, so it would escape the catch and fail the task.
      // On a LIST the sibling continuation is pushed and the walk
      // descends immediately, so frames append in the same in-order
      // sequence the recursive form produced. Stack depth ≤ payload/12
      // (each nested LIST consumes ≥ 12 bytes), heap-allocated: bounded.
      def walk(start: Int, stop: Int): Unit = {
        val stack = scala.collection.mutable.ArrayDeque[(Int, Int)]()
        var off = start
        var end = stop
        while (off + 8 <= end || stack.nonEmpty) {
          if (off + 8 > end) {
            val (o, e) = stack.removeLast(); off = o; end = e
          } else {
            val id = fourcc(off)
            // clamp a lying size field to the enclosing chunk
            val size = math.min(u32(off + 4), (end - off - 8).toLong).toInt
            val body = off + 8
            val next = body + size + (size & 1) // bodies pad to even length
            if (id == "LIST" && size >= 4) {
              stack.append((next, end)) // resume siblings after the LIST
              off = body + 4; end = body + size
            } else {
              if (id == "avih" && size >= 40) {
                usPerFrame = u32(body)
                hdrW = u32(body + 32).toInt
                hdrH = u32(body + 36).toInt
              } else if (size > 0 &&
                  (id.endsWith("dc") || id.endsWith("db"))) {
                frames += ((body, size))
              }
              off = next
            }
          }
        }
      }
      walk(12, b.length)
      if (frames.isEmpty) return None
      val means = scala.collection.mutable.ArrayBuffer[Double]()
      var w = hdrW
      var h = hdrH
      frames.foreach { case (off, len) =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b, off, len)))
          catch { case scala.util.control.NonFatal(_) => None }
        img.foreach { bi =>
          if (w <= 0 || h <= 0) { w = bi.getWidth; h = bi.getHeight }
          var lum = 0L
          var y = 0
          while (y < bi.getHeight) {
            var x = 0
            while (x < bi.getWidth) {
              val rgb = bi.getRGB(x, y)
              lum += (((rgb >> 16 & 0xff) * 299 +
                (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000)
              x += 1
            }
            y += 1
          }
          means +=
            lum.toDouble / (bi.getWidth.toLong * bi.getHeight) / 255.0
        }
      }
      if (means.isEmpty) None
      else Some(VideoFrames(w, h, means.length * usPerFrame / 1000L,
        means.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ISO BMFF (MP4/QuickTime/WebM-sibling) metadata parse, pure JDK:
    * boxes are [u32-BE size][fourcc][body] with size INCLUDING the
    * 8-byte header (size 1 → 64-bit largesize follows; size 0 → box
    * runs to the end of its container). Sniff: 'ftyp' at offset 4 —
    * every conforming file leads with the brand box. The walk descends
    * only into 'moov' and 'trak' containers (iterative, explicit heap
    * stack — the AVI discipline), reading:
    *  - 'mvhd': movie timescale + duration (v0: u32s at +12/+16;
    *    v1: u32 at +20, u64 at +24) → durationMs;
    *  - 'tkhd': track width/height as 16.16 fixed point (v0: +76/+80;
    *    v1: +88/+92) — the max across tracks (audio tracks carry 0×0).
    * Lying sizes clamp to the container; any advance ≤ 0 aborts the
    * level. None unless a valid mvhd (timescale > 0) is found — a
    * text/garbage payload that happens to contain 'ftyp' cannot
    * produce one, so the byte-histogram fallback stays reachable. */
  private def decodeMp4Metadata(payload: Array[Byte]): Option[VideoFrames] =
    try {
      val b = payload
      def fourcc(off: Int): String =
        new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      def u32(off: Int): Long =
        (b(off) & 0xffL) << 24 | (b(off + 1) & 0xffL) << 16 |
        (b(off + 2) & 0xffL) << 8 | (b(off + 3) & 0xffL)
      def u64(off: Int): Long = u32(off) << 32 | u32(off + 4)
      if (b.length < 12 || fourcc(4) != "ftyp") return None
      var timescale = 0L
      var duration = 0L
      var w = 0
      var h = 0
      var tracks = 0
      val stack = scala.collection.mutable.ArrayDeque[(Int, Int)]((0, b.length))
      while (stack.nonEmpty) {
        var (off, end) = stack.removeLast()
        var ok = true
        while (ok && off + 8 <= end) {
          val size0 = u32(off)
          val typ = fourcc(off + 4)
          var body = off + 8
          var size = size0
          if (size0 == 1 && off + 16 <= end) { size = u64(off + 8); body = off + 16 }
          else if (size0 == 0) size = (end - off).toLong
          // clamp a lying/truncated size to the container
          val boxEnd = math.min(off + math.max(size, (body - off).toLong),
            end.toLong).toInt
          typ match {
            case "moov" | "trak" =>
              if (typ == "trak") tracks += 1
              stack.append((body, boxEnd))
            case "mvhd" if boxEnd - body >= 20 =>
              val v = b(body) & 0xff
              if (v == 1 && boxEnd - body >= 32) {
                timescale = u32(body + 20); duration = u64(body + 24)
              } else if (v == 0) {
                timescale = u32(body + 12); duration = u32(body + 16)
              }
            // the version-byte read needs ≥1 body byte: a zero-length
            // tkhd (truncated/lying size with body == end) would throw
            // and the NonFatal catch would discard EVERYTHING already
            // parsed, dropping the file to the byte-histogram fallback
            case "tkhd" if boxEnd - body >= 1 =>
              val v = b(body) & 0xff
              val (wo, ho) = if (v == 1) (88, 92) else (76, 80)
              if (boxEnd - body >= ho + 4) {
                val tw = (u32(body + wo) >> 16).toInt
                val th = (u32(body + ho) >> 16).toInt
                if (tw > w) w = tw
                if (th > h) h = th
              }
            case _ => ()
          }
          if (boxEnd <= off) ok = false // malformed: no forward progress
          else off = boxEnd
        }
      }
      if (timescale <= 0) None
      else Some(VideoFrames(w, h, duration * 1000L / timescale,
        Array.empty[Double]))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** WebM/Matroska metadata: EBML element walk. Elements are
    * (VINT id, VINT size, body); containers nest. The walk keeps an
    * explicit stack of (offset, end, container-id) — the container id
    * disambiguates short leaf ids (0xB0 is PixelWidth only inside a
    * Video element) and, as in the MP4 walk, recursion depth must not
    * scale with attacker-supplied nesting. Truncated/lying sizes clamp
    * to the enclosing container; the reserved all-ones VINT ("unknown
    * size", used by live-muxed Segments) extends to the container end;
    * any advance ≤ 0 aborts the level. Claims ONLY payloads whose EBML
    * header carries a webm/matroska DocType — garbage that happens to
    * start with the 4 magic bytes cannot produce one, so the
    * byte-histogram fallback stays reachable. Duration is a float in
    * TimestampScale units (default 1 000 000 ns/tick). */
  private def decodeWebmMetadata(payload: Array[Byte]): Option[VideoFrames] =
    try {
      val b = payload
      def uint(off: Int, len: Int): Long = {
        var v = 0L
        var i = 0
        while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
        v
      }
      // VINT width: 1 + count of leading zero bits in the first byte;
      // 9 (no marker bit at all) is malformed
      def vintWidth(first: Int): Int = {
        var mask = 0x80
        var w = 1
        while (w <= 8 && (first & mask) == 0) { mask >>= 1; w += 1 }
        w
      }
      // element id: marker bit KEPT (ids are compared in stored form);
      // returns width 0 on truncation/malformation
      def readId(off: Int, end: Int): (Long, Int) = {
        if (off >= end) return (0L, 0)
        val w = vintWidth(b(off) & 0xff)
        if (w > 4 || off + w > end) return (0L, 0)
        (uint(off, w), w)
      }
      // element size: marker bit STRIPPED; -1 = reserved "unknown size"
      def readSize(off: Int, end: Int): (Long, Int) = {
        if (off >= end) return (0L, 0)
        val first = b(off) & 0xff
        val w = vintWidth(first)
        if (w > 8 || off + w > end) return (0L, 0)
        var v = (first & (0xff >>> w)).toLong
        var i = 1
        while (i < w) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
        (if (v == (1L << (7 * w)) - 1) -1L else v, w)
      }
      def float(off: Int, len: Int): Double =
        if (len == 4) java.lang.Float.intBitsToFloat(uint(off, 4).toInt)
        else if (len == 8) java.lang.Double.longBitsToDouble(uint(off, 8))
        else 0.0
      if (b.length < 4 || uint(0, 4) != 0x1A45DFA3L) return None
      val Ebml = 0x1A45DFA3L; val Segment = 0x18538067L
      val Info = 0x1549A966L; val Tracks = 0x1654AE6BL
      val TrackEntry = 0xAEL;  val Video = 0xE0L
      var docTypeOk = false
      var tsScale = 1000000L // ns per tick, Matroska default
      var durTicks = 0.0
      var w0 = 0
      var h0 = 0
      val stack = scala.collection.mutable.ArrayDeque[(Int, Int, Long)](
        (0, b.length, 0L))
      while (stack.nonEmpty) {
        val (start, end, ctx) = stack.removeLast()
        var off = start
        var ok = true
        while (ok && off < end) {
          val (id, iw) = readId(off, end)
          val (sz, sw) = if (iw == 0) (0L, 0) else readSize(off + iw, end)
          if (iw == 0 || sw == 0) ok = false
          else {
            val body = off + iw + sw
            val bodyEnd = if (sz < 0) end
              else math.min(body + sz, end.toLong).toInt
            val n = bodyEnd - body
            (ctx, id) match {
              case (0L, Ebml) | (0L, Segment) | (Segment, Info) |
                   (Segment, Tracks) | (Tracks, TrackEntry) |
                   (TrackEntry, Video) => stack.append((body, bodyEnd, id))
              case (Ebml, 0x4282L) if n > 0 => // DocType
                val dt = new String(b, body, n,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
                docTypeOk = dt.startsWith("webm") || dt.startsWith("matroska")
              case (Info, 0x2AD7B1L) if n >= 1 && n <= 8 => // TimestampScale
                val v = uint(body, n)
                if (v > 0) tsScale = v
              case (Info, 0x4489L) if n == 4 || n == 8 => // Duration
                durTicks = float(body, n)
              case (Video, 0xB0L) if n >= 1 && n <= 8 => // PixelWidth
                val v = uint(body, n).toInt
                if (v > w0) w0 = v
              case (Video, 0xBAL) if n >= 1 && n <= 8 => // PixelHeight
                val v = uint(body, n).toInt
                if (v > h0) h0 = v
              case _ => ()
            }
            if (bodyEnd <= off) ok = false // malformed: no forward progress
            else off = bodyEnd
          }
        }
      }
      if (!docTypeOk) None
      else Some(VideoFrames(w0, h0,
        (durTicks * tsScale / 1e6).toLong, Array.empty[Double]))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Codec-agnostic fold of a [[VideoFrames]] into MediaFeatures: frame
    * means binned into `dim` time segments, normalized by the total
    * (the shared half of the video path — every codec gets it free). */
  private def videoFeatures(vf: VideoFrames, dim: Int,
      base: MediaFeatures): MediaFeatures = {
    val n = vf.frameMeanLuminance.length
    val seg = new Array[Double](dim)
    var total = 0.0
    var fi = 0
    while (fi < n) {
      val mean = vf.frameMeanLuminance(fi)
      seg((fi.toLong * dim / n).toInt) += mean
      total += mean
      fi += 1
    }
    val feats = new Array[Float](dim)
    if (total > 0) {
      var j = 0
      while (j < dim) { feats(j) = (seg(j) / total).toFloat; j += 1 }
    }
    base.copy(
      decoded_width = vf.width, decoded_height = vf.height,
      decoded_frames = n.toLong,
      decoded_duration_ms = vf.durationMs,
      features = feats)
  }

  private def copyCanvas(c: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      c.getWidth, c.getHeight, c.getType)
    val g = out.createGraphics()
    g.drawImage(c, 0, 0, null)
    g.dispose()
    out
  }

  /** Logical screen dimensions from the stream metadata's
    * LogicalScreenDescriptor node (GIF); None when the format carries no
    * such node — caller falls back to the first frame's raster size. */
  private def logicalScreenSize(reader: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val md = reader.getStreamMetadata
      if (md == null) None
      else {
        val root = md.getAsTree(md.getNativeMetadataFormatName)
          .asInstanceOf[org.w3c.dom.Element]
        val nodes = root.getElementsByTagName("LogicalScreenDescriptor")
        if (nodes.getLength == 0) None
        else {
          val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
          val w = d.getAttribute("logicalScreenWidth")
          val h = d.getAttribute("logicalScreenHeight")
          if (w.isEmpty || h.isEmpty) None else Some((w.toInt, h.toInt))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame placement + disposal from the image metadata: the
    * ImageDescriptor's (imageLeftPosition, imageTopPosition) and the
    * GraphicControlExtension's disposalMethod; ((0,0), "none") when the
    * format or frame carries no such metadata. */
  private def frameGeometry(reader: javax.imageio.ImageReader,
      i: Int): (Int, Int, String) =
    try {
      val md = reader.getImageMetadata(i)
      val root = md.getAsTree(md.getNativeMetadataFormatName)
        .asInstanceOf[org.w3c.dom.Element]
      val desc = root.getElementsByTagName("ImageDescriptor")
      val (ox, oy) =
        if (desc.getLength == 0) (0, 0)
        else {
          val d = desc.item(0).asInstanceOf[org.w3c.dom.Element]
          val l = d.getAttribute("imageLeftPosition")
          val t = d.getAttribute("imageTopPosition")
          (if (l.isEmpty) 0 else l.toInt, if (t.isEmpty) 0 else t.toInt)
        }
      val gce = root.getElementsByTagName("GraphicControlExtension")
      val disposal =
        if (gce.getLength == 0) "none"
        else {
          val d = gce.item(0).asInstanceOf[org.w3c.dom.Element]
            .getAttribute("disposalMethod")
          if (d.isEmpty) "none" else d
        }
      (ox, oy, disposal)
    } catch { case scala.util.control.NonFatal(_) => (0, 0, "none") }

  /** Per-frame delay (ms) from the GIF GraphicControlExtension metadata
    * node (`delayTime` is in hundredths of a second); 0 when the format
    * or frame carries no delay metadata. */
  private def frameDelayMs(reader: javax.imageio.ImageReader, i: Int): Long =
    try {
      val md = reader.getImageMetadata(i)
      val root = md.getAsTree(md.getNativeMetadataFormatName)
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = root.getElementsByTagName("GraphicControlExtension")
      if (nodes.getLength == 0) 0L
      else {
        val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute("delayTime")
        if (d.isEmpty) 0L else d.toLong * 10L
      }
    } catch { case scala.util.control.NonFatal(_) => 0L }

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
