package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The gated multimodal key (q88): [[MultimodalOps.decodeFeatures]]'s
  * DETERMINISTIC path under the driver's DuckDB differential check.
  *
  * The fixture corpus carries no binary column, so the key manufactures
  * one deterministically: each document's UTF-8 text bytes become an
  * opaque `video`-kind payload (the fixtures are pure ASCII — verified
  * at every scale factor — so byte values equal codepoints and DuckDB's
  * `ascii()` replays the byte stream value-for-value, the q81 poly-hash
  * trick). No ImageIO reader claims ASCII bytes, so every row exercises
  * the real decode pipeline end-to-end — mapPartitions batch iteration,
  * reader probe, fallback — and lands on the codec-less byte-histogram
  * path, which is pure arithmetic over blob bytes:
  *
  *  - `n_bytes`    — payload length;
  *  - `checksum`   — polynomial byte fold (·131 mod 2^31−1), the
  *                   decode-independent raw-bytes fingerprint;
  *  - `decoded_frames` — must be 0: pins that the fallback was taken
  *                   (a probe that wrongly "decoded" text would fail);
  *  - `hist_fp`    — Σ_j (j+1)·count_j over the 16 histogram bins,
  *                   recovered from the NORMALIZED features as
  *                   round(features[j]·n_bytes): bin counts ≤ 577 are
  *                   exact in float32 and the divide-then-multiply
  *                   round-trip is within 0.5 ulp-scaled error, so the
  *                   rounded counts are exact. Any wrong bin anywhere
  *                   breaks the weighted sum — the whole histogram is
  *                   gated through one integer.
  *
  * Codec-backed decode (PNG/WAV/GIF…) cannot be DuckDB-replayed and
  * stays pinned by MultimodalSpec's real encoded fixtures. */
object MultimodalQueries {

  private val Dim = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_media_stats" -> { (s, dir) =>
      import s.implicits._
      val media = tWide(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          MultimodalOps.MediaRow(id, "video",
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            0, 0, 0, 0L)
        }
      val feats = MultimodalOps.decodeFeatures(media, Dim)
      feats.toDF()
        .withColumn("hist_fp",
          aggregate(
            zip_with(col("features"), sequence(lit(0), lit(Dim - 1)),
              (x, i) => round(x * col("n_bytes")).cast("long") *
                (i + lit(1)).cast("long")),
            lit(0L), (acc, v) => acc + v))
        .select(col("media_id"), col("n_bytes"), col("checksum"),
          col("decoded_frames"), col("hist_fp"))
        .orderBy("media_id")
    },

    // Image near-dup END-TO-END under the gate: deterministic 9×8
    // grayscale PNGs (pixel (x,y) = the document's byte at (y·9+x) mod
    // len — ASCII fixtures, so DuckDB's ascii() replays every pixel)
    // go through the REAL ImageIO decode → dHash path, then the
    // library's standard LSH machinery: band the 64-bit hash into 4×16
    // bits, self-join on the band key (hash-partitionable — never
    // all-pairs), keep candidates within hamming ≤ 6 (MultimodalSpec's
    // near-dup bound), and assign clusters with ClusterIters min-label
    // steps. A 9-wide/8-tall image makes each dHash grid cell exactly
    // one pixel and gray luma exactly the byte value, so the oracle
    // replays the hash bit-for-bit — the decode path stays real, the
    // arithmetic stays replayable (q88's trick, aimed at the hash).
    // Scale shape = q89: narrow per-row synth+hash, ×4 band explode,
    // bucketable band join, bounded pair set, fixed-step propagation.
    "q115_image_dedup" -> { (s, dir) =>
      val pairs = dHashPairs(syntheticImageHashes(s, dir))
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      GraphQueries.minLabel(s, edges, GraphQueries.ClusterIters)
        .select(col("node").as("media_id"), col("lbl").as("cluster_id"))
        .orderBy("media_id")
    },

    // Image ingest dedup as a TRUE STREAM — the multimodal member that
    // completes streaming coverage across the dedup families (q108
    // text, q114 segments, q135 embeddings, images here): new images
    // (media_id % 10 = 7) arrive as file-source micro-batches, each
    // row runs the REAL ImageIO encode→decode→dHash path inside the
    // stream (mapPartitions — stateless narrow work, the q115 decode
    // justification), bands its 64-bit hash (4×16 bits, per-row
    // arithmetic), stream-static joins the persisted bucketed corpus
    // hash index ([[imageHashIndex]], the q106 lifecycle: built once
    // from media_id % 10 ≠ 7, grown per ingest via appendBucketed at
    // 100 TB), verifies hamming ≤ 6 in-batch and appends verified
    // pairs to a parquet sink. Read-back dedups band-collision
    // repeats. Oracle: the q115 dHash chain restricted to mixed
    // (batch, corpus) pairs — streaming ingest must reproduce the
    // one-shot batch answer bit-for-bit (the q106/q108 discipline).
    "q139_stream_image_dedup" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      val tab = imageHashIndex(s, dir)
      val corpus = s.table(tab)
        .toDF("corpus_media", "h_c", "b_c", "bk_c")
      val base = freshBase(s, dir, "q139")
      val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      val batchDocs = t(s, dir, "documents")
        .filter(col("doc_id") % 10 === 7).select("doc_id", "text")
      val src = stageBatches(s, base, Seq(
        batchDocs.filter(col("doc_id") % 20 === 7),
        batchDocs.filter(col("doc_id") % 20 === 17)))
      graft.Tables.withShufflePartitions(s, 8) {
        val stream = s.readStream
          .schema("doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
        val hashes = hashRows(stream).toDF("batch_media", "h_b")
        val bands = hashes
          .withColumn("b", explode(sequence(lit(0), lit(3))))
          .withColumn("bk",
            expr("shiftright(h_b, CAST(16 * b AS INT)) & 65535"))
        val pairs = bands
          .join(corpus, col("b") === col("b_c") && col("bk") === col("bk_c"))
          .filter(bit_count(col("h_b").bitwiseXOR(col("h_c"))) <= 6)
          .select(col("batch_media"), col("corpus_media"),
            bit_count(col("h_b").bitwiseXOR(col("h_c"))).cast("long")
              .as("hamming"))
        val q = graft.streaming.StreamPipelines
          .writeParquetStream(pairs, outDir, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .select("batch_media", "corpus_media", "hamming")
        .distinct()
        .orderBy("batch_media", "corpus_media")
    },

    // AUDIO near-dup END-TO-END under the gate — the audio member of
    // the multimodal dedup family (q115 image, q139 streaming image):
    // each document's bytes become a REAL RIFF/WAVE container
    // (MultimodalOps.wavBytes), go through the real
    // `javax.sound.sampled` decode, and hash to the 32-bit
    // energy-envelope fingerprint (all-integer: window amplitude sums
    // vs track mean). Candidates come from a 2×16-bit band self-join
    // on the fingerprint — hash-partitionable, never all-pairs;
    // hamming ≤ 1 keeps a pair (pigeonhole: radius 1 needs only TWO
    // bands — a single flipped envelope bit leaves ≥ 1 band intact,
    // so banding loses nothing at this radius). The envelope was 16
    // bits (2×8 bands) through r16; the sf3 probe's arithmetic put
    // that band floor's candidates at ~n²/256 — crossing the linear
    // decode cost ~sf10 — so r17 WIDENED the envelope to 32 windows
    // (VERDICT r16 item 2): 2×16-bit bands give 65,536 buckets per
    // band, candidates ~n²/65536 (the q169 class), and the crossover
    // moves ~256× out. More windows = a finer loudness profile, so
    // the verified contract changes WITH the fingerprint (it's a new,
    // sharper instrument, re-gated at all scales — not a band-only
    // re-cut like r12's, which was output-invariant). The
    // oracle replays sample bytes via ascii() (ASCII fixtures — the
    // q88/q115 trick aimed at the envelope hash): decode stays real,
    // arithmetic stays replayable. Same narrow per-row synth+decode
    // shape as q115: scales as one codec pass + a banded join.
    "q147_audio_dedup" -> { (s, dir) =>
      audioDedupPairs(audioFpRows(
        tWide(s, dir, "documents").select(col("doc_id"), col("text"))))
    },

    // VIDEO near-dup — completes the multimodal dedup family (q115
    // image, q147 audio, q139 streaming image): each document becomes
    // a REAL 4-frame RIFF/AVI container (MultimodalOps.aviBytes; frame
    // f's 9×8 PNG reads the byte stream at offset f·7, so consecutive
    // frames genuinely differ), goes through the REAL container walk +
    // per-frame ImageIO decode (aviFrameDHashes), and fingerprints as
    // the SEQUENCE of per-frame dHashes. Candidates come from a
    // (frame, band) 4×16-bit self-join — any frame-aligned band
    // agreement nominates the pair, the video twin of q115's banding;
    // verification compares WHOLE fingerprints: total hamming across
    // all 4 frames ≤ 24 (q115's per-frame 6 × 4 frames). The hash
    // arrays RIDE the band rows (the q44 payload trade — 4 longs, no
    // re-join) and the total folds with zip_with/aggregate in one
    // codegen pass. The oracle replays every frame's dHash from
    // ascii() bytes with the same +f·7 shift — decode stays real,
    // arithmetic stays replayable (the q115 trick, per frame).
    "q169_video_dedup" -> { (s, dir) =>
      val vh = videoFrameHashes(
        tWide(s, dir, "documents").select(col("doc_id"), col("text")))
      // cached: the AVI walk + 4 per-frame ImageIO decodes upstream
      // would otherwise run once per self-join side (q73 discipline)
      val bands = vh.select(col("media_id"), col("hs"),
          posexplode(col("hs")).as(Seq("f", "h")))
        .withColumn("b", explode(sequence(lit(0), lit(3))))
        .withColumn("bk", expr("shiftright(h, CAST(16 * b AS INT)) & 65535"))
        .cache()
      val ba = bands.select(col("media_id").as("id_a"), col("hs").as("hs_a"),
        col("f"), col("b"), col("bk"))
      val bb = bands.select(col("media_id").as("id_b"), col("hs").as("hs_b"),
        col("f").as("f2"), col("b").as("b2"), col("bk").as("bk2"))
      ba.join(bb, col("f") === col("f2") && col("b") === col("b2") &&
          col("bk") === col("bk2") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("hs_a"), col("hs_b"))
        .distinct()
        .withColumn("total_ham",
          aggregate(zip_with(col("hs_a"), col("hs_b"),
            (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
            lit(0L), (acc, v) => acc + v))
        .filter(col("total_ham") <= 24)
        .select("id_a", "id_b", "total_ham")
        .orderBy("id_a", "id_b")
    },
  )

  /** q147's banded pair stage over a fingerprint frame (media_id, fp):
    * 2×16-bit band self-join → distinct candidates → hamming ≤ 1
    * verify. Factored from the key so the spec can drive it with
    * CONSTRUCTED fingerprints (guaranteed hamming-0/1/2 neighbors —
    * the fixtures' 32-bit pair content starts only at sf0.1). */
  def audioDedupPairs(fps: DataFrame): DataFrame = {
    // cached: the WAV synth + javax.sound decode upstream would
    // otherwise run once PER SELF-JOIN SIDE (the q73 discipline;
    // ~2× the whole decode cost at sf1)
    val bands = fps.select(col("media_id"), col("fp"),
        explode(sequence(lit(0), lit(1))).as("b"))
      .withColumn("bk", expr("shiftright(fp, CAST(16 * b AS INT)) & 65535"))
      .cache()
    val ba = bands.select(col("media_id").as("id_a"), col("fp").as("f_a"),
      col("b"), col("bk"))
    val bb = bands.select(col("media_id").as("id_b"), col("fp").as("f_b"),
      col("b").as("b2"), col("bk").as("bk2"))
    ba.join(bb, col("b") === col("b2") &&
        col("bk") === col("bk2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("f_a"), col("f_b"))
      .distinct()
      .filter(bit_count(col("f_a").bitwiseXOR(col("f_b"))) <= 1)
      .select(col("id_a"), col("id_b"),
        bit_count(col("f_a").bitwiseXOR(col("f_b"))).cast("long")
          .as("ham"))
      .orderBy("id_a", "id_b")
  }

  /** q147's fingerprint stage: text bytes → real WAV container → real
    * JDK audio decode → 32-bit envelope hash, as (media_id, fp).
    * Stateless narrow per-row work (the hashRows shape for audio);
    * mapPartitions is justified as in q88 — a codec call, not an
    * Expression. */
  def audioFpRows(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val wav = MultimodalOps.wavBytes(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // .get: the WAV was just synthesized — a decode failure is a
          // bug worth failing loudly on, never a silent wrong hash
          (id, MultimodalOps.audioEnvelopeFp(wav).get)
        }
      }.toDF("media_id", "fp")
  }

  /** q169's fingerprint stage: text bytes → 4 shifted 9×8 PNG frames →
    * REAL AVI container → REAL container walk + per-frame ImageIO
    * decode → per-frame dHash sequence, as (media_id, hs). Stateless
    * narrow per-row work (the hashRows shape for video); mapPartitions
    * is justified as in q88 — codec calls, not an Expression. */
  def videoFrameHashes(df: DataFrame, nFrames: Int = 4,
      shift: Int = 7): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val frames = (0 until nFrames).map { f =>
            val bi = new java.awt.image.BufferedImage(
              9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 9) {
                val v = if (bytes.isEmpty) 0
                  else bytes((y * 9 + x + f * shift) % bytes.length) & 0xff
                bi.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", bos)
            bos.toByteArray
          }
          val avi = MultimodalOps.aviBytes(frames, 9, 8)
          // .get + length check: the AVI was just synthesized — a
          // container or frame decode failure is a bug worth failing
          // loudly on, never a silently short fingerprint
          val hs = MultimodalOps.aviFrameDHashes(avi).get
          require(hs.length == nFrames,
            s"video $id decoded ${hs.length} of $nFrames frames")
          (id, hs)
        }
      }.toDF("media_id", "hs")
  }

  /** Build — or REUSE — q139's persisted corpus image-hash band index:
    * dHash + 4×16-bit band rows for every NON-batch image
    * (media_id % 10 ≠ 7), bucketed on the band key. The q106/q109
    * lifecycle applied to the image family: written once, grown per
    * ingest via `Staging.appendBucketed` at 100 TB, never re-shuffled
    * (Bench times the build separately as q139_index_build). */
  def imageHashIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_image_bands_")
    val tab = "graft_image_bands_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    if (rebuild || !s.catalog.tableExists(tab)) {
      val bands = syntheticImageHashes(s, dir)
        .filter(col("media_id") % 10 =!= 7)
        .withColumn("b", explode(sequence(lit(0), lit(3))))
        .withColumn("bk", expr("shiftright(h, CAST(16 * b AS INT)) & 65535"))
      graft.sources.Staging.storeBucketed(
        bands.repartition(8, col("bk")), tab, Seq("bk"), 8)
    }
    tab
  }

  /** q115's hash stage: one deterministic 9×8 grayscale PNG per
    * document through the REAL ImageIO encode → decode → dHash path.
    * Returns (media_id, h). */
  def syntheticImageHashes(s: SparkSession, dir: String): DataFrame =
    hashRows(tWide(s, dir, "documents").select(col("doc_id"), col("text")))

  /** The synth + ImageIO decode + dHash kernel over any (id, text)
    * frame — stateless narrow per-row work, so it runs identically on
    * the batch hash stage above and on q139's micro-batched stream. */
  def hashRows(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val bi = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              val v = if (bytes.isEmpty) 0
                else bytes((y * 9 + x) % bytes.length) & 0xff
              bi.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(bi, "png", bos)
          // .get: the PNG was just encoded, a decode failure is a bug
          // worth failing loudly on, never a silent wrong hash
          (id, MultimodalOps.dHash(bos.toByteArray).get)
        }
      }.toDF("media_id", "h")
  }

  /** q115's candidate stage: LSH-band the 64-bit dHash (4 bands × 16
    * bits), equi-join on the band key — hash-partitionable, NEVER
    * all-pairs (PlanSpec pins no cartesian/nested-loop) — and keep
    * pairs within hamming ≤ 6. Returns (id_a, id_b), id_a < id_b. */
  def dHashPairs(hashes: DataFrame): DataFrame = {
    // cached: both self-join sides consume the banded frame, and
    // alias-renamed sides defeat ReuseExchange (the q73 discipline) —
    // uncached, the REAL ImageIO decode upstream runs twice
    val bands = hashes.select(col("media_id"), col("h"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bk", expr("shiftright(h, CAST(16 * b AS INT)) & 65535"))
      .cache()
    val ba = bands.select(col("media_id").as("id_a"), col("h").as("h_a"),
      col("b"), col("bk"))
    val bb = bands.select(col("media_id").as("id_b"), col("h").as("h_b"),
      col("b").as("b2"), col("bk").as("bk2"))
    ba.join(bb, col("b") === col("b2") &&
        col("bk") === col("bk2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct()
      .filter(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 6)
      .select(col("id_a"), col("id_b"))
  }

  /** DuckDB twin: byte stream via `ascii()` over single-char splits
    * (byte == codepoint for the ASCII fixtures), checksum as the q81
    * poly-hash fold, and hist_fp collapsed with
    * Σ_j (j+1)·c_j = Σ_bytes (b mod 16 + 1) = len + Σ_bytes (b mod 16).
    * Empty-text guard: DuckDB's `string_split('', '')` is `['']` (one
    * element, `ascii('') = 0`), NOT `[]` — unguarded it would report
    * n_bytes = 1 for a document Spark correctly reports as 0 bytes; the
    * `COALESCE` covers `list_sum([]) = NULL` on the guarded empty list. */
  def oracle: Map[String, String] = Map(
    "q88_media_stats" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN text = '' THEN []::BIGINT[]
        |         ELSE list_transform(string_split(text, ''), ch -> ascii(ch)::BIGINT)
        |    END AS cs
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(len(cs) AS BIGINT) AS n_bytes,
        |  list_reduce(list_prepend(0::BIGINT, cs),
        |    (a, b) -> (a * 131 + b) % 2147483647) AS checksum,
        |  CAST(0 AS BIGINT) AS decoded_frames,
        |  CAST(len(cs) + COALESCE(list_sum(list_transform(cs, c -> c % 16)), 0)
        |    AS BIGINT) AS hist_fp
        |FROM b ORDER BY media_id""".stripMargin,

    // q115 twin: replay the dHash from first principles — 72 pixel
    // values from the text bytes, 64 adjacent-compare bits (bit 63 is
    // the sign bit: summing it last keeps every partial in range), the
    // same 4×16 banding ((h >> 16b) & 65535: arithmetic shift +
    // mask ≡ Spark's shiftright + mask), bit_count(xor) hamming, and
    // the q89 unrolled min-label steps.
    "q115_image_dedup" ->
      s"""WITH px AS (
         |  SELECT doc_id, list_transform(range(72), i ->
         |    CASE WHEN len(text) = 0 THEN 0
         |         ELSE ascii(text[CAST(i % len(text) AS INTEGER) + 1])
         |    END) AS px
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
         |    list_transform(range(64), k ->
         |      CASE WHEN px[CAST((k // 8) * 9 + (k % 8) AS INTEGER) + 1]
         |              > px[CAST((k // 8) * 9 + (k % 8) AS INTEGER) + 2]
         |           THEN CASE WHEN k = 63 THEN -9223372036854775807 - 1
         |                     ELSE (1::BIGINT << CAST(k AS INTEGER)) END
         |           ELSE 0::BIGINT
         |      END)), (a, b) -> a + b) AS h
         |  FROM px),
         |bands AS MATERIALIZED (
         |  SELECT doc_id, b, (h >> CAST(16 * b AS INTEGER)) & 65535 AS bk, h
         |  FROM h CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
         |pairs AS MATERIALIZED (
         |  SELECT DISTINCT id_a, id_b FROM (
         |    SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.h AS ha, y.h AS hb
         |    FROM bands x JOIN bands y
         |      ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id)
         |  WHERE bit_count(xor(ha, hb)) <= 6),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges),
         |${GraphQueries.labelSteps(GraphQueries.ClusterIters)}
         |SELECT node AS media_id, lbl AS cluster_id
         |FROM l${GraphQueries.ClusterIters} ORDER BY media_id""".stripMargin,

    // q139: the q115 px/h/bands chain restricted to mixed
    // (batch, corpus) pairs and relabeled — signatures are per-image
    // quantities, so the one-shot pair query with a side filter IS the
    // incremental answer (the q106/q109 twin discipline); streaming
    // ingest must reproduce it bit-for-bit
    "q139_stream_image_dedup" ->
      """WITH px AS (
        |  SELECT doc_id, list_transform(range(72), i ->
        |    CASE WHEN len(text) = 0 THEN 0
        |         ELSE ascii(text[CAST(i % len(text) AS INTEGER) + 1])
        |    END) AS px
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
        |    list_transform(range(64), k ->
        |      CASE WHEN px[CAST((k // 8) * 9 + (k % 8) AS INTEGER) + 1]
        |              > px[CAST((k // 8) * 9 + (k % 8) AS INTEGER) + 2]
        |           THEN CASE WHEN k = 63 THEN -9223372036854775807 - 1
        |                     ELSE (1::BIGINT << CAST(k AS INTEGER)) END
        |           ELSE 0::BIGINT
        |      END)), (a, b) -> a + b) AS h
        |  FROM px),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, b, (h >> CAST(16 * b AS INTEGER)) & 65535 AS bk, h
        |  FROM h CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
        |pairs AS (
        |  SELECT DISTINCT id_a, id_b, bit_count(xor(ha, hb))::BIGINT AS hamming
        |  FROM (
        |    SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.h AS ha, y.h AS hb
        |    FROM bands x JOIN bands y
        |      ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id
        |    WHERE (x.doc_id % 10 = 7) != (y.doc_id % 10 = 7))
        |  WHERE bit_count(xor(ha, hb)) <= 6)
        |SELECT CASE WHEN id_a % 10 = 7 THEN id_a ELSE id_b END AS batch_media,
        |  CASE WHEN id_a % 10 = 7 THEN id_b ELSE id_a END AS corpus_media,
        |  hamming
        |FROM pairs ORDER BY batch_media, corpus_media""".stripMargin,

    // q169: the q115 px/h dHash replay PER FRAME (pixel stream shifted
    // +f·7, the synth's frame offset), frame-aligned band candidates,
    // whole-fingerprint total hamming from the ordered hash list
    "q169_video_dedup" ->
      """WITH fx AS (SELECT unnest(range(4)) AS f),
        |px AS (
        |  SELECT doc_id, f, list_transform(range(72), i ->
        |    CASE WHEN len(text) = 0 THEN 0
        |         ELSE ascii(text[CAST((i + f * 7) % len(text) AS INTEGER) + 1])
        |    END) AS px
        |  FROM documents CROSS JOIN fx),
        |h AS (
        |  SELECT doc_id, f, list_reduce(list_prepend(0::BIGINT,
        |    list_transform(range(64), k ->
        |      CASE WHEN px[CAST((k // 8) * 9 + (k % 8) AS INTEGER) + 1]
        |              > px[CAST((k // 8) * 9 + (k % 8) AS INTEGER) + 2]
        |           THEN CASE WHEN k = 63 THEN -9223372036854775807 - 1
        |                     ELSE (1::BIGINT << CAST(k AS INTEGER)) END
        |           ELSE 0::BIGINT
        |      END)), (a, b) -> a + b) AS h
        |  FROM px),
        |hl AS (SELECT doc_id, list(h ORDER BY f) AS hs
        |       FROM h GROUP BY doc_id),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, f, b, (h >> CAST(16 * b AS INTEGER)) & 65535 AS bk
        |  FROM h CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bands x JOIN bands y
        |    ON x.f = y.f AND x.b = y.b AND x.bk = y.bk
        |   AND x.doc_id < y.doc_id),
        |p AS (
        |  SELECT id_a, id_b,
        |    list_reduce(list_transform(range(1, 5),
        |      i -> bit_count(xor(a.hs[i], b.hs[i]))::BIGINT),
        |      (x, y) -> x + y) AS total_ham
        |  FROM cand JOIN hl a ON a.doc_id = id_a
        |            JOIN hl b ON b.doc_id = id_b)
        |SELECT id_a, id_b, total_ham FROM p WHERE total_ham <= 24
        |ORDER BY id_a, id_b""".stripMargin,

    // q147: sample bytes replayed via ascii() (decoded 8-bit PCM ==
    // text bytes), envelope hash in integer SQL, same 2×16-bit banding
    // (32 windows since r17 — see the key note).
    // NB a zero-length text would fingerprint engine-side as 0 but drop
    // out of the sample CTE here — the fixtures carry none (pinned by
    // FixturesSpec) and a length-0 doc can't pair anyway.
    "q147_audio_dedup" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n, i, abs(ascii(text[CAST(i AS INTEGER) + 1]) - 128) AS a
        |  FROM d CROSS JOIN (SELECT unnest(range(0, (SELECT max(n) FROM d))) AS i) ii
        |  WHERE i < n),
        |w AS (SELECT doc_id, (i * 32) // n AS j, sum(a) AS ej
        |  FROM s GROUP BY doc_id, (i * 32) // n),
        |t AS (SELECT doc_id, sum(ej) AS etot FROM w GROUP BY doc_id),
        |fp AS (
        |  SELECT w.doc_id, CAST(sum(CASE WHEN 32 * ej > etot
        |    THEN 1::BIGINT << CAST(j AS INTEGER) ELSE 0 END) AS BIGINT) AS fp
        |  FROM w JOIN t USING (doc_id) GROUP BY w.doc_id),
        |bands AS (
        |  SELECT doc_id, fp, b, (fp >> CAST(16 * b AS INTEGER)) & 65535 AS bk
        |  FROM fp CROSS JOIN (SELECT unnest(range(2)) AS b) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
        |    x.fp AS fa, y.fp AS fb
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id)
        |SELECT id_a, id_b, bit_count(xor(fa, fb))::BIGINT AS ham
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
