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
  )

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
  )
}
