package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextOps

/** Text-analysis query keys over `documents` (q50–q53): language ID,
  * quality scoring, token counting, fingerprinting. Thin consumers of
  * [[graft.functions.TextOps]] — the reusable column functions are the
  * library surface; these keys pin their semantics to the DuckDB oracle.
  *
  * NB the fixture corpus draws all langs from one shared vocab, so the
  * lang-ID confusion matrix is degenerate by construction — the heuristic
  * itself is exercised on genuinely multilingual text in TextOpsSpec. */
object TextQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_lang_id" -> { (s, dir) =>
      tWide(s, dir, "documents")
        // two-step: hits materialized once per row behind the projection
        .withColumn("hits", TextOps.langIdHits(col("text")))
        .select(col("lang"),
          TextOps.langIdFromHits(col("hits")).as("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "pred_lang")
    },

    "q51_quality" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCountWs(col("text")).as("n_tokens"),
          round(TextOps.typeTokenRatio(col("text")), 6).as("ttr"),
          round(TextOps.wordHitRatio(col("text"), TextOps.EnStopwords), 6)
            .as("stop_ratio"),
          round(TextOps.avgWordLen(col("text")), 6).as("avg_word_len"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    "q52_token_count" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .select(col("lang"),
          TextOps.tokenCountWs(col("text")).as("ws"),
          TextOps.tokenCountBpe(col("text")).as("bpe"))
        .groupBy("lang")
        .agg(sum("ws").cast("long").as("ws_tokens"),
          sum("bpe").cast("long").as("bpe_tokens"),
          min("ws").as("min_doc_tokens"),
          max("ws").as("max_doc_tokens"))
        .orderBy("lang")
    },

    "q53_fingerprint" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // BPE-style pair mining — the first merge step of byte-pair-
    // encoding tokenizer induction: count adjacent character pairs
    // WITHIN words, weighted by corpus word frequency; the top pair is
    // the merge a BPE trainer would apply next. Two-level aggregation
    // is the 100 TB shape: the corpus collapses to its vocabulary first
    // (groupBy word — map-side combined, vocabulary-sized result), and
    // pair explosion runs over distinct WORD TYPES only, never the raw
    // token stream; the final pair agg has a ≤ alphabet² key space.
    // Single-char words are guarded (sequence(1, 0) would DESCEND and
    // fabricate a wrapped pair — the segmentHashes landmine).
    "q119_bpe_pairs" -> { (s, dir) =>
      bpePairs(tWide(s, dir, "documents"))
        .orderBy(desc("weight"), col("pair"))
        .limit(20)
    },

    // Vocabulary coverage / OOV rate — the tokenizer-sizing question a
    // training pipeline asks before fixing a vocab: if we keep the
    // top-K words, what fraction of the token stream is covered, and
    // how many word types per language fall out-of-vocabulary? One
    // corpus token pass: tokens collapse to (lang, word) counts
    // (map-side combined), the global vocabulary derives from THAT
    // (vocabulary-scale agg + heap top-K, never a re-scan), and the
    // K-row vocab broadcasts back onto the (lang, word) counts.
    "q120_vocab_coverage" -> { (s, dir) =>
      vocabCoverage(tWide(s, dir, "documents")).orderBy("lang")
    },

    // Streaming QUALITY ROUTER — the ingest-time shape of q51's scoring:
    // documents arrive as file-source micro-batches, each row scores
    // itself (stateless narrow maps, NO stateful aggregation, no
    // stream-side shuffle) and foreachBatch routes it to ONE of two
    // parquet sinks — quality >= 0.5 to the curated store, the rest to
    // quarantine (the multi-sink fan-out every ingest pipeline runs:
    // accept/reject is decided in-flight, not by a batch sweep later).
    // The gated result reads BOTH sinks back and checksum-aggregates
    // per (sink, lang) — the q140 discipline proving the router is a
    // LOSSLESS PARTITION of the input: every doc lands in exactly one
    // sink, bytes intact. The 0.5 cut compares the round(…,6)'d score,
    // whose pre-round op order the q51 gate already proves bitwise
    // engine-identical — no boundary ULP hazard. Oracle: the same
    // routing as a batch CASE over the original table.
    "q145_stream_quarantine" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      import graft.plans.GraftExpressions.poly_hash
      val base = freshBase(s, dir, "q145")
      val docs = t(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars", "text")
      val src = stageBatches(s, base, Seq(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1)))
      val passDir = s"$base/pass"
      val quarDir = s"$base/quarantine"
      graft.Tables.withShufflePartitions(s, 8) {
        val stream = s.readStream
          .schema("doc_id BIGINT, lang STRING, source STRING, " +
            "n_chars BIGINT, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
          .withColumn("quality", TextOps.qualityScore(col("text")))
        val q = stream.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            // both sinks consume the scored batch — cache so the score
            // pass (and the source file read) runs once per batch
            batch.persist()
            if (batch.count() > 0) {
              // content-derived batch key (the q174 discipline): stable
              // across replays, so each batch owns — and a retry
              // OVERWRITES — its own sink subdirectory instead of
              // double-appending (Staging.storeBatch)
              val key = batch
                .agg(min(pmod(col("doc_id"), lit(2L)))).head().getLong(0)
              graft.sources.Staging.storeBatch(
                batch.filter(col("quality") >= 0.5), passDir, key, bid)
              graft.sources.Staging.storeBatch(
                batch.filter(col("quality") < 0.5), quarDir, key, bid)
            }
            batch.unpersist()
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      // explicit schema on read-back: a sink a batch never fed still
      // reads as EMPTY rather than failing schema inference
      def sinkAgg(path: String, tag: String): DataFrame =
        graft.sources.Staging.readBatchSink(s, path,
          "doc_id BIGINT, lang STRING, source STRING, " +
            "n_chars BIGINT, text STRING, quality DOUBLE")
          .groupBy(lit(tag).as("sink"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("sum_chars"),
            sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
            sum("doc_id").cast("long").as("id_sum"))
      sinkAgg(passDir, "pass").unionByName(sinkAgg(quarDir, "quarantine"))
        .orderBy("sink", "lang")
    },
  )

  /** q120: top-K corpus vocabulary (ties broken lexicographically —
    * deterministic at the K boundary). */
  val VocabK = 500

  /** q120 core, one row per lang: token totals, tokens covered by the
    * global top-`k` vocabulary, OOV word-type count, coverage ratio.
    * The (lang, word) count frame is cached — it feeds both the
    * vocabulary derivation and the coverage roll-up, and is only
    * vocabulary × languages rows. */
  def vocabCoverage(docs: DataFrame, k: Int = VocabK): DataFrame = {
    val lw = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
      .cache()
    val vocab = lw.groupBy("word").agg(sum("cnt").as("freq"))
      .orderBy(desc("freq"), col("word")).limit(k)
      .select(col("word"), lit(1).as("in_vocab"))
    lw.join(broadcast(vocab), Seq("word"), "left_outer")
      .groupBy("lang")
      .agg(sum("cnt").cast("long").as("total_tokens"),
        sum(when(col("in_vocab").isNotNull, col("cnt")).otherwise(0L))
          .cast("long").as("covered_tokens"),
        countDistinct(when(col("in_vocab").isNull, col("word")))
          .as("oov_types"))
      .withColumn("cov_ratio",
        round(col("covered_tokens").cast("double") / col("total_tokens"), 6))
  }

  /** q119 core: adjacent character pairs within words, weighted by
    * corpus word frequency (weight counts a pair's every occurrence in
    * a word; n_word_types counts each word type once). Unordered — the
    * gated key applies its own presentation ORDER BY/LIMIT. */
  def bpePairs(docs: DataFrame): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    words
      .select(col("word"), col("freq"),
        explode(when(length(col("word")) >= 2, expr(
            "transform(sequence(1, length(word) - 1)," +
            " i -> substring(word, i, 2))"))
          .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair")
      .agg(sum("freq").cast("long").as("weight"),
        countDistinct(col("word")).as("n_word_types"))
  }

  private def sqlHits(words: Seq[String]): String =
    s"len(list_filter(string_split(text,' '), t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t)))"

  private val langCase: String = {
    val langs = TextOps.LangMarkers.map(_._1)
    val hitExpr = TextOps.LangMarkers.map { case (l, ws) => l -> sqlHits(ws) }.toMap
    val branches = langs.init.map { l =>
      val conds = langs.filter(_ != l)
        .map(o => s"${hitExpr(l)} >= ${hitExpr(o)}").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${langs.last}' END"
  }

  def oracle: Map[String, String] = Map(
    "q50_lang_id" ->
      s"""WITH p AS (SELECT lang, $langCase AS pred_lang FROM documents)
         |SELECT lang, pred_lang, count(*) AS cnt FROM p
         |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,

    "q51_quality" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents)
        |SELECT doc_id,
        | len(toks) AS n_tokens,
        | round(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS ttr,
        | round(len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','a','it','that','for'], t)))::DOUBLE / len(toks), 6) AS stop_ratio,
        | round(length(regexp_replace(text, ' ', '', 'g'))::DOUBLE / len(toks), 6) AS avg_word_len,
        | round((len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4
        |   + (len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','a','it','that','for'], t)))::DOUBLE / len(toks)) * 0.3
        |   + least(1.0, len(toks) / 50.0) * 0.3, 6) AS quality
        |FROM d ORDER BY doc_id""".stripMargin,

    "q52_token_count" ->
      """WITH d AS (SELECT lang,
        |  len(string_split(text, ' ')) AS ws,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe
        | FROM documents)
        |SELECT lang, CAST(sum(ws) AS BIGINT) AS ws_tokens,
        | CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        | min(ws) AS min_doc_tokens, max(ws) AS max_doc_tokens
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q53_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(0::BIGINT, list_transform(
        |   list_filter(string_split(text,' '), t -> length(t) > 0),
        |   tok -> list_reduce(list_prepend(0::BIGINT,
        |     list_transform(string_split(tok,''), ch -> ascii(ch)::BIGINT)),
        |     (a,b) -> (a*131 + b) % 2147483647))),
        |   (acc, wh) -> (acc*131 + wh) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q119: pairs over word TYPES weighted by corpus frequency; a pair
    // occurring twice in one word counts twice in weight but the word
    // counts once in n_word_types
    "q119_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word),
        |p AS (
        |  SELECT word, freq, substr(word, i, 2) AS pair
        |  FROM w CROSS JOIN LATERAL
        |    (SELECT unnest(range(1, length(word))) AS i) js
        |  WHERE length(word) >= 2)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS weight,
        |  count(DISTINCT word) AS n_word_types
        |FROM p GROUP BY pair
        |ORDER BY weight DESC, pair LIMIT 20""".stripMargin,

    // q120: global top-K vocab (freq desc, word asc at the boundary);
    // coverage and OOV types per lang from the (lang, word) counts
    "q120_vocab_coverage" ->
      s"""WITH lw AS (
         |  SELECT lang, word, count(*) AS cnt
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
         |        FROM documents)
         |  GROUP BY lang, word),
         |v AS (
         |  SELECT word FROM (
         |    SELECT word, sum(cnt) AS freq FROM lw GROUP BY word
         |    ORDER BY freq DESC, word LIMIT $VocabK)),
         |j AS (
         |  SELECT lang, lw.word AS word, cnt, v.word IS NOT NULL AS iv
         |  FROM lw LEFT JOIN v ON lw.word = v.word)
         |SELECT lang,
         |  CAST(sum(cnt) AS BIGINT) AS total_tokens,
         |  CAST(sum(CASE WHEN iv THEN cnt ELSE 0 END) AS BIGINT) AS covered_tokens,
         |  count(DISTINCT CASE WHEN NOT iv THEN word END) AS oov_types,
         |  round(sum(CASE WHEN iv THEN cnt ELSE 0 END)::DOUBLE / sum(cnt), 6) AS cov_ratio
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,

    // q145: the same routing as a batch CASE over the original table —
    // equality proves the streamed dual-sink router is a lossless
    // partition of the input (quality expr = q51's twin; checksum fold
    // = the q140 per-char replay)
    "q145_stream_quarantine" ->
      """WITH d AS (SELECT doc_id, lang, source, n_chars, text,
        |    string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang, n_chars, text,
        |  round((len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4
        |    + (len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','a','it','that','for'], t)))::DOUBLE / len(toks)) * 0.3
        |    + least(1.0, len(toks) / 50.0) * 0.3, 6) AS quality
        |  FROM d)
        |SELECT CASE WHEN quality >= 0.5 THEN 'pass' ELSE 'quarantine' END AS sink,
        |  lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(text,''), ch -> ascii(ch)::BIGINT)),
        |    (a,b) -> (a*131 + b) % 2147483647)) AS BIGINT) AS text_checksum,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY sink, lang ORDER BY sink, lang""".stripMargin,
  )
}
