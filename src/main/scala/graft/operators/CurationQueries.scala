package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.plans.MisraGriesAgg.misra_gries

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization (q91–q93, q96): context-window chunking,
  * exact heavy-hitter vocabulary mining, BM25 relevance ranking, and
  * inverted-index (posting-list) construction.
  *
  * The reference (santoroc/appstore-aws-etl `README.md:2`) stops at
  * "load scraped app-store rows into a warehouse"; these keys are the
  * analytics that warehouse exists to serve once the rows are text.
  *
  * Scale notes (100 TB):
  *  - q91 is a pure narrow pipeline — split/sequence/explode/slice all
  *    codegen, no shuffle at all (the gate's ORDER BY is presentation
  *    only). Chunking 100 TB is embarrassingly parallel.
  *  - q92 is the canonical two-pass exact heavy-hitters: pass 1 ships a
  *    fixed-size Misra–Gries summary per partition (KBs, independent of
  *    data size), pass 2 re-counts ONLY the broadcast candidate set.
  *    Neither pass shuffles the corpus; a naive groupBy on a 100 TB
  *    token stream would.
  *  - q93 aggregates on (doc, term) for a bounded term set — the
  *    explode is filtered to query terms BEFORE the shuffle, so shuffle
  *    volume is O(matching tokens), not O(corpus); df/N/avgdl ride in
  *    as broadcasts.
  *  - q96 shuffles once on token — the unavoidable posting-build
  *    exchange; hot terms (stopwords) are the known skew case, handled
  *    in this library by the SkewOps salted-agg pattern if needed.
  */
object CurationQueries {

  /** q91: context-window size (tokens) and stride; stride < width gives
    * the standard overlapping windows. */
  val ChunkWidth = 32
  val ChunkStride = 24

  /** q92: Misra–Gries capacity k. Guarantee: every item with frequency
    * > n/(k+1) survives pass 1, so the pass-2 threshold n/32 (< n/65)
    * filters a guaranteed-complete candidate set — the result is
    * EXACTLY the oracle's plain GROUP BY ... HAVING. */
  val MgCapacity = 64

  /** q93: BM25 free parameters (the universal defaults) and query. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Terms: Seq[String] = Seq("scan", "merge", "dup")

  /** q198/q204: hashed-feature vocabulary size and resampling-front
    * cut. V is FIXED (not data-dependent) — the λ table is always at
    * most V rows, broadcastable at any corpus size. */
  val DsirBuckets = 4096
  val DsirTopK = 50

  /** q198/q204 gram stream: unigram + bigram INSTANCES of the
    * space-token stream, hashed into the fixed V-bucket feature
    * space — (doc_id, lang, h). */
  private def dsirGrams(d: DataFrame): DataFrame = {
    import graft.plans.GraftExpressions.{poly_hash, word_bigrams}
    val uni = d.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("g"))
    val bi = d.select(col("doc_id"), col("lang"),
      word_bigrams(col("text")).as("g"))
    uni.unionAll(bi)
      .select(col("doc_id"), col("lang"),
        (poly_hash(col("g")) % DsirBuckets).as("h"))
  }

  /** q198/q204 per-bucket counts: raw and target (lang = 'en') gram
    * instances — the one map-side-combinable bounded-key pass. */
  private def dsirCounts(grams: DataFrame): DataFrame =
    grams.groupBy("h").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === "en", 1)).as("ct"))

  /** q198/q204 quantized λ per bucket row (needs cr/ct columns):
    * floor(ln(((ct+1)(Nr+V)) / ((cr+1)(Nt+V))) · 1e6 + 1e-6) — exact
    * int64 micro-nats, products double-exact below 2^53. */
  private def dsirLambda(buckets: DataFrame, nr: Long, nt: Long): DataFrame =
    buckets.select(col("h"),
      floor(log(((col("ct") + lit(1L)) * lit(nr + DsirBuckets)).cast("double")
          / ((col("cr") + lit(1L)) * lit(nt + DsirBuckets)).cast("double"))
        * 1e6 + 1e-6).as("q"))

  /** q198/q204 presentation: attach doc metadata, display weight,
    * top-[[DsirTopK]] by exact integer weight. */
  private def dsirBoard(docs: DataFrame, perDoc: DataFrame): DataFrame =
    docs.select("doc_id", "lang", "source")
      .join(perDoc, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_feats"),
        col("w_scaled"),
        round(col("w_scaled").cast("double") / 1e6, 6).as("w"))
      .orderBy(desc("w_scaled"), col("doc_id"))
      .limit(DsirTopK)

  /** The q93 core, shared with q195's hybrid fusion: BM25 score over
    * [[Bm25Terms]], one row per doc containing ≥ 1 query term, rounded
    * to 6 dp. Unordered — callers apply their own presentation sort.
    * Determinism: each per-(doc, term) weight is a SINGLE value (tf is
    * already one row per pair, so no shuffle-order double sums exist)
    * and the cross-term total folds in fixed term order.
    * dl is read twice (corpus stats + the per-doc join) and tf twice
    * (df + weights); multi-referenced subtrees re-expand with fresh
    * exprIds, so uncached each reference re-ran the tokenize/explode
    * pipeline — both frames are narrow ((doc_id, dl) / ≤|terms| rows
    * per doc), and the caches measure faster even at fixture scale
    * (A/B warm medians 1.02 vs 1.21 s at sf0.1) because the recomputed
    * subtree is CPU-heavy, unlike q107's cheap pruned re-scan where
    * the same trade measured the other way. */
  private[operators] def bm25PerDoc(raw: DataFrame): DataFrame = {
    val docs = raw.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val dl = docs.select(col("doc_id"),
      size(col("toks")).cast("double").as("dl")).cache()
    // dl values are whole numbers: their double sum is exact in any
    // order, so avg() here is deterministic cross-engine
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).cast("double").as("tf"))
      .cache()
    val dfreq = tf.groupBy("tok")
      .agg(count(lit(1)).cast("double").as("df"))
    val w = tf
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(Bm25K1 + 1.0))
          / (col("tf") + lit(Bm25K1)
            * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
    val perTerm = Bm25Terms.map(t =>
      coalesce(sum(when(col("tok") === t, col("w"))), lit(0.0))
        .as(s"w_$t"))
    w.groupBy("doc_id")
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"),
        round(Bm25Terms.map(t => col(s"w_$t")).reduce(_ + _), 6)
          .as("bm25"))
  }

  /** q110: segment width (tokens) for paragraph-granularity dedup —
    * the fixtures carry no newlines, so non-overlapping fixed-width
    * token windows stand in for paragraphs/lines. */
  val SegWidth = 8

  /** q111: training-sequence length (tokens) for packing. */
  val PackWindow = 256

  /** q111/q112: shard fan-out for packing. 4 keeps every (source, shard)
    * non-empty down to sf0.001; at 100 TB it rises to O(corpus/executor
    * memory) — the plan shape is shard-count-independent. */
  val PackShards = 4L

  /** q96: posting-page width (docs per page). Every posting row and
    * every build-side aggregation buffer is bounded by this, whatever
    * the token's document frequency. 16 forces multi-page postings even
    * at sf0.001 (500 docs ⇒ ~31 pages for a stopword); production sizes
    * pages to the reader's block size (thousands), same plan. */
  val PostingPageDocs = 16

  /** Sequence packing, the 100 TB shape: docs are pre-assigned to
    * `shards` deterministic shards (doc_id mod shards — the fixture ids
    * are dense; non-dense ids would use a portable hash like poly_hash
    * of the id, same plan), and each (source, shard) packs its own
    * doc_id-ordered token stream into PackWindow-token sequences
    * INDEPENDENTLY. The running-sum window partitions on the composite
    * key, so no reducer ever sorts more than one shard of one source —
    * the per-source-window variant this replaces put each source's
    * ENTIRE token stream on a single reducer, exactly the skew q107's
    * quota design refuses. Packing is only ever stream-local (industry
    * practice: each worker packs its own shard; sequences never cross
    * shards), so the per-shard metrics ARE the production numbers, and
    * CurationSpec pins the stream-local equivalence law: each (source,
    * shard) group equals packing that shard's docs as a standalone
    * stream. Returns one row per (source, shard). */
  def packSequences(docs: DataFrame, shards: Long): DataFrame = {
    val W = PackWindow
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("source"), col("doc_id"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("cum", sum("n").over(w))
      .withColumn("first_seq", expr(s"(cum - n) DIV $W"))
      .withColumn("last_seq", expr(s"(cum - 1) DIV $W"))
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").cast("long").as("total_tokens"),
        expr(s"CAST((sum(n) + ${W - 1}) DIV $W AS BIGINT)").as("n_seqs"),
        sum(when(col("first_seq") =!= col("last_seq"), 1L).otherwise(0L))
          .cast("long").as("split_docs"))
  }

  /** One row per (doc_id, segment md5) — each doc's non-overlapping
    * SegWidth-token windows fingerprinted (q110's segment definition,
    * shared by the streaming probe q114 and the q114 index build).
    * Short-doc guard (the shingles discipline): below SegWidth tokens
    * there are no segments. Unguarded, sequence(0, size/8 - 1) would
    * DESCEND to [0, -1] for size < 8 and the -1 slice index wraps from
    * the array end — fabricating two identical segments that score the
    * doc dup_ratio 1.0 while the oracle's range(len//8) emits none. */
  def segmentHashes(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(col("doc_id"),
      explode(when(size(toks) >= SegWidth, transform(
          sequence(lit(0), (size(toks) / SegWidth).cast("int") - 1),
          j => md5(concat_ws(" ",
            slice(toks, j * SegWidth + 1, lit(SegWidth))))))
        .otherwise(array().cast("array<string>"))).as("h"))
  }

  /** Build — or REUSE — q114's persisted segment-count table: corpus
    * (non-batch) segment fingerprints counted and written bucketed on
    * the 32-char digest — only digests, never text, ever shuffle or
    * persist. The paragraph-granularity sibling of q106's band index:
    * grows per ingest via Staging.appendBucketed at 100 TB. */
  def segCountIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_seg_counts_")
    val tab = "graft_seg_counts_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    if (rebuild || !s.catalog.tableExists(tab)) {
      graft.sources.Staging.storeBucketed(
        segmentHashes(tWide(s, dir, "documents")
            .filter(col("doc_id") % 10 =!= 7))
          .groupBy("h").agg(count(lit(1)).as("cnt"))
          .repartition(8, col("h")),
        tab, Seq("h"), 8)
    }
    tab
  }

  /** q118: overlapping-span width (tokens) for substring-level dedup.
    * Production exact-substring dedup uses ~50-gram spans (the
    * "deduplicating training data" discipline); 8 keeps the signal
    * dense on 10–99-token fixture docs while exercising the identical
    * plan. Shares SegWidth's value but NOT its meaning — q110 segments
    * are disjoint, spans overlap at stride 1, which is what catches a
    * duplicated passage at a shifted offset (q110's aligned windows
    * miss it). */
  val SpanWidth = 8

  /** One row per (doc_id, span start, span md5) — every OVERLAPPING
    * SpanWidth-token window, stride 1 (q118). Same short-doc guard as
    * [[segmentHashes]]: below SpanWidth tokens, `sequence(0, size-W)`
    * would descend and fabricate wrapped spans. */
  def spanHashes(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val W = SpanWidth
    docs.select(col("doc_id"),
        posexplode(when(size(toks) >= W, transform(
            sequence(lit(0), size(toks) - W),
            j => md5(concat_ws(" ", slice(toks, j + 1, lit(W))))))
          .otherwise(array().cast("array<string>"))))
      .toDF("doc_id", "pos", "h")
  }

  /** q121: content-defined chunk divisor — a chunk boundary falls
    * AFTER token t whenever polyhash(t) % CdcDivisor == 0, so the mean
    * chunk is ~CdcDivisor tokens and boundaries depend only on LOCAL
    * content: an insertion near a doc's head shifts every q118-style
    * positional window but CDC boundaries re-synchronize at the next
    * boundary token, which is why storage/dedup systems chunk this way. */
  val CdcDivisor = 8

  /** One row per (doc_id, chunk token-length, chunk md5) — content-
    * defined chunking of the token stream (q121). Entirely narrow
    * per-row compute: boundary positions, starts/ends, and per-chunk
    * digests are array ops inside one projection; nothing shuffles
    * until the digests aggregate. The n >= 2 guard is the usual
    * descending-sequence landmine (a 1-token doc is one chunk). */
  def cdcChunkStream(docs: DataFrame): DataFrame = {
    import graft.plans.GraftExpressions.poly_hash
    val n = size(col("toks"))
    val bpos = when(n >= 2,
        filter(
          transform(sequence(lit(0), n - 2),
            j => when(poly_hash(element_at(col("toks"), j + 1))
              % CdcDivisor === 0, j + 1)),
          x => x.isNotNull))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        concat(array(lit(0)), bpos).as("starts"),
        concat(bpos, array(n)).as("ends"))
      .select(col("doc_id"),
        explode(zip_with(col("starts"), col("ends"), (st, en) =>
          struct((en - st).as("len"),
            md5(concat_ws(" ", slice(col("toks"), st + 1, en - st)))
              .as("h")))).as("c"))
      .select(col("doc_id"), col("c.len").as("len"), col("c.h").as("h"))
  }

  /** q146/q155 shared URL synthesis (deterministic from (doc_id, lang,
    * source); variant-axis rationale at the q146 key). */
  private[graft] def rawUrl(d: Column, lang: Column,
      source: Column): Column = concat(
    lit("https://"),
    when(d % 7 === 0, concat(lit("WWW."), upper(source),
        lit(".Example.COM")))
      .otherwise(concat(lit("www."), source, lit(".example.com"))),
    // path rides %17 (params ride %5): the canonical key space
    // (source, lang, d mod 85) sits near corpus cardinality, so q155's
    // ingest batch mixes SEEN and NEW resources at every fixture scale
    // (13/27 at sf0.001, 454/46 at sf0.1) — both crawl-frontier
    // branches run under the gate
    lit("/"), lang, lit("/p"), (d % 17).cast("string"),
    when(d % 2 === 0,
      concat(lit("?b="), ((d % 5) + 1).cast("string"),
        lit("&a="), ((d % 5) * 2).cast("string")))
      .otherwise(concat(lit("?a="), ((d % 5) * 2).cast("string"),
        lit("&b="), ((d % 5) + 1).cast("string"))),
    when(d % 3 === 0, lit("&utm_source=feed")).otherwise(lit("")),
    when(d % 5 === 0, lit("#sec")).otherwise(lit("")))

  /** q146/q155 shared canonicalizer: fragment strip → query parse →
    * utm_* filter → param sort → case-folded reassembly. */
  private[graft] def canonicalUrl(raw: Column): Column = {
    val noFrag = regexp_replace(raw, "#.*$", "")
    val hostPath = substring_index(noFrag, "?", 1)
    val query = when(instr(noFrag, "?") > 0,
      substring_index(noFrag, "?", -1)).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    concat(lower(hostPath),
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Build — or REUSE — q155's persisted canonical-URL count index
    * over the non-batch corpus ((doc_id DIV 20) % 10 ≠ 7), bucketed on the
    * canonical key. The q106 lifecycle applied to the URL family:
    * written once, grown per ingest via `Staging.appendBucketed` at
    * 100 TB, never re-shuffled (Bench times the build separately as
    * q155_index_build). */
  def urlCanonIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_url_canon_")
    val tab = "graft_url_canon_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    if (rebuild || !s.catalog.tableExists(tab)) {
      val canon = tWide(s, dir, "documents")
        .filter(expr("(doc_id DIV 20) % 10 != 7"))
        .select(canonicalUrl(rawUrl(col("doc_id"), col("lang"),
          col("source"))).as("canonical"))
        .groupBy("canonical").agg(count(lit(1)).as("prior_cnt"))
      graft.sources.Staging.storeBucketed(
        canon.repartition(8, col("canonical")), tab, Seq("canonical"), 8)
    }
    tab
  }

  /** Build — or REUSE — q190's persisted admission membership indexes:
    * the canonical-URL set and the md5 digest set of the serving corpus
    * (doc_id % 10 ≠ 7 — q190's split, distinct from q155's DIV-20
    * corpus, which is why these are separate tables), each bucketed on
    * its probe key. The q106 build-once/probe-many lifecycle: through
    * r11 the q190 stream rebuilt both sets inline per run
    * (`distinct().cache()`) — at 100 TB that is corpus-sized
    * driver-session state recomputed on every restart, while the band
    * index it probes alongside was already persisted. Now all three
    * membership structures share the discipline: written once, probed
    * bucket-aligned by every micro-batch, grown per ingest via
    * `Staging.appendBucketed` (Bench prices the build separately as
    * q190_index_build). */
  def admissionUrlIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_adm_url_")
    val tab = "graft_adm_url_" + graft.sources.Staging.sessionSuffix(s, dir)
    if (rebuild || !s.catalog.tableExists(tab)) {
      val canon = tWide(s, dir, "documents")
        .filter(col("doc_id") % 10 =!= 7)
        .select(canonicalUrl(rawUrl(col("doc_id"), col("lang"),
          col("source"))).as("canonical"))
        .distinct()
      graft.sources.Staging.storeBucketed(
        canon.repartition(8, col("canonical")), tab, Seq("canonical"), 8)
    }
    tab
  }

  /** The md5-digest half of [[admissionUrlIndex]]'s pair — see there. */
  def admissionMd5Index(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_adm_md5_")
    val tab = "graft_adm_md5_" + graft.sources.Staging.sessionSuffix(s, dir)
    if (rebuild || !s.catalog.tableExists(tab)) {
      val dig = tWide(s, dir, "documents")
        .filter(col("doc_id") % 10 =!= 7)
        .select(md5(col("text")).as("m"))
        .distinct()
      graft.sources.Staging.storeBucketed(
        dig.repartition(8, col("m")), tab, Seq("m"), 8)
    }
    tab
  }

  /** q154 core, one row per ≥-2-token doc: bigram count and mean
    * bigram surprisal in integer micro-nats under the fitted MLE
    * bigram LM (rationale and shape notes at the q154 key). */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    import graft.plans.GraftExpressions.word_bigrams
    val bg = docs.select(col("doc_id"), word_bigrams(col("text")).as("bg"))
    val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("cnt")).cache()
    val ctx = bgCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("cnt").as("ctx_cnt"))
    val lm = bgCounts
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(broadcast(ctx), "w1")
      .withColumn("x",
        -log(col("cnt").cast("double") / col("ctx_cnt")) * 1e6)
      .select(col("bg"),
        floor(col("x") + lit(1e-6)).cast("long").as("lnq"))
    bg.join(lm, "bg")
      .groupBy("doc_id")
      .agg(sum("lnq").as("surprisal"), count(lit(1)).as("nb"))
      .selectExpr("doc_id", "nb", "surprisal div nb AS ppx_micro")
  }

  /** q185 core: top-20 tokens by variance-to-mean dispersion over a
    * (doc_id, text) frame; all-integer formula at the q185 key. */
  def burstinessBoard(docs: DataFrame): DataFrame = {
    val n = docs.count()
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("tok")
      .agg(count(lit(1)).cast("long").as("df"),
        sum("c").cast("long").as("t"),
        sum(col("c") * col("c")).cast("long").as("s2"))
      .select(col("tok"), col("df"), col("t").as("total"),
        round((lit(n) * col("s2") - col("t") * col("t")).cast("double")
          / (lit(n) * col("t")), 6).as("vmr"))
      .orderBy(desc("vmr"), col("tok"))
      .limit(20)
  }

  /** q177/q189 shared core: the five-stage pipeline's surviving docs
    * as (doc_id, source, text) — URL-canonical dedup → exact-text
    * dedup → near-dup drops (both endpoints alive) → quality ≥ 0.5;
    * stage rationale at the q177 key. */
  def pipelineSurvivors(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select("doc_id", "lang", "source", "text")
    val w1 = Window.partitionBy("canonical")
    val s1 = docs
      .withColumn("canonical",
        canonicalUrl(rawUrl(col("doc_id"), col("lang"), col("source"))))
      .withColumn("k1", min("doc_id").over(w1))
      .filter(col("doc_id") === col("k1"))
    val w2 = Window.partitionBy("m")
    val s2 = s1
      .withColumn("m", md5(col("text")))
      .withColumn("k2", min("doc_id").over(w2))
      .filter(col("doc_id") === col("k2"))
      .select("doc_id", "source", "text")
    val alive = s2.select(col("doc_id"))
    val drops = graft.operators.LlmQueries.nearDupPairs(s, dir)
      .filter(col("match_cnt") >=
        graft.operators.LlmQueries.NearDupMinMatches)
      .select("doc_a", "doc_b")
      .join(alive.toDF("doc_a"), "doc_a")
      .join(alive.toDF("doc_b"), "doc_b")
      .select(col("doc_b").as("doc_id")).distinct()
    s2.join(drops, Seq("doc_id"), "left_anti")
      .filter(graft.functions.TextOps.qualityScore(col("text")) >= 0.5)
  }

  /** q184 core: log-log Zipf slope of the token rank/frequency curve
    * over a frame with a `text` column; quantize-then-OLS rationale at
    * the q184 key.
    *
    * Width discipline: x = ln(rank)·1e6 starts at 0 (rank 1), so the
    * q161 min-centering buys nothing here — instead the MOMENT partials
    * (Σxx, Σxy and the n·Σxy−Σx·Σy products) run in DECIMAL(38,0),
    * the q171 comment's prescription: int64 sums wrap silently past
    * ~600 vocab (n·Σxx ≤ V²·(ln V·1e6)²), while 38 digits hold to
    * V ≈ 1e9 — any real corpus. Each per-row product x·x ≤ (21e6)²
    * still fits long, so only the SUM widens; Σx and Σy stay int64
    * (≤ V·ln V·1e6, safe to ~4e11 vocab) but their cross product
    * widens to decimal before multiplying. The DuckDB twin gets the
    * identical width for free: its integer sum() already returns
    * HUGEINT (int128), with explicit HUGEINT casts on the products.
    * Both engines then make ONE double from the same exact integer —
    * int→double rounding is IEEE-identical. ZipfLargeVocabSpec pins
    * the >600-vocab case the fixtures (31 tokens) never exercise. */
  def zipfFit(docs: DataFrame): DataFrame = {
    // TWO-PHASE RANK (r22): the old row_number over
    // Window.orderBy(desc(c), tok) ranked the FULL vocabulary in one
    // partition — the last softly-bounded global window in a declared
    // path (vocab can reach 10⁸+ tokens at corpus scale). rank(tok)
    // decomposes exactly: rank = (# tokens with a strictly higher
    // count) + row_number among the SAME count ordered by tok. The
    // offset table has one row per DISTINCT count value — a multiset of
    // V positive counts summing to N tokens has ≤ √(2N) distinct values
    // (distinct values sum ≥ 1+2+…+k), so the one remaining
    // single-partition window runs over an O(√N)-bounded two-long frame
    // instead of the vocabulary; the per-token work is a c-partitioned
    // window sharing its exchange with the offset attach join. Ranks —
    // and therefore x, y and the fit — are bit-identical: the (desc c,
    // asc tok) order is total (tok is distinct post-groupBy) and the
    // decomposition re-derives the same positions.
    val freq = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val wOff = Window.orderBy(desc("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = freq.groupBy("c").agg(count(lit(1)).as("nc"))
      .withColumn("off", coalesce(sum("nc").over(wOff), lit(0L)))
      .select("c", "off")
    val pts = freq.join(off, "c")
      .withColumn("rank", (col("off") + row_number()
        .over(Window.partitionBy("c").orderBy("tok"))).cast("long"))
      .select(
        floor(log(col("rank").cast("double")) * 1e6 + lit(1e-6))
          .cast("long").as("x"),
        floor(log(col("c").cast("double")) * 1e6 + lit(1e-6))
          .cast("long").as("y"))
    pts.agg(count(lit(1)).as("n"),
        sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .filter(col("n") * col("sxx")
        - col("sx").cast("decimal(38,0)") * col("sx") > 0)
      .withColumn("slope",
        (col("n") * col("sxy")
          - col("sx").cast("decimal(38,0)") * col("sy")).cast("double")
          / (col("n") * col("sxx")
            - col("sx").cast("decimal(38,0)") * col("sx")).cast("double"))
      .select(col("n").cast("long").as("vocab"),
        round(col("slope"), 6).as("zipf_slope"),
        round((col("sy").cast("double")
          - col("slope") * col("sx")) / col("n") / 1e6, 6)
          .as("ln_c_intercept"))
  }

  /** q172 core: per-source Shannon token entropy in integer micro-nats
    * over a (source, text) frame; quantize-then-sum rationale at the
    * q172 key. */
  def entropyBySource(docs: DataFrame): DataFrame = {
    val cell = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    cell.groupBy("source")
      .agg(sum("c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("vocab"),
        sum(col("c") *
          floor(log(col("c").cast("double")) * 1e6 + lit(1e-6))
            .cast("long")).cast("long").as("s"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        (floor(log(col("n_tokens").cast("double")) * 1e6 + lit(1e-6))
          .cast("long")
          - expr("s div n_tokens")).as("h_micro"))
      .orderBy("source")
  }

  /** q166 core: top-20 source-vs-rest G² keyness board over a
    * (source, text) frame; rationale, contingency construction and the
    * int64 bound at the q166 key. */
  def keynessBoard(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val cell = toks.groupBy("source", "tok")
      .agg(count(lit(1)).as("a")).cache()
    val st = cell.groupBy("source").agg(sum("a").cast("long").as("st"))
    val tt = cell.groupBy("tok").agg(sum("a").cast("long").as("tt"))
    val n = cell.agg(sum("a").cast("long").as("n"))
    def term(o: Column, m1: Column, m2: Column): Column =
      when(o > 0, o.cast("double")
        * log((o * col("n")).cast("double") / (m1 * m2))).otherwise(lit(0.0))
    cell.join(broadcast(st), "source").join(broadcast(tt), "tok")
      .crossJoin(broadcast(n))
      .withColumn("b", col("tt") - col("a"))
      .withColumn("c", col("st") - col("a"))
      .withColumn("d", col("n") - col("tt") - col("st") + col("a"))
      .withColumn("g2",
        (term(col("a"), col("st"), col("tt"))
          + term(col("b"), col("n") - col("st"), col("tt"))
          + term(col("c"), col("st"), col("n") - col("tt"))
          + term(col("d"), col("n") - col("st"), col("n") - col("tt")))
          * 2.0)
      .select(col("source"), col("tok"), col("a").as("n_in_source"),
        floor(col("g2") * 1e6 + lit(1e-6)).cast("long").as("g2_micro"))
      .orderBy(desc("g2_micro"), col("source"), col("tok"))
      .limit(20)
  }

  /** q165 core: ed ≤ 1 pairs over the DISTINCT titles of a
    * (doc_id, title) frame via symmetric-delete blocking + exact
    * levenshtein verify; rationale and exactness proof at the q165
    * key. */
  def fuzzyTitlePairs(titles: DataFrame): DataFrame = {
    val d = titles.groupBy("title").agg(count(lit(1)).as("n_docs")).cache()
    val keys = d.select(col("title"),
      explode(array_distinct(concat(array(col("title")),
        transform(sequence(lit(1), length(col("title"))),
          i => concat(col("title").substr(lit(1), i - 1),
            col("title").substr(i + 1, length(col("title")))))))).as("k"))
    val ka = keys.toDF("title_a", "k")
    val kb = keys.toDF("title_b", "k2")
    ka.join(kb, col("k") === col("k2") && col("title_a") < col("title_b"))
      .select("title_a", "title_b").distinct()
      .filter(levenshtein(col("title_a"), col("title_b")) <= 1)
      .withColumn("dist",
        levenshtein(col("title_a"), col("title_b")).cast("long"))
      .join(d.select(col("title").as("title_a"), col("n_docs").as("n_docs_a")), "title_a")
      .join(d.select(col("title").as("title_b"), col("n_docs").as("n_docs_b")), "title_b")
      .select("title_a", "title_b", "dist", "n_docs_a", "n_docs_b")
      .orderBy("title_a", "title_b")
  }

  /** q159 core: the top-20 PMI collocation board over a (doc_id, text)
    * frame — counts, marginals, one-ln micro-nat score; rationale and
    * shape notes at the q159 key. */
  def pmiBoard(docs: DataFrame): DataFrame = {
    import graft.plans.GraftExpressions.word_bigrams
    val bc = docs.select(word_bigrams(col("text")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val uni = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
    val tot = bc.agg(sum("cb").cast("long").as("n_bi"))
      .crossJoin(uni.agg(sum("cu").cast("long").as("n_uni")))
    bc.filter(col("cb") >= 5)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(broadcast(uni.select(col("tok").as("w1"), col("cu").as("c1"))), "w1")
      .join(broadcast(uni.select(col("tok").as("w2"), col("cu").as("c2"))), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("x",
        log(col("cb").cast("double") * col("n_uni") * col("n_uni")
          / (col("n_bi").cast("double") * col("c1") * col("c2"))) * 1e6)
      .select(col("bg"), col("cb").as("pair_cnt"), col("c1"), col("c2"),
        floor(col("x") + lit(1e-6)).cast("long").as("pmi_micro"))
      .orderBy(desc("pmi_micro"), col("bg"))
      .limit(20)
  }

  /** Heavy-hitters pass 2, shared by q92 (batch pass 1) and q102
    * (streaming pass 1): exact recount of the token stream restricted
    * to the broadcast candidate summary, then the real threshold.
    * One definition so the two keys cannot silently diverge from each
    * other or from their shared oracle. */
  private def exactRecount(toks: DataFrame, pass1: DataFrame): DataFrame =
    toks.crossJoin(broadcast(pass1))
      .filter(array_contains(col("cand"), col("tok")))
      .groupBy("tok", "n")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n") / 32.0)
      .select(col("tok"), col("cnt"))
      .orderBy("tok")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // URL canonicalization + dedup — the first curation step of any
    // web-crawl corpus: the same resource arrives under host-case
    // variants, shuffled query-param order, utm_* tracking params, and
    // #fragments; crawl dedup keys on the CANONICAL form. The fixture
    // corpus carries no URL column, so each doc synthesizes one
    // deterministically from (doc_id, lang, source) — the q124/q115
    // discipline: the INPUT is replayable arithmetic, the MACHINERY
    // (fragment strip, query parse, tracking-param filter, param sort,
    // case fold, reassembly, group-dedup) is the real thing, all
    // array/string built-ins. Variant axes (case %7, param order %2,
    // utm %3, fragment %5) are coprime to the canonical key's %5 id
    // class, so every canonical group mixes raw variants — a broken
    // canonicalizer can't silently pass. Narrow per-row work + one
    // canonical-key groupBy: the 100 TB shape is a single shuffle on
    // the dedup key, exactly like q43.
    "q146_url_dedup" -> { (s, dir) =>
      val raw = rawUrl(col("doc_id"), col("lang"), col("source"))
      tWide(s, dir, "documents")
        .select(col("doc_id"), raw.as("raw_url"),
          canonicalUrl(raw).as("canonical"))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("raw_url")).as("n_raw_variants"),
          min(col("doc_id")).as("first_seen"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy("canonical")
    },

    // Incremental URL dedup against the PERSISTED canonical index —
    // the q106/q109 serving discipline applied to the crawl-frontier
    // question "have we fetched this resource before": corpus
    // canonical counts are built once, bucketed on the canonical key;
    // a new ingest batch ((doc_id DIV 20) % 10 = 7 — the split rides a
    // HIGHER digit than the fixtures' source = doc_id % 20 encoding, so
    // every batch crosses all sources and its canonicals genuinely
    // collide with the corpus; a %10 split would alias the source
    // column and flag everything new) canonicalizes itself
    // per row and left-joins the index — only the SMALL batch side
    // shuffles, the bucketed corpus scan never does. Each batch URL
    // reports its prior corpus count and a 0/1 novelty flag (the
    // crawl-frontier admit decision).
    "q155_url_dedup_incremental" -> { (s, dir) =>
      val corpus = s.table(urlCanonIndex(s, dir))
      val batch = tWide(s, dir, "documents")
        .filter(expr("(doc_id DIV 20) % 10 = 7"))
        .select(col("doc_id"), canonicalUrl(rawUrl(col("doc_id"),
          col("lang"), col("source"))).as("canonical"))
      batch.join(corpus, Seq("canonical"), "left_outer")
        .select(col("doc_id"), col("canonical"),
          coalesce(col("prior_cnt"), lit(0L)).as("prior_cnt"),
          when(col("prior_cnt").isNull, lit(1L)).otherwise(lit(0L))
            .as("is_new"))
        .orderBy("doc_id")
    },

    // Overlapping token-window chunking: one row per (doc, window).
    // sequence() materializes the window starts, explode unrolls them,
    // slice takes the window — all codegen'd, no UDF, no shuffle.
    "q91_chunk_docs" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1), greatest(size(col("toks")), lit(1)),
            lit(ChunkStride))).as("st"))
        .select(
          col("doc_id"),
          expr(s"CAST((st - 1) DIV $ChunkStride AS BIGINT)").as("chunk_id"),
          size(slice(col("toks"), col("st"), lit(ChunkWidth)))
            .cast("long").as("n_chunk_tokens"),
          array_join(slice(col("toks"), col("st"), lit(ChunkWidth)), " ")
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },

    // Two-pass exact heavy hitters over the token stream.
    // Pass 1: one MG summary (candidates + exact row tally n).
    // Pass 2: exact recount restricted to the broadcast candidates,
    // then the real threshold cnt > n/32. MG guarantees candidates ⊇
    // every item above n/65, so nothing above n/32 can be missed and
    // the exact recount discards any false positives: output ≡ oracle.
    "q92_heavy_hitters" -> { (s, dir) =>
      val toks = tWide(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val pass1 = toks.select(misra_gries(col("tok"), MgCapacity).as("s"))
        .select(col("s.cand").as("cand"), col("s.n").as("n"))
      exactRecount(toks, pass1)
    },

    // BM25 (Robertson/Sparck Jones) document ranking for a fixed term
    // set. Per-term partial scores are summed in a FIXED order (one
    // conditional-agg column per term) so the float result is
    // bit-reproducible against the oracle before rounding.
    "q93_bm25" -> { (s, dir) =>
      bm25PerDoc(tWide(s, dir, "documents"))
        .orderBy(desc("bm25"), col("doc_id"))
        .limit(20)
    },

    // HYBRID RETRIEVAL FUSION — reciprocal-rank fusion (RRF, k = 60) of
    // the two ranking modalities the engine serves separately: q93's
    // BM25 lexical ranking and a dense cosine ranking against a fixed
    // query embedding (vec_id 0; doc_id = vec_id in the fixtures). RRF
    // is the production hybrid-search combiner precisely because it
    // fuses INTEGER RANKS, not incomparable scores — which also makes
    // it deterministic cross-engine for free: 1/(k+r) over int ranks is
    // one fp expression, with no score normalization to disagree on.
    // Scale: each arm ends in a distributed top-50
    // (TakeOrderedAndProject — never a single-partition global window);
    // rank attachment is a row_number over the already-LIMITed ≤50-row
    // frame (the bounded-window warning is intentional and harmless
    // there); the fusion join touches ≤ 100 rows. A missing arm
    // contributes 0 (standard RRF over the union of lists).
    "q195_rrf_fusion" -> { (s, dir) =>
      import graft.plans.GraftExpressions.seq_dot
      val k = 60
      val txt = bm25PerDoc(tWide(s, dir, "documents"))
        .orderBy(desc("bm25"), col("doc_id")).limit(50)
        .withColumn("r_txt", row_number()
          .over(Window.orderBy(desc("bm25"), col("doc_id"))).cast("long"))
        .select("doc_id", "r_txt")
      val emb = tWide(s, dir, "embeddings")
        .withColumn("nrm", graft.functions.VectorOps.l2Norm(col("embedding")))
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("nrm").as("qn"))
      val vec = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          graft.functions.VectorOps.cosinePre(
            seq_dot(col("qe"), col("embedding")), col("qn"), col("nrm"))
            .as("sim"))
        .filter(col("sim").isNotNull)
        .orderBy(desc("sim"), col("doc_id")).limit(50)
        .withColumn("r_vec", row_number()
          .over(Window.orderBy(desc("sim"), col("doc_id"))).cast("long"))
        .select("doc_id", "r_vec")
      // full-outer as union + groupBy (r22): each doc_id appears at most
      // ONCE per arm (both arms are row_number'd LIMIT frames), so
      // max() recovers exactly the full-outer's per-side value-or-null —
      // identical rows, but the plan is one hash agg over ≤100 rows
      // instead of the last SortMergeJoin in the inventory (BHJ cannot
      // do full-outer, so the join form always sorted both arms).
      txt.select(col("doc_id"), col("r_txt"),
          lit(null).cast("long").as("r_vec"))
        .unionByName(vec.select(col("doc_id"),
          lit(null).cast("long").as("r_txt"), col("r_vec")))
        .groupBy("doc_id")
        .agg(max("r_txt").as("r_txt"), max("r_vec").as("r_vec"))
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(k) + col("r_txt")), lit(0.0))
            + coalesce(lit(1.0) / (lit(k) + col("r_vec")), lit(0.0)))
        .orderBy(desc("rrf"), col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("r_txt"), col("r_vec"),
          round(col("rrf"), 6).as("rrf"))
    },

    // DSIR IMPORTANCE WEIGHTS — data selection via importance
    // resampling over a HASHED n-gram feature space (the public DSIR
    // recipe: score each raw document by how much likelier its
    // unigram+bigram profile is under the TARGET domain than under the
    // raw corpus, then resample by weight). Target here is lang = 'en';
    // w(d) = Σ_g λ(h(g)) over the doc's gram INSTANCES, with λ(h) =
    // ln(p_tgt(h) / p_raw(h)) under Laplace smoothing on the fixed
    // V-bucket hashed vocabulary. Scale (100 TB): the feature space is
    // FIXED at V = 4096 buckets, so the λ table is bucket-count-sized
    // and broadcasts; the corpus makes exactly two linear gram passes
    // (one bounded-key count agg — map-side combinable — and one
    // score-join + per-doc sum whose shuffle key is doc_id), and the
    // final cut is a distributed TakeOrderedAndProject top-50. No
    // corpus-sized build is cached or collected. Determinism: λ is
    // quantized to int64 micro-nats per DISTINCT bucket (floor(ln·1e6
    // + 1e-6), the quantize-then-sum discipline) so per-doc weights
    // are exact integer sums; the ln argument is a ratio of exact
    // int64 products, each ≤ ~1e14 at sf1 (double-exact below 2^53,
    // headroom to ~3e7-gram targets; past that, split the ln).
    "q198_dsir_weight" -> { (s, dir) =>
      val docs = tWide(s, dir, "documents")
      val counts = dsirCounts(dsirGrams(docs))
      // corpus totals off the bounded V-row count table — metadata-scale
      val tot = counts
        .agg(sum("cr").cast("long"), sum("ct").cast("long")).head()
      val lam = dsirLambda(counts, tot.getLong(0), tot.getLong(1))
      val perDoc = dsirGrams(docs).join(broadcast(lam), "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum("q").as("w_scaled"))
      dsirBoard(docs, perDoc)
    },

    // DSIR SCORING WITH FROZEN WEIGHTS — the incremental production
    // shape of q198 (the q106/q113/q155 delta-vs-index discipline
    // applied to importance weighting): the standing corpus
    // (doc_id % 10 ≠ 7) trains the λ table once; the ARRIVING batch
    // (doc_id % 10 = 7) is scored with those weights FROZEN — batch
    // work is delta-linear, the corpus is never re-scanned per batch.
    // λ is built over the full V-bucket SPINE, so a feature the corpus
    // never saw resolves to the smoothed default ln((Nr+V)/(Nt+V)) as
    // a VALUE, not a join miss — the one semantic that q198 (which
    // only ever scores counted grams) can't exercise. Same quantized
    // micro-nat sums, same bounded broadcast, same top-50 cut over the
    // batch.
    "q204_dsir_score_delta" -> { (s, dir) =>
      val docs = tWide(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val delta = docs.filter(col("doc_id") % 10 === 7)
      val counts = dsirCounts(dsirGrams(corpus))
      val tot = counts
        .agg(sum("cr").cast("long"), sum("ct").cast("long")).head()
      val spine = docs.sparkSession.range(DsirBuckets).toDF("h")
        .join(counts, Seq("h"), "left").na.fill(0L, Seq("cr", "ct"))
      val lam = dsirLambda(spine, tot.getLong(0), tot.getLong(1))
      val perDoc = dsirGrams(delta).join(broadcast(lam), "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum("q").as("w_scaled"))
      dsirBoard(delta, perDoc)
    },

    // q92's candidate pass maintained INCREMENTALLY under the gate:
    // the corpus replays as two deterministic micro-batches (doc-id
    // parity split staged as mtime-ordered single files), a
    // complete-mode streaming aggregation carries the Misra–Gries
    // buffer in the state store across batches (the same mergeable-
    // summary property that makes it map-side combinable makes it
    // streaming-maintainable), foreachBatch overwrites the summary
    // each trigger, and the final streamed candidates feed q92's exact
    // batch recount. The MG guarantee is merge-order-free, so the
    // result must equal the one-shot oracle — continuous-monitoring
    // candidate generation with batch verification, end-to-end.
    "q102_stream_heavy_hitters" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val base = freshBase(s, dir, "q102")
      val src = stageBatches(s, base, Seq(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0)))
      val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val agg = stream
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy()
          .agg(misra_gries(col("tok"), MgCapacity).as("sm"))
          .select(col("sm.cand").as("cand"), col("sm.n").as("n"))
        val q = agg.writeStream.outputMode("complete")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            b.write.mode("overwrite").parquet(outDir)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      val pass1 = s.read.parquet(outDir)
      exactRecount(
        tWide(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok")),
        pass1)
    },

    // Unigram-LM perplexity quality filter — the statistical
    // complement to q51's heuristic score and the standard pretraining
    // "LM filter" shape: fit token log-probs on the corpus itself,
    // score each doc by its mean token surprisal, surface the top-20
    // outliers. Surprisal is QUANTIZED to integer micro-nats per token
    // (floor(-ln p × 1e6)) so the per-doc sum is exact long
    // arithmetic — order-free, no float-accumulation drift between
    // engines (the only doubles are |vocab| ln calls, not per-row
    // folds). Scale: one token-count agg (bounded vocab), the LM
    // broadcasts, per-doc scoring is a map-side-combinable sum.
    "q103_perplexity" -> { (s, dir) =>
      // TWO corpus passes on purpose — and both shuffles map-combine to
      // near-nothing (vocab-sized partials for the LM fit, doc-sized
      // partials for scoring). A one-pass variant via a (doc, tok)
      // term-frequency frame was tried in r7 and REVERTED on
      // measurement (0.76 → 1.19 s at sf0.1): tf ≈ 1 for most pairs,
      // so the pre-agg combined nothing and turned a cheap co-located
      // re-scan into a token-stream-sized shuffle. Scans are local and
      // columnar; shuffles are the network — trade accordingly.
      val toks = tWide(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      // vocab-scale cache: counts is read twice (total + lm); uncached,
      // each reference re-runs the corpus-scanning count agg
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .cache()
      val total = counts.agg(sum("cnt").cast("long").as("n"))
      // cross-engine floor guard: ln is only ~1-ulp accurate on each
      // engine, so a token whose -ln(p)·1e6 lands within an ulp of an
      // integer could floor differently between Spark and the oracle.
      // floor(x + 1e-6) — applied identically in the oracle SQL — moves
      // the cut point to n − 1e-6, a value no exact -ln(cnt/n)·1e6 sits
      // near, making the divergence boundary-rare (ulp-probability at
      // the single shifted cut, vs ulp-probability at every integer
      // unguarded). A snap-then-floor variant was tried first; it has
      // the SAME residual exposure but two risky boundaries per integer
      // (the window edges), so the single-cut form replaced it.
      val lm = counts
        .crossJoin(broadcast(total))
        .withColumn("x", -log(col("cnt").cast("double") / col("n")) * 1e6)
        .select(col("tok"),
          floor(col("x") + lit(1e-6)).cast("long").as("lnq"))
      toks.join(broadcast(lm), "tok")
        .groupBy("doc_id")
        .agg(sum("lnq").as("surprisal"), count(lit(1)).as("nt"))
        .selectExpr("doc_id", "nt",
          "surprisal div nt AS ppx_micro") // mean surprisal, micro-nats
        .orderBy(desc("ppx_micro"), col("doc_id"))
        .limit(20)
    },

    // BIGRAM-LM surprisal — the coherence complement of q103's unigram
    // rarity: a doc whose words are individually common but locally
    // scrambled scores high here and low there; real pipelines filter
    // on both. MLE P(w2|w1) = c(w1,w2)/c(w1), no smoothing needed —
    // scoring the fitting corpus means every scored bigram has c ≥ 1.
    // Shapes: bigrams come from the NATIVE WordBigrams generator
    // (q49's — one row per bigram straight off the string); bigram
    // counts map-side combine; CONTEXT counts derive from the bigram
    // table by a vocab-sized agg on w1 (never a corpus re-scan) and
    // broadcast back (vocab-bounded); the scoring join keys on the
    // bigram — a plain hash join, NOT a broadcast: unlike q103's vocab
    // LM the bigram table outgrows a broadcast at corpus scale.
    // Surprisal in integer micro-nats with q103's floor(x + 1e-6)
    // cross-engine ulp guard (rationale at q103). Docs under 2 tokens
    // have no bigrams and drop out on both engines.
    "q154_bigram_surprisal" -> { (s, dir) =>
      bigramSurprisal(tWide(s, dir, "documents"))
        .orderBy(desc("ppx_micro"), col("doc_id"))
        .limit(20)
    },

    // PMI COLLOCATIONS — the corpus-analysis complement of q119's raw
    // pair counts: rank bigrams by pointwise mutual information
    // ln(p(w1w2)/(p(w1)p(w2))), the standard collocation-extraction
    // score (Church & Hanks 1990) a tokenizer/phrase-mining pass runs
    // before freezing a vocabulary. Raw counts (q119) surface frequent
    // pairs of frequent words; PMI normalizes by the unigram marginals
    // and surfaces pairs that co-occur MORE than their words' rates
    // predict. Shapes: bigrams from the native WordBigrams generator
    // (map-side-combined count), unigram marginals are a VOCAB-bounded
    // agg broadcast back (the q103 vocab-LM precedent — w1 and w2
    // attach via two broadcast joins, no corpus re-shuffle), corpus
    // totals ride a 1-row broadcast crossJoin (the q130 shape). The
    // score is ONE ln on a ratio assembled left-to-right from exact
    // longs — identical IEEE doubles on both engines — quantized to
    // integer micro-nats with q103's floor(x + 1e-6) ulp guard, so the
    // top-20 ordering compares longs, never raw doubles. Min support
    // cb ≥ 5 keeps the classic low-count PMI blowup out of the board.
    "q159_pmi_collocations" -> { (s, dir) =>
      pmiBoard(tWide(s, dir, "documents"))
    },

    // TOKEN ENTROPY per source — Shannon H = ln(N) − Σ(c/N)·ln(c) in
    // integer micro-nats: the DIVERSITY audit that catches a feed
    // collapsing to boilerplate (H falls toward 0) or template spam
    // (vocab stays flat while volume grows) before any dedup pass even
    // runs. Determinism discipline: the per-cell FP term c·ln(c) would
    // sum in shuffle order, so each DISTINCT count quantizes FIRST
    // (floor(ln(c)·1e6 + 1e-6), q103's guard) and the weighted sum
    // S = Σ c·lnq(c) is an exact LONG; H_micro = lnq(N) − S div N is
    // pure integer arithmetic off exact longs. One vocab-bounded cell
    // count, one bounded re-agg — map-combinable throughout.
    "q172_entropy" -> { (s, dir) =>
      entropyBySource(tWide(s, dir, "documents"))
    },

    // CONJUNCTIVE RETRIEVAL — "docs containing ALL query terms", the
    // AND-semantics search q93's BM25 ranks and q96's index serves:
    // posting-list intersection expressed as one doc-keyed agg over
    // the term-matched token stream. The query set self-calibrates (3
    // globally most-frequent tokens, ties alphabetical) so the key has
    // no magic constants and stays non-degenerate at every scale.
    // Shapes: the |Q|-row query set BROADCASTS into a semi-filtering
    // join on the token stream (the q92/q98 bounded-candidate shape),
    // per-(doc, term) tf map-combines, and the all-terms test is
    // count(distinct-by-construction) = |Q| — never a per-term
    // self-join chain, whose plan would grow with |Q|.
    "q180_search_and" -> { (s, dir) =>
      val toks = tWide(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val q = toks.groupBy("tok").agg(count(lit(1)).as("tf_total"))
        .orderBy(desc("tf_total"), col("tok")).limit(3)
        .select("tok")
      toks.join(broadcast(q), "tok")
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          min("tf").cast("long").as("min_tf"),
          sum("tf").cast("long").as("sum_tf"))
        .filter(col("n_terms") === 3)
        .select("doc_id", "min_tf", "sum_tf")
        .orderBy("doc_id")
    },

    // THE FULL CURATION PIPELINE, end to end — the composition proof:
    // URL-canonical dedup (q146's rule) → exact-text dedup (q43's
    // min-id keeper) → near-dup survivor selection (q143's
    // lower-id-partner rule on q44's persisted pairs, restricted to
    // docs still alive) → quality gate (q51's 6-dp score ≥ 0.5) →
    // split assignment (q127's arithmetic); the output is the curated
    // corpus MANIFEST (split × source counts with id-sum content
    // pins), i.e. what a training run actually consumes. Every stage
    // reuses the gate-proven core of its standalone key, so the hash
    // match here certifies the COMPOSITION (stage interactions:
    // near-dup drops consider only pairs whose BOTH endpoints
    // survived the exact stages — the q152 discipline). Shapes are
    // the constituents': two min-over-window dedups on canonical/md5
    // keys, one anti-join against the pair-frame drops, a stateless
    // quality filter, pure-arithmetic splits.
    "q177_pipeline" -> { (s, dir) =>
      pipelineSurvivors(s, dir)
        .select(col("source"),
          graft.operators.CorpusQueries.splitOf(col("doc_id")).as("split"),
          col("doc_id"))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("split", "source")
    },

    // PACK THE CURATED CORPUS — the second composition key: q177's
    // survivors flow straight into q111's sequence packing, yielding
    // the per-source packing manifest of the corpus a training run
    // would ACTUALLY consume (packing the raw corpus, as q111 does,
    // over-counts every doc the pipeline drops). Same shapes as the
    // constituents: the pipeline's dedup windows + anti-join, then the
    // composite (source, shard) packing window — no new exchange
    // classes; the oracle splices the pipeline CTEs into the
    // PARAMETERIZED packing replay, one SQL source of truth for both.
    "q189_pack_curated" -> { (s, dir) =>
      packSequences(pipelineSurvivors(s, dir), PackShards)
        .groupBy("source")
        .agg(sum("n_docs").cast("long").as("n_docs"),
          sum("total_tokens").cast("long").as("total_tokens"),
          sum("n_seqs").cast("long").as("n_seqs"),
          sum("split_docs").cast("long").as("split_docs"))
        .orderBy("source")
    },

    // BURSTINESS — per-token variance-to-mean ratio of per-doc counts
    // (Church & Gale's dispersion): function words spread Poisson-like
    // (VMR ≈ 1), topical words cluster in few docs (VMR ≫ 1), and
    // boilerplate injected verbatim into a subset of docs lights up
    // brightest — a dedup-adjacent signal no frequency count shows.
    // All-integer until the last division: with T = total count, k
    // nonzero docs, N corpus docs, VMR = (N·Σc² − T²) / (N·T) — the
    // zero-count docs contribute nothing to Σc², so the per-token agg
    // touches only the docs that contain the token; both factors stay
    // exact int64 (N·Σc² < 2⁶³ holds while N·T² stays under ~9e18 —
    // per-token totals in the billions; beyond that, DECIMAL(38,0)
    // partials, same plan) and both engines divide identical longs
    // once.
    "q185_burstiness" -> { (s, dir) =>
      burstinessBoard(tWide(s, dir, "documents"))
    },

    // ZIPF FIT — the log-log rank/frequency slope of the token
    // distribution: natural text sits near −1, template spam and
    // synthetic vocabularies flatten or steepen it, so the exponent is
    // the one-number "does this corpus look like language" diagnostic
    // (and a drift alarm when tracked per ingest). Two established
    // disciplines compose: ln(rank) and ln(count) QUANTIZE to integer
    // micro-nats first (q103's floor guard — one ln per vocab row,
    // never a summed FP), then the OLS slope comes from q161's exact
    // int64 sufficient statistics over those quantized coordinates.
    // Rank is a global window over the VOCAB domain (vocab-bounded,
    // the q171 metadata-scale argument), ties broken by token.
    "q184_zipf_fit" -> { (s, dir) =>
      zipfFit(tWide(s, dir, "documents"))
    },

    // STREAMING ADMISSION CONTROL — the pipeline's ingest-time twin:
    // q177 curates the corpus in batch; THIS is the gate a crawler's
    // micro-batches hit on arrival, composed entirely from the
    // engine's probe primitives: canonical-URL seen-before (q146's
    // canonicalizer vs the corpus canonical set), exact-dup (md5 vs
    // corpus digests), near-dup (the q108 stateless per-row MinHash
    // probe against the persisted corpusBandIndex — no stream-side
    // shuffle), and the q51 quality gate; each doc gets ONE decision
    // by fixed priority (url_dup → exact_dup → near_dup → low_quality
    // → admit) and each batch writes its (batch_key, decision) census
    // idempotently (Staging.storeBatch). All three membership
    // structures — canonical set, digest set, band index — are
    // PERSISTED bucketed tables (admissionUrlIndex/admissionMd5Index/
    // corpusBandIndex) stream-static joined every batch: nothing
    // corpus-sized is rebuilt per run or held as session state.
    // Batches identify by CONTENT (min doc_id % 20, the q174
    // discipline) so the oracle replays each by membership — streamed
    // ≡ one-shot per batch.
    "q190_stream_admission" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      import graft.operators.LlmQueries
      val base = freshBase(s, dir, "q190")
      val docs = t(s, dir, "documents")
        .select("doc_id", "lang", "source", "text")
      // ALL THREE membership structures come from persisted bucketed
      // indexes (build-once/probe-many — see admissionUrlIndex): the
      // batch path never recomputes or re-shuffles corpus-sized state
      val cCorp = s.table(admissionUrlIndex(s, dir))
      val dCorp = s.table(admissionMd5Index(s, dir))
      val bandIdx = s.table(LlmQueries.corpusBandIndex(s, dir))
        .toDF("corpus_doc", "sig_c", "bk")
      val batchDocs = docs.filter(col("doc_id") % 10 === 7)
      val src = stageBatches(s, base, Seq(
        batchDocs.filter(col("doc_id") % 20 === 7),
        batchDocs.filter(col("doc_id") % 20 === 17)))
      val outDir = s"$base/out"
      graft.Tables.withShufflePartitions(s, 8) {
        val stream = s.readStream
          .schema("doc_id BIGINT, lang STRING, source STRING, text STRING")
          .option("maxFilesPerTrigger", 1).parquet(src)
        val q = stream.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            batch.persist()
            // finally: a storeBatch failure (e.g. the loud batch-key
            // collision guard) must not leak the persisted batch into
            // the retrying stream
            try {
              if (batch.count() > 0) {
                val key = batch
                  .agg(min(pmod(col("doc_id"), lit(20L)))).head().getLong(0)
                val sig = batch
                  .withColumn("arr", transform(
                    LlmQueries.shingles(col("text"), 3),
                    sg => LlmQueries.polyHash(sg)))
                  .filter(size(col("arr")) > 0)
                  .select(col("doc_id"),
                    graft.plans.MinHashAgg.minhash_code(col("arr")).as("sig"))
                val nd = LlmQueries.bandKeys(sig)
                  .toDF("batch_doc", "sig_b", "bk_b")
                  .join(bandIdx, col("bk") === col("bk_b"))
                  .filter(graft.plans.GraftExpressions.zip_equal(
                    col("sig_b"), col("sig_c")) >= LlmQueries.NearDupMinMatches)
                  .select(col("batch_doc").as("doc_id")).distinct()
                  .withColumn("is_nd", lit(1))
                // idempotent sink: the content-derived key is stable
                // across replays, so a retried batch overwrites its own
                // census rows instead of double-appending them
                graft.sources.Staging.storeBatch(
                  batch
                    .withColumn("canonical",
                      canonicalUrl(rawUrl(col("doc_id"), col("lang"),
                        col("source"))))
                    .withColumn("m", md5(col("text")))
                    .join(cCorp.withColumn("is_url", lit(1)),
                      Seq("canonical"), "left")
                    .join(dCorp.withColumn("is_ex", lit(1)), Seq("m"), "left")
                    .join(nd, Seq("doc_id"), "left")
                    .withColumn("decision",
                      when(col("is_url").isNotNull, "url_dup")
                        .when(col("is_ex").isNotNull, "exact_dup")
                        .when(col("is_nd").isNotNull, "near_dup")
                        .when(graft.functions.TextOps.qualityScore(col("text"))
                          < 0.5, "low_quality")
                        .otherwise("admit"))
                    .groupBy("decision")
                    .agg(count(lit(1)).as("n_docs"),
                      sum("doc_id").cast("long").as("id_sum"))
                    .select(lit(key).as("batch_key"), col("decision"),
                      col("n_docs"), col("id_sum")),
                  outDir, key, bid)
              }
            } finally batch.unpersist()
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      graft.sources.Staging.readBatchSink(s, outDir,
          "batch_key BIGINT, decision STRING, n_docs BIGINT, id_sum BIGINT")
        .orderBy("batch_key", "decision")
    },

    // VOCABULARY OVERLAP — pairwise Jaccard of source vocabularies:
    // the lexical-level sibling of q151's content syndication (two
    // feeds can share a vocabulary without sharing documents — same
    // domain, different articles — and a TRANSLATED mirror shares
    // documents but not vocabulary; reading both matrices apart is
    // the diagnosis). Exact integers throughout: distinct (source,
    // token) cells once, pairwise intersections from ONE token-keyed
    // self-join (per-token fan-out ≤ |sources|, a bounded dimension),
    // union by inclusion–exclusion from broadcast vocab sizes.
    "q176_vocab_overlap" -> { (s, dir) =>
      val cells = tWide(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .distinct().cache()
      val sizes = cells.groupBy("source").agg(count(lit(1)).as("v"))
      val ca = cells.toDF("source_a", "tok")
      val cb = cells.toDF("source_b", "tok2")
      ca.join(cb, col("tok") === col("tok2") &&
          col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.toDF("source_a", "va")), "source_a")
        .join(broadcast(sizes.toDF("source_b", "vb")), "source_b")
        .select(col("source_a"), col("source_b"),
          col("inter").cast("long").as("inter"),
          (col("va") + col("vb") - col("inter")).cast("long").as("uni"),
          round(col("inter").cast("double")
            / (col("va") + col("vb") - col("inter")), 6).as("jaccard"))
        .orderBy("source_a", "source_b")
    },

    // KEYNESS — Dunning's log-likelihood G² (1993), source-vs-rest:
    // which tokens are OVER-represented in a source relative to the
    // remaining corpus. The corpus-comparison complement of q159's PMI
    // (PMI scores adjacency inside the text; keyness scores a token
    // against a CONTRAST corpus — the domain-signature / contamination
    // -screening view of the same count infrastructure). Each
    // (source, token) cell builds its 2×2 contingency table from exact
    // long marginals (cell counts once, source totals and vocab totals
    // re-agg from the cells and broadcast — never a corpus re-scan),
    // and each G² term is one ln on a ratio of exact integer products
    // (o·N vs margin·margin — inside int64 for any corpus where both
    // factors stay under ~3e9 tokens), summed in fixed textual order
    // and quantized to micro-units so the top-20 orders on longs.
    // Zero cells contribute 0 by the x·ln(x)→0 convention (CASE o>0,
    // identical on both engines).
    "q166_keyness" -> { (s, dir) =>
      keynessBoard(tWide(s, dir, "documents"))
    },

    // FUZZY string join — edit-distance ≤ 1 matching on short keys
    // (titles), the entity-resolution primitive behind near-duplicate
    // title/product/name merging. Blocking is SYMMETRIC DELETE
    // (SymSpell): each DISTINCT title emits itself plus its
    // delete-one-char neighborhood; two strings within ed ≤ 1 provably
    // share a key (substitution → delete the differing position from
    // both; insertion/deletion → the shorter string IS a delete of the
    // longer), so the equi-join on keys is an EXACT candidate set and
    // per-row fan-out is len+1 — linear, never all-pairs. Titles
    // synthesize deterministically from the fixture (first 3 tokens;
    // %7=2 appends a char, %7=4 substitutes the head — the q124/q146
    // synthesis discipline) so insertion- and substitution-shaped
    // matches both exist. The join runs on the DISTINCT-title domain
    // (doc multiplicity re-attaches after — a doc-level self-join
    // would square every hot title); exact `levenshtein` verifies
    // candidates, and both engines' implementations agree on ints.
    "q165_fuzzy_title_join" -> { (s, dir) =>
      val t0 = concat_ws(" ", slice(split(col("text"), " "), 1, 3))
      fuzzyTitlePairs(t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 2, concat(t0, lit("x")))
            .when(col("doc_id") % 7 === 4,
              concat(lit("q"), t0.substr(lit(2), length(t0))))
            .otherwise(t0).as("title")))
    },

    // Paragraph-granularity dedup audit (the C4/RefinedWeb "remove
    // documents that are mostly duplicated lines" step): each doc
    // splits into non-overlapping SegWidth-token segments (the
    // fixtures carry no newlines, so fixed windows stand in for
    // lines), segments fingerprint by md5, and a doc's duplication
    // ratio is the share of its segments whose fingerprint occurs
    // more than once ANYWHERE in the corpus (same-doc repeats count —
    // boilerplate inside one doc is still boilerplate). Surfaces the
    // top-20 most-duplicated docs, q82's presentation shape.
    //
    // Scale: the fingerprint scan runs ONCE — corpus-wide occurrence
    // counts come from a count() window over the h clustering, so the
    // segment stream shuffles once onto h and once back onto doc_id
    // (both bounded payloads: only 32-char md5s ever move; nothing is
    // quadratic). The agg-then-join form this replaces evaluated the
    // scan+md5 pipeline twice (both sides of the self-join) and paid a
    // third exchange for the join's count side.
    "q110_segment_dedup" -> { (s, dir) =>
      segmentHashes(tWide(s, dir, "documents"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).cast("long")
            .as("n_dup_segs"))
        .withColumn("dup_ratio",
          round(col("n_dup_segs").cast("double") / col("n_segs"), 6))
        .orderBy(desc("dup_ratio"), col("doc_id"))
        .limit(20)
    },

    // Sequence packing — the final pretraining step: cut each (source,
    // shard) doc_id-ordered token stream into PackWindow-token training
    // sequences (see [[packSequences]]); report, per source, how many
    // sequences the shards yield and how many docs straddle a sequence
    // boundary (the packing-fragmentation metric that decides window
    // size vs doc-boundary attention masking).
    //
    // Scale: the window key is COMPOSITE (source, shard) — no reducer
    // ever sorts more than one shard of one source — and the per-source
    // roll-up exchanges only shard SUMMARY rows (shards × sources of
    // them, metadata-scale). The earlier per-source-window form is the
    // one this inventory refuses everywhere else: one reducer sorting a
    // whole source's 100 TB token stream.
    "q111_pack_sequences" -> { (s, dir) =>
      packSequences(t(s, dir, "documents"), PackShards)
        .groupBy("source")
        .agg(sum("n_docs").cast("long").as("n_docs"),
          sum("total_tokens").cast("long").as("total_tokens"),
          sum("n_seqs").cast("long").as("n_seqs"),
          sum("split_docs").cast("long").as("split_docs"))
        .orderBy("source")
    },

    // The per-shard packing detail q111 rolls up: one row per (source,
    // shard) — the manifest a packing job actually executes from (each
    // shard is one worker's independent stream). Same plan minus the
    // roll-up: one composite-key exchange, nothing global.
    "q112_pack_shards" -> { (s, dir) =>
      packSequences(t(s, dir, "documents"), PackShards)
        .orderBy("source", "shard")
    },

    // q110's INCREMENTAL twin — the paragraph-granularity member of the
    // streaming serving triad (q108 text bands, q109 vector bands,
    // q114 segments): new docs arrive as file-source micro-batches,
    // each row fingerprints its own segments STATELESSLY (explode +
    // md5 — a narrow map, no watermark, no state store), and the
    // segments stream-static LEFT join the persisted corpus
    // segment-count table (segCountIndex, bucketed on the digest). A
    // batch segment is duplicated iff it exists in the corpus at all —
    // the corpus excludes the batch, so cnt >= 1 is the q110 "occurs
    // elsewhere" test. Per-segment hits append to a parquet sink; the
    // read-back aggregates per doc. Oracle: q110's replay restricted to
    // batch-side docs vs the non-batch corpus — streaming ingest must
    // reproduce the one-shot batch answer bit-for-bit.
    "q114_stream_segment_dedup" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      val counts = s.table(segCountIndex(s, dir))
      val base = freshBase(s, dir, "q114")
      val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      val batchDocs = t(s, dir, "documents")
        .filter(col("doc_id") % 10 === 7).select("doc_id", "text")
      val src = stageBatches(s, base, Seq(
        batchDocs.filter(col("doc_id") % 20 === 7),
        batchDocs.filter(col("doc_id") % 20 === 17)))
      withShufflePartitions(s, 8) {
        val stream = s.readStream
          .schema("doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
        val hits = segmentHashes(stream)
          .join(counts, Seq("h"), "left_outer")
          .select(col("doc_id"), col("h"),
            when(col("cnt").isNotNull, 1L).otherwise(0L).as("dup"))
        val q = graft.streaming.StreamPipelines
          .writeParquetStream(hits, outDir, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum("dup").cast("long").as("n_dup_segs"))
        .withColumn("dup_ratio",
          round(col("n_dup_segs").cast("double") / col("n_segs"), 6))
        .orderBy(desc("dup_ratio"), col("doc_id"))
        .limit(20)
    },

    // Inverted index, PAGED: one row per (token, page) where page =
    // doc_id DIV PostingPageDocs, so every posting row — and every
    // aggregation buffer building one — holds at most PostingPageDocs
    // ids. The r6 shape (one collect_set row per token) was correct but
    // O(corpus docs) in a single row for a stopword token: the exact
    // buffer that OOMs an executor long before 100 TB. Lucene-style
    // segmented postings are the standard fix; readers stream a token's
    // pages in order (page is doc-id-major, so concatenation IS the
    // sorted full list).
    //
    // Token-level df/tf_total are a groupBy("tok") SUMMARY of the page
    // rows, shuffle-hash-joined back onto them — NOT a window over tok.
    // The r7 window gathered every page of a token onto one reducer and
    // SORTED them: for a stopword at 100 TB that is O(corpus/16) rows
    // through a single task's sort (degraded parallelism, the last
    // named scale-killer). The summary agg map-side-combines — reducers
    // see one partial per upstream task, so even a stopword key is
    // cheap — and the join back is hash, never a per-token sort. The
    // summary side is vocabulary-sized (one row per distinct token), so
    // it is NOT broadcast: a shuffled hash join keys both sides on tok.
    //
    // df stays size(plist)-derived, NOT countDistinct — the r6 rule: a
    // distinct aggregate alongside collect_set would trigger the
    // two-shuffle distinct rewrite. Exchanges: the (tok, page) build agg
    // (map-side combined, every partial ≤ page-bounded) reused across
    // both join inputs by ReuseExchange, plus one per join side to
    // co-locate on tok — every exchange moves only bounded-size rows
    // (pages ≤ PostingPageDocs ids; summaries are two longs).
    "q96_inverted_index" -> { (s, dir) =>
      val B = PostingPageDocs
      val pages = tWide(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), expr(s"doc_id DIV $B").as("page"))
        .agg(count(lit(1)).as("page_tf"),
          sort_array(collect_set(col("doc_id"))).as("plist"))
      val summary = pages.groupBy("tok")
        .agg(sum(size(col("plist")).cast("long")).as("df"),
          sum(col("page_tf")).as("tf_total"))
      pages.join(summary.hint("SHUFFLE_HASH"), Seq("tok"))
        .select(col("tok"), col("page"), col("df"), col("tf_total"),
          size(col("plist")).cast("long").as("page_df"),
          col("page_tf"),
          array_join(transform(col("plist"), _.cast("string")), ",")
            .as("postings"))
        .orderBy("tok", "page")
    },

    // Substring-level (overlapping-span) dedup — the exact-substring
    // discipline of "Deduplicating Training Data Makes Language Models
    // Better": every SpanWidth-token window at stride 1 is
    // fingerprinted, a span is duplicated iff its text occurs anywhere
    // else in the corpus (same rule as q110's segments, but overlap
    // catches shifted copies q110's aligned windows miss), and each doc
    // reports the fraction of its TOKENS covered by >= 1 duplicated
    // span — the number a span-removal pass would actually cut.
    //
    // Scale: spans are a narrow codegen map (explode + md5 — only
    // 32-char digests and int positions ever shuffle, never text). The
    // corpus-wide occurrence count is a groupBy("h") — map-side
    // combined, so a boilerplate span repeated 10^9 times costs one
    // partial per upstream task — SHUFFLE_HASH-joined back to the span
    // rows (the q96 de-skew shape: hash join streams a hot digest's
    // rows, no per-key sort, no per-key buffer). Coverage explodes dup
    // spans to positions (bounded W× blowup of dup spans only) and
    // counts distinct positions per doc — per-doc bounded.
    "q118_substring_dedup" -> { (s, dir) =>
      substringDedup(tWide(s, dir, "documents"))
        .orderBy(desc("cov_ratio"), col("doc_id"))
        .limit(20)
    },

    // Content-defined chunking + chunk-level dedup — the rsync/LBFS
    // discipline applied to training text: chunk boundaries fall where
    // a token's hash ≡ 0 mod CdcDivisor, so boundaries RE-SYNCHRONIZE
    // after an insertion (q118's positional spans all shift; CDC
    // chunks downstream of the next boundary token are identical) and
    // a doc is scored by the token fraction living in chunks whose
    // digest occurs elsewhere in the corpus.
    //
    // Scale: chunking is zero-shuffle narrow array compute per row
    // (the q91 discipline); only (doc_id, len, digest) rows ever
    // shuffle. Chunk-occurrence counts are a map-side-combined
    // groupBy("h") SHUFFLE_HASH-joined back (the q96/q118 de-skew
    // shape — a boilerplate chunk repeated 10^9 times never funnels
    // through one reducer), and the per-doc roll-up is doc-bounded.
    "q121_cdc_chunks" -> { (s, dir) =>
      cdcChunks(tWide(s, dir, "documents"))
        .orderBy(desc("dup_ratio"), col("doc_id"))
        .limit(20)
    },

    // Per-doc n-gram NOVELTY — the corpus-wide complement of q82's
    // WITHIN-doc repetition score: the fraction of a doc's distinct
    // 3-shingles that occur in NO other document. Low novelty marks
    // boilerplate/template mass that exact and near dedup both miss
    // (the doc pair is not a near-dup, but its building blocks are
    // corpus-wide clichés); the low tail is the curation review queue.
    // Scale: one shingle+hash pass (62-bit portable hashes — only 8-byte
    // keys ever shuffle), a map-combined groupBy("h") occurrence count
    // SHUFFLE_HASH-joined back (q118/q121's de-skew discipline — a
    // cliché shingle in 10^9 docs must not funnel through a sort-merge),
    // then a doc-bounded roll-up.
    "q131_ngram_novelty" -> { (s, dir) =>
      ngramNovelty(tWide(s, dir, "documents"))
        .orderBy(col("novelty"), col("doc_id"))
        .limit(20)
    },
  )

  /** q118 core, one row per doc with >= 1 span: span counts, duplicated-
    * span counts, and the distinct-token-position coverage of duplicated
    * spans (the fraction a span-removal pass would cut). Unordered —
    * the gated key applies its own presentation ORDER BY/LIMIT. */
  def substringDedup(docs: DataFrame): DataFrame = {
    val W = SpanWidth
    // Cached: spans feeds both the count agg and the join-back, and
    // marked feeds both per-doc aggs — without the caches the corpus
    // explode+md5 ran FOUR times (5 parquet scans; PlanProbe --audit).
    // One tokenize+hash pass of the corpus, materialized narrow
    // (doc_id, pos, digest), beats recompute at any scale.
    val spans = spanHashes(docs).cache()
    val counts = spans.groupBy("h").agg(count(lit(1)).as("cnt"))
    val marked = spans.join(counts.hint("SHUFFLE_HASH"), Seq("h"))
      .select(col("doc_id"), col("pos"),
        when(col("cnt") > 1, 1L).otherwise(0L).as("dup"))
      .cache()
    val per = marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum("dup").cast("long").as("n_dup_spans"))
    val cov = marked.filter(col("dup") === 1L)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(W - 1))).as("p"))
      .groupBy("doc_id")
      .agg(countDistinct(col("p")).as("n_cov_tokens"))
    val toklen = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    per.join(cov, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_cov_tokens"))
      .join(toklen, Seq("doc_id"))
      .withColumn("cov_ratio",
        round(col("n_cov_tokens").cast("double") / col("n_toks"), 6))
      .select("doc_id", "n_spans", "n_dup_spans", "n_cov_tokens",
        "n_toks", "cov_ratio")
  }

  /** q131 core, one row per doc with ≥ 1 shingle: distinct-shingle
    * count, corpus-unique shingle count, and their ratio. The shingle
    * stream is cached — it feeds the occurrence count and the join-back
    * (one tokenize+hash pass, not two; the q118 lesson). Unordered —
    * the gated key applies its own presentation ORDER BY/LIMIT. */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    import graft.plans.GraftExpressions.poly_hash
    val h62 = (c: Column) =>
      poly_hash(c, 131) * 2147483648L + poly_hash(c, 137)
    val sh = docs
      .select(col("doc_id"),
        explode(LlmQueries.shingles(col("text"), 3)).as("sg"))
      .select(col("doc_id"), h62(col("sg")).as("h"))
      .cache()
    val counts = sh.groupBy("h").agg(count(lit(1)).as("cnt"))
    sh.join(counts.hint("SHUFFLE_HASH"), Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).cast("long")
          .as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_shingles"), 6))
  }

  /** q121 core, one row per doc: chunk counts, duplicated-chunk counts
    * (digest occurs >1 time corpus-wide), duplicated-chunk token mass,
    * and its ratio of the doc's tokens. sum(len) IS the doc's token
    * count — chunks partition the token stream, so no second corpus
    * scan is needed. The chunk stream is cached: it feeds the count
    * agg and the join-back (one chunking pass, not two). Unordered —
    * the gated key applies its own presentation ORDER BY/LIMIT. */
  def cdcChunks(docs: DataFrame): DataFrame = {
    val chunks = cdcChunkStream(docs).cache()
    val counts = chunks.groupBy("h").agg(count(lit(1)).as("cnt"))
    chunks.join(counts.hint("SHUFFLE_HASH"), Seq("h"))
      .select(col("doc_id"), col("len"),
        when(col("cnt") > 1, 1L).otherwise(0L).as("dup"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("dup").cast("long").as("n_dup_chunks"),
        sum(col("len") * col("dup")).cast("long").as("dup_tokens"),
        sum("len").cast("long").as("n_toks"))
      .withColumn("dup_ratio",
        round(col("dup_tokens").cast("double") / col("n_toks"), 6))
  }

  /** Shared (source, shard) packing CTE body for q111/q112: same
    * composite-key window + per-shard metrics as [[packSequences]]. */
  private def packShardsSql: String = packShardsSqlFrom("documents")

  /** The packing replay parameterized on its source relation — shared
    * by q111/q112 (raw `documents`) and q189 (the pipeline survivors),
    * so the packing arithmetic has one SQL source of truth. */
  private def packShardsSqlFrom(src: String): String = {
    val w = PackWindow
    s"""SELECT source, shard, count(*) AS n_docs,
       |  CAST(sum(n) AS BIGINT) AS total_tokens,
       |  CAST((sum(n) + ${w - 1}) // $w AS BIGINT) AS n_seqs,
       |  CAST(sum(CASE WHEN (cum - n) // $w != (cum - 1) // $w
       |    THEN 1 ELSE 0 END) AS BIGINT) AS split_docs
       |FROM (
       |  SELECT source, shard, doc_id, n,
       |    sum(n) OVER (PARTITION BY source, shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (
       |    SELECT source, doc_id, doc_id % $PackShards AS shard,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |    FROM $src))
       |GROUP BY source, shard""".stripMargin
  }

  /** The q146 synthesis + canonicalization CTE pair (`r`, `c`), shared
    * with q155's twin — one DuckDB source of truth for the canonical
    * key. */
  private val UrlCanonCtes: String =
    """WITH r AS (
      |  SELECT doc_id,
      |    'https://' ||
      |    CASE WHEN doc_id % 7 = 0
      |         THEN 'WWW.' || upper(source) || '.Example.COM'
      |         ELSE 'www.' || source || '.example.com' END ||
      |    '/' || lang || '/p' || (doc_id % 17)::VARCHAR ||
      |    CASE WHEN doc_id % 2 = 0
      |         THEN '?b=' || ((doc_id % 5) + 1)::VARCHAR || '&a=' || ((doc_id % 5) * 2)::VARCHAR
      |         ELSE '?a=' || ((doc_id % 5) * 2)::VARCHAR || '&b=' || ((doc_id % 5) + 1)::VARCHAR END ||
      |    CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed' ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END AS raw_url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, raw_url,
      |    lower(string_split(nf, '?')[1]) ||
      |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END AS canonical
      |  FROM (
      |    SELECT doc_id, raw_url,
      |      list_sort(list_filter(
      |        string_split(CASE WHEN len(string_split(nf, '?')) > 1
      |                          THEN string_split(nf, '?')[2] ELSE '' END, '&'),
      |        p -> p != '' AND NOT starts_with(p, 'utm_'))) AS ps, nf
      |    FROM (SELECT doc_id, raw_url,
      |            regexp_replace(raw_url, '#.*$', '') AS nf FROM r)))""".stripMargin

  /** q177/q189 shared DuckDB replay of [[pipelineSurvivors]]: splices
    * UrlCanonCtes + pairEstCtes + the four stage CTEs, ending at `s4`
    * = (doc_id, source, text) survivors. One SQL source of truth for
    * every stage, consumed by both composition keys. */
  private lazy val PipelineCtes: String =
    UrlCanonCtes + ",\n" +
    graft.operators.LlmQueries.pairEstCtes.stripPrefix("WITH ") + ",\n" +
    s"""s1 AS (SELECT d.doc_id, d.source, d.text FROM documents d
      |  JOIN (SELECT min(doc_id) AS doc_id FROM c GROUP BY canonical) k1
      |    ON k1.doc_id = d.doc_id),
      |s2 AS (SELECT s1.doc_id, s1.source, s1.text FROM s1
      |  JOIN (SELECT min(doc_id) AS doc_id FROM
      |        (SELECT doc_id, md5(text) AS m FROM s1) mm GROUP BY m) k2
      |    ON k2.doc_id = s1.doc_id),
      |pp AS (SELECT doc_a, doc_b FROM est WHERE match_cnt >= ${graft.operators.LlmQueries.NearDupMinMatches}),
      |drops AS (SELECT DISTINCT pp.doc_b AS doc_id FROM pp
      |  JOIN s2 sa ON sa.doc_id = pp.doc_a
      |  JOIN s2 sb ON sb.doc_id = pp.doc_b),
      |s3 AS (SELECT doc_id, source, text FROM s2
      |  WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
      |qq AS (SELECT doc_id, source, text,
      |    round((len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4
      |      + (len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','a','it','that','for'], t)))::DOUBLE / len(toks)) * 0.3
      |      + least(1.0, len(toks) / 50.0) * 0.3, 6) AS quality
      |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS toks
      |        FROM s3) tt),
      |s4 AS (SELECT doc_id, source, text FROM qq WHERE quality >= 0.5)""".stripMargin

  /** The q93 BM25 CTE chain through `bm` (doc_id, bm25) — one DuckDB
    * source of truth for the lexical ranking, spliced by both the q93
    * twin and q195's fusion. Generated from the same
    * [[Bm25Terms]]/[[Bm25K1]]/[[Bm25B]] constants the Spark side uses. */
  private val bm25Ctes: String = {
    val terms = Bm25Terms.map("'" + _ + "'").mkString(", ")
    val sumExpr = Bm25Terms
      .map(t => s"coalesce(sum(CASE WHEN tok = '$t' THEN w END), 0)")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM d),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
       |  WHERE tok IN ($terms) GROUP BY doc_id, tok),
       |dfreq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
       |w AS (SELECT tf.doc_id, tf.tok,
       |  ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |    * (tf * ${Bm25K1 + 1.0})
       |    / (tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl / avgdl)) AS w
       |  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id), stats),
       |bm AS (SELECT doc_id, round($sumExpr, 6) AS bm25
       |  FROM w GROUP BY doc_id)""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    // q154: q49's bigram replay + MLE conditional + q103's guarded
    // integer micro-nat fold
    "q154_bigram_surprisal" ->
      """WITH bgd AS (
        |  SELECT doc_id, unnest(list_transform(range(0, len(sp) - 1),
        |    i -> array_to_string(sp[i+1:i+2], ' '))) AS bg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents) t),
        |bc AS (SELECT bg, count(*) AS cnt FROM bgd GROUP BY bg),
        |ctx AS (SELECT string_split(bg, ' ')[1] AS w1, sum(cnt) AS ctx_cnt
        |        FROM bc GROUP BY string_split(bg, ' ')[1]),
        |lm AS (SELECT bg,
        |    CAST(floor(-ln(cnt::DOUBLE / ctx_cnt) * 1000000 + 0.000001) AS BIGINT) AS lnq
        |  FROM bc JOIN ctx ON string_split(bc.bg, ' ')[1] = ctx.w1),
        |sc AS (SELECT doc_id, CAST(sum(lnq) AS BIGINT) AS surprisal,
        |    count(*) AS nb
        |  FROM bgd JOIN lm USING (bg) GROUP BY doc_id)
        |SELECT doc_id, nb, surprisal // nb AS ppx_micro
        |FROM sc ORDER BY ppx_micro DESC, doc_id LIMIT 20""".stripMargin,

    // q159: the same bigram/unigram replay, PMI ratio assembled in the
    // engine's exact left-to-right operand order, q103's floor guard
    "q159_pmi_collocations" ->
      """WITH bgd AS (
        |  SELECT unnest(list_transform(range(0, len(sp) - 1),
        |    i -> array_to_string(sp[i+1:i+2], ' '))) AS bg
        |  FROM (SELECT string_split(text, ' ') AS sp FROM documents) t),
        |bc AS (SELECT bg, count(*) AS cb FROM bgd GROUP BY bg),
        |uc AS (SELECT tok, count(*) AS cu FROM
        |  (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |tot AS (SELECT
        |  (SELECT CAST(sum(cu) AS BIGINT) FROM uc) AS n_uni,
        |  (SELECT CAST(sum(cb) AS BIGINT) FROM bc) AS n_bi),
        |sc AS (SELECT bg, cb, c1.cu AS c1, c2.cu AS c2, n_uni, n_bi
        |  FROM bc CROSS JOIN tot
        |  JOIN uc c1 ON string_split(bg, ' ')[1] = c1.tok
        |  JOIN uc c2 ON string_split(bg, ' ')[2] = c2.tok
        |  WHERE cb >= 5)
        |SELECT bg, cb AS pair_cnt, c1, c2,
        |  CAST(floor(ln(cb::DOUBLE * n_uni * n_uni
        |    / (n_bi::DOUBLE * c1 * c2)) * 1000000 + 0.000001) AS BIGINT)
        |    AS pmi_micro
        |FROM sc ORDER BY pmi_micro DESC, bg LIMIT 20""".stripMargin,

    // q172: same quantize-then-integer-sum order — ln only ever sees a
    // distinct count or a source total, never a running FP sum
    "q172_entropy" ->
      """WITH cell AS (
        |  SELECT source, tok, count(*) AS c FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) GROUP BY source, tok),
        |agg AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS vocab,
        |    CAST(sum(c * CAST(floor(ln(c::DOUBLE) * 1000000 + 0.000001)
        |      AS BIGINT)) AS BIGINT) AS s
        |  FROM cell GROUP BY source)
        |SELECT source, n_tokens, vocab,
        |  CAST(floor(ln(n_tokens::DOUBLE) * 1000000 + 0.000001) AS BIGINT)
        |    - s // n_tokens AS h_micro
        |FROM agg ORDER BY source""".stripMargin,

    // q180: the same self-calibrating query set and intersection-as-agg
    "q180_search_and" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |q AS (SELECT tok FROM
        |  (SELECT tok, count(*) AS tf_total FROM toks GROUP BY tok)
        |  ORDER BY tf_total DESC, tok LIMIT 3),
        |m AS (SELECT doc_id, toks.tok, count(*) AS tf
        |  FROM toks JOIN q ON toks.tok = q.tok
        |  GROUP BY doc_id, toks.tok)
        |SELECT doc_id, CAST(min(tf) AS BIGINT) AS min_tf,
        |  CAST(sum(tf) AS BIGINT) AS sum_tf
        |FROM m GROUP BY doc_id HAVING count(*) = 3
        |ORDER BY doc_id""".stripMargin,

    // q177: the whole pipeline replayed by splicing the factored
    // replays — UrlCanonCtes (canonical per doc), pairEstCtes (q44's
    // pair set), q51's quality expression VERBATIM, q127's splitSql —
    // so the hash match certifies the COMPOSITION of the gate-proven
    // stages, with no second source of truth for any stage
    "q177_pipeline" -> (PipelineCtes +
      s"""
         |SELECT split, source, count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM (SELECT doc_id, source,
         |        ${graft.operators.CorpusQueries.splitSql} AS split
         |      FROM s4) f
         |GROUP BY split, source ORDER BY split, source""".stripMargin),

    // q189: the SAME pipeline CTEs feeding the PARAMETERIZED packing
    // replay — both compositions share one SQL source of truth per stage
    "q189_pack_curated" -> (PipelineCtes + ",\n" +
      s"""pk AS (${packShardsSqlFrom("s4")})
         |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_seqs) AS BIGINT) AS n_seqs,
         |  CAST(sum(split_docs) AS BIGINT) AS split_docs
         |FROM pk GROUP BY source ORDER BY source""".stripMargin),

    // q185: identical integer dispersion formula, one division
    "q185_burstiness" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |pc AS (SELECT tok, doc_id, count(*) AS c FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |   FROM documents) GROUP BY tok, doc_id),
        |agg AS (SELECT tok, count(*) AS df,
        |    CAST(sum(c) AS BIGINT) AS t,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM pc GROUP BY tok)
        |SELECT tok, CAST(df AS BIGINT) AS df, t AS total,
        |  round((n * s2 - t * t)::DOUBLE / (n * t), 6) AS vmr
        |FROM agg CROSS JOIN n
        |ORDER BY vmr DESC, tok LIMIT 20""".stripMargin,

    // q184: same quantize-then-OLS composition — one ln per vocab row,
    // exact integer moments in int128 (DuckDB's native integer-sum
    // width, matching the engine's DECIMAL(38,0) partials — see
    // zipfFit's width note), the identical slope formula
    "q184_zipf_fit" ->
      """WITH c AS (SELECT tok, count(*) AS c FROM
        |  (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |r AS (SELECT c,
        |    row_number() OVER (ORDER BY c DESC, tok) AS rank FROM c),
        |p AS (SELECT
        |    CAST(floor(ln(rank::DOUBLE) * 1000000 + 0.000001) AS BIGINT) AS x,
        |    CAST(floor(ln(c::DOUBLE) * 1000000 + 0.000001) AS BIGINT) AS y
        |  FROM r),
        |st AS (SELECT count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM p),
        |sl AS (SELECT n, sx, sy,
        |    (n * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
        |      / (n * sxx - CAST(sx AS HUGEINT) * sx) AS slope
        |  FROM st WHERE n * sxx - CAST(sx AS HUGEINT) * sx > 0)
        |SELECT CAST(n AS BIGINT) AS vocab,
        |  round(slope, 6) AS zipf_slope,
        |  round((sy::DOUBLE - slope * sx) / n / 1000000, 6)
        |    AS ln_c_intercept
        |FROM sl""".stripMargin,

    // q190: every admission test replayed by membership — canonical
    // set from UrlCanonCtes's c, digests from the corpus split, mixed
    // near-dup pairs from pairEstCtes, the q51 quality expression,
    // the same decision priority
    "q190_stream_admission" -> (UrlCanonCtes + ",\n" +
      graft.operators.LlmQueries.pairEstCtes.stripPrefix("WITH ") + ",\n" +
      s"""b AS (SELECT doc_id, doc_id % 20 AS batch_key, source, text
        |      FROM documents WHERE doc_id % 10 = 7),
        |ccorp AS (SELECT DISTINCT canonical FROM c
        |          WHERE doc_id % 10 != 7),
        |dcorp AS (SELECT DISTINCT md5(text) AS m FROM documents
        |          WHERE doc_id % 10 != 7),
        |nd AS (SELECT DISTINCT
        |    CASE WHEN doc_a % 10 = 7 THEN doc_a ELSE doc_b END AS doc_id
        |  FROM est WHERE match_cnt >= ${graft.operators.LlmQueries.NearDupMinMatches}
        |    AND (doc_a % 10 = 7) != (doc_b % 10 = 7)),
        |qq AS (SELECT doc_id,
        |    round((len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4
        |      + (len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','a','it','that','for'], t)))::DOUBLE / len(toks)) * 0.3
        |      + least(1.0, len(toks) / 50.0) * 0.3, 6) AS quality
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM b) t),
        |dec AS (SELECT b.doc_id, b.batch_key,
        |    CASE WHEN cc.canonical IS NOT NULL THEN 'url_dup'
        |         WHEN dc.m IS NOT NULL THEN 'exact_dup'
        |         WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
        |         WHEN qq.quality < 0.5 THEN 'low_quality'
        |         ELSE 'admit' END AS decision
        |  FROM b
        |    JOIN c cb ON cb.doc_id = b.doc_id
        |    LEFT JOIN ccorp cc ON cc.canonical = cb.canonical
        |    LEFT JOIN dcorp dc ON dc.m = md5(b.text)
        |    LEFT JOIN nd ON nd.doc_id = b.doc_id
        |    JOIN qq ON qq.doc_id = b.doc_id)
        |SELECT batch_key, decision, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM dec GROUP BY batch_key, decision
        |ORDER BY batch_key, decision""".stripMargin),

    // q176: the same distinct-cell self-join in SQL — exact integers,
    // inclusion–exclusion union
    "q176_vocab_overlap" ->
      """WITH cells AS (
        |  SELECT DISTINCT source, tok FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS tok
        |     FROM documents)),
        |sizes AS (SELECT source, count(*) AS v FROM cells GROUP BY source),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS inter
        |  FROM cells a JOIN cells b
        |    ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT source_a, source_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(sa.v + sb.v - inter AS BIGINT) AS uni,
        |  round(inter::DOUBLE / (sa.v + sb.v - inter), 6) AS jaccard
        |FROM inter JOIN sizes sa ON sa.source = source_a
        |           JOIN sizes sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,

    // q166: the same 2×2 G² from the same exact marginals, terms in
    // the same textual order, CASE o>0 for the x·ln(x)→0 convention
    "q166_keyness" ->
      """WITH cell AS (
        |  SELECT source, tok, count(*) AS a FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) GROUP BY source, tok),
        |st AS (SELECT source, CAST(sum(a) AS BIGINT) AS st
        |       FROM cell GROUP BY source),
        |tt AS (SELECT tok, CAST(sum(a) AS BIGINT) AS tt
        |       FROM cell GROUP BY tok),
        |n AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cell),
        |g AS (SELECT source, tok, a,
        |    2.0 * (
        |      (CASE WHEN a > 0 THEN a::DOUBLE
        |         * ln((a * n)::DOUBLE / (st * tt)) ELSE 0 END)
        |      + (CASE WHEN tt - a > 0 THEN (tt - a)::DOUBLE
        |         * ln(((tt - a) * n)::DOUBLE / ((n - st) * tt)) ELSE 0 END)
        |      + (CASE WHEN st - a > 0 THEN (st - a)::DOUBLE
        |         * ln(((st - a) * n)::DOUBLE / (st * (n - tt))) ELSE 0 END)
        |      + (CASE WHEN n - tt - st + a > 0 THEN (n - tt - st + a)::DOUBLE
        |         * ln(((n - tt - st + a) * n)::DOUBLE
        |              / ((n - st) * (n - tt))) ELSE 0 END)) AS g2
        |  FROM cell JOIN st USING (source) JOIN tt USING (tok)
        |       CROSS JOIN n)
        |SELECT source, tok, a AS n_in_source,
        |  CAST(floor(g2 * 1000000 + 0.000001) AS BIGINT) AS g2_micro
        |FROM g ORDER BY g2_micro DESC, source, tok LIMIT 20""".stripMargin,

    // q165: same synthesis, but the oracle is the BRUTE all-pairs join
    // over distinct titles — the hash match therefore PROVES the
    // engine's symmetric-delete blocking lossless at ed ≤ 1, not just
    // replayed (the distinct-title domain keeps the brute side cheap)
    "q165_fuzzy_title_join" ->
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 2
        |           THEN array_to_string(string_split(text,' ')[1:3], ' ') || 'x'
        |         WHEN doc_id % 7 = 4
        |           THEN 'q' || substr(array_to_string(string_split(text,' ')[1:3], ' '), 2)
        |         ELSE array_to_string(string_split(text,' ')[1:3], ' ')
        |    END AS title
        |  FROM documents),
        |d AS (SELECT title, count(*) AS n_docs FROM t GROUP BY title),
        |p AS (SELECT a.title AS title_a, b.title AS title_b,
        |    CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist,
        |    a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
        |  FROM d a JOIN d b ON a.title < b.title
        |  WHERE levenshtein(a.title, b.title) <= 1)
        |SELECT title_a, title_b, dist, n_docs_a, n_docs_b
        |FROM p ORDER BY title_a, title_b""".stripMargin,

    // q146: same synthesis, same canonicalization in DuckDB list/string
    // ops — equality proves the canonicalizer collapses every variant
    // axis and nothing else
    "q146_url_dedup" -> (UrlCanonCtes + "\n" +
      """SELECT canonical, count(*) AS n_docs,
        |  count(DISTINCT raw_url) AS n_raw_variants,
        |  min(doc_id) AS first_seen,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM c GROUP BY canonical ORDER BY canonical""".stripMargin),

    // q155: the SAME synthesis+canonicalization CTEs, corpus counts
    // from the non-batch side — equality proves the batch's
    // prior-count/novelty answers against the index contents
    "q155_url_dedup_incremental" -> (UrlCanonCtes + ",\n" +
      """corp AS (SELECT canonical, count(*) AS prior_cnt
        |  FROM c WHERE (doc_id // 20) % 10 != 7 GROUP BY canonical),
        |b AS (SELECT doc_id, canonical FROM c WHERE (doc_id // 20) % 10 = 7)
        |SELECT b.doc_id, b.canonical,
        |  CAST(COALESCE(corp.prior_cnt, 0) AS BIGINT) AS prior_cnt,
        |  CAST(CASE WHEN corp.prior_cnt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
        |FROM b LEFT JOIN corp USING (canonical)
        |ORDER BY doc_id""".stripMargin),

    "q91_chunk_docs" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |st AS (SELECT doc_id, toks,
         |  unnest(generate_series(1, greatest(len(toks), 1), $ChunkStride)) AS st
         | FROM d)
         |SELECT doc_id,
         | CAST((st - 1) // $ChunkStride AS BIGINT) AS chunk_id,
         | CAST(len(toks[st : st + ${ChunkWidth - 1}]) AS BIGINT) AS n_chunk_tokens,
         | array_to_string(toks[st : st + ${ChunkWidth - 1}], ' ') AS chunk_text
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "q92_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT tok, count(*) AS cnt FROM t, n
        |GROUP BY tok, n.n HAVING count(*) > n.n / 32.0
        |ORDER BY tok""".stripMargin,

    // incremental candidates + exact recount ≡ the one-shot exact query
    "q102_stream_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT tok, count(*) AS cnt FROM t, n
        |GROUP BY tok, n.n HAVING count(*) > n.n / 32.0
        |ORDER BY tok""".stripMargin,

    "q93_bm25" ->
      (bm25Ctes + "\n" +
        """SELECT doc_id, bm25 FROM bm
          |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin),

    // q195: the q93 BM25 CTEs and the q45 float-dot cosine rendering,
    // each ranked (QUALIFY ≤ 50 replays the Spark top-50 + re-rank —
    // same total order, same cut), fused on integer ranks. Literals
    // route through CAST(1 AS DOUBLE): DuckDB parses 1.0 as DECIMAL
    // and a decimal division would leak DECIMAL into the result
    // surface, which the gate hard-fails.
    "q195_rrf_fusion" ->
      (bm25Ctes + ",\n" +
        """txt AS (SELECT doc_id,
          |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_txt
          |  FROM bm QUALIFY r_txt <= 50),
          |e AS MATERIALIZED (SELECT vec_id, embedding,
          |    sqrt(list_reduce(list_transform(range(1,65), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (a,b)->a+b)) AS nrm
          |  FROM embeddings),
          |qv AS (SELECT embedding AS qe, nrm AS qn FROM e WHERE vec_id = 0),
          |sims AS (SELECT vec_id AS doc_id,
          |    CASE WHEN qn = 0 OR nrm = 0 THEN NULL ELSE
          |      list_reduce(list_transform(range(1,65), i -> CAST(qe[i]*embedding[i] AS DOUBLE)), (a,b)->a+b) / (qn * nrm)
          |    END AS sim
          |  FROM e CROSS JOIN qv WHERE vec_id != 0),
          |vec AS (SELECT doc_id,
          |    CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS r_vec
          |  FROM sims WHERE sim IS NOT NULL QUALIFY r_vec <= 50),
          |f AS (SELECT coalesce(txt.doc_id, vec.doc_id) AS doc_id, r_txt, r_vec,
          |    coalesce(CAST(1 AS DOUBLE) / (60 + r_txt), 0)
          |      + coalesce(CAST(1 AS DOUBLE) / (60 + r_vec), 0) AS rrf
          |  FROM txt FULL JOIN vec ON txt.doc_id = vec.doc_id)
          |SELECT doc_id, r_txt, r_vec, round(rrf, 6) AS rrf
          |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin),

    // q198: the full DSIR replay — same gram streams (unigrams +
    // positional bigrams), the char-fold poly_hash into V buckets, one
    // bounded count table, quantized λ per DISTINCT bucket, exact
    // integer per-doc sums. sp/g are multi-referenced → MATERIALIZED
    // (the exponential-re-evaluation gotcha). The ln argument is the
    // identical exact-int64-product ratio the engine builds.
    "q198_dsir_weight" -> {
      val V = DsirBuckets
      s"""WITH sp AS MATERIALIZED (
         |  SELECT doc_id, lang, string_split(text, ' ') AS toks
         |  FROM documents),
         |g0 AS (
         |  SELECT doc_id, lang, unnest(toks) AS g FROM sp
         |  UNION ALL
         |  SELECT doc_id, lang, unnest(list_transform(range(0, len(toks) - 1),
         |    i -> array_to_string(toks[i+1:i+2], ' '))) AS g FROM sp),
         |g AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(string_split(g, ''), ch -> ascii(ch)::BIGINT)),
         |      (a,b) -> (a*131 + b) % 2147483647) % $V AS h
         |  FROM g0),
         |counts AS (
         |  SELECT h, count(*) AS cr,
         |    count(*) FILTER (lang = 'en') AS ct
         |  FROM g GROUP BY h),
         |tots AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
         |    CAST(sum(ct) AS BIGINT) AS nt FROM counts),
         |lam AS (
         |  SELECT h, CAST(floor(ln(
         |      CAST((ct + 1) * (nr + $V) AS DOUBLE)
         |      / CAST((cr + 1) * (nt + $V) AS DOUBLE)) * 1e6 + 1e-6)
         |    AS BIGINT) AS q
         |  FROM counts CROSS JOIN tots),
         |per AS (
         |  SELECT doc_id, count(*) AS n_feats,
         |    CAST(sum(q) AS BIGINT) AS w_scaled
         |  FROM g JOIN lam USING (h) GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, d.source, n_feats, w_scaled,
         |  round(CAST(w_scaled AS DOUBLE) / 1e6, 6) AS w
         |FROM per JOIN documents d USING (doc_id)
         |ORDER BY w_scaled DESC, doc_id LIMIT $DsirTopK""".stripMargin
    },

    // q204: q198's replay with the corpus/delta split — counts come
    // from the standing corpus only, λ is computed over the full
    // V-bucket spine (COALESCE gives unseen features the smoothed
    // default), and only the delta batch is scored
    "q204_dsir_score_delta" -> {
      val V = DsirBuckets
      s"""WITH sp AS MATERIALIZED (
         |  SELECT doc_id, lang, string_split(text, ' ') AS toks
         |  FROM documents),
         |g0 AS (
         |  SELECT doc_id, lang, unnest(toks) AS g FROM sp
         |  UNION ALL
         |  SELECT doc_id, lang, unnest(list_transform(range(0, len(toks) - 1),
         |    i -> array_to_string(toks[i+1:i+2], ' '))) AS g FROM sp),
         |g AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(string_split(g, ''), ch -> ascii(ch)::BIGINT)),
         |      (a,b) -> (a*131 + b) % 2147483647) % $V AS h
         |  FROM g0),
         |counts AS (
         |  SELECT h, count(*) AS cr,
         |    count(*) FILTER (lang = 'en') AS ct
         |  FROM g WHERE doc_id % 10 != 7 GROUP BY h),
         |tots AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
         |    CAST(sum(ct) AS BIGINT) AS nt FROM counts),
         |lam AS (
         |  SELECT h, CAST(floor(ln(
         |      CAST((COALESCE(ct, 0) + 1) * (nr + $V) AS DOUBLE)
         |      / CAST((COALESCE(cr, 0) + 1) * (nt + $V) AS DOUBLE)) * 1e6 + 1e-6)
         |    AS BIGINT) AS q
         |  FROM (SELECT unnest(range(0, $V)) AS h) spine
         |  LEFT JOIN counts USING (h) CROSS JOIN tots),
         |per AS (
         |  SELECT doc_id, count(*) AS n_feats,
         |    CAST(sum(q) AS BIGINT) AS w_scaled
         |  FROM g JOIN lam USING (h)
         |  WHERE doc_id % 10 = 7 GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, d.source, n_feats, w_scaled,
         |  round(CAST(w_scaled AS DOUBLE) / 1e6, 6) AS w
         |FROM per JOIN documents d USING (doc_id)
         |ORDER BY w_scaled DESC, doc_id LIMIT $DsirTopK""".stripMargin
    },

    "q103_perplexity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT count(*) AS n FROM t),
        |lmx AS (SELECT tok, -ln(count(*)::DOUBLE / n.n) * 1000000 AS x
        | FROM t, n GROUP BY tok, n.n),
        |lm AS (SELECT tok,
        |  CAST(floor(x + 1e-6) AS BIGINT) AS lnq
        | FROM lmx),
        |s AS (SELECT doc_id, CAST(sum(lnq) AS BIGINT) AS surprisal, count(*) AS nt
        |      FROM t JOIN lm USING (tok) GROUP BY doc_id)
        |SELECT doc_id, nt, surprisal // nt AS ppx_micro
        |FROM s ORDER BY ppx_micro DESC, doc_id LIMIT 20""".stripMargin,

    "q110_segment_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |segs AS (
         |  SELECT doc_id,
         |    md5(array_to_string(toks[j*$SegWidth+1 : j*$SegWidth+$SegWidth], ' ')) AS h
         |  FROM d CROSS JOIN LATERAL
         |    (SELECT unnest(range(len(toks) // $SegWidth)) AS j) js),
         |counts AS (SELECT h, count(*) AS cnt FROM segs GROUP BY h),
         |per AS (
         |  SELECT doc_id, count(*) AS n_segs,
         |    CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs
         |  FROM segs JOIN counts USING (h) GROUP BY doc_id)
         |SELECT doc_id, n_segs, n_dup_segs,
         |  round(n_dup_segs::DOUBLE / n_segs, 6) AS dup_ratio
         |FROM per ORDER BY dup_ratio DESC, doc_id LIMIT 20""".stripMargin,

    // q110's replay restricted: batch docs (doc_id % 10 = 7) probed
    // against the DISTINCT segment set of the non-batch corpus
    "q114_stream_segment_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |segs AS (
         |  SELECT doc_id,
         |    md5(array_to_string(toks[j*$SegWidth+1 : j*$SegWidth+$SegWidth], ' ')) AS h
         |  FROM d CROSS JOIN LATERAL
         |    (SELECT unnest(range(len(toks) // $SegWidth)) AS j) js),
         |corp AS (SELECT DISTINCT h FROM segs WHERE doc_id % 10 != 7),
         |b AS (SELECT doc_id, h FROM segs WHERE doc_id % 10 = 7),
         |per AS (
         |  SELECT b.doc_id, count(*) AS n_segs,
         |    CAST(sum(CASE WHEN corp.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs
         |  FROM b LEFT JOIN corp ON b.h = corp.h GROUP BY b.doc_id)
         |SELECT doc_id, n_segs, n_dup_segs,
         |  round(n_dup_segs::DOUBLE / n_segs, 6) AS dup_ratio
         |FROM per ORDER BY dup_ratio DESC, doc_id LIMIT 20""".stripMargin,

    "q111_pack_sequences" ->
      s"""WITH p AS ($packShardsSql)
         |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_seqs) AS BIGINT) AS n_seqs,
         |  CAST(sum(split_docs) AS BIGINT) AS split_docs
         |FROM p GROUP BY source ORDER BY source""".stripMargin,

    "q112_pack_shards" ->
      s"""WITH p AS ($packShardsSql)
         |SELECT * FROM p ORDER BY source, shard""".stripMargin,

    "q96_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |pg AS (
         |  SELECT tok, doc_id // $PostingPageDocs AS page,
         |    count(*) AS page_tf,
         |    list_sort(list(DISTINCT doc_id)) AS plist
         |  FROM t GROUP BY tok, doc_id // $PostingPageDocs)
         |SELECT tok, page,
         |  CAST(sum(len(plist)) OVER (PARTITION BY tok) AS BIGINT) AS df,
         |  CAST(sum(page_tf) OVER (PARTITION BY tok) AS BIGINT) AS tf_total,
         |  CAST(len(plist) AS BIGINT) AS page_df,
         |  CAST(page_tf AS BIGINT) AS page_tf,
         |  array_to_string(list_transform(plist, x -> CAST(x AS VARCHAR)), ',') AS postings
         |FROM pg ORDER BY tok, page""".stripMargin,

    // q118: overlapping spans at stride 1; coverage = distinct token
    // positions under >= 1 duplicated span
    "q118_substring_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |spans AS (
         |  SELECT doc_id, j AS pos,
         |    md5(array_to_string(toks[j+1 : j+$SpanWidth], ' ')) AS h
         |  FROM d CROSS JOIN LATERAL
         |    (SELECT unnest(range(len(toks) - $SpanWidth + 1)) AS j) js
         |  WHERE len(toks) >= $SpanWidth),
         |counts AS (SELECT h, count(*) AS cnt FROM spans GROUP BY h),
         |marked AS (
         |  SELECT doc_id, pos, cnt > 1 AS dup
         |  FROM spans JOIN counts USING (h)),
         |per AS (
         |  SELECT doc_id, count(*) AS n_spans,
         |    CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
         |  FROM marked GROUP BY doc_id),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT p) AS n_cov_tokens
         |  FROM (SELECT doc_id, pos + unnest(range($SpanWidth)) AS p
         |        FROM marked WHERE dup)
         |  GROUP BY doc_id),
         |tok AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents)
         |SELECT per.doc_id, n_spans, n_dup_spans,
         |  COALESCE(n_cov_tokens, 0) AS n_cov_tokens, n_toks,
         |  round(COALESCE(n_cov_tokens, 0)::DOUBLE / n_toks, 6) AS cov_ratio
         |FROM per
         |LEFT JOIN cov ON per.doc_id = cov.doc_id
         |JOIN tok ON per.doc_id = tok.doc_id
         |ORDER BY cov_ratio DESC, per.doc_id LIMIT 20""".stripMargin,

    // q121: CDC boundaries replayed via the q53 char-fold polyhash;
    // parallel unnest zips chunk lengths with chunk digests
    "q121_cdc_chunks" -> {
      def wh(tok: String): String =
        "list_reduce(list_prepend(0::BIGINT, list_transform(" +
          s"string_split($tok, ''), ch -> ascii(ch)::BIGINT)), " +
          "(a,b) -> (a*131 + b) % 2147483647)"
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |b AS (SELECT doc_id, toks,
         |  CASE WHEN len(toks) >= 2 THEN
         |    list_filter(list_transform(range(0, len(toks) - 1), j ->
         |      CASE WHEN ${wh("toks[j+1]")} % $CdcDivisor = 0 THEN j + 1 END),
         |      x -> x IS NOT NULL)
         |  ELSE [] END AS bpos FROM d),
         |se AS (SELECT doc_id, toks,
         |  list_prepend(0, bpos) AS starts,
         |  list_append(bpos, len(toks)) AS ends FROM b),
         |chunks AS (SELECT doc_id,
         |  unnest(list_transform(range(0, len(starts)), i ->
         |    ends[i+1] - starts[i+1])) AS len,
         |  unnest(list_transform(range(0, len(starts)), i ->
         |    md5(array_to_string(toks[starts[i+1]+1 : ends[i+1]], ' ')))) AS h
         |  FROM se),
         |counts AS (SELECT h, count(*) AS cnt FROM chunks GROUP BY h),
         |per AS (
         |  SELECT doc_id, count(*) AS n_chunks,
         |    CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |    CAST(sum(CASE WHEN cnt > 1 THEN len ELSE 0 END) AS BIGINT) AS dup_tokens,
         |    CAST(sum(len) AS BIGINT) AS n_toks
         |  FROM chunks JOIN counts USING (h) GROUP BY doc_id)
         |SELECT doc_id, n_chunks, n_dup_chunks, dup_tokens, n_toks,
         |  round(dup_tokens::DOUBLE / n_toks, 6) AS dup_ratio
         |FROM per ORDER BY dup_ratio DESC, doc_id LIMIT 20""".stripMargin
    },

    // q131: the q123 62-bit shingle-hash rendering (131/137 polynomial
    // pair), occurrence-counted corpus-wide and rolled up per doc
    "q131_ngram_novelty" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
        |    range(0, len(string_split(text,' ')) - 2),
        |    i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')))) AS s
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(string_split(s,''), ch -> ascii(ch)::BIGINT)),
        |      (a,b) -> (a*131 + b) % 2147483647) * 2147483648
        |    + list_reduce(list_prepend(0::BIGINT,
        |      list_transform(string_split(s,''), ch -> ascii(ch)::BIGINT)),
        |      (a,b) -> (a*137 + b) % 2147483647) AS h
        |  FROM sh),
        |c AS (SELECT h, count(*) AS cnt FROM h GROUP BY h),
        |per AS (
        |  SELECT doc_id, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |  FROM h JOIN c USING (h) GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_unique,
        |  round(n_unique::DOUBLE / n_shingles, 6) AS novelty
        |FROM per ORDER BY novelty, doc_id LIMIT 20""".stripMargin,
  )
}
