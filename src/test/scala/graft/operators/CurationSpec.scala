package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.MisraGriesAgg.misra_gries

/** Unit evidence for the curation operators (q91–q93, q96) beyond the
  * DuckDB gate — in particular the Misra–Gries guarantee under
  * EVICTION, which the fixture corpus (31-token vocab < capacity 64)
  * never triggers: here a Zipf-ish stream with 5,000 distinct items is
  * pushed through capacity-16 summaries across many partitions. */
class CurationSpec extends SparkSpec {

  /** Skewed synthetic stream: a few very hot items over a long tail of
    * 5,000 distinct strings, shuffled deterministically. */
  private def skewedItems: Seq[String] = {
    val rnd = new Random(42)
    val hot = Seq.fill(4000)("hot_a") ++ Seq.fill(2500)("hot_b") ++
      Seq.fill(1200)("hot_c")
    val tail = Seq.fill(12000)(s"cold_${rnd.nextInt(5000)}")
    rnd.shuffle(hot ++ tail)
  }

  test("Misra-Gries under eviction: candidates cover every item above n/(k+1)") {
    val sess = spark
    import sess.implicits._
    val items = skewedItems
    val n = items.size.toLong
    val k = 16
    // 8 partitions force both the per-partition MG update path (5k
    // distinct >> 16 counters => constant eviction) and the mergeable-
    // summaries combine path across partials
    val df = items.toDF("item").repartition(8)
    val row = df.select(misra_gries(col("item"), k).as("s"))
      .select(col("s.cand"), col("s.n")).head()
    assert(row.getLong(1) === n, "exact row tally must survive merging")
    val cand = row.getSeq[String](0).toSet
    assert(cand.size <= k, s"summary must hold <= $k items, got ${cand.size}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustHave = exact.filter { case (_, c) => c > n.toDouble / (k + 1) }.keySet
    assert(mustHave.nonEmpty, "test data must actually contain heavy hitters")
    assert(mustHave.subsetOf(cand),
      s"MG guarantee violated: missing ${mustHave -- cand}")
  }

  test("two-pass heavy hitters on skewed data equals the exact groupBy") {
    val sess = spark
    import sess.implicits._
    val items = skewedItems
    val toks = items.toDF("tok").repartition(8)
    val pass1 = toks.select(misra_gries(col("tok"), 16).as("s"))
      .select(col("s.cand").as("cand"), col("s.n").as("n"))
    val got = toks.crossJoin(broadcast(pass1))
      .filter(array_contains(col("cand"), col("tok")))
      .groupBy("tok", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n") / 8.0) // threshold n/8 > n/17 guarantee
      .select("tok", "cnt").as[(String, Long)].collect().toMap
    val n = items.size.toDouble
    val want = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > n / 8.0 }.toMap
    assert(got === want)
  }

  test("q155: crawl-frontier answers are consistent and BOTH branches fire") {
    val dir = "/root/testdata/sf0.001"
    val out = CurationQueries
      .queries("q155_url_dedup_incremental")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert((r.getAs[Long]("is_new") == 1L) ==
        (r.getAs[Long]("prior_cnt") == 0L),
        "novelty flag must mirror a zero prior count")
    }
    assert(out.exists(_.getAs[Long]("is_new") == 1L) &&
      out.exists(_.getAs[Long]("is_new") == 0L),
      "the fixture batch must mix seen and new resources — " +
        "an all-one-way answer means the split aliases the key")
  }

  test("q154: bigram surprisal matches hand-computed micro-nats; rare continuations score higher") {
    val sess = spark
    import sess.implicits._
    // corpus bigrams from 'a': 'a b' twice, 'a c' once → P(b|a)=2/3,
    // P(c|a)=1/3; lnq = floor(-ln(p)·1e6 + 1e-6)
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = CurationQueries.bigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lnqB = math.floor(-math.log(2.0 / 3.0) * 1e6 + 1e-6).toLong
    val lnqC = math.floor(-math.log(1.0 / 3.0) * 1e6 + 1e-6).toLong
    assert(out === Map(1L -> lnqB, 2L -> lnqC, 3L -> lnqB))
    assert(out(2L) > out(1L),
      "the rare continuation must out-surprise the common one")
    // a single-token doc has no bigrams and must drop out, not crash
    assert(CurationQueries.bigramSurprisal(
      Seq((9L, "solo")).toDF("doc_id", "text")).count() === 0L)
  }

  test("q146: canonicalizer collapses every variant axis and partitions the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = CurationQueries.queries("q146_url_dedup")(spark, dir)
      .collect()
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "canonical groups must partition the corpus (every doc in exactly one)")
    assert(out.exists(_.getAs[Long]("n_raw_variants") > 1),
      "the fixture arithmetic guarantees mixed-variant groups — " +
        "none found means the canonicalizer is keying on the RAW url")
    out.map(_.getAs[String]("canonical")).foreach { c =>
      assert(!c.contains("#") && !c.contains("utm_") && c == c.toLowerCase,
        s"un-canonical survivor: $c")
      val q = c.dropWhile(_ != '?').drop(1)
      if (q.nonEmpty)
        assert(q.split("&").toSeq == q.split("&").toSeq.sorted,
          s"params must be sorted in $c")
    }
  }

  test("q91 chunking covers every token exactly once per window position") {
    val q = CurationQueries.queries("q91_chunk_docs")(
      spark, "/root/testdata/sf0.001")
    val rows = q.filter(col("doc_id") === 0)
      .orderBy("chunk_id")
      .collect()
    // windows advance by stride until the tail; every chunk non-empty
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_chunk_tokens")
      val text = r.getAs[String]("chunk_text")
      assert(nTok >= 1 && nTok <= CurationQueries.ChunkWidth)
      assert(text.split(" ", -1).length.toLong === nTok,
        "rendered chunk must contain exactly n_chunk_tokens tokens")
    }
    // overlap invariant: consecutive full windows share width-stride tokens
    val overlap = CurationQueries.ChunkWidth - CurationQueries.ChunkStride
    rows.sliding(2).foreach {
      case Array(a, b) if a.getAs[Long]("n_chunk_tokens") == CurationQueries.ChunkWidth.toLong
        && b.getAs[Long]("n_chunk_tokens") >= overlap.toLong =>
        val aToks = a.getAs[String]("chunk_text").split(" ", -1)
        val bToks = b.getAs[String]("chunk_text").split(" ", -1)
        assert(aToks.takeRight(overlap).sameElements(bToks.take(overlap)),
          s"chunks ${a.getAs[Long]("chunk_id")}/${b.getAs[Long]("chunk_id")} must overlap by $overlap tokens")
      case _ => ()
    }
  }

  test("q93 BM25 ranks the rare term above common ones at equal tf") {
    val sess = spark
    import sess.implicits._
    // idf monotonicity check on a hand-built corpus: 'rare' appears in
    // 1 of 20 docs, 'common' in all 20; the doc containing both once
    // must owe more of its score to 'rare'
    val docs = (0 until 20).map { i =>
      val words = Seq.fill(10)("filler") ++ Seq("common") ++
        (if (i == 0) Seq("rare") else Seq.empty)
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val n = 20.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    assert(idf(1) > idf(20), "sanity: rarer term has larger idf")
    // and the full pipeline agrees: score(doc0) > score(any other doc)
    // when querying {rare, common} — doc0 is the only one with both
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin("rare", "common"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val scored = tf.join(broadcast(dfreq), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w", col("idf") * (col("tf") * lit(2.2))
        / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum("w").as("score"))
      .as[(Long, Double)].collect().toMap
    val top = scored.maxBy(_._2)._1
    assert(top === 0L, s"doc 0 (rare+common) must rank first, got $top")
  }

  test("packSequences: sharded packing equals packing each shard standalone") {
    // the stream-local equivalence law behind q111/q112: packing is only
    // ever per-stream, so the composite-key (source, shard) window must
    // produce, for every shard k, exactly the metrics of running the
    // single-stream packer over JUST that shard's docs. This is what
    // makes the sharded plan a valid replacement for the per-source
    // window it retired — and what a wrong shard assignment, wrong
    // window ordering, or cross-shard leakage would each break.
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.t(spark, dir, "documents")
    val S = 4L
    def metrics(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("n_seqs"), r.getAs[Long]("split_docs"))
    val sharded = CurationQueries.packSequences(docs, S).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard")) -> metrics(r))
      .toMap
    assert(sharded.nonEmpty && sharded.keys.map(_._2).toSet.size === S.toInt,
      "fixture must populate every shard")
    for (k <- 0L until S) {
      val solo = CurationQueries.packSequences(
          docs.filter(pmod(col("doc_id"), lit(S)) === k), 1)
        .collect().map(r => r.getAs[String]("source") -> metrics(r)).toMap
      val inShard = sharded.collect { case ((src, `k`), m) => src -> m }.toMap
      assert(inShard === solo,
        s"shard $k must equal its standalone packing: $inShard vs $solo")
    }
    // conservation: shards partition the corpus — doc and token totals
    // roll up exactly (n_seqs/split_docs intentionally do NOT: they are
    // per-stream quantities, which is the whole point of sharding)
    val expect = docs
      .groupBy("source")
      .agg(count(lit(1)).as("nd"),
        sum(size(split(col("text"), " "))).cast("long").as("tt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = sharded.groupBy(_._1._1).view.mapValues(ms =>
      (ms.values.map(_._1).sum, ms.values.map(_._2).sum)).toMap
    assert(got === expect, "sharded totals must conserve docs and tokens")
  }

  test("q96 posting pages are bounded and reassemble the exact full index") {
    // the 100 TB property the paging exists for: NO row (and therefore
    // no aggregation buffer) ever holds more than PostingPageDocs ids,
    // however frequent the token — plus lossless reassembly: pages
    // concatenated in page order equal the unpaged sorted posting list,
    // and the windowed df/tf_total equal the page-derived totals.
    val B = CurationQueries.PostingPageDocs
    val rows = CurationQueries.queries("q96_inverted_index")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    def ids(r: org.apache.spark.sql.Row): Seq[Long] = {
      val s = r.getAs[String]("postings")
      if (s.isEmpty) Seq.empty else s.split(",").map(_.toLong).toSeq
    }
    rows.foreach { r =>
      assert(ids(r).size <= B, s"page over $B ids: $r")
      assert(ids(r).size.toLong === r.getAs[Long]("page_df"))
      assert(ids(r).forall(_ / B === r.getAs[Long]("page")),
        s"every id must belong to its page: $r")
    }
    val byTok = rows.groupBy(_.getAs[String]("tok"))
    assert(byTok.exists(_._2.length > 1),
      "fixture must actually produce multi-page tokens")
    byTok.foreach { case (tok, pages) =>
      val cat = pages.sortBy(_.getAs[Long]("page")).flatMap(ids)
      assert(cat.toSeq === cat.sorted.toSeq && cat.distinct.length === cat.length,
        s"$tok: page-order concatenation must be the sorted distinct list")
      assert(pages.map(_.getAs[Long]("df")).distinct.length === 1)
      assert(pages.head.getAs[Long]("df") === cat.length.toLong,
        s"$tok: windowed df must equal total posting count")
      assert(pages.head.getAs[Long]("tf_total") ===
        pages.map(_.getAs[Long]("page_tf")).sum, s"$tok: tf rollup")
    }
  }

  test("q94 SCD2 segments partition each user's timeline without gaps") {
    val q = EventAnalytics.queries("q94_scd2")(spark, "/root/testdata/sf0.001")
      .orderBy("user_id", "version").collect()
    q.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      // versions are 1..m dense
      assert(rows.map(_.getAs[Long]("version")).toSeq === (1L to rows.length))
      // each segment's valid_to equals the next segment's valid_from
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ===
            b.getAs[java.sql.Timestamp]("valid_from"))
        case _ => ()
      }
      // only the last segment is open-ended
      assert(rows.last.isNullAt(rows.last.fieldIndex("valid_to")))
      assert(rows.init.forall(!_.isNullAt(rows.head.fieldIndex("valid_to"))))
    }
  }

  test("q118 spanHashes: stride-1 span count and the short-doc guard") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks -> 3 spans
      (2L, (1 to 8).map(i => s"u$i").mkString(" ")),  // exactly W -> 1 span
      (3L, (1 to 7).map(i => s"v$i").mkString(" "))   // below W -> none
    ).toDF("doc_id", "text")
    val spans = CurationQueries.spanHashes(docs).collect()
    assert(spans.count(_.getLong(0) == 1L) === 3)
    assert(spans.filter(_.getLong(0) == 1L).map(_.getInt(1)).sorted
      === Array(0, 1, 2))
    assert(spans.count(_.getLong(0) == 2L) === 1)
    assert(spans.count(_.getLong(0) == 3L) === 0,
      "short docs must emit no spans (descending-sequence wrap guard)")
  }

  test("q121 CDC boundaries re-synchronize after an insertion") {
    val sess = spark
    import sess.implicits._
    // scala replay of the PolyHash char fold, to pick boundary words
    def ph(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 131 + c.toInt) % 2147483647L)
    def isB(w: String) = ph(w) % CurationQueries.CdcDivisor == 0
    val nonB = Iterator.from(1).map(i => s"w$i").filterNot(isB).take(12).toSeq
    val bWord = Iterator.from(1).map(i => s"b$i").filter(isB).next()
    // shared tail: a boundary word then 3 non-boundary words; prefixes
    // differ in length AND content, so every q118-style positional
    // span of the tail shifts — but the chunk opened after bWord is
    // byte-identical in both docs
    val tail = Seq(bWord) ++ nonB.slice(8, 11)
    val a = (nonB.slice(0, 5) ++ tail).mkString(" ")
    val b = (nonB.slice(5, 8) ++ tail).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = CurationQueries.cdcChunks(docs).orderBy("doc_id").collect()
    // each doc: chunk 1 = prefix..bWord (differs), chunk 2 = the
    // re-synchronized 3-token tail (shared => duplicated)
    assert(out.map(_.getAs[Long]("n_chunks")).toSeq === Seq(2L, 2L))
    assert(out.map(_.getAs[Long]("n_dup_chunks")).toSeq === Seq(1L, 1L))
    assert(out.map(_.getAs[Long]("dup_tokens")).toSeq === Seq(3L, 3L))
    assert(out.map(_.getAs[Long]("n_toks")).toSeq === Seq(9L, 7L))
  }

  test("q121 chunk stream partitions the token stream exactly") {
    val sess = spark
    import sess.implicits._
    val docs = Seq((1L, (1 to 40).map(i => s"t$i").mkString(" ")),
      (2L, "solo")).toDF("doc_id", "text")
    val rows = CurationQueries.cdcChunkStream(docs)
      .groupBy("doc_id").agg(sum("len").as("s"), count(lit(1)).as("c"))
      .orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("s")).toSeq === Seq(40L, 1L),
      "chunk lengths must sum to the doc's token count (no gap/overlap)")
    assert(rows(1).getAs[Long]("c") === 1L, "a 1-token doc is one chunk")
  }

  test("q118 catches a shifted duplicate passage that aligned segments miss") {
    val sess = spark
    import sess.implicits._
    val passage = (1 to CurationQueries.SpanWidth).map(i => s"p$i")
    // the shared 8-token passage sits at offset 3 in doc 1 and offset 1
    // in doc 2 — different alignment mod SegWidth, so q110's disjoint
    // segments never line up on it
    val a = (Seq("a1", "a2", "a3") ++ passage ++ Seq("a4", "a5", "a6", "a7", "a8")).mkString(" ")
    val b = (Seq("b1") ++ passage ++ Seq("b2", "b3", "b4", "b5", "b6", "b7")).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // aligned segments: zero duplicated fingerprints across docs
    val segs = CurationQueries.segmentHashes(docs).collect()
    assert(segs.map(_.getString(1)).groupBy(identity).values
      .forall(_.length == 1), "aligned segments must NOT see the shifted copy")
    // overlapping spans: exactly one duplicated span per doc, covering
    // exactly the passage's 8 token positions
    val out = CurationQueries.substringDedup(docs)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_dup_spans")).toSeq === Seq(1L, 1L))
    assert(out.map(_.getAs[Long]("n_cov_tokens")).toSeq === Seq(8L, 8L))
    assert(out.map(_.getAs[Long]("n_toks")).toSeq === Seq(16L, 15L))
  }

  test("q131: verbatim duplicates score zero novelty, unique docs score one") {
    val sess = spark
    import sess.implicits._
    val common = (1 to 10).map(i => s"c$i").mkString(" ")
    val uniq = (1 to 10).map(i => s"u$i").mkString(" ")
    val out = CurationQueries.ngramNovelty(
        Seq((1L, common), (2L, common), (3L, uniq)).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty"))
      .toMap
    // every shingle of docs 1/2 occurs in the other; doc 3 shares none
    assert(out(1L) === 0.0 && out(2L) === 0.0,
      "a verbatim duplicate has no corpus-unique shingles")
    assert(out(3L) === 1.0, "an unrelated doc is fully novel")
  }

  test("q165: symmetric-delete blocking finds all ed-1 shapes, never ed-2") {
    val sess = spark
    import sess.implicits._
    val titles = Seq(
      (1L, "alpha beta"),   // base
      (2L, "alpha betax"),  // insertion at end
      (3L, "alpha bXta"),   // substitution mid
      (4L, "alpha bet"),    // deletion at end
      (5L, "lpha beta"),    // deletion at head
      (6L, "QQpha beta"),   // ed 2 from base — must NOT pair with base
      (7L, "unrelated")).toDF("doc_id", "title")
    val out = CurationQueries.fuzzyTitlePairs(titles).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("dist")))
    val paired = out.map { case (a, b, _) => Set(a, b) }
    for (v <- Seq("alpha betax", "alpha bXta", "alpha bet", "lpha beta"))
      assert(paired.contains(Set("alpha beta", v)),
        s"ed-1 variant '$v' must pair with the base")
    assert(!paired.contains(Set("alpha beta", "QQpha beta")),
      "an ed-2 string must not match at the ed<=1 threshold")
    assert(!out.exists { case (a, b, _) => a == "unrelated" || b == "unrelated" },
      "an unrelated title must not pair")
    assert(out.forall(_._3 <= 1), "every reported pair verifies at ed<=1")
  }

  test("q172: entropy is 0 for a one-token feed and ~ln(v) for a uniform one") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      ("mono", "x x x x x x x x"),            // collapsed feed: H = 0
      ("uni",  "a b c d a b c d"),            // uniform over 4: H = ln 4
      ("skew", "a a a a a a a b")).toDF("source", "text")
    val out = CurationQueries.entropyBySource(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("mono") === ((8L, 1L, 0L)),
      "a single-token feed must score exactly zero entropy")
    val lnV = math.floor(math.log(4.0) * 1e6 + 1e-6).toLong
    val (n, v, h) = out("uni")
    assert(v === 4L && math.abs(h - lnV) <= 4,
      s"uniform-over-4 entropy $h must sit within quantization of ln4 ($lnV)")
    assert(out("skew")._3 > 0 && out("skew")._3 < out("uni")._3,
      "a skewed feed scores strictly between collapsed and uniform")
  }

  test("q184: slope reads -1 on a Zipfian corpus and ~0 on a uniform one") {
    val sess = spark
    import sess.implicits._
    // Zipfian: token t_r appears round(1000/r) times, r = 1..50
    val zipfText = (1 to 50).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"t$r")).mkString(" ")
    val z = CurationQueries.zipfFit(Seq((1L, zipfText)).toDF("doc_id", "text"))
      .head()
    assert(math.abs(z.getAs[Double]("zipf_slope") - (-1.0)) < 0.02,
      s"count = 1000/rank must fit slope ~ -1, got ${z.getAs[Double]("zipf_slope")}")
    // uniform: every token equally frequent -> slope exactly 0
    val uniText = (1 to 50).flatMap(r => Seq.fill(20)(s"u$r")).mkString(" ")
    val u = CurationQueries.zipfFit(Seq((1L, uniText)).toDF("doc_id", "text"))
      .head()
    assert(u.getAs[Double]("zipf_slope") === 0.0,
      "a uniform distribution has a flat rank/frequency curve")
  }

  test("q184 width: a 5,000-vocab corpus matches an exact BigInt recompute " +
      "(int64 moment sums would wrap)") {
    val sess = spark
    import sess.implicits._
    // The fixtures carry 31 distinct tokens, far under the ~600-vocab
    // point where int64 n·Σxx wraps — this pins the regime they never
    // reach. 5,000 tokens with small per-token counts (1 + r mod 7)
    // keeps the corpus at ~20k tokens while ln(rank) spans the full
    // ln(1)..ln(5000) range, putting n·Σxx ≈ 1.4e21 — 150× past int64.
    val V = 5000
    val counts = (1 to V).map(r => (f"t$r%05d", 1 + r % 7))
    val docs = counts.zipWithIndex.map { case ((tok, c), i) =>
      (i.toLong, Seq.fill(c)(tok).mkString(" ")) }.toDF("doc_id", "text")
    val got = CurationQueries.zipfFit(docs).head()
    // exact recompute in BigInt: same quantization, same tie-break
    // (count DESC, token), same one-double-division formula
    val pts = counts.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), i) =>
        (BigInt(math.floor(math.log((i + 1).toDouble) * 1e6 + 1e-6).toLong),
         BigInt(math.floor(math.log(c.toDouble) * 1e6 + 1e-6).toLong)) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val den = n * sxx - sx * sx
    assert(den > BigInt(Long.MaxValue),
      s"denominator $den must genuinely exceed int64 or this test pins nothing")
    val slope = (n * sxy - sx * sy).toDouble / den.toDouble
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("vocab") === V.toLong)
    assert(got.getAs[Double]("zipf_slope") === r6(slope),
      "DECIMAL(38,0) partials must reproduce the exact-integer slope")
    assert(got.getAs[Double]("ln_c_intercept") ===
      r6((sy.toDouble - slope * sx.toDouble) / n.toDouble / 1e6),
      "intercept must come off the same exact integers")
  }

  test("q185: a concentrated token out-bursts a spread one; Poisson-ish reads ~1") {
    val sess = spark
    import sess.implicits._
    // 10 docs; "burst" appears 20 times in ONE doc, "flat" twice in
    // every doc (same total = 20). VMR(burst) ≫ VMR(flat).
    val docs = (1 to 10).map { i =>
      val b = if (i == 1) Seq.fill(20)("burst") else Nil
      (i.toLong, (b ++ Seq.fill(2)("flat") ++ Seq("pad")).mkString(" "))
    }.toDF("doc_id", "text")
    val out = CurationQueries.burstinessBoard(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("vmr")).toMap
    // exact: burst N=10, T=20, S2=400 -> (10*400-400)/(10*20) = 18
    assert(out("burst") === 18.0, s"got ${out("burst")}")
    // flat: S2 = 10*4 = 40 -> (400-400)/200 = 0 (perfectly even)
    assert(out("flat") === 0.0)
    assert(out("burst") > out("flat"))
  }

  test("q180: AND retrieval returns exactly the docs containing every query term") {
    val dir = "/root/testdata/sf0.001"
    val got = CurationQueries.queries("q180_search_and")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val q = docs.flatMap(_._2).groupBy(identity).toSeq
      .map { case (t, v) => (t, v.length) }
      .sortBy { case (t, n) => (-n, t) }.take(3).map(_._1)
    val expect = docs.flatMap { case (id, toks) =>
      val tf = q.map(t => toks.count(_ == t).toLong)
      if (tf.forall(_ > 0)) Some(id -> (tf.min, tf.sum)) else None
    }.toMap
    assert(got === expect,
      "intersection-as-agg must equal the exact per-doc containment scan")
    assert(expect.size < docs.length,
      "the conjunction must exclude at least one doc (non-degenerate)")
  }

  test("q189: curated packing reconciles with the pipeline survivors") {
    val dir = "/root/testdata/sf0.001"
    val out = CurationQueries.queries("q189_pack_curated")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val surv = CurationQueries.pipelineSurvivors(spark, dir)
      .select(col("source"), org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.split(col("text"), " "))
        .cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = surv.groupBy(_._1).map { case (src, rows) =>
      src -> (rows.length.toLong, rows.map(_._2).sum)
    }
    assert(out.view.mapValues(v => (v._1, v._2)).toMap === expect,
      "per-source doc and token totals must equal the survivor frame")
    // sequence count is bounded below by the unsharded ideal
    val w = CurationQueries.PackWindow
    out.foreach { case (src, (_, toks, seqs)) =>
      assert(seqs >= (toks + w - 1) / w,
        s"$src: sharded packing can only add boundary sequences")
    }
  }

  test("q177: pipeline manifest is consistent with its standalone stages") {
    val dir = "/root/testdata/sf0.001"
    val manifest = CurationQueries.queries("q177_pipeline")(spark, dir).collect()
    val total = manifest.map(_.getAs[Long]("n_docs")).sum
    val raw = graft.Tables.t(spark, dir, "documents").count()
    assert(total > 0 && total < raw,
      s"the pipeline must keep some docs and drop some ($total of $raw)")
    assert(manifest.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
    // stage-1 consistency against the STANDALONE q146 key: the
    // pipeline's survivors must be a subset of q146's first_seen
    // keepers (later stages only remove)
    val k1 = CurationQueries.queries("q146_url_dedup")(spark, dir)
      .select(col("first_seen")).collect().map(_.getLong(0)).toSet
    val survivors = {
      // re-derive survivor ids from the manifest's id_sum pins by
      // re-running the pipeline head: cheaper — assert group id_sums
      // are consistent with SOME subset of k1 via the total bound
      val idSum = manifest.map(_.getAs[Long]("id_sum")).sum
      val k1Sum = k1.sum
      assert(idSum <= k1Sum,
        "survivor id mass cannot exceed the stage-1 keeper mass")
      assert(total <= k1.size.toLong,
        "later stages only remove: survivor count <= stage-1 keepers")
    }
    survivors
  }

  test("q176: overlap matrix covers all pairs and matches set arithmetic") {
    val dir = "/root/testdata/sf0.001"
    val out = CurationQueries.queries("q176_vocab_overlap")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getAs[Double]("jaccard"))).toMap
    val vocab = graft.Tables.t(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (s0, rows) => s0 -> rows.flatMap(_._2.split(" ")).toSet }
    val srcs = vocab.keys.toSeq.sorted
    val expect = (for {
      a <- srcs; b <- srcs if a < b
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
      uni = (vocab(a) | vocab(b)).size.toLong
    } yield (a, b) -> (inter, uni,
      BigDecimal(inter.toDouble / uni)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(out === expect, "matrix must equal exact set arithmetic")
  }

  test("q166: an exclusive token tops the keyness board; a uniform one scores ~0") {
    val sess = spark
    import sess.implicits._
    // srcA's docs carry the marker token "exclusive"; all sources share
    // uniform filler. G² must rank (srcA, exclusive) first; filler
    // tokens, distributed proportionally, must score (near) zero.
    val docs = (1 to 40).map { i =>
      val src = if (i <= 10) "srcA" else s"src${i % 3}"
      val marker = if (src == "srcA") " exclusive" else ""
      (src, s"f1 f2 f3 f4$marker")
    }.toDF("source", "text")
    val out = CurationQueries.keynessBoard(docs).collect()
    assert(out.head.getString(0) === "srcA" &&
      out.head.getString(1) === "exclusive",
      s"the source-exclusive token must top the board")
    // the exclusive cell dominates every filler cell by orders of magnitude
    val top = out.head.getAs[Long]("g2_micro")
    val fillers = out.filter(_.getString(1) != "exclusive")
      .map(_.getAs[Long]("g2_micro"))
    assert(fillers.forall(_ < top / 2),
      "proportionally distributed fillers must not rival the exclusive token")
  }

  test("q159: PMI separates a glued pair from independent fillers") {
    val sess = spark
    import sess.implicits._
    // "x y" always co-occur (every occurrence of x is followed by y);
    // fillers a/b/c combine freely. PMI must rank the glued pair first
    // and agree with an exact driver-side recompute of the formula.
    val docs = (1 to 30).map { i =>
      val filler = Seq("a", "b", "c")(i % 3)
      (i.toLong, s"x y $filler x y a b c a $filler")
    }.toDF("doc_id", "text")
    val out = CurationQueries.queries("q159_pmi_collocations")
      .apply(sess, "/root/testdata/sf0.001") // signature needs dir; recompute below on fixture
    val rows = out.collect()
    assert(rows.length === 20 && rows.map(_.getAs[Long]("pair_cnt")).forall(_ >= 5))
    // exact recompute on the fixture: counts + one math.log per pair
    val fix = graft.Tables.t(sess, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect().map(_.getString(0))
    val toks = fix.flatMap(_.split(" "))
    val bigr = fix.flatMap(t => { val w = t.split(" "); w.dropRight(1).zip(w.drop(1)) })
    val cu = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cb = bigr.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nU = toks.length.toLong; val nB = bigr.length.toLong
    val expect = cb.toSeq.filter(_._2 >= 5).map { case ((w1, w2), c) =>
      val x = math.log(c.toDouble * nU * nU / (nB.toDouble * cu(w1) * cu(w2))) * 1e6
      (s"$w1 $w2", math.floor(x + 1e-6).toLong)
    }.sortBy { case (bg, p) => (-p, bg) }.take(20)
    val got = rows.map(r => (r.getAs[String]("bg"), r.getAs[Long]("pmi_micro"))).toSeq
    assert(got === expect, "engine PMI board must equal the exact recompute")
    // and the synthetic glued pair outranks every filler combination
    val synth = CurationQueries.pmiBoard(docs).collect()
    assert(synth.head.getAs[String]("bg") === "x y",
      "the always-adjacent pair must top the PMI board")
  }

  test("q195: rrf fusion equals the exact rank arithmetic over both arms") {
    val dir = "/root/testdata/sf0.001"
    val got = CurationQueries.queries("q195_rrf_fusion")(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3))).toSeq
    // lexical arm: rank the engine's own bm25 board (its exactness is
    // q93's oracle-gated concern; THIS law pins the fusion arithmetic)
    val txt = CurationQueries.bm25PerDoc(
      graft.Tables.tWide(spark, dir, "documents"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // dense arm: driver-side cosine replaying seq_dot's float-product-
    // widened-to-double sequential fold exactly (contract D7)
    val emb = graft.Tables.tWide(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) * b(i)).toDouble)
    val (qe, qn) = {
      val q = emb.find(_._1 == 0L).get._2
      (q, math.sqrt(dot(q, q)))
    }
    val vec = emb.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(qe, v) / (qn * math.sqrt(dot(v, v)))) }
      .filterNot { case (_, s) => s.isNaN }
      .sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expect = (txt.keySet ++ vec.keySet).toSeq.map { id =>
      val rrf = txt.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vec.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, txt.get(id), vec.get(id), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(20)
      .map { case (id, rt, rv, rrf) =>
        (id, rt, rv, BigDecimal(rrf)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got === expect,
      "fused board must equal the exact union-of-arms rank arithmetic")
    // non-degenerate: the fixture must exercise all three membership
    // shapes (both arms, text-only, vector-only)
    assert(got.exists(t => t._2.isDefined && t._3.isDefined) &&
      got.exists(t => t._2.isEmpty) && got.exists(t => t._3.isEmpty),
      "fixture board should contain both-arms, text-only and vector-only rows")
  }

  test("q198: DSIR weights equal an exact driver-side hashed-gram recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = CurationQueries.queries("q198_dsir_weight")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val V = CurationQueries.DsirBuckets
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % 2147483647L)
    val docs = graft.Tables.tWide(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // gram instance stream: unigrams ++ positional bigrams, hashed
    val grams = docs.flatMap { case (id, lang, _, text) =>
      val toks = text.split(" ", -1)
      val gs = toks.toSeq ++
        (if (toks.length < 2) Seq.empty
         else (0 until toks.length - 1).map(i => toks(i) + " " + toks(i + 1)))
      gs.map(g => (id, lang, polyHash(g) % V))
    }
    val nr = grams.length.toLong
    val nt = grams.count(_._2 == "en").toLong
    val lam = grams.groupBy(_._3).map { case (h, inst) =>
      val cr = inst.length.toLong
      val ct = inst.count(_._2 == "en").toLong
      h -> math.floor(math.log(((ct + 1) * (nr + V)).toDouble
        / ((cr + 1) * (nt + V)).toDouble) * 1e6 + 1e-6).toLong
    }
    val perDoc = grams.groupBy(_._1).map { case (id, inst) =>
      id -> (inst.length.toLong, inst.map(g => lam(g._3)).sum)
    }
    val meta = docs.map(d => d._1 -> (d._2, d._3)).toMap
    val expect = perDoc.toSeq
      .sortBy { case (id, (_, w)) => (-w, id) }.take(CurationQueries.DsirTopK)
      .map { case (id, (nf, w)) =>
        (id, meta(id)._1, meta(id)._2, nf, w,
          BigDecimal(w.toDouble / 1e6)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got === expect,
      "DSIR board must equal the exact quantized-λ recompute")
    // and the weights discriminate: target-domain docs average higher
    val (enW, otherW) = {
      val byLang = perDoc.toSeq.map { case (id, (_, w)) => (meta(id)._1, w) }
      (byLang.filter(_._1 == "en").map(_._2.toDouble),
        byLang.filterNot(_._1 == "en").map(_._2.toDouble))
    }
    assert(enW.sum / enW.length > otherW.sum / otherW.length,
      "mean importance weight must be higher for the target domain")
  }

  test("q204: frozen-λ delta scoring equals an exact recompute incl. the unseen default") {
    val dir = "/root/testdata/sf0.001"
    val got = CurationQueries.queries("q204_dsir_score_delta")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val V = CurationQueries.DsirBuckets
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % 2147483647L)
    val docs = graft.Tables.tWide(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def grams(ds: Seq[(Long, String, String, String)]) =
      ds.flatMap { case (id, lang, _, text) =>
        val toks = text.split(" ", -1)
        val gs = toks.toSeq ++
          (if (toks.length < 2) Seq.empty
           else (0 until toks.length - 1).map(i => toks(i) + " " + toks(i + 1)))
        gs.map(g => (id, lang, polyHash(g) % V))
      }
    val corpusG = grams(docs.filter(_._1 % 10 != 7))
    val deltaG = grams(docs.filter(_._1 % 10 == 7))
    val nr = corpusG.length.toLong
    val nt = corpusG.count(_._2 == "en").toLong
    val byH = corpusG.groupBy(_._3)
    // λ over the FULL spine — unseen buckets carry the smoothed default
    def lam(h: Long): Long = {
      val inst = byH.getOrElse(h, Seq.empty)
      val cr = inst.length.toLong
      val ct = inst.count(_._2 == "en").toLong
      math.floor(math.log(((ct + 1) * (nr + V)).toDouble
        / ((cr + 1) * (nt + V)).toDouble) * 1e6 + 1e-6).toLong
    }
    val meta = docs.map(d => d._1 -> (d._2, d._3)).toMap
    val expect = deltaG.groupBy(_._1).toSeq.map { case (id, inst) =>
      (id, meta(id)._1, meta(id)._2, inst.length.toLong,
        inst.map(g => lam(g._3)).sum)
    }.sortBy { case (id, _, _, _, w) => (-w, id) }
      .take(CurationQueries.DsirTopK)
      .map { case (id, l, src, nf, w) =>
        (id, l, src, nf, w, BigDecimal(w.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got === expect,
      "frozen-weights delta board must equal the exact split recompute")
    // the split must actually exercise the unseen-feature default
    val corpusH = byH.keySet
    assert(deltaG.exists(g => !corpusH.contains(g._3)),
      "fixture delta should contain at least one corpus-unseen bucket")
  }
}
