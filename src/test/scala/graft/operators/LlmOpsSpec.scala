package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextOps

/** Unit layer for the dedup/similarity operators: synthetic known
  * duplicates (the fixtures' near-dups are only statistical), hash
  * portability constants, and MinHash-vs-exact-Jaccard error bounds. */
class LlmOpsSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("doc_id", "text")
  }

  test("charPolyHash matches the cross-engine constant for 'hello'") {
    val sess = spark
    import sess.implicits._
    // 792145564 = fold('hello', 0, (a,c) -> (a*131 + ascii(c)) % (2^31-1)),
    // verified against DuckDB's list_reduce in the oracle prototype.
    val got = Seq("hello").toDF("s")
      .select(TextOps.charPolyHash(col("s"))).head().getLong(0)
    assert(got === 792145564L)
  }

  test("minhash detects synthetic near-duplicates and skips unrelated docs") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 38).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val unrelated = (1 to 40).map(i => s"z$i").mkString(" ")
    val pairs = LlmQueries.minhashPairs(
        docsDF(Seq((1L, base), (2L, nearDup), (3L, unrelated))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L },
      "near-dup pair must be banding candidates")
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L },
      "unrelated doc must produce no candidate pair")
    // exact 3-shingle Jaccard of (base, nearDup): 36 shared / 40 union
    val est = pairs.collect { case (1L, 2L, cnt) => cnt / 32.0 }.head
    val exact = 36.0 / 40.0
    assert(math.abs(est - exact) < 0.25,
      s"minhash estimate $est should approximate exact $exact")
  }

  test("per-row MinHashCode is bit-identical to the MinHashAgg group-by form") {
    // the streaming-ingest kernel (q108) must produce EXACTLY the
    // signatures the aggregate produces (q44/q106), or the streaming
    // and batch probes of the same corpus index would disagree
    val docs = docsDF(Seq(
      1L -> (1 to 40).map(i => s"w$i").mkString(" "),
      2L -> ((1 to 30).map(i => s"w$i") ++ Seq("x", "y", "z")).mkString(" "),
      3L -> "a b c d e f g",
      4L -> "exact copy exact copy exact copy"))
    val viaAgg = LlmQueries.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCode = docs
      .withColumn("arr", transform(
        LlmQueries.shingles(col("text"), 3),
        sg => graft.plans.GraftExpressions.poly_hash(sg)))
      .filter(size(col("arr")) > 0)
      .select(col("doc_id"), graft.plans.MinHashAgg.minhash_code(col("arr")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaCode === viaAgg)
    // empty-array rows yield the untouched-buffer sentinel, not a crash
    val sentinel = docsDF(Seq(5L -> "too short"))
      .withColumn("arr", transform(
        LlmQueries.shingles(col("text"), 3),
        sg => graft.plans.GraftExpressions.poly_hash(sg)))
      .select(graft.plans.MinHashAgg.minhash_code(col("arr")))
      .head().getSeq[Long](0)
    assert(sentinel.forall(_ == Long.MaxValue))
  }

  test("docs shorter than the shingle size produce no pairs and no crash") {
    val pairs = LlmQueries.minhashPairs(
      docsDF(Seq((1L, "one two"), (2L, "one two"), (3L, "a"))))
    assert(pairs.collect().isEmpty,
      "sub-shingle docs have no signatures, hence no candidate pairs")
  }

  test("identical texts give identical signatures and full agreement") {
    val text = (1 to 30).map(i => s"t$i").mkString(" ")
    val pairs = LlmQueries.minhashPairs(docsDF(Seq((1L, text), (2L, text))))
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(2) === 32L, "all 32 minhashes must agree")
  }

  test("nearDupPairs persisted frame equals the direct minhashPairs pipeline") {
    // the build-once pair index serves seven gated keys; this law pins
    // that the parquet round-trip (and the build/reuse guard) changes
    // NOTHING vs computing pairs from scratch on the same corpus
    val dir = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val persisted = LlmQueries.nearDupPairs(spark, dir, rebuild = true)
      .select("doc_a", "doc_b", "match_cnt", "est_jaccard")
      .collect().map(key).toSet
    val direct = LlmQueries.minhashPairs(
        graft.Tables.tWide(spark, dir, "documents"))
      .select("doc_a", "doc_b", "match_cnt", "est_jaccard")
      .collect().map(key).toSet
    assert(persisted === direct)
    assert(persisted.nonEmpty, "fixture corpus must produce candidates")
    // and the REUSE path (no rebuild) serves the identical content
    val reused = LlmQueries.nearDupPairs(spark, dir)
      .select("doc_a", "doc_b", "match_cnt", "est_jaccard")
      .collect().map(key).toSet
    assert(reused === persisted)
  }

  test("grownPairIndex (A build + B delta append) equals the one-shot pair frame") {
    // the q136 gate's row-level form: epoch-wise growth must reproduce
    // the one-shot pair set EXACTLY, including sub-threshold candidates
    // (the persisted frames are unfiltered)
    val dir = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val grown = spark.read
      .parquet(LlmQueries.grownPairIndex(spark, dir, rebuild = true))
      .select("doc_a", "doc_b", "match_cnt", "est_jaccard")
      .collect().map(key).toSet
    val oneShot = LlmQueries.nearDupPairs(spark, dir, rebuild = true)
      .select("doc_a", "doc_b", "match_cnt", "est_jaccard")
      .collect().map(key).toSet
    assert(grown === oneShot)
    // the delta actually contributed: epoch B endpoints exist in the set
    assert(grown.exists { case (a, b, _, _) => a % 10 == 3 || b % 10 == 3 },
      "fixture corpus must produce candidate pairs touching epoch B")
  }

  test("q123 sketch error: identical docs score est=exact=1, err=0") {
    val text = (1 to 30).map(i => s"t$i").mkString(" ")
    val rows = LlmQueries.sketchError(docsDF(Seq((1L, text), (2L, text))))
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Double]("est_jaccard") === 1.0)
    assert(r.getAs[Double]("exact_jaccard") === 1.0)
    assert(r.getAs[Double]("abs_err") === 0.0)
  }

  test("q123 exact side counts DISTINCT shingles (multiset-proof)") {
    // doc 2 repeats doc 1's text — its shingle MULTISET doubles (plus
    // the three spanning shingles) but the distinct SET barely grows;
    // an implementation intersecting multisets would overcount the
    // union and underestimate exact Jaccard
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val rows = LlmQueries.sketchError(
        docsDF(Seq((1L, base), (2L, s"$base $base"))))
      .collect()
    if (rows.nonEmpty) { // pair surfaces only if bands collide — it does
      val r = rows.head
      // |A| = 28 distinct trigrams; B repeats them all and adds the 2
      // seam trigrams (t29 t30 t1, t30 t1 t2): |B| = 30, inter = 28,
      // union = 30 — exact = 28/30 regardless of the repeat
      assert(r.getAs[Double]("exact_jaccard") ===
        BigDecimal(28.0 / 30.0).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("fingerprint is order-sensitive and deterministic") {
    val sess = spark
    import sess.implicits._
    val fps = Seq("a b c", "a b c", "c b a", "a  b   c").toDF("text")
      .select(TextOps.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
    assert(fps(0) === fps(3), "repeated separators must not change the fingerprint")
  }

  test("grownBandIndex publishes atomically: stale build temp replaced, content = one-shot build") {
    // the two-step (store epoch A, append epoch B) build runs under a
    // temp name and renames only after BOTH steps — tableExists(final)
    // must imply a complete index. Simulate a crashed previous build by
    // planting a garbage table under the temp name, then build and
    // compare against corpusBandIndex's one-shot build of the SAME doc
    // set (grown = ∉{3,7} ∪ {3} = ∉{7} = one-shot's filter).
    val sess = spark
    import sess.implicits._
    val dir = "/root/testdata/sf0.001"
    val tab = "graft_grown_bands_" +
      graft.sources.Staging.sessionSuffix(spark, dir)
    spark.sql(s"DROP TABLE IF EXISTS `${tab}__build_tmp`")
    Seq((1L, "junk")).toDF("a", "b").write.saveAsTable(tab + "__build_tmp")
    val name = LlmQueries.grownBandIndex(spark, dir, rebuild = true)
    assert(name === tab)
    assert(!spark.catalog.tableExists(tab + "__build_tmp"),
      "the temp name must be renamed away after publish")
    def rows(t: String) = spark.table(t)
      .select(col("doc_id"), col("bk"),
        concat_ws(",", col("sig")).as("sig_s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val oneShot = LlmQueries.corpusBandIndex(spark, dir, rebuild = true)
    assert(rows(name) === rows(oneShot),
      "grown index content must equal the one-shot build")
  }

  test("simhash: near-identical docs have small hamming distance") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 38).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val unrelated = (1 to 40).map(i => s"q$i").mkString(" ")
    val sh = SimilarityQueries.simhash(
        docsDF(Seq((1L, base), (2L, nearDup), (3L, unrelated))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)),
      "near-dup must be closer in hamming space than unrelated")
    assert(hamming(sh(1L), sh(1L)) === 0)
  }

  test("q214: survivor clusters equal a driver-side union-find over q54's exact pairs") {
    // the house standard: recompute the whole contract independently.
    // Union-find fully converges, so equality also PROVES the engine's
    // fixed SurvivorIters step count reaches the fixpoint here — and
    // that cluster_id (the propagated label) is the component min.
    val dir = "/root/testdata/sf0.001"
    val pairs = SimilarityQueries.queries("q54_simhash")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture corpus must contain hamming<=8 pairs")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).values
      .map(ds => (ds.min, ds.length.toLong, ds.min, ds.length.toLong - 1))
      .toSet
    val got = SimilarityQueries.queries("q214_simhash_survivors")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === got.map(_._1).distinct.length, "one row per cluster")
    assert(got.toSet === expect)
  }

  test("q214: fingerprint collapse clusters synthetic dup groups, both candidate rules honored") {
    // brute-force the CONTRACT in the driver: candidate iff some 15-bit
    // chunk agrees (the recall rule — 8 bits CAN split 2+2+2+2 across
    // chunks), pair iff additionally hamming <= 8; then union-find.
    val texts = Seq(
      1L -> (1 to 40).map(i => s"w$i").mkString(" "),
      2L -> (1 to 40).map(i => s"w$i").mkString(" "),   // exact dup of 1
      3L -> (1 to 40).map(i => s"w$i").mkString(" "),   // exact dup of 1
      4L -> (1 to 40).map(i => s"z$i").mkString(" "),
      5L -> (1 to 40).map(i => s"z$i").mkString(" "),   // exact dup of 4
      6L -> (1 to 40).map(i => s"u$i").mkString(" "))   // lone content
    val sh = SimilarityQueries.simhash(docsDF(texts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = texts.map(_._1)
    def chunkEq(a: Long, b: Long) =
      (0 to 3).exists(c => ((a >> (c * 15)) & 32767L) == ((b >> (c * 15)) & 32767L))
    val expPairs = for {
      a <- ids; b <- ids
      if a < b && chunkEq(sh(a), sh(b)) &&
        java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 8
    } yield (a, b)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = expPairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).values
      .map(ds => (ds.min, ds.length.toLong, ds.min, ds.length.toLong - 1))
      .toSet
    val got = SimilarityQueries.simhashSurvivors(spark, docsDF(texts))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expect)
    // the guaranteed core: exact dups share a fingerprint, so {1,2,3}
    // must cluster with survivor 1 whatever the cross-content hammings
    assert(got.exists { case (cid, n, surv, _) =>
      cid == 1L && surv == 1L && n >= 3L })
  }

  test("q215: survivor clusters equal a driver-side union-find over q44's gate-proven pairs") {
    // the q214 law applied to the MinHash family: recompute the whole
    // contract independently. Union-find fully converges, so equality
    // also PROVES the fixed SurvivorIters step count reaches the
    // fixpoint here — and that cluster_id (the propagated label) is
    // the component min. q44's pair set is the doc-granularity graph;
    // q215 computes its components at distinct-signature granularity,
    // so equality is exactly the interchangeability argument.
    val dir = "/root/testdata/sf0.001"
    val pairs = LlmQueries.queries("q44_dedup_near")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture corpus must contain gate-proven pairs")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).values
      .map(ds => (ds.min, ds.length.toLong, ds.min, ds.length.toLong - 1))
      .toSet
    val got = LlmQueries.queries("q215_minhash_survivors")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === got.map(_._1).distinct.length, "one row per cluster")
    assert(got.toSet === expect)
    spark.catalog.clearCache()
  }

  test("q215: signature collapse clusters synthetic dup groups, band-candidate rule honored") {
    // brute-force the CONTRACT in the driver: candidate iff some
    // 4-perm band agrees (the recall rule), pair iff additionally
    // >= NearDupMinMatches of 32 signature slots agree; then
    // union-find. Exact dups share the whole signature, so they MUST
    // cluster whatever the cross-content band collisions do.
    val texts = Seq(
      1L -> (1 to 40).map(i => s"w$i").mkString(" "),
      2L -> (1 to 40).map(i => s"w$i").mkString(" "),   // exact dup of 1
      3L -> (1 to 40).map(i => s"w$i").mkString(" "),   // exact dup of 1
      4L -> (1 to 40).map(i => s"z$i").mkString(" "),
      5L -> (1 to 40).map(i => s"z$i").mkString(" "),   // exact dup of 4
      6L -> (1 to 40).map(i => s"u$i").mkString(" "))   // lone content
    val sigs = LlmQueries.minhashSignatures(docsDF(texts))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ids = texts.map(_._1)
    def bandEq(a: Seq[Long], b: Seq[Long]) =
      (0 to 7).exists(bd =>
        a.slice(bd * 4, bd * 4 + 4) == b.slice(bd * 4, bd * 4 + 4))
    def matchCnt(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }
    val expPairs = for {
      a <- ids; b <- ids
      if a < b && bandEq(sigs(a), sigs(b)) &&
        matchCnt(sigs(a), sigs(b)) >= LlmQueries.NearDupMinMatches
    } yield (a, b)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = expPairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).values
      .map(ds => (ds.min, ds.length.toLong, ds.min, ds.length.toLong - 1))
      .toSet
    val got = LlmQueries.minhashSurvivors(spark, docsDF(texts))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expect)
    // the guaranteed core: exact dups share a signature, so {1,2,3}
    // must cluster with survivor 1 whatever cross-content collisions do
    assert(got.exists { case (cid, n, surv, _) =>
      cid == 1L && surv == 1L && n >= 3L })
    spark.catalog.clearCache()
  }

  test("q206/q212: the 2^17-1 cluster-width bound TRIPS with its documented message") {
    // VERDICT r16 item 3: the assert_true at kmeansReassign's partial
    // sums had never fired. Build a >131,071-member cluster (one cid,
    // 1-dim vectors) and require the loud throw; 131,071 members must
    // still pass — the bound is exact, not approximate.
    val sess = spark
    import sess.implicits._
    def cluster(n: Long) = spark.range(n)
      .select(col("id").as("vec_id"), array(lit(1L)).as("vq"),
        lit(0L).as("cid"), lit(0L).as("pcid"))
    val ex = intercept[Throwable] {
      SimilarityQueries.kmeansReassign(cluster(131072L)).count()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("exactness bound violated"),
      s"the documented width-bound message must surface, got: $msgs")
    val ok = SimilarityQueries.kmeansReassign(cluster(131071L))
    assert(ok.count() === 131071L, "at the bound exactly, reassignment runs")
  }

  test("q134: the grown IVF index equals the one-shot build row-for-row") {
    val dir = "/root/testdata/sf0.001"
    def rows(path: String) = spark.read.parquet(path)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    val oneShot = rows(SimilarityQueries.ivfIndex(spark, dir))
    val grown = rows(SimilarityQueries.ivfIndexGrown(spark, dir))
    assert(grown === oneShot,
      "frozen-centroid append must reproduce the one-shot assignment")
  }

  test("q152/q153: funnel stages chain and bitext + within-lang partition the pair set") {
    val dir = "/root/testdata/sf0.001"
    val funnel = LlmQueries.queries("q152_dedup_funnel")(spark, dir)
      .orderBy("stage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    funnel.foreach { case (st, nIn, nDrop, nOut) =>
      assert(nOut === nIn - nDrop && nDrop >= 0L, s"stage $st must balance") }
    funnel.sliding(2).foreach { case Array((_, _, _, out), (st, in, _, _)) =>
      assert(in === out, s"stage $st must consume the previous stage's survivors")
    }
    assert(funnel.last._3 > 0L, "the near stage must drop fixtures' near-dups")
    val bitext = LlmQueries.queries("q153_bitext_candidates")(spark, dir).count()
    val allPairs = LlmQueries.queries("q44_dedup_near")(spark, dir).count()
    assert(bitext > 0L && bitext < allPairs,
      "cross-lang candidates must be a proper nonempty subset of q44's pairs")
  }

  test("q151: syndication matrix conserves the q44 pair total") {
    // every near-dup pair lands in exactly one (source_a, source_b)
    // cell — the q128 conservation law applied to source attribution
    val dir = "/root/testdata/sf0.001"
    val matrixTotal = LlmQueries.queries("q151_syndication")(spark, dir)
      .agg(sum("n_pairs")).head.getLong(0)
    val pairTotal = LlmQueries.queries("q44_dedup_near")(spark, dir).count()
    assert(matrixTotal === pairTotal)
    assert(matrixTotal > 0L, "fixture corpus must contain near-dup pairs")
  }

  test("q143: semdedup drops only same-cluster lower-id duplicates, a subset of q73's band pairs") {
    val dir = "/root/testdata/sf0.001"
    val dropped = SimilarityQueries.queries("q143_semdedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dropped.nonEmpty,
      "fixture corpus must contain within-cluster near-dups")
    assert(dropped.forall { case (_, vecId, dupOf) => dupOf < vecId },
      "the keeper is always the lowest id")
    // same-cluster law, against the persisted index itself
    val cid = spark.read.parquet(SimilarityQueries.ivfIndex(spark, dir))
      .select(col("vec_id"), col("cid").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    dropped.foreach { case (c, vecId, dupOf) =>
      assert(cid(vecId) === c && cid(dupOf) === c,
        s"pair ($dupOf, $vecId) must share cluster $c") }
    // the (cid, band) candidate filter is strictly SHARPER than q73's
    // band-only filter: every dropped pair must appear among q73's
    // same-band pairs at the same cosine threshold
    val bandPairs = CorpusQueries.queries("q73_embed_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped.forall { case (_, v, d) => bandPairs.contains((d, v)) },
      "semdedup pairs must be a subset of the band-only pair set")
  }

  test("q138: streamed ANN serving equals the one-shot q57 probe row-for-row") {
    // the serving path recomputes each query's centroid per micro-batch
    // from the reconstructed frozen centroid set; this law pins that
    // the recomputed assignment + per-batch top-3 reproduce the batch
    // probe EXACTLY (the oracle proves it against DuckDB; this proves
    // it engine-side, so a drift points at the streaming path alone)
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rnk", "nid", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
    val streamed = rows(
      SimilarityQueries.queries("q138_stream_ann_serve")(spark, dir))
    val oneShot = rows(
      SimilarityQueries.queries("q57_ann_ivf")(spark, dir))
    assert(streamed === oneShot)
    assert(streamed.nonEmpty, "fixture query set must produce neighbors")
  }

  test("q132: candidate PR laws — tp bounded, candidate set shrinks with threshold") {
    val out = LlmQueries.candidatePR(
        graft.Tables.tWide(spark, "/root/testdata/sf0.001", "documents"))
      .orderBy("threshold").collect()
    assert(out.nonEmpty, "bounded subcorpus must yield candidate rows")
    val nTrue = out.head.getAs[Long]("n_true")
    out.foreach { r =>
      val tp = r.getAs[Long]("n_tp")
      assert(tp <= math.min(r.getAs[Long]("n_cand"), nTrue),
        s"tp $tp exceeds candidate or truth count")
    }
    // raising the threshold only removes candidates (and their tps)
    val cands = out.map(_.getAs[Long]("n_cand"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a >= b },
      s"candidate counts must be non-increasing: ${cands.toSeq}")
    val tps = out.map(_.getAs[Long]("n_tp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b },
      s"tp counts must be non-increasing: ${tps.toSeq}")
  }

  test("q173: the threshold curve is monotone and anchored at the gated count") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q173_dedup_curve")(spark, dir)
      .orderBy("threshold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === (1L to 32L))
    // both curves are non-increasing in the threshold
    assert(out.zip(out.tail).forall { case (a, b) =>
      a._2 >= b._2 && a._3 >= b._3 }, "raising the cutoff only removes")
    // the curve at the gated threshold equals the gated pair count
    val gated = LlmQueries.nearDupPairs(spark, dir)
      .filter(col("match_cnt") >= LlmQueries.NearDupMinMatches).count()
    val at = out(LlmQueries.NearDupMinMatches - 1)
    assert(at._2 === gated,
      s"curve at threshold ${LlmQueries.NearDupMinMatches} must equal the q44 count")
    // threshold 1 covers every pair and every endpoint of the frame
    val all = LlmQueries.nearDupPairs(spark, dir)
    assert(out.head._2 === all.count())
    assert(out.head._3 === all.select(explode(array(col("doc_a"), col("doc_b"))))
      .distinct().count())
  }

  test("q187: assortativity reads -1 on a star, 1 on a clique, NULL when flat") {
    val sess = spark
    import sess.implicits._
    def r(edges: Seq[(Long, Long)]) =
      LlmQueries.assortativity(edges.toDF("doc_a", "doc_b")).head()
    // star K1,4: hub degree 4 always pairs with leaf degree 1 → r = −1
    val star = r(Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L)))
    assert(star.getAs[Double]("assortativity") === -1.0)
    assert(star.getAs[Long]("max_degree") === 4L)
    // K3 clique: every endpoint degree 2 — zero variance → NULL
    val k3 = r(Seq((1L,2L),(2L,3L),(1L,3L)))
    assert(k3.isNullAt(k3.fieldIndex("assortativity")),
      "constant degrees have no defined correlation")
    // two cliques of different sizes: within-clique degrees equal →
    // still perfectly assortative where variance exists (K3 + K2)
    val mixed = r(Seq((1L,2L),(2L,3L),(1L,3L),(10L,11L)))
    assert(mixed.getAs[Double]("assortativity") === 1.0)
  }

  test("q168: triangle census is exact on a clique, a path and a cycle") {
    val sess = spark
    import sess.implicits._
    def census(edges: Seq[(Long, Long)]) =
      LlmQueries.triangleCensus(edges.toDF("doc_a", "doc_b")).head()
    // K4: 4 nodes, 6 edges, 12 wedges, 4 triangles, clustering 1
    val k4 = census(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
    assert((k4.getLong(0), k4.getLong(1), k4.getLong(2), k4.getLong(3),
      k4.getAs[Double]("clustering")) === ((4L, 6L, 12L, 4L, 1.0)))
    // P4 path: 4 nodes, 3 edges, 2 wedges, 0 triangles, clustering 0
    val p4 = census(Seq((1L,2L),(2L,3L),(3L,4L)))
    assert((p4.getLong(2), p4.getLong(3), p4.getAs[Double]("clustering"))
      === ((2L, 0L, 0.0)))
    // C5 cycle: 5 wedges, 0 triangles; C3 cycle: 3 wedges, 1 triangle
    val c5 = census(Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(1L,5L)))
    assert((c5.getLong(2), c5.getLong(3)) === ((5L, 0L)))
    val c3 = census(Seq((1L,2L),(2L,3L),(1L,3L)))
    assert((c3.getLong(2), c3.getLong(3), c3.getAs[Double]("clustering"))
      === ((3L, 1L, 1.0)))
  }

  test("q164: containment catches a swallowed doc that symmetric Jaccard misses") {
    val sess = spark
    import sess.implicits._
    // doc 1 = 12 tokens; doc 2 = doc 1 verbatim inside 60 tokens of
    // unrelated wrapper. Every 3-gram of doc 1 appears in doc 2, so
    // C(1→2) = 1.0 — while J(1,2) ≈ 10/68 ≈ 0.15, far under q55's 0.5.
    val inner = (1 to 12).map(i => s"w$i").mkString(" ")
    val wrapper = (1 to 30).map(i => s"pre$i").mkString(" ") +
      " " + inner + " " + (1 to 30).map(i => s"post$i").mkString(" ")
    val docs = Seq((1L, inner), (2L, wrapper), (3L, (1 to 12).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SimilarityQueries.containmentPairs(docs).collect()
    val dirs = out.map(r => (r.getAs[Long]("doc_sub"), r.getAs[Long]("doc_sup"),
      r.getAs[Double]("containment")))
    assert(dirs.exists { case (s0, p, c) => s0 == 1L && p == 2L && c == 1.0 },
      s"doc 1 must be fully contained in doc 2: ${dirs.toSeq}")
    // asymmetry: the wrapper is NOT contained in the inner doc
    assert(!dirs.exists { case (s0, p, _) => s0 == 2L && p == 1L },
      "containment must be directional")
    assert(!dirs.exists { case (s0, p, _) => s0 == 3L || p == 3L },
      "the unrelated doc shares no shingles and must not pair")
    // and q55's symmetric Jaccard indeed misses the (1,2) pair: the
    // asymmetric operator exists precisely for this shape
    val j = 10.0 / (10 + 68 - 10)
    assert(j < 0.5, "sanity: the swallowed pair sits under the q55 threshold")
  }

  test("q196: hard negatives are the hardest different-label vectors") {
    val dir = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("q196_hard_negatives")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getDouble(5)))
    assert(got.nonEmpty)
    // every row is a genuine negative
    assert(got.forall { case (_, _, _, ql, nl, _) => ql != nl },
      "a mined negative must carry a different label than its query")
    // exact driver recompute: top-3 different-label by the D7 cosine
    // (float product widened to double, sequential fold), tie on nid
    val emb = graft.Tables.tWide(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) * b(i)).toDouble)
    val expect = emb.filter(e => e._1 % 50 == 0 && e._1 < 5000)
      .flatMap { case (qid, ql, qe) =>
        val qn = math.sqrt(dot(qe, qe))
        emb.filter(e => e._1 != qid && e._2 != ql)
          .map { case (nid, nl, ve) =>
            (nid, nl, dot(qe, ve) / (qn * math.sqrt(dot(ve, ve)))) }
          .filterNot(_._3.isNaN)
          .sortBy { case (nid, _, s) => (-s, nid) }.take(3)
          .zipWithIndex.map { case ((nid, nl, s), i) =>
            (qid, i + 1L, nid, ql, nl, BigDecimal(s)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === expect.toSeq,
      "engine top-3 must equal the exact brute-force recompute")
  }

  test("q199: Lloyd refinement equals an exact driver-side recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = SimilarityQueries.queries("q199_kmeans_refine")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val emb = graft.Tables.tWide(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stride = SimilarityQueries.centroidStride(emb.length.toLong)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) * b(i)).toDouble)
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val cents = emb.filter(_._1 % stride == 0).sortBy(_._1)
    // nearest-centroid assignment: sim desc (nulls last), cid asc —
    // the same total order the persisted index build uses
    val assigned = emb.map { case (id, v) =>
      val nv = nrm(v)
      val cid = cents.map { case (c, ce) =>
        val nc = nrm(ce)
        val s = if (nv == 0 || nc == 0) None else Some(dot(v, ce) / (nv * nc))
        (c, s)
      }.minBy { case (c, s) => (s.map(-_).getOrElse(Double.MaxValue), c) }._1
      (id, v, cid)
    }
    def rnd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = cents.map { case (cid, ce) =>
      val members = assigned.filter(_._3 == cid)
      val nA = members.length.toLong
      val cohQ = members.map { case (_, v, _) =>
        val nv = nrm(v); val nc = nrm(ce)
        val s = if (nv == 0 || nc == 0) 0.0 else dot(v, ce) / (nv * nc)
        math.floor(s * 1e6 + 1e-6).toLong
      }.sum
      val m = (0 until 64).map { i =>
        val sq = members.map { case (_, v, _) =>
          math.floor(v(i).toDouble * 1048576.0).toLong }.sum
        sq.toDouble / (nA * 1048576L).toDouble
      }
      val dmc = (0 until 64).foldLeft(0.0)((a, i) => a + m(i) * ce(i).toDouble)
      val dmm = (0 until 64).foldLeft(0.0)((a, i) => a + m(i) * m(i))
      val dcc = (0 until 64).foldLeft(0.0)((a, i) =>
        a + ce(i).toDouble * ce(i).toDouble)
      val drift = if (dmm == 0.0 || dcc == 0.0) 0.0
        else 1.0 - dmc / (math.sqrt(dmm) * math.sqrt(dcc))
      (cid, nA,
        rnd(if (nA == 0) 0.0 else cohQ.toDouble / 1e6 / nA),
        rnd(drift))
    }
    assert(got === expect.toSeq,
      "refinement stats must equal the exact per-cluster recompute")
    // every vector lands somewhere, and drift is a proper 1−cos ∈ [0, 2]
    assert(got.map(_._2).sum === emb.length.toLong)
    got.foreach { case (_, _, coh, drift) =>
      assert(coh >= -1.0 && coh <= 1.0 && drift >= 0.0 && drift <= 2.0)
    }
  }

  test("q206: iterated Lloyd rounds equal an exact driver-side recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = SimilarityQueries.queries("q206_kmeans_iterate")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val emb = graft.Tables.tWide(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stride = SimilarityQueries.centroidStride(emb.length.toLong)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) * b(i)).toDouble)
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val cents = emb.filter(_._1 % stride == 0).sortBy(_._1)
    // round-0: the persisted IVF assignment's total order (sim desc,
    // nulls last, cid asc) — q199's recompute verbatim
    var asg: Map[Long, Long] = emb.map { case (id, v) =>
      val nv = nrm(v)
      val cid = cents.map { case (c, ce) =>
        val nc = nrm(ce)
        val s = if (nv == 0 || nc == 0) None else Some(dot(v, ce) / (nv * nc))
        (c, s)
      }.minBy { case (c, s) => (s.map(-_).getOrElse(Double.MaxValue), c) }._1
      id -> cid
    }.toMap
    // components quantized ONCE at 2^20 — the engine's arithmetic
    val vq: Map[Long, Array[Long]] = emb.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1048576.0).toLong)
    }.toMap
    val expect = (1 to SimilarityQueries.KmeansRounds).map { r =>
      val byCid = vq.toSeq.groupBy { case (id, _) => asg(id) }
      val cs = byCid.toSeq.map { case (cid, vs) =>
        val sq = Array.tabulate(64)(i => vs.map(_._2(i)).sum)
        val nn = (0 until 64).foldLeft(0.0)((a, i) =>
          a + sq(i).toDouble * sq(i).toDouble)
        (cid, sq, nn)
      }.filter(_._3 > 0.0)
      val next = vq.map { case (id, v) =>
        val best = cs.map { case (cid, sq, nn) =>
          val d = (0 until 64).foldLeft(0L)((a, i) => a + v(i) * sq(i))
          (cid, d.toDouble / math.sqrt(nn))
        }.minBy { case (c, s) => (-s, c) }._1
        id -> best
      }
      val moved = next.count { case (id, c) => asg(id) != c }.toLong
      asg = next
      val sizes = asg.groupBy(_._2).map(_._2.size)
      (r.toLong, moved, sizes.size.toLong, sizes.max.toLong)
    }
    assert(got === expect,
      "per-round convergence stats must equal the exact Lloyd recompute")
    // the fixed-point direction: re-clustering must not oscillate up
    assert(got.map(_._2) === got.map(_._2).sortBy(-_),
      "moved counts should be non-increasing across rounds on the fixture")
  }

  test("q201: MMR picks equal an exact driver-side greedy recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("q201_mmr_diversify")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val emb = graft.Tables.tWide(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) * b(i)).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Option[Double] = {
      val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      if (na == 0 || nb == 0) None else Some(dot(a, b) / (na * nb))
    }
    def rnd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qids = emb.keys.filter(id => id % 50 == 0 && id < 5000).toSeq.sorted
    val expect = qids.flatMap { qid =>
      val cand = emb.toSeq.filter(_._1 != qid)
        .flatMap { case (nid, v) => cos(emb(qid), v).map(s => (nid, v, s)) }
        .sortBy { case (nid, _, s) => (-s, nid) }.take(LlmQueries.MmrCandidates)
      val picks = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
      (1 to LlmQueries.MmrPicks).foreach { _ =>
        val remaining = cand.filterNot(c => picks.exists(_._1 == c._1))
        if (remaining.nonEmpty) {
          val best = remaining.map { case (nid, v, s) =>
            val sc = if (picks.isEmpty) s
              else s - picks.map(p => cos(v, emb(p._1)).get).max
            (nid, sc)
          }.minBy { case (nid, sc) => (-sc, nid) }
          picks += best
        }
      }
      picks.zipWithIndex.map { case ((nid, sc), i) =>
        (qid, i + 1L, nid, rnd(sc)) }
    }
    assert(got === expect, "MMR board must equal the exact greedy recompute")
    // non-degenerate diversification: at least one query's MMR picks
    // diverge from its plain similarity top-5
    val plainTop = qids.map { qid =>
      qid -> emb.toSeq.filter(_._1 != qid)
        .flatMap { case (nid, v) => cos(emb(qid), v).map(s => (nid, s)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(LlmQueries.MmrPicks)
        .map(_._1)
    }.toMap
    val mmrPicks = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    assert(qids.exists(q => mmrPicks(q) != plainTop(q)),
      "the fixture should make MMR reorder at least one query's board")
  }

  test("q212: drift trigger fires at fixture scale and the metric is pinned") {
    // the maintenance loop's branch behavior is part of the contract:
    // at sf0.001 the corpus-weighted mean drift is 0.194712 (measured,
    // pinned — stride-sampled seeds sit far from member means in the
    // 500-vector corpus), well above DriftTriggerMicro=50000, so the
    // key must emit the decision row PLUS KmeansRounds recluster rows.
    // The sf1 standing gate covers the skip branch (37113 ≤ 50000 →
    // 1 row; see the DriftTriggerMicro doc for the per-scale table).
    val rows = SimilarityQueries.queries("q212_drift_recluster")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 1 + SimilarityQueries.KmeansRounds,
      "trigger must fire at sf0.001: decision row + one row per Lloyd round")
    assert(rows.map(_.getAs[Long]("drift_micro")).distinct.toSeq === Seq(194712L),
      "the trigger input must be the pinned corpus-weighted mean drift")
    assert(rows.map(_.getAs[Long]("round")).toSeq ===
      (0L to SimilarityQueries.KmeansRounds.toLong),
      "rounds must be 0 (decision) through KmeansRounds, ordered")
    // the recluster rows must be q206's convergence stats verbatim:
    // same machinery, same assignment start (grown ≡ one-shot content)
    val q206 = SimilarityQueries.queries("q206_kmeans_iterate")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_moved"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("max_cluster")))
    val reclusterRows = rows.filter(_.getAs[Long]("round") > 0L)
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_moved"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("max_cluster")))
    assert(reclusterRows.toSeq === q206.toSeq,
      "triggered recluster must equal q206's rounds on the same corpus")
  }

  test("q208-q211: slice pair counts are pinned — a hollow slice fails loudly") {
    // VERDICT r15 item 1: the slice keys' cross-engine gate proves
    // Spark ≡ DuckDB, but both share the slice PREDICATE — a predicate
    // bug that empties a slice would pass the gate green-by-vacuity.
    // These constants are the independent pin: exact pair counts per
    // slice per fixture scale, measured once (DuckDB, 2026-08-15) and
    // frozen. The mid slice's sf0.001 count is genuinely 0 — that 0 is
    // the assertion, not an absence of one (the disjoint mid-range
    // residues hold no dup pairs in the smallest fixture; they gain
    // pairs from sf0.01 up). round_close.sh pins the sf1 counts
    // (q208=3, q209=6, q210=2, q211=4) in the replay step.
    val expected = Map(
      // key -> (sf0.001 pairs, sf0.01 pairs)
      "q208_jaccard_slice" -> ((1L, 1L)),
      "q209_containment_slice" -> ((2L, 2L)),
      "q210_jaccard_slice_mid" -> ((0L, 1L)),
      "q211_containment_slice_mid" -> ((0L, 2L)))
    for ((key, (n001, n01)) <- expected) {
      val got001 = SimilarityQueries.queries(key)(spark, "/root/testdata/sf0.001").count()
      assert(got001 === n001, s"$key at sf0.001: expected $n001 pairs")
      val got01 = SimilarityQueries.queries(key)(spark, "/root/testdata/sf0.01").count()
      assert(got01 === n01, s"$key at sf0.01: expected $n01 pairs")
    }
    spark.catalog.clearCache() // the slice pipelines cache arrs/prefix
  }
}
