package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** LLM-data-pipeline operators (SURVEY.md §2b q43–q46): exact dedup,
  * MinHash near-dup, cosine top-k similarity, corpus text stats.
  *
  * Portability contract: every hash used here is engine-neutral —
  * md5 (bit-identical everywhere) or an explicit char-fold polynomial
  * hash — never Spark's internal `hash()`/xxhash64, so the DuckDB oracle
  * can replay signatures value-for-value.
  *
  * Scale notes: MinHash is the classic shingle→signature→band→bucket-join
  * pipeline — candidate generation is a hash-partitioned join on band
  * keys, never an all-pairs product, so it survives 100 TB corpora. The
  * brute-force cosine top-k is the *correctness baseline* over a bounded
  * query set; the bucketed/ANN scale path is [[SimilarityQueries]]. */
object LlmQueries {

  /** Sequential char-fold polynomial hash, identical on both engines:
    * h = fold(chars, 0, (a, c) -> (a*131 + ascii(c)) mod 2147483647).
    * Codegen'd Catalyst expression — see [[graft.plans.PolyHash]]. */
  private[graft] def polyHash(c: Column): Column =
    graft.plans.GraftExpressions.poly_hash(c)

  private val NumPerms = graft.plans.MinHashAgg.NumPerms
  private val NumBands = 8
  private val RowsPerBand = NumPerms / NumBands

  /** q44's near-dup cutoff: est Jaccard ≥ 0.8 ⇔ match_cnt ≥ this. */
  val NearDupMinMatches: Int = math.ceil(0.8 * NumPerms).toInt

  /** q201: candidate-list width and greedy pick count. Both FIXED, so
    * every MMR round works on ≤ |Q|·[[MmrCandidates]]-row frames. */
  val MmrCandidates = 20
  val MmrPicks = 5

  /** Declarative form of the affine "permutation" — constants come from
    * [[graft.plans.MinHashAgg]], the single source of truth shared with
    * the imperative aggregate and the DuckDB oracle SQL. */
  def permHash(h: Column, i: Int): Column = {
    import graft.plans.MinHashAgg.{permA, permB, PermMod}
    (h * permA(i) + permB(i)) % PermMod
  }

  /** Distinct word k-shingles of `text`, joined with single spaces.
    * Docs shorter than k tokens yield an empty array — without the
    * guard, sequence(0, size-k) would DESCEND for short docs and
    * element_at(toks, 0) throws. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ",
          (0 until k).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** doc_id → 32-wide MinHash signature array over word 3-shingles,
    * aggregated by [[graft.plans.MinHashAgg]] (single long[32]
    * running-min buffer instead of 32 separate min expressions). */
  def minhashSignatures(docs: DataFrame, k: Int = 3): DataFrame = {
    import graft.plans.MinHashAgg.minhash_agg
    docs
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("s"))
      .select(col("doc_id"), polyHash(col("s")).as("h"))
      .groupBy("doc_id")
      .agg(minhash_agg(col("h")).as("sig"))
  }

  /** LSH-banded candidate pairs + estimated Jaccard from signature
    * agreement. Join is on (band index, band key) — hash-partitionable.
    *
    * Shape (measured at sf0.1, load 2.5): signatures are carried THROUGH
    * the band join, so verification needs no sig re-joins and no
    * pre-verify `distinct()`. Candidate occurrences dedup at 2,680 → 450
    * pairs (83% duplicates — near-dup pairs agree in most of their 8
    * bands, the opposite of q55's 5%), but a pre-verify distinct would
    * shuffle the same 2,680 rows the post-verify one does, and the old
    * shape paid two extra signature joins on top. Verifying every
    * occurrence is a codegen'd 32-slot loop ([[graft.plans.ZipEqualCount]]
    * — the interpreted `zip_with`+`filter` pair built an intermediate
    * boolean array per candidate), then the tiny surviving set dedups.
    * At 100 TB the same argument holds: 256 B of signature per band row
    * is the standard LSH payload trade, and dedup work scales with the
    * candidate count either way. */
  /** doc_id → one row per LSH band: (doc_id, sig, bk) where bk is the
    * composite band key "b:k1,k2,k3,k4" — the band index prefixed so ONE
    * string column is the whole join key (hash-partitionable, bucketable
    * by [[graft.sources.Staging.storeBucketed]]; the ':' separator keeps
    * the encoding unambiguous — band indexes are digits, slice keys hold
    * only digits and commas). Signatures ride along for verification. */
  def bandKeys(sig: DataFrame): DataFrame =
    sig
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(NumBands - 1))).as("b"))
      .select(col("doc_id"), col("sig"),
        concat_ws(":", col("b"),
          concat_ws(",", slice(col("sig"), col("b") * RowsPerBand + 1,
            lit(RowsPerBand)))).as("bk"))

  /** Build — or REUSE — the persisted corpus band index shared by the
    * incremental-dedup keys (q106 batch probe, q108 streaming probe):
    * signatures + band keys for every NON-batch doc (doc_id % 10 != 7),
    * written bucketed on the band key via `storeBucketed`. Returns the
    * session-suffixed table name. The table name is a pure function of
    * (input dir, session) and its content a pure function of the input,
    * so when the catalog already has it the build is skipped — probes
    * are probe-only after the first call, the build-once/probe-many
    * lifecycle these operators exist for (Bench times the build
    * separately as q106_index_build; `rebuild` forces a fresh write).
    * At 100 TB this table is written once and grows per ingest via
    * `Staging.appendBucketed` — the q113 path — never re-shuffling. */
  def corpusBandIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_corpus_bands_")
    val tab = "graft_corpus_bands_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    if (rebuild || !s.catalog.tableExists(tab)) {
      val B = 8
      graft.sources.Staging.storeBucketed(
        bandKeys(minhashSignatures(
            graft.Tables.tWide(s, dir, "documents")
              .filter(col("doc_id") % 10 =!= 7)))
          .repartition(B, col("bk")),
        tab, Seq("bk"), B)
    }
    tab
  }

  /** q113's index: the SAME corpus as [[corpusBandIndex]] but reached
    * through the append lifecycle a long-lived deployment actually runs —
    * ingest epoch A (doc_id % 10 ∉ {3, 7}) builds the bucketed table,
    * epoch B (doc_id % 10 = 3) GROWS it in place via
    * `Staging.appendBucketed` (same keys, same bucket count — layout
    * preserved, zero re-shuffle of epoch A), and probes then read the
    * grown table bucket-aligned. Content ≡ corpusBandIndex's one-shot
    * build, which is exactly what q113's oracle (q106's twin) checks.
    *
    * The two-step build is NOT atomic, so it runs under a temp name and
    * publishes via drop + catalog RENAME (the `compactBucketed` swap
    * discipline): `tableExists(tab)` ⇒ the index holds BOTH epochs.
    * Without this, a failure between store and append would leave the
    * final name holding epoch A only — and every later call in the
    * session would silently reuse the incomplete index. A crash inside
    * the publish window leaves the final name absent (plus a stale temp
    * that the next build drops), so the reuse check rebuilds instead of
    * serving a torn copy. */
  def grownBandIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_grown_bands_")
    val tab = "graft_grown_bands_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    if (rebuild || !s.catalog.tableExists(tab)) {
      val B = 8
      val tmp = tab + "__build_tmp"
      val tmpB = tab + "__epochb_tmp"
      val docs = graft.Tables.tWide(s, dir, "documents")
      // The two epoch band pipelines are INDEPENDENT jobs — build them
      // concurrently as two same-spec bucketed tables (guide §2.6, the
      // q134/q136 shape) and merge epoch B by file move: bucket
      // membership lives in the `_NNNNN` part-file names, which the
      // move preserves, so the merged table is file-for-file what
      // appendBucketed produced without serializing epoch B behind
      // epoch A's commit (r22; A/B'd fresh-JVM). Catalog entry and
      // bucket spec stay on the epoch-A table; epoch B's entry is
      // dropped AFTER its files move out (a managed-table drop deletes
      // the then-empty location only).
      graft.Par.run(2)(Seq(
        () => graft.sources.Staging.storeBucketed(
          bandKeys(minhashSignatures(
              docs.filter(col("doc_id") % 10 =!= 7 &&
                col("doc_id") % 10 =!= 3)))
            .repartition(B, col("bk")),
          tmp, Seq("bk"), B),
        () => graft.sources.Staging.storeBucketed(
          bandKeys(minhashSignatures(docs.filter(col("doc_id") % 10 === 3)))
            .repartition(B, col("bk")),
          tmpB, Seq("bk"), B)))
      graft.sources.Staging.absorb(s, s"$wh/${tmpB.toLowerCase}",
        s"$wh/${tmp.toLowerCase}")
      s.sql(s"DROP TABLE IF EXISTS `$tmpB`")
      s.sql(s"DROP TABLE IF EXISTS `$tab`")
      graft.sources.Staging.vacuum(s, s"$wh/${tab.toLowerCase}")
      s.sql(s"ALTER TABLE `$tmp` RENAME TO `$tab`")
    }
    tab
  }

  /** Build — or REUSE — the persisted MinHash candidate-PAIR frame for
    * the (session, dir) corpus: [[minhashPairs]] output (doc_a, doc_b,
    * match_cnt, est_jaccard), UNFILTERED, written once under
    * java.io.tmpdir (the q106/q57 build-once discipline applied to pair
    * output). Seven keys consume this pipeline — q44 and q123 directly,
    * q89/q117/q129 as cluster edges, q128 as leakage pairs, q132 as the
    * calibration candidate set — and each used to rebuild
    * shingles→signatures→band-join from scratch; now the shingle
    * pipeline is paid once per corpus and every consumer reads a
    * candidate-sized parquet (hundreds of rows at sf0.1). Persisting
    * UNFILTERED pairs (not just ≥ [[NearDupMinMatches]]) is what lets
    * q132 probe it too: band candidacy and match_cnt are pair-local
    * quantities, so the full-corpus frame restricted to doc_id < 300 on
    * both endpoints IS the bounded subcorpus's pair set. At 100 TB this
    * frame is the natural persisted artifact of a dedup run — built once
    * per corpus version, consumed by every downstream cluster / survivor
    * / leakage / repair / calibration pass (Bench times the build
    * separately as q44_index_build; probes are probe-only after the
    * first call). */
  def nearDupPairs(s: SparkSession, dir: String,
      rebuild: Boolean = false): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, "graft_neardup_pairs_")
    val path = s"$tmp/graft_neardup_pairs_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (rebuild || !fs.exists(done)) {
      graft.sources.Staging.store(
        minhashPairs(graft.Tables.tWide(s, dir, "documents")), path)
    }
    s.read.parquet(path)
  }

  /** q136's pair frame: the SAME content as [[nearDupPairs]] but
    * reached through the append lifecycle a long-lived dedup service
    * actually runs — ingest epoch A (doc_id % 10 ≠ 3) builds the pair
    * frame with the one-shot [[minhashPairs]] shape restricted to A,
    * and epoch B (doc_id % 10 = 3) APPENDS only its DELTA: every pair
    * with ≥ 1 endpoint in B, generated by joining B's band rows against
    * the FULL band set (normalized via least/greatest so B×B pairs
    * collapse under the distinct) — epoch A's pairs are never
    * recomputed, A×A work is never repeated. Because band keys,
    * signatures and match_cnt are all per-doc / per-pair quantities,
    * build+delta provably equals the one-shot pair set over A∪B —
    * q136's oracle is q44's twin VERBATIM, making the gate the
    * equivalence proof (the q113/q134 growth discipline applied to
    * pair output). At 100 TB the delta join's full-band side is the
    * persisted bucketed band index (the q113 table) rather than a
    * recompute, and each ingest appends pairs touching only its own
    * band buckets.
    *
    * Two-step build ⇒ temp-dir + atomic rename publish (`_SUCCESS` at
    * the final path ⇒ both epochs landed), the ivfIndexGrown
    * discipline. */
  /** q168 core: one-row triangle census (nodes, edges, wedges,
    * triangles, clustering 3T/W) of an undirected edge frame with
    * columns (doc_a, doc_b), doc_a < doc_b, distinct. Degree-ordered
    * orientation + out-edge wedge join + semi-join closure; rationale
    * and bounds at the q168 key. */
  def triangleCensus(edges: DataFrame): DataFrame = {
    val deg = edges
      .select(explode(array(col("doc_a"), col("doc_b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val e2 = edges
      .join(deg.toDF("doc_a", "da"), "doc_a")
      .join(deg.toDF("doc_b", "db"), "doc_b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("doc_a") < col("doc_b"))
    val o = e2.select(
      when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("src"),
      when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("dst"))
    // carry the dst's order key so the wedge join can order its legs
    val od = o.join(deg.toDF("dst", "dd"), "dst")
      .select("src", "dst", "dd").cache()
    val w = od.toDF("src", "v1", "d1")
      .join(od.toDF("src2", "v2", "d2"),
        col("src") === col("src2") &&
        (col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("v1") < col("v2"))))
      .select("v1", "v2")
    val tri = w.join(
      od.select(col("src").as("v1"), col("dst").as("v2")),
      Seq("v1", "v2"), "left_semi")
    val nodes = deg.agg(count(lit(1)).cast("long").as("n_nodes"),
      // d(d-1) is even so `div` is exact — and summing LONGS keeps
      // the wedge total out of FP accumulation entirely
      sum(expr("(d * (d - 1)) div 2")).cast("long").as("n_wedges"))
    val ne = edges.agg(count(lit(1)).cast("long").as("n_edges"))
    val nt = tri.agg(count(lit(1)).cast("long").as("n_triangles"))
    // every side is a global agg = exactly 1 row BY CONSTRUCTION, but
    // the estimator sizes them from the (corpus-sized) scans beneath —
    // broadcast the attach sides explicitly so the build side never
    // depends on stats (the q45/q201 discipline).
    nodes.crossJoin(broadcast(ne)).crossJoin(broadcast(nt))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering"))
  }

  /** q187 core: one-row degree assortativity (Pearson r of endpoint
    * degrees over both-orientation edges) of an undirected (doc_a,
    * doc_b) edge frame; exact-integer-moment rationale at the key. */
  def assortativity(edges: DataFrame): DataFrame = {
    val deg = edges
      .select(explode(array(col("doc_a"), col("doc_b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val directed = edges
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val xy = directed
      .join(deg.toDF("u", "du"), "u")
      .join(deg.toDF("v", "dv"), "v")
      .select(col("du").as("x"), col("dv").as("y"))
    val m = xy.agg(count(lit(1)).as("n"),
      sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
      sum(col("x") * col("x")).cast("long").as("sxx"),
      sum(col("y") * col("y")).cast("long").as("syy"),
      sum(col("x") * col("y")).cast("long").as("sxy"))
    val nn = deg.agg(count(lit(1)).cast("long").as("n_nodes"),
      max("d").cast("long").as("max_degree"))
    // nn is a 1-row global agg — broadcast explicitly (see wedge note)
    m.crossJoin(broadcast(nn))
      .select(col("n_nodes"), (col("n") / 2).cast("long").as("n_edges"),
        col("max_degree"),
        when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
             (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")
              * (col("n") * col("syy") - col("sy") * col("sy"))), 6))
          .as("assortativity"))
  }

  def grownPairIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.SaveMode
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, "graft_grown_pairs_")
    val path = s"$tmp/graft_grown_pairs_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    val done = new Path(path, "_SUCCESS")
    val fs = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (rebuild || !fs.exists(done)) {
      val bld = path + "__build_tmp"
      val bldDelta = path + "__delta_tmp"
      fs.delete(new Path(bld), true)
      fs.delete(new Path(bldDelta), true)
      val sig = minhashSignatures(
        graft.Tables.tWide(s, dir, "documents")).cache()
      // materialize the shared signature cache ONCE before the two
      // epoch jobs fan out (r22): launched concurrently against a cold
      // cache, both jobs would schedule the shingle pipeline's tasks
      // and duplicate the compute — one cheap count pins the blocks
      sig.count()
      val bands = bandKeys(sig)
      val zipEq = graft.plans.GraftExpressions.zip_equal _
      // epoch A: the one-shot pair shape restricted to A
      val bandsA = bands.filter(col("doc_id") % 10 =!= 3)
      val pairsA = bandsA.toDF("doc_a", "sig_a", "key_a")
        .join(bandsA.toDF("doc_b", "sig_b", "key_b"),
          col("key_a") === col("key_b") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          zipEq(col("sig_a"), col("sig_b")).as("match_cnt"))
        .distinct()
        .withColumn("est_jaccard", col("match_cnt") / NumPerms.toDouble)
      // epoch B delta: every pair with >= 1 endpoint in B. B rides the
      // small side; the full-band side is what the persisted band index
      // serves at scale. least/greatest normalizes pair order so the
      // two orientations of a B×B pair collapse under distinct; A×A
      // pairs can't appear (the b-side is epoch B only), so the append
      // never duplicates an epoch-A row.
      val delta = bands.toDF("doc_a", "sig_a", "key_a")
        .join(bands.filter(col("doc_id") % 10 === 3)
            .toDF("doc_b", "sig_b", "key_b"),
          col("key_a") === col("key_b") && col("doc_a") =!= col("doc_b"))
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"),
          zipEq(col("sig_a"), col("sig_b")).as("match_cnt"))
        .distinct()
        .withColumn("est_jaccard", col("match_cnt") / NumPerms.toDouble)
      // The two epoch band joins are INDEPENDENT jobs over the pinned
      // signature cache — run them concurrently into SIBLING dirs
      // (guide §2.6) and merge by file move: a SaveMode.Append into bld
      // serialized epoch B behind epoch A's commit for no reason (the
      // committer's shared _temporary staging forbids concurrent jobs
      // on one directory), while the absorbed layout is byte-for-byte
      // what the append produced — the same job-unique part files, in
      // one directory (r22; A/B'd fresh-JVM).
      graft.Par.run(2)(Seq(
        () => graft.sources.Staging.store(pairsA, bld),
        () => graft.sources.Staging.store(delta, bldDelta)))
      graft.sources.Staging.absorb(s, bldDelta, bld)
      sig.unpersist()
      fs.delete(new Path(path), true)
      require(fs.rename(new Path(bld), new Path(path)),
        s"pair index publish failed: rename $bld -> $path")
    }
    path
  }

  def minhashPairs(docs: DataFrame, k: Int = 3): DataFrame = {
    // consumed twice (both sides of the band join); cache avoids
    // recomputing the shingle scan per consumer. NB callers running many
    // corpora in one session should clearCache()/unpersist between runs
    // (Verify and Bench both do)
    val sig = minhashSignatures(docs, k).cache()
    val bands = bandKeys(sig)
    val ba = bands.toDF("doc_a", "sig_a", "key_a")
    val bb = bands.toDF("doc_b", "sig_b", "key_b")
    ba.join(bb,
        col("key_a") === col("key_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.plans.GraftExpressions.zip_equal(col("sig_a"), col("sig_b"))
          .as("match_cnt"))
      .distinct()
      .withColumn("est_jaccard", col("match_cnt") / NumPerms.toDouble)
  }

  /** q215: the scale-safe rendering of q44's contract — near-dup
    * CLUSTERS with one lowest-id survivor each, instead of the
    * all-pairs list (the r17 sf10docs probe measured q44's pair output
    * growing 73× on 10× docs, 5,468 → 401,735 pairs, while q214's
    * survivor output stayed content-constant: pair frames are
    * inspection instruments, survivor frames are the curation output).
    * This gives the MinHash family the collapse-then-survivors shape
    * q214 gave SimHash (VERDICT r17 item 3). It differs from q89's
    * cluster assignment in both input and granularity: q89 probes the
    * PERSISTED doc-level pair frame (output-quadratic at scale); this
    * key never materializes doc pairs at all.
    *
    * The pair-quadratic is killed by collapsing EXACT signatures
    * first: band keys and signature agreement are pure functions of
    * the 32-perm signature, so docs sharing a signature are
    * interchangeable — one representative (min doc_id) stands for the
    * group in candidate generation, estimated-Jaccard verification
    * (match_cnt ≥ [[NearDupMinMatches]], the q44 gate), and min-label
    * propagation, and the corpus expands back only at the final
    * labeling. Replica-heavy near-dup families collapse to their
    * distinct signatures, so the band self-join runs on
    * content-bounded sides. Docs whose signature group has ≥ 2
    * members (identical sigs share every band and agree in all 32
    * slots — guaranteed q44 pairs) or whose rep has ≥ 1 verified
    * sig-edge are exactly q44's pair-graph vertex set, so clusters
    * here ARE q44's connected components (the union-find law in
    * LlmOpsSpec proves it, and that the fixed step count reaches the
    * fixpoint). Components via [[GraphQueries.minLabel]]
    * ([[SimilarityQueries.SurvivorIters]] fixed steps, mirrored by
    * the oracle's unrolled labelSteps); the survivor is the min
    * doc_id computed over MEMBERS, not the propagated label (equal
    * only at convergence, which the fixed step count doesn't
    * promise). The label attach broadcasts (labels surface from a
    * localCheckpoint with unknown stats — the q214 lesson, pinned in
    * PlanSpec with the estimator off); verification runs per
    * band-collision occurrence with the codegen'd
    * [[graft.plans.ZipEqualCount]] and dedups AFTER (the q44 shape —
    * no pre-verify shuffle, no window anywhere). */
  /** q215's symmetrized sig-graph edge list at distinct-signature
    * granularity (`grp` = one row per distinct signature with its min
    * doc_id `rep`): banded candidates on the reps, match_cnt ≥
    * [[NearDupMinMatches]] verify, dedup after — the q44 shape.
    * Factored out of [[minhashSurvivors]] so [[graft.tools.Probe215]]'s
    * convergence tripwire (ADVICE r18) can run
    * [[GraphQueries.minLabel]] at SurvivorIters AND SurvivorIters+1
    * over the SAME edges and assert the fixpoint. */
  private[graft] def minhashSigEdges(grp: DataFrame): DataFrame = {
    val bands = bandKeys(grp.select(col("rep").as("doc_id"), col("sig")))
    val ba = bands.toDF("rep_a", "sig_a", "bk_a")
    val bb = bands.toDF("rep_b", "sig_b", "bk_b")
    val fpPairs = ba.join(bb,
        col("bk_a") === col("bk_b") && col("rep_a") < col("rep_b"))
      .filter(graft.plans.GraftExpressions.zip_equal(
        col("sig_a"), col("sig_b")) >= NearDupMinMatches)
      .select("rep_a", "rep_b").distinct()
    fpPairs
      .select(col("rep_a").as("src"), col("rep_b").as("dst"))
      .unionByName(
        fpPairs.select(col("rep_b").as("src"), col("rep_a").as("dst")))
  }

  def minhashSurvivors(s: SparkSession, docs: DataFrame): DataFrame = {
    // sig consumed twice (collapse + final expand), grp three times
    // (bands + both attach joins) — cache both, q214's discipline
    val sig = minhashSignatures(docs).cache()
    val grp = sig.groupBy("sig")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n_members"))
      .cache()
    val labels = GraphQueries.minLabel(s, minhashSigEdges(grp),
      SimilarityQueries.SurvivorIters)
    sig.join(grp, "sig")
      .join(broadcast(labels), col("node") === col("rep"), "left")
      .filter(col("n_members") >= 2 || col("node").isNotNull)
      .select(col("doc_id"),
        coalesce(col("lbl"), col("rep")).as("cluster_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("survivor_doc"))
      .withColumn("n_dropped", col("n_docs") - 1)
      .orderBy("cluster_id")
  }

  /** Sequential-fold dot product of two float arrays (contract D7: float32
    * products, left-to-right double accumulation — identical op order to
    * the DuckDB list_reduce twin). Codegen'd: [[graft.plans.SeqDotProduct]]. */
  def seqDot(a: Column, b: Column): Column =
    graft.plans.GraftExpressions.seq_dot(a, b)


  /** The shared probe of q106/q113: today's ingest batch (doc_id % 10 =
    * 7) band-joins a persisted bucketed band index and verifies
    * signature agreement — broadcast batch, zero index-side exchange. */
  private def probeBandIndex(s: SparkSession, tab: String,
      dir: String): DataFrame = {
    val corpus = s.table(tab).toDF("corpus_doc", "sig_c", "bk")
    val batch = bandKeys(minhashSignatures(
        tWide(s, dir, "documents").filter(col("doc_id") % 10 === 7)))
      .toDF("batch_doc", "sig_b", "bk_b")
    corpus.join(broadcast(batch), col("bk") === col("bk_b"))
      .select(col("batch_doc"), col("corpus_doc"),
        graft.plans.GraftExpressions.zip_equal(col("sig_b"), col("sig_c"))
          .as("match_cnt"))
      .filter(col("match_cnt") >= NearDupMinMatches)
      .distinct()
      .withColumn("est_jaccard", col("match_cnt") / NumPerms.toDouble)
      .orderBy("batch_doc", "corpus_doc")
  }

  /** q123 core: for every q44 near-dup pair, the MinHash Jaccard
    * ESTIMATE next to the exact distinct-shingle Jaccard and the
    * absolute error — the sketch-calibration number that justifies (or
    * indicts) the 32-perm/8×4-band parameters before a 100 TB dedup
    * run trusts them. Exact verification touches ONLY the sketch's own
    * candidate pairs (output-sized), never all-pairs: the pair list
    * equi-joins each side's sorted shingle-hash array and the codegen
    * two-pointer merge (q55's kernel) counts the intersection. */
  def sketchError(docs: DataFrame): DataFrame =
    sketchErrorFrom(
      minhashPairs(docs).filter(col("match_cnt") >= NearDupMinMatches), docs)

  /** [[sketchError]] over an externally-supplied near-dup pair frame
    * (doc_a, doc_b, match_cnt, est_jaccard — already thresholded):
    * the q123 gated key probes [[nearDupPairs]] through this so the
    * shingle pipeline isn't rebuilt per consumer. */
  def sketchErrorFrom(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val h62 = (c: Column) =>
      graft.plans.GraftExpressions.poly_hash(c, 131) * 2147483648L +
        graft.plans.GraftExpressions.poly_hash(c, 137)
    val arrs = docs.select(col("doc_id"),
      array_sort(transform(shingles(col("text"), 3), sg => h62(sg))))
    val a = arrs.toDF("doc_a", "arr_a")
    val b = arrs.toDF("doc_b", "arr_b")
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", graft.plans.GraftExpressions
        .sorted_intersect(col("arr_a"), col("arr_b")))
      .withColumn("exact_jaccard", round(col("inter").cast("double") /
        (size(col("arr_a")) + size(col("arr_b")) - col("inter")), 6))
      .select(col("doc_a"), col("doc_b"), col("match_cnt"),
        col("est_jaccard"), col("exact_jaccard"),
        round(abs(col("est_jaccard") - col("exact_jaccard")), 6)
          .as("abs_err"))
  }

  /** q132 core: precision/recall of the LSH CANDIDATE set against exact
    * Jaccard ≥ 0.8 ground truth, per match_cnt threshold. q123 measures
    * how far the estimate sits from exact ON candidate pairs; this
    * measures what the bands MISS — a true near-dup pair agreeing in no
    * band never becomes a candidate, and only an exact all-pairs pass
    * can see it. That pass is quadratic, so it runs on an ABSOLUTELY
    * bounded subcorpus (doc_id < 300 — the q45/q122 bounded-eval rule):
    * calibrate the 8×4-band recall on a sample, then trust the banding
    * at 100 TB. The ≥ 0.8 truth test is integer cross-multiplication
    * (5·inter ≥ 4·union) — no float boundary on either engine. */
  def candidatePR(docs: DataFrame): DataFrame =
    candidatePRFrom(minhashPairs(docs.filter(col("doc_id") < 300)), docs)

  /** [[candidatePR]] over an externally-supplied UNFILTERED candidate
    * frame restricted to the bounded subcorpus (both endpoints
    * doc_id < 300). Band candidacy and match_cnt are pair-local, so the
    * full-corpus [[nearDupPairs]] frame restricted on both endpoints is
    * exactly the subcorpus pair set — which is what the q132 gated key
    * passes in. */
  def candidatePRFrom(cand: DataFrame, docs: DataFrame): DataFrame = {
    val h62 = (c: Column) =>
      graft.plans.GraftExpressions.poly_hash(c, 131) * 2147483648L +
        graft.plans.GraftExpressions.poly_hash(c, 137)
    val sub = docs.filter(col("doc_id") < 300)
    val arrs = sub.select(col("doc_id"),
        array_sort(transform(shingles(col("text"), 3), sg => h62(sg)))
          .as("arr"))
      .filter(size(col("arr")) > 0)
    val a = arrs.toDF("doc_a", "arr_a")
    val b = arrs.toDF("doc_b", "arr_b")
    // both sides are doc_id < 300 BY CONTRACT; broadcast one explicitly
    // so the build side never falls back to the stats estimator (the
    // q45/q201 discipline — at 100 TB the filter's selectivity is
    // invisible to the planner).
    val tru = a.crossJoin(broadcast(b)).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", graft.plans.GraftExpressions
        .sorted_intersect(col("arr_a"), col("arr_b")))
      .filter(col("inter") * 5 >=
        (size(col("arr_a")) + size(col("arr_b")) - col("inter")) * 4)
      .select("doc_a", "doc_b")
    // NB: tru is bounded by the doc_id < 300 contract, but do NOT
    // broadcast it (tried r21, REVERTED on measurement: fresh-JVM warm
    // 0.57–0.69 → 0.92–1.37 s, same canary band). Unlike the recall
    // arms, tru is EXPENSIVE to produce (bounded crossJoin + intersect
    // kernel) — an explicit broadcast serializes its full build ahead
    // of the probe side, where the planner's exchange lets both sides'
    // map stages run concurrently and AQE still picks the cheap join
    // from real sizes at this scale.
    val marked = cand
      .select(col("doc_a"), col("doc_b"), col("match_cnt"))
      .join(tru.withColumn("is_true", lit(1L)),
        Seq("doc_a", "doc_b"), "left_outer")
      .na.fill(0L, Seq("is_true"))
    val th = docs.sparkSession.range(1).select(
      explode(array(lit(13L), lit(20L), lit(26L))).as("threshold"))
    val perTh = marked.crossJoin(broadcast(th))
      .filter(col("match_cnt") >= col("threshold"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_cand"),
        sum("is_true").cast("long").as("n_tp"))
    val tot = tru.agg(count(lit(1)).cast("long").as("n_true"))
    perTh.crossJoin(broadcast(tot))
      .select(col("threshold"), col("n_cand"), col("n_true"), col("n_tp"),
        round(col("n_tp").cast("double") / col("n_cand"), 6).as("prec"),
        // n_true = 0 ⇒ Spark double division yields NaN where DuckDB
        // yields NULL — guard to NULL on both engines. (n_cand needs no
        // guard: a threshold group only exists with ≥ 1 candidate row.)
        when(col("n_true") > 0,
          round(col("n_tp").cast("double") / col("n_true"), 6)).as("rec"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sketch-quality evaluation: MinHash estimate vs exact Jaccard on
    // the sketch's own candidate pairs (the q122 discipline applied to
    // the dedup sketch — measure the approximation before trusting it).
    "q123_sketch_error" -> { (s, dir) =>
      sketchErrorFrom(
        nearDupPairs(s, dir).filter(col("match_cnt") >= NearDupMinMatches),
        tWide(s, dir, "documents")).orderBy("doc_a", "doc_b")
    },

    // Candidate-generation calibration: band-recall/precision vs exact
    // ground truth on a bounded subcorpus (evaluation family, alongside
    // q122/q123/q126's exact-side disciplines).
    "q132_candidate_pr" -> { (s, dir) =>
      candidatePRFrom(
        nearDupPairs(s, dir)
          .filter(col("doc_a") < 300 && col("doc_b") < 300),
        tWide(s, dir, "documents")).orderBy("threshold")
    },

    // Exact dedup: md5 grouping, min-doc_id survivor, per-lang report.
    "q43_dedup_exact" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .groupBy(col("lang"), md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dups"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_unique"),
          sum("dups").cast("long").as("n_docs"),
          min("keep_id").as("min_keep_id"))
        .orderBy("lang")
    },

    // MinHash near-dup: word 3-shingles → 32-perm signature → 8×4 bands
    // → bucket join → est Jaccard ≥ 0.8 (match_cnt ≥ 26).
    "q44_dedup_near" -> { (s, dir) =>
      nearDupPairs(s, dir)
        .filter(col("match_cnt") >= NearDupMinMatches)
        .orderBy("doc_a", "doc_b")
    },

    // q44's gated scale twin (VERDICT r17 item 3): MinHash near-dup
    // pairs → connected components → lowest-id survivor per cluster,
    // with the pair-quadratic retired by exact-signature collapse —
    // see [[minhashSurvivors]]. Output rows ∝ clusters (≤ docs),
    // never pairs.
    "q215_minhash_survivors" -> { (s, dir) =>
      minhashSurvivors(s, tWide(s, dir, "documents"))
    },

    // DEDUP FUNNEL telemetry — the per-stage survivor report every
    // curation run publishes (raw → exact → near): how many documents
    // each dedup stage admits and drops. Stage 1 keeps one doc per
    // md5(text) group (q43's machinery, min-id keeper); stage 2 drops
    // every stage-1 survivor with a LOWER-ID near-dup partner that
    // also survived stage 1 (q143's keep-lowest-id rule on q44's
    // gate-proven pairs — probed from the persisted frame, never
    // rebuilt). The counts are whole-corpus aggregations; only the
    // three scalars come back to the driver, and the 3-row report is
    // assembled locally. At sf0.001 the fixture corpus has no exact
    // dups (stage-1 drop = 0 — the zero path is exercised under the
    // gate); sf0.1 has 8.
    "q152_dedup_funnel" -> { (s, dir) =>
      import s.implicits._
      val docs = tWide(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("m"))
      val keep1 = docs.groupBy("m").agg(min("doc_id").as("doc_id"))
        .select("doc_id").cache()
      // n0 (pruned parquet row count) and n1 (the md5+groupBy pass that
      // also populates the keep1 cache) are independent jobs — overlap
      // them (guide §2.6); d2 then probes the populated cache
      var n0 = 0L; var n1 = 0L // visibility via Par.run's Future.get
      graft.Par.run(2)(Seq(
        () => { n0 = docs.count() },
        () => { n1 = keep1.count() }))
      val d2 = nearDupPairs(s, dir)
        .filter(col("match_cnt") >= NearDupMinMatches)
        .select("doc_a", "doc_b")
        .join(keep1.toDF("doc_a"), "doc_a")
        .join(keep1.toDF("doc_b"), "doc_b")
        .select("doc_b").distinct().count()
      Seq(("00_raw", n0, 0L, n0),
          ("01_exact", n0, n0 - n1, n1),
          ("02_near", n1, d2, n1 - d2))
        .toDF("stage", "n_in", "n_dropped", "n_out")
        .orderBy("stage")
    },

    // BITEXT candidate mining — the parallel-text step of a
    // multilingual pipeline (CCAligned/WikiMatrix-style, here by
    // lexical overlap): near-dup pairs whose endpoints carry DIFFERENT
    // language tags are translation/transliteration candidates (the
    // fixture corpus draws all langs from one shared vocabulary, so
    // cross-lang overlap is dense by construction — 20 of 28 pairs at
    // sf0.001). Probes the persisted pair frame and attributes
    // endpoints with two doc_id hash joins (the q151 shape); the
    // within-lang complement is exactly q44 ∖ this set, so the two
    // keys partition the gated pair set.
    "q153_bitext_candidates" -> { (s, dir) =>
      val langs = tWide(s, dir, "documents").select("doc_id", "lang")
      nearDupPairs(s, dir)
        .filter(col("match_cnt") >= NearDupMinMatches)
        .join(langs.toDF("doc_a", "lang_a"), "doc_a")
        .join(langs.toDF("doc_b", "lang_b"), "doc_b")
        .filter(col("lang_a") =!= col("lang_b"))
        .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
          col("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // SYNDICATION matrix — which source pairs share near-duplicate
    // content (mirror sites, feed republication, scraped copies): the
    // per-(source, source) count of q44's near-dup pairs. The curation
    // question this answers is "which sources should dedup against
    // each other FIRST" — cross-source mass means syndication, the
    // diagonal means within-source boilerplate. Probes the persisted
    // pair frame (the build-once discipline — Bench prices this key
    // probe-only) and attributes endpoints with two hash joins on
    // doc_id against the |corpus|-row (doc_id, source) projection;
    // output is a ≤ |sources|² matrix, least/greatest-normalized so
    // the pair orientation can't split a cell.
    "q151_syndication" -> { (s, dir) =>
      val pairs = nearDupPairs(s, dir)
        .filter(col("match_cnt") >= NearDupMinMatches)
        .select("doc_a", "doc_b")
      val src = tWide(s, dir, "documents").select("doc_id", "source")
      pairs
        .join(src.toDF("doc_a", "src_a"), "doc_a")
        .join(src.toDF("doc_b", "src_b"), "doc_b")
        .select(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    },

    // DEDUP THRESHOLD CURVE — pair and affected-doc counts at EVERY
    // MinHash agreement cutoff 1..32: the calibration table that turns
    // "what threshold should near-dup use" from a guess into a read
    // (q132 evaluates ONE bounded subcorpus against exact truth; this
    // prices every cutoff on the FULL corpus — together they give
    // precision AND volume per threshold). Probes the persisted
    // UNFILTERED q44 pair frame (build-once, priced probe-only); both
    // curves reduce to ≤ 32-key aggregations — pairs via a
    // match_cnt histogram, affected docs via each doc's MAX agreement
    // (so a doc counts once per cutoff it survives to) — joined
    // against the 1..32 grid. Nothing here touches text or
    // signatures; the whole key is arithmetic on the pair frame.
    "q173_dedup_curve" -> { (s, dir) =>
      val grid = s.range(1, 33).toDF("threshold")
        .select(col("threshold").cast("long").as("threshold"))
      val pairs = nearDupPairs(s, dir).select("doc_a", "doc_b", "match_cnt")
      val pc = pairs.groupBy("match_cnt").agg(count(lit(1)).as("np"))
      val dm = pairs
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc"),
          col("match_cnt"))
        .groupBy("doc").agg(max("match_cnt").as("mm"))
        .groupBy("mm").agg(count(lit(1)).as("nd"))
      grid
        .join(broadcast(pc), col("match_cnt") >= col("threshold"), "left")
        .groupBy("threshold")
        .agg(coalesce(sum("np"), lit(0L)).cast("long").as("n_pairs"))
        .join(grid.join(broadcast(dm), col("mm") >= col("threshold"), "left")
          .groupBy("threshold")
          .agg(coalesce(sum("nd"), lit(0L)).cast("long").as("n_docs_affected")),
          "threshold")
        .orderBy("threshold")
    },

    // DEGREE ASSORTATIVITY of the near-dup graph — Pearson r of the
    // endpoint degrees over all (both-orientation) edges: positive
    // means hubs pair with hubs (one template family cross-linking —
    // collapse it as a unit), negative means hub-and-spoke (one
    // canonical doc with many variants — survivor-pick per spoke). The
    // q168 census says HOW MANY triangles; this says WHICH dedup
    // topology generated them. Probes the persisted q44 pair frame;
    // all five correlation moments are exact int64 sums over integer
    // degrees (both orientations make Σx = Σy, kept explicit anyway),
    // and the one sqrt+division happens on identical longs at display.
    "q187_assortativity" -> { (s, dir) =>
      assortativity(nearDupPairs(s, dir)
        .filter(col("match_cnt") >= NearDupMinMatches)
        .select("doc_a", "doc_b"))
    },

    // TRIANGLE CENSUS of the near-dup graph — edges, wedges, triangles
    // and the global clustering coefficient 3T/W: the one-row shape
    // signature that says whether near-dup pairs are CLIQUES (template
    // families, mirror rings — high clustering) or CHAINS (drifting
    // revisions — low), which decides whether cluster-collapse dedup
    // (q89/q117) or pairwise survivor picks fit the corpus. Probes the
    // persisted q44 pair frame (build-once; Bench prices this key
    // probe-only). Triangle counting is the degree-ordered orientation
    // scheme (Suri & Vassilvitskii's MR-friendly form): each edge
    // orients low→high by (degree, id), wedges join only at each
    // vertex's OUT-edges (out-degree ≤ √2m, so wedge work is bounded
    // even at hub vertices), and a wedge closes iff its (v1, v2) edge
    // exists — each triangle counted exactly once from its
    // lowest-order vertex. Wedge totals come from exact integer
    // degree arithmetic, never enumeration.
    "q168_triangles" -> { (s, dir) =>
      triangleCensus(nearDupPairs(s, dir)
        .filter(col("match_cnt") >= NearDupMinMatches)
        .select("doc_a", "doc_b"))
    },

    // The pair-index GROWTH path under the gate — the lifecycle step
    // q44's persisted frame presumes but doesn't exercise: epoch A
    // builds the pair frame, epoch B appends only its new×old + new×new
    // DELTA (A×A never recomputes), and the probe reads the GROWN
    // frame. The answer must equal the one-shot pair set over A∪B —
    // the oracle is q44's twin verbatim, so the gate IS the
    // append ≡ rebuild equivalence proof (q113/q134's discipline
    // applied to pair output).
    "q136_pair_grow_reprobe" -> { (s, dir) =>
      s.read.parquet(grownPairIndex(s, dir))
        .filter(col("match_cnt") >= NearDupMinMatches)
        .orderBy("doc_a", "doc_b")
    },

    // Incremental (delta-vs-corpus) near-dup — the shape a real training
    // pipeline runs DAILY: a new ingest batch (doc_id % 10 = 7, ~10%)
    // asks "which of my docs duplicate the EXISTING corpus" without ever
    // re-pairing corpus × corpus. The corpus's MinHash signatures + band
    // keys are persisted BUCKETED on the band key
    // (Staging.storeBucketed), so the probe is newBatch-bands against a
    // pre-bucketed table: at 100 TB the corpus side is written once,
    // appended per ingest (Staging.upsert), and NEVER shuffles again —
    // each day's join moves only the batch's band rows. Here the batch
    // is small enough to broadcast (zero shuffle on either side); when a
    // batch outgrows broadcast, the bucketed layout makes the fallback a
    // sort-merge join that exchanges ONLY the batch side (pinned by
    // PlanSpec, the q69 discipline). Batch-internal duplicates are q44's
    // job, deliberately out of scope here.
    "q106_dedup_incremental" -> { (s, dir) =>
      probeBandIndex(s, corpusBandIndex(s, dir), dir)
    },

    // The index GROWTH path under the gate — the lifecycle step q106
    // presumes but doesn't exercise: the corpus index is built from
    // ingest epoch A, epoch B is appended in place with
    // Staging.appendBucketed (bucket layout preserved — PlanSpec pins
    // the post-append probe still scans bucketed with zero index-side
    // exchange), and today's batch probes the GROWN index. The answer
    // must equal probing a one-shot index over A∪B — the oracle is
    // q106's twin verbatim, since A∪B is exactly q106's corpus — which
    // pins that appendBucketed changed the layout's file count and
    // nothing else. At 100 TB this is the daily cycle: append today's
    // bands, probe tomorrow's batch; nothing ever rebuilds.
    "q113_dedup_append_reprobe" -> { (s, dir) =>
      probeBandIndex(s, grownBandIndex(s, dir), dir)
    },

    // q106's probe as a TRUE STREAM: new docs arrive as file-source
    // micro-batches (two ingest batches, doc_id % 20 splits), each row
    // computes its own MinHash signature with the per-row
    // [[graft.plans.MinHashCode]] kernel — NO stateful aggregation, no
    // stream-side shuffle; the signature is a narrow map — then its
    // band keys stream-static join against the SAME persisted corpus
    // index q106 reads. The join is stateless (inner stream-static),
    // so state-store cost is zero and the watermark machinery isn't
    // needed: this is the always-on ingest-dedup service shape, where
    // each arriving document is checked against the corpus within its
    // micro-batch. Verified pairs append to a parquet sink
    // (exactly-once file log); the read-back dedups band-collision
    // repeats. Oracle: identical to q106 — streaming ingest must
    // reproduce the one-shot batch answer bit-for-bit.
    "q108_stream_dedup_incremental" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      val tab = corpusBandIndex(s, dir)
      val corpus = s.table(tab).toDF("corpus_doc", "sig_c", "bk")
      val base = freshBase(s, dir, "q108")
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
        val sig = stream
          .withColumn("arr",
            transform(shingles(col("text"), 3), sg => polyHash(sg)))
          // shingle-less docs (< 3 tokens) have no signature — the
          // group-by form drops them by never seeing a row
          .filter(size(col("arr")) > 0)
          .select(col("doc_id"),
            graft.plans.MinHashAgg.minhash_code(col("arr")).as("sig"))
        val pairs = bandKeys(sig).toDF("batch_doc", "sig_b", "bk_b")
          .join(corpus, col("bk") === col("bk_b"))
          .select(col("batch_doc"), col("corpus_doc"),
            graft.plans.GraftExpressions.zip_equal(col("sig_b"), col("sig_c"))
              .as("match_cnt"))
          .filter(col("match_cnt") >= NearDupMinMatches)
        val q = graft.streaming.StreamPipelines
          .writeParquetStream(pairs, outDir, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .select("batch_doc", "corpus_doc", "match_cnt")
        .distinct()
        .withColumn("est_jaccard", col("match_cnt") / NumPerms.toDouble)
        .orderBy("batch_doc", "corpus_doc")
    },

    // Brute-force cosine top-5 per query vector (vec_id % 50 = 0 AND
    // vec_id < 5000, i.e. |Q| ≤ 100 ABSOLUTELY — a modulo alone would
    // grow the query set with the corpus and turn this exact-correctness
    // baseline quadratic; with the cap the pair space stays O(n)).
    // Norms are precomputed per vector (one linear pass) so the O(|q|·n)
    // pair stage evaluates ONE seq_dot per pair, not three. The scale
    // paths for unbounded query sets are q57 (IVF) / q73 / q90 / q109.
    "q45_sim_topk" -> { (s, dir) =>
      val emb = tWide(s, dir, "embeddings")
        .withColumn("nrm", graft.functions.VectorOps.l2Norm(col("embedding")))
      val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val v = emb.select(col("vec_id").as("nid"), col("embedding").as("ve"),
        col("nrm").as("vn"))
      val w = Window.partitionBy("qid").orderBy(desc("sim_raw"), col("nid"))
      // broadcast the CONTRACT-bounded query side explicitly: the
      // autobroadcast estimator sizes the post-filter frame from scan
      // stats it can't see through, so left to itself it builds the
      // full corpus side (BuildRight over every embedding) — fine at
      // fixture scale, fatal at 100 TB. Same form as q201.
      broadcast(q).crossJoin(v)
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          graft.functions.VectorOps.cosinePre(
            seqDot(col("qe"), col("ve")), col("qn"), col("vn")).as("sim_raw"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("nid"),
          round(col("sim_raw"), 6).as("sim"))
        .orderBy("qid", "rnk")
    },

    // HARD-NEGATIVE MINING — the contrastive-training selection step:
    // for each query vector, the most-similar vectors carrying a
    // DIFFERENT label (top-3 by cosine). High-similarity/wrong-label is
    // exactly what embedding finetuning needs as negatives; random
    // negatives are too easy to carry gradient. Same bounded-|Q|
    // contract, precomputed norms, and rank discipline as q45 (the
    // brute-force arm is the correctness baseline; the unbounded-|Q|
    // scale path is IVF/LSH candidate generation feeding this same
    // label-mismatch filter — q57/q73). The label filter lands INSIDE
    // the pair stage, before ranking, so negatives never compete with
    // same-label rows for the top-3 cut.
    "q196_hard_negatives" -> { (s, dir) =>
      val emb = tWide(s, dir, "embeddings")
        .withColumn("nrm", graft.functions.VectorOps.l2Norm(col("embedding")))
      val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("qid"), col("label").as("q_label"),
          col("embedding").as("qe"), col("nrm").as("qn"))
      val v = emb.select(col("vec_id").as("nid"), col("label").as("n_label"),
        col("embedding").as("ve"), col("nrm").as("vn"))
      val w = Window.partitionBy("qid").orderBy(desc("sim_raw"), col("nid"))
      // explicit broadcast of the bounded query side — see q45's note.
      broadcast(q).crossJoin(v)
        .filter(col("nid") =!= col("qid") && col("n_label") =!= col("q_label"))
        .select(col("qid"), col("q_label"), col("nid"), col("n_label"),
          graft.functions.VectorOps.cosinePre(
            seqDot(col("qe"), col("ve")), col("qn"), col("vn")).as("sim_raw"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("nid"), col("q_label"),
          col("n_label"), round(col("sim_raw"), 6).as("sim"))
        .orderBy("qid", "rnk")
    },

    // MMR DIVERSIFIED RETRIEVAL — maximal marginal relevance re-ranking
    // of each query's candidate list: greedily pick the candidate
    // maximizing relevance MINUS its max similarity to what's already
    // picked, so the final 5 don't say the same thing five times (the
    // RAG-context / eval-set diversification step; near-dup retrieved
    // contexts waste the prompt budget q189 packs). λ = 0.5, for which
    // argmax(λ·sim − (1−λ)·maxsim) ≡ argmax(sim − maxsim) — the
    // CONSTANT-FREE form, one subtraction of two gate-proven cosine
    // doubles, nothing else to disagree on cross-engine. Greedy is
    // inherently sequential, so the [[MmrPicks]] rounds unroll as fixed
    // plan stages (the q101 fixed-point discipline: one cached frame
    // per iteration) — but every frame is BOUNDED: |Q| ≤ 100 queries ×
    // [[MmrCandidates]] candidates (the q45 rule), so each round is
    // joins over ≤ 2,000-row cached frames regardless of corpus size.
    // The only corpus-sized work is the one candidate-generation pass
    // (brute force here as the correctness baseline; the scale path
    // feeds IVF/LSH candidates — q57/q73 — into the same greedy loop).
    "q201_mmr_diversify" -> { (s, dir) =>
      val emb = tWide(s, dir, "embeddings")
        .withColumn("nrm", graft.functions.VectorOps.l2Norm(col("embedding")))
      val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val v = emb.select(col("vec_id").as("nid"), col("embedding").as("ve"),
        col("nrm").as("vn"))
      val wTop = Window.partitionBy("qid").orderBy(desc("sim"), col("nid"))
      val cand = broadcast(q).crossJoin(v)
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"), col("ve"), col("vn"),
          graft.functions.VectorOps.cosinePre(
            seqDot(col("qe"), col("ve")), col("qn"), col("vn")).as("sim"))
        .filter(col("sim").isNotNull)
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= MmrCandidates)
        .select("qid", "nid", "ve", "vn", "sim")
        .cache()
      // candidate-candidate similarities: ≤ |Q|·20² rows, all norms > 0
      // by cand's sim-not-null construction
      val pairs = cand.select(col("qid"), col("nid").as("a"),
          col("ve").as("ae"), col("vn").as("an"))
        .join(broadcast(cand.select(col("qid"), col("nid").as("b"),
          col("ve").as("be"), col("vn").as("bn"))), Seq("qid"))
        .filter(col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("b"),
          graft.functions.VectorOps.cosinePre(
            seqDot(col("ae"), col("be")), col("an"), col("bn")).as("psim"))
      // the greedy rounds run INSIDE one expression over each query's
      // bounded arrays (≤ 20 candidates, ≤ 380 pair sims) — a per-row
      // O(picks·cands·pairs) ≈ 40k-op loop, not 5 plan stages: an
      // iterative union-and-cache formulation re-references each round's
      // frame three times and planned 20+ jobs (measured 7 s at sf0.1
      // for ≤ 200 output rows); this single-projection form is the same
      // arithmetic in one pass. Argmax folds are order-free (strict
      // improvement or equal-score-smaller-nid replacement), so the
      // unsorted collect_list order can't leak into the answer.
      // LEFT join + coalesce-to-empty: a query whose candidate list has
      // exactly one entry yields NO pair rows (a != b needs >= 2), and
      // an inner join here would drop the query entirely while the
      // oracle's p1 CTE still emits its step-1 pick. The greedy
      // expression already handles size(cands) < MmrPicks, so an empty
      // prs array is the correct degenerate input.
      val st = cand.groupBy("qid")
        .agg(collect_list(struct(col("nid"), col("sim"))).as("cands"))
        .join(broadcast(pairs.groupBy("qid")
          .agg(collect_list(struct(col("a"), col("b"), col("psim")))
            .as("prs"))), Seq("qid"), "left_outer")
        .withColumn("prs", coalesce(col("prs"), expr(
          "cast(array() as array<struct<a: bigint, b: bigint, psim: double>>)")))
      val picks = expr(s"""
        aggregate(
          sequence(1, $MmrPicks),
          cast(array() as array<struct<nid: bigint, score: double>>),
          (acc, step) ->
            case when size(cands) <= size(acc) then acc else array_append(
              acc,
              aggregate(
                transform(
                  filter(cands, c -> not exists(acc, p -> p.nid = c.nid)),
                  c -> named_struct('nid', c.nid, 'score',
                    case when size(acc) = 0 then c.sim
                    else c.sim - aggregate(
                      filter(prs, pr -> pr.a = c.nid
                        and exists(acc, p -> p.nid = pr.b)),
                      cast(-2.0 as double),
                      (m, pr) -> case when pr.psim > m then pr.psim else m end)
                    end)),
                named_struct('nid', cast(null as bigint),
                  'score', cast(null as double)),
                (best, c) -> case
                  when best.nid is null then c
                  when c.score > best.score then c
                  when c.score = best.score and c.nid < best.nid then c
                  else best end))
            end)""")
      st.select(col("qid"), posexplode(picks).as(Seq("i", "p")))
        .select(col("qid"), (col("i") + 1).cast("long").as("step"),
          col("p.nid").as("nid"), round(col("p.score"), 6).as("score"))
        .orderBy("qid", "step")
    },

    // Composite cleaning pipeline — the canonical training-data flow:
    // exact-dedup survivors → quality gate → per-lang corpus report.
    "q62_clean_pipeline" -> { (s, dir) =>
      val docs = tWide(s, dir, "documents")
      val survivors = docs
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val toks = split(col("text"), " ")
      docs.join(survivors, "doc_id")
        .withColumn("ttr",
          size(array_distinct(toks)).cast("double") / size(toks))
        .withColumn("n_tokens", size(toks).cast("long"))
        .filter(col("ttr") >= 0.2 && col("n_tokens") >= 10)
        .groupBy("lang")
        .agg(count(lit(1)).as("kept_docs"),
          sum("n_tokens").cast("long").as("kept_tokens"),
          round(min("ttr"), 6).as("min_ttr"))
        .orderBy("lang")
    },

    // Per-lang corpus stats.
    "q46_text_stats" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          (sum(dec("n_chars")) / count(lit(1))).cast(D).cast("double")
            .as("avg_chars"),
          countDistinct(col("source")).as("n_sources"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
        .orderBy("lang")
    },
  )

  /** The q44 twin — also q136's oracle verbatim (the grown pair frame
    * must equal the one-shot pair set). */
  /** The q44 MinHash pair CTE chain through `est` (shingles → portable
    * hashes → 32 permutations → 8×4 bands → candidates → match counts),
    * exposed so q151's twin can splice source attribution after the
    * SAME pair replay — one DuckDB source of truth for the pair set. */
  /** The portable MinHash SIGNATURE CTE chain (shingles → char-fold
    * hashes → 32 permutations → `sig(doc_id, sig)`), the exact SQL
    * twin of [[minhashSignatures]] — factored from [[pairEstCtes]] so
    * the q215 survivor oracle composes the same signature definition
    * (the r17 `SimhashCtes` discipline: one SQL source of truth per
    * fingerprint, shared by every gate that uses it). */
  private[graft] val sigCtes: String =
    """sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
      |    range(0, len(string_split(text,' ')) - 2),
      |    i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')))) AS s
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
      |    list_transform(string_split(s,''), ch -> ascii(ch)::BIGINT)),
      |    (a,b) -> (a*131 + b) % 2147483647) AS h
      |  FROM sh),
      |mh AS (
      |  SELECT doc_id, i,
      |    min((h * (1103515245 + 2*i) + (12345 + 7*i)) % 4294967296) AS mh
      |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS i) p
      |  GROUP BY doc_id, i),
      |sig AS MATERIALIZED (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id)""".stripMargin

  private[graft] val pairEstCtes: String =
    s"""WITH $sigCtes,
      |bands AS MATERIALIZED (
      |  SELECT doc_id, b, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
      |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) bb),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |est AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) AS BIGINT) AS match_cnt
      |  FROM cand
      |   JOIN sig sa ON sa.doc_id = doc_a
      |   JOIN sig sb ON sb.doc_id = doc_b)""".stripMargin

  private val nearDupSql: String = pairEstCtes + "\n" +
    s"""SELECT doc_a, doc_b, match_cnt, match_cnt / 32.0 AS est_jaccard
      |FROM est WHERE match_cnt >= $NearDupMinMatches
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Shared twin for q106/q108: the one-shot q44 replay restricted to
    * mixed (batch, corpus) pairs and relabeled. */
  private val incrementalDedupSql: String =
    s"""WITH sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
      |    range(0, len(string_split(text,' ')) - 2),
      |    i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')))) AS s
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
      |    list_transform(string_split(s,''), ch -> ascii(ch)::BIGINT)),
      |    (a,b) -> (a*131 + b) % 2147483647) AS h
      |  FROM sh),
      |mh AS (
      |  SELECT doc_id, i,
      |    min((h * (1103515245 + 2*i) + (12345 + 7*i)) % 4294967296) AS mh
      |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS i) p
      |  GROUP BY doc_id, i),
      |sig AS MATERIALIZED (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
      |bands AS MATERIALIZED (
      |  SELECT doc_id, b, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
      |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) bb),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
      |  WHERE (x.doc_id % 10 = 7) != (y.doc_id % 10 = 7)),
      |est AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) AS BIGINT) AS match_cnt
      |  FROM cand
      |   JOIN sig sa ON sa.doc_id = doc_a
      |   JOIN sig sb ON sb.doc_id = doc_b)
      |SELECT CASE WHEN doc_a % 10 = 7 THEN doc_a ELSE doc_b END AS batch_doc,
      |  CASE WHEN doc_a % 10 = 7 THEN doc_b ELSE doc_a END AS corpus_doc,
      |  match_cnt, match_cnt / 32.0 AS est_jaccard
      |FROM est WHERE match_cnt >= $NearDupMinMatches
      |ORDER BY batch_doc, corpus_doc""".stripMargin

  def oracle: Map[String, String] = Map(
    "q43_dedup_exact" ->
      """WITH s AS (SELECT lang, md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dups
        |  FROM documents GROUP BY lang, md5(text))
        |SELECT lang, count(*) AS n_unique, CAST(sum(dups) AS BIGINT) AS n_docs,
        |  min(keep_id) AS min_keep_id
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "q44_dedup_near" -> nearDupSql,

    // q215: the shared sig CTEs → exact-signature collapse → banded
    // candidates + match-count verify over DISTINCT sigs → unrolled
    // min-label (same SurvivorIters step count as the engine, same
    // MATERIALIZED discipline as q87/q214) → expand groups back → one
    // survivor (min doc_id, computed over members) per cluster.
    "q215_minhash_survivors" ->
      s"""WITH $sigCtes,
        |grp AS MATERIALIZED (
        |  SELECT sig, min(doc_id) AS rep, count(*)::BIGINT AS n_members
        |  FROM sig GROUP BY sig),
        |gb AS MATERIALIZED (
        |  SELECT rep, sig, b, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
        |  FROM grp CROSS JOIN (SELECT unnest(range(8)) AS b) bb),
        |fpp AS MATERIALIZED (
        |  SELECT DISTINCT x.rep AS rep_a, y.rep AS rep_b
        |  FROM gb x JOIN gb y ON x.b = y.b AND x.bkey = y.bkey AND x.rep < y.rep
        |  WHERE len(list_filter(list_zip(x.sig, y.sig), z -> z[1] = z[2])) >= $NearDupMinMatches),
        |edges AS MATERIALIZED (SELECT rep_a AS src, rep_b AS dst FROM fpp
        |  UNION ALL SELECT rep_b, rep_a FROM fpp),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges),
        |${GraphQueries.labelSteps(SimilarityQueries.SurvivorIters)},
        |lab AS (
        |  SELECT m.doc_id, coalesce(l.lbl, m.rep) AS cluster_id,
        |    m.n_members, l.node AS lnode
        |  FROM (SELECT s.doc_id, g.rep, g.n_members
        |        FROM sig s JOIN grp g ON g.sig = s.sig) m
        |  LEFT JOIN l${SimilarityQueries.SurvivorIters} l ON l.node = m.rep)
        |SELECT cluster_id, count(*)::BIGINT AS n_docs,
        |  min(doc_id) AS survivor_doc, (count(*) - 1)::BIGINT AS n_dropped
        |FROM lab WHERE n_members >= 2 OR lnode IS NOT NULL
        |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // q152: md5 exact-survivor CTE + the SAME pair replay — equality
    // proves every stage count, including the zero exact-drop path at
    // sf0.001
    "q152_dedup_funnel" -> (pairEstCtes + ",\n" +
      s"""keep1 AS (SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id, md5(text) AS m FROM documents) GROUP BY m),
        |p AS (SELECT doc_a, doc_b FROM est WHERE match_cnt >= $NearDupMinMatches),
        |d2 AS (SELECT DISTINCT doc_b FROM p
        |  JOIN keep1 ka ON ka.doc_id = p.doc_a
        |  JOIN keep1 kb ON kb.doc_id = p.doc_b),
        |n AS (SELECT (SELECT count(*) FROM documents) AS n0,
        |  (SELECT count(*) FROM keep1) AS n1,
        |  (SELECT count(*) FROM d2) AS d2)
        |SELECT stage, n_in, n_dropped, n_out FROM (
        |  SELECT '00_raw' AS stage, n0 AS n_in, 0::BIGINT AS n_dropped, n0 AS n_out FROM n
        |  UNION ALL SELECT '01_exact', n0, n0 - n1, n1 FROM n
        |  UNION ALL SELECT '02_near', n1, d2, n1 - d2 FROM n)
        |ORDER BY stage""".stripMargin),

    // q153: the SAME pair replay + language attribution, cross-lang
    // rows only — with q44 this partitions the gated pair set
    "q153_bitext_candidates" -> (pairEstCtes + ",\n" +
      s"""p AS (SELECT doc_a, doc_b, match_cnt FROM est WHERE match_cnt >= $NearDupMinMatches),
        |lg AS (SELECT doc_id, lang FROM documents)
        |SELECT doc_a, doc_b, la.lang AS lang_a, lb.lang AS lang_b,
        |  match_cnt / 32.0 AS est_jaccard
        |FROM p JOIN lg la ON la.doc_id = doc_a
        |       JOIN lg lb ON lb.doc_id = doc_b
        |WHERE la.lang != lb.lang
        |ORDER BY doc_a, doc_b""".stripMargin),

    // q151: the SAME pair replay (shared pairEstCtes) + source
    // attribution — equality proves the matrix counts exactly q44's
    // pair set, orientation-normalized
    // q173: the q44 pair replay aggregated against the 1..32 grid —
    // the same two ≤32-key histograms, LEFT joins so empty cutoffs
    // report zeros
    "q173_dedup_curve" -> (pairEstCtes + ",\n" +
      """grid AS (SELECT unnest(range(1, 33)) AS threshold),
        |pc AS (SELECT match_cnt, count(*) AS np FROM est GROUP BY match_cnt),
        |dm AS (SELECT mm, count(*) AS nd FROM (
        |  SELECT doc, max(match_cnt) AS mm FROM (
        |    SELECT doc_a AS doc, match_cnt FROM est
        |    UNION ALL SELECT doc_b, match_cnt FROM est) u
        |  GROUP BY doc) m GROUP BY mm),
        |cp AS (SELECT threshold,
        |    CAST(COALESCE(sum(np), 0) AS BIGINT) AS n_pairs
        |  FROM grid LEFT JOIN pc ON match_cnt >= threshold
        |  GROUP BY threshold),
        |cd AS (SELECT threshold,
        |    CAST(COALESCE(sum(nd), 0) AS BIGINT) AS n_docs_affected
        |  FROM grid LEFT JOIN dm ON mm >= threshold
        |  GROUP BY threshold)
        |SELECT threshold, n_pairs, n_docs_affected
        |FROM cp JOIN cd USING (threshold)
        |ORDER BY threshold""".stripMargin),

    // q187: the q44 pair replay → both-orientation degree pairs →
    // exact integer correlation moments, one sqrt at display
    "q187_assortativity" -> (pairEstCtes + ",\n" +
      s"""p AS (SELECT doc_a, doc_b FROM est WHERE match_cnt >= $NearDupMinMatches),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT doc_a AS v FROM p UNION ALL SELECT doc_b FROM p)
        |  GROUP BY v),
        |xy AS (
        |  SELECT da.d AS x, db.d AS y FROM p
        |    JOIN deg da ON da.v = p.doc_a JOIN deg db ON db.v = p.doc_b
        |  UNION ALL
        |  SELECT db.d, da.d FROM p
        |    JOIN deg da ON da.v = p.doc_a JOIN deg db ON db.v = p.doc_b),
        |m AS (SELECT count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM xy),
        |nn AS (SELECT count(*) AS n_nodes, CAST(max(d) AS BIGINT)
        |         AS max_degree FROM deg)
        |SELECT n_nodes, CAST(n // 2 AS BIGINT) AS n_edges, max_degree,
        |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |    THEN round((n * sxy - sx * sy)::DOUBLE
        |      / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)), 6)
        |  END AS assortativity
        |FROM m CROSS JOIN nn""".stripMargin),

    // q168: the q44 pair replay → degree-ordered orientation → wedge
    // join → EXISTS closure; wedge total from exact integer degrees
    // (d(d-1)//2), one summary row
    "q168_triangles" -> (pairEstCtes + ",\n" +
      s"""p AS (SELECT doc_a, doc_b FROM est WHERE match_cnt >= $NearDupMinMatches),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT doc_a AS v FROM p UNION ALL SELECT doc_b FROM p)
        |  GROUP BY v),
        |o AS (SELECT
        |    CASE WHEN (da.d, p.doc_a) < (db.d, p.doc_b)
        |         THEN p.doc_a ELSE p.doc_b END AS src,
        |    CASE WHEN (da.d, p.doc_a) < (db.d, p.doc_b)
        |         THEN p.doc_b ELSE p.doc_a END AS dst
        |  FROM p JOIN deg da ON da.v = p.doc_a
        |         JOIN deg db ON db.v = p.doc_b),
        |od AS (SELECT src, dst, d AS dd FROM o JOIN deg ON deg.v = o.dst),
        |w AS (SELECT x.dst AS v1, y.dst AS v2
        |  FROM od x JOIN od y ON x.src = y.src
        |    AND (x.dd, x.dst) < (y.dd, y.dst)),
        |tri AS (SELECT count(*) AS t FROM w
        |  WHERE EXISTS (SELECT 1 FROM od z
        |                WHERE z.src = w.v1 AND z.dst = w.v2))
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM p) AS n_edges,
        |  (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) FROM deg)
        |    AS n_wedges,
        |  (SELECT t FROM tri) AS n_triangles,
        |  CASE WHEN (SELECT sum((d * (d - 1)) // 2) FROM deg) > 0
        |    THEN round(3.0 * (SELECT t FROM tri)
        |      / (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) FROM deg), 6)
        |  END AS clustering""".stripMargin),

    "q151_syndication" -> (pairEstCtes + ",\n" +
      s"""p AS (SELECT doc_a, doc_b FROM est WHERE match_cnt >= $NearDupMinMatches),
        |src AS (SELECT doc_id, source FROM documents)
        |SELECT least(sa.source, sb.source) AS source_a,
        |  greatest(sa.source, sb.source) AS source_b,
        |  count(*) AS n_pairs
        |FROM p JOIN src sa ON sa.doc_id = p.doc_a
        |       JOIN src sb ON sb.doc_id = p.doc_b
        |GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin),
    // the grown (A build + B delta append) pair frame holds exactly the
    // one-shot pair set over A∪B, so q44's twin IS the oracle:
    // append-then-probe must be indistinguishable from build-once
    "q136_pair_grow_reprobe" -> nearDupSql,

    // q123: the q44 pipeline's pairs, re-verified exactly via the q55
    // distinct-shingle 62-bit arrays (list_intersect = the engine's
    // sorted two-pointer merge)
    "q123_sketch_error" ->
      s"""WITH sh AS (
        |  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
        |    range(0, len(string_split(text,' ')) - 2),
        |    i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')))) AS s
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(s,''), ch -> ascii(ch)::BIGINT)),
        |    (a,b) -> (a*131 + b) % 2147483647) AS h
        |  FROM sh),
        |mh AS (
        |  SELECT doc_id, i,
        |    min((h * (1103515245 + 2*i) + (12345 + 7*i)) % 4294967296) AS mh
        |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS i) p
        |  GROUP BY doc_id, i),
        |sig AS MATERIALIZED (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, b, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
        |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |pairs AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) AS BIGINT) AS match_cnt
        |  FROM cand
        |   JOIN sig sa ON sa.doc_id = doc_a
        |   JOIN sig sb ON sb.doc_id = doc_b),
        |arrs AS MATERIALIZED (
        |  SELECT doc_id, list_transform(list_distinct(list_transform(
        |      range(0, len(string_split(text,' ')) - 2),
        |      i -> array_to_string(string_split(text,' ')[i+1:i+3], ' '))),
        |    sg -> list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*131 + b) % 2147483647) * 2147483648
        |        + list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*137 + b) % 2147483647)) AS arr
        |  FROM documents),
        |x AS (
        |  SELECT p.doc_a, p.doc_b, match_cnt, match_cnt / 32.0 AS est_jaccard,
        |    len(list_intersect(a.arr, b.arr))::BIGINT AS inter,
        |    (len(a.arr) + len(b.arr) - len(list_intersect(a.arr, b.arr)))::BIGINT AS uni
        |  FROM pairs p
        |   JOIN arrs a ON a.doc_id = p.doc_a
        |   JOIN arrs b ON b.doc_id = p.doc_b
        |  WHERE match_cnt >= $NearDupMinMatches)
        |SELECT doc_a, doc_b, match_cnt, est_jaccard,
        |  round(inter::DOUBLE / uni, 6) AS exact_jaccard,
        |  round(abs(est_jaccard - round(inter::DOUBLE / uni, 6)), 6) AS abs_err
        |FROM x ORDER BY doc_a, doc_b""".stripMargin,

    // q44's declarative replay restricted to mixed pairs (exactly one
    // side in the ingest batch), relabeled (batch_doc, corpus_doc):
    // signatures are per-doc quantities, so the one-shot pair query
    // with a side filter IS the incremental answer. q108 (the streaming
    // ingest form) must reproduce the same answer bit-for-bit, so it
    // shares the twin verbatim.
    "q106_dedup_incremental" -> incrementalDedupSql,
    "q108_stream_dedup_incremental" -> incrementalDedupSql,
    // the grown (A build + B append) index holds exactly q106's corpus
    // (A∪B = doc_id % 10 != 7), so the one-shot twin IS the oracle:
    // append-then-probe must be indistinguishable from build-once
    "q113_dedup_append_reprobe" -> incrementalDedupSql,

    // norms precomputed per vector in CTE `e` — the same sqrt'd
    // sequential fold the Spark side's l2Norm runs (D7: bit-identical
    // whether computed once or per pair)
    // q196: q45's CTE rendering with the label carried through the
    // pair stage and the mismatch filter applied BEFORE ranking
    "q196_hard_negatives" ->
      """WITH e AS MATERIALIZED (SELECT vec_id, label, embedding,
        |    sqrt(list_reduce(list_transform(range(1,65), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (a,b)->a+b)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, label AS q_label, embedding AS qe, nrm AS qn FROM e
        |  WHERE vec_id % 50 = 0 AND vec_id < 5000),
        |p AS (
        |  SELECT qid, q_label, vec_id AS nid, label AS n_label,
        |    list_reduce(list_transform(range(1,65), i -> CAST(qe[i]*embedding[i] AS DOUBLE)), (a,b)->a+b) AS dot,
        |    qn, nrm AS vn
        |  FROM q CROSS JOIN e WHERE vec_id != qid AND label != q_label),
        |s AS (SELECT qid, q_label, nid, n_label,
        |  CASE WHEN qn = 0 OR vn = 0 THEN NULL ELSE dot/(qn*vn) END AS sim_raw FROM p),
        |r AS (SELECT qid, q_label, nid, n_label, sim_raw,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, nid) AS rnk FROM s)
        |SELECT qid, rnk, nid, q_label, n_label, round(sim_raw, 6) AS sim
        |FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "q45_sim_topk" ->
      """WITH e AS MATERIALIZED (SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_transform(range(1,65), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (a,b)->a+b)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e
        |  WHERE vec_id % 50 = 0 AND vec_id < 5000),
        |p AS (
        |  SELECT qid, vec_id AS nid,
        |    list_reduce(list_transform(range(1,65), i -> CAST(qe[i]*embedding[i] AS DOUBLE)), (a,b)->a+b) AS dot,
        |    qn, nrm AS vn
        |  FROM q CROSS JOIN e WHERE vec_id != qid),
        |s AS (SELECT qid, nid,
        |  CASE WHEN qn = 0 OR vn = 0 THEN NULL ELSE dot/(qn*vn) END AS sim_raw FROM p),
        |r AS (SELECT qid, nid, sim_raw,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, nid) AS rnk FROM s)
        |SELECT qid, rnk, nid, round(sim_raw, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    // q201: the greedy rounds UNROLL as generated CTE layers (fixed
    // pick count — no recursion, so no recursive-term aggregate
    // restrictions); each p_k excludes prior picks and ranks by the
    // constant-free sim − max(psim-to-picked) score. cand/pairs are
    // multi-referenced → MATERIALIZED.
    "q201_mmr_diversify" -> {
      val steps = (2 to MmrPicks).map { k =>
        val prev = (1 until k).map(i => s"SELECT qid, nid FROM p$i")
          .mkString(" UNION ALL ")
        s"""p$k AS (
           |  SELECT qid, nid, score FROM (
           |    SELECT c.qid, c.nid, c.sim - pen.pen AS score,
           |      row_number() OVER (PARTITION BY c.qid
           |        ORDER BY c.sim - pen.pen DESC, c.nid) AS rn
           |    FROM cand c
           |    JOIN (SELECT pr.qid, pr.a, max(pr.psim) AS pen
           |          FROM pairs pr JOIN ($prev) s
           |            ON pr.qid = s.qid AND pr.b = s.nid
           |          GROUP BY pr.qid, pr.a) pen
           |      ON pen.qid = c.qid AND pen.a = c.nid
           |    WHERE NOT EXISTS (SELECT 1 FROM ($prev) s2
           |      WHERE s2.qid = c.qid AND s2.nid = c.nid)) t
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val out = (1 to MmrPicks).map(i =>
        s"SELECT qid, CAST($i AS BIGINT) AS step, nid, score FROM p$i")
        .mkString(" UNION ALL ")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_transform(range(1,65), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (x,y)->x+y)) AS nrm
         |  FROM embeddings),
         |qv AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e
         |  WHERE vec_id % 50 = 0 AND vec_id < 5000),
         |cand AS MATERIALIZED (
         |  SELECT qid, nid, ve, vn, sim FROM (
         |    SELECT qid, nid, ve, vn, sim,
         |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
         |    FROM (
         |      SELECT q.qid, e.vec_id AS nid, e.embedding AS ve, e.nrm AS vn,
         |        CASE WHEN q.qn = 0 OR e.nrm = 0 THEN NULL ELSE
         |          list_reduce(list_transform(range(1,65), i -> CAST(q.qe[i]*e.embedding[i] AS DOUBLE)), (x,y)->x+y) / (q.qn * e.nrm)
         |        END AS sim
         |      FROM qv q CROSS JOIN e WHERE e.vec_id != q.qid) s0
         |    WHERE sim IS NOT NULL) s1
         |  WHERE rn <= $MmrCandidates),
         |pairs AS MATERIALIZED (
         |  SELECT a.qid, a.nid AS a, b.nid AS b,
         |    list_reduce(list_transform(range(1,65), i -> CAST(a.ve[i]*b.ve[i] AS DOUBLE)), (x,y)->x+y) / (a.vn * b.vn) AS psim
         |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid != b.nid),
         |p1 AS (
         |  SELECT qid, nid, score FROM (
         |    SELECT qid, nid, sim AS score,
         |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
         |    FROM cand) t WHERE rn = 1),
         |$steps
         |SELECT qid, step, nid, round(score, 6) AS score
         |FROM ($out) u ORDER BY qid, step""".stripMargin
    },

    "q62_clean_pipeline" ->
      """WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |d AS (SELECT doc_id, lang,
        |   len(list_distinct(string_split(text,' ')))::DOUBLE / len(string_split(text,' ')) AS ttr,
        |   len(string_split(text,' '))::BIGINT AS n_tokens
        |  FROM documents JOIN surv USING (doc_id))
        |SELECT lang, count(*) AS kept_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
        |  round(min(ttr), 6) AS min_ttr
        |FROM d WHERE ttr >= 0.2 AND n_tokens >= 10
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q46_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(CAST(sum(CAST(n_chars AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS DOUBLE) AS avg_chars,
        | count(DISTINCT source) AS n_sources,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // q132: the q44 candidate chain on the bounded subcorpus, LEFT-joined
    // against exact ≥0.8 truth (integer cross-multiplication — no float
    // boundary), grouped per match_cnt threshold
    "q132_candidate_pr" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
        |    range(0, len(string_split(text,' ')) - 2),
        |    i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')))) AS s
        |  FROM documents WHERE doc_id < 300),
        |h AS (
        |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(s,''), ch -> ascii(ch)::BIGINT)),
        |    (a,b) -> (a*131 + b) % 2147483647) AS h
        |  FROM sh),
        |mh AS (
        |  SELECT doc_id, i,
        |    min((h * (1103515245 + 2*i) + (12345 + 7*i)) % 4294967296) AS mh
        |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS i) p
        |  GROUP BY doc_id, i),
        |sig AS MATERIALIZED (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, b, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
        |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |est AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) AS BIGINT) AS match_cnt
        |  FROM cand
        |   JOIN sig sa ON sa.doc_id = doc_a
        |   JOIN sig sb ON sb.doc_id = doc_b),
        |arrs AS MATERIALIZED (
        |  SELECT doc_id, list_transform(list_distinct(list_transform(
        |      range(0, len(string_split(text,' ')) - 2),
        |      i -> array_to_string(string_split(text,' ')[i+1:i+3], ' '))),
        |    sg -> list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*131 + b) % 2147483647) * 2147483648
        |        + list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*137 + b) % 2147483647)) AS arr
        |  FROM documents
        |  WHERE doc_id < 300 AND len(string_split(text,' ')) >= 3),
        |tru AS MATERIALIZED (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM arrs a JOIN arrs b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.arr, b.arr)) AS BIGINT) * 5 >=
        |    (len(a.arr) + len(b.arr) - len(list_intersect(a.arr, b.arr))) * 4),
        |tot AS (SELECT count(*) AS n_true FROM tru),
        |mk AS (
        |  SELECT e.match_cnt,
        |    CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_true
        |  FROM est e LEFT JOIN tru t
        |    ON e.doc_a = t.doc_a AND e.doc_b = t.doc_b),
        |per AS (
        |  SELECT threshold, count(*) AS n_cand,
        |    CAST(sum(is_true) AS BIGINT) AS n_tp
        |  FROM mk CROSS JOIN (SELECT unnest([13, 20, 26]) AS threshold) th
        |  WHERE match_cnt >= threshold GROUP BY threshold)
        |SELECT CAST(threshold AS BIGINT) AS threshold, n_cand,
        |  CAST(n_true AS BIGINT) AS n_true, n_tp,
        |  round(n_tp::DOUBLE / n_cand, 6) AS prec,
        |  CASE WHEN n_true > 0 THEN round(n_tp::DOUBLE / n_true, 6) END AS rec
        |FROM per, tot ORDER BY threshold""".stripMargin,
  )
}
