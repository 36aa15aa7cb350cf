package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.operators.LlmQueries.seqDot
import graft.plans.GraftExpressions.poly_hash

/** Similarity & fingerprint-family operators (beyond the q43–q46 core):
  * SimHash near-dup, exact n-gram Jaccard via inverted-index pair join,
  * blocked embedding near-dup, and IVF-bucketed approximate NN — the
  * scale paths that complement the brute-force baselines.
  *
  * Scale notes: SimHash candidate generation joins on 15-bit chunks —
  * a recall heuristic (candidates pinned by the oracle), hash-
  * partitionable like any LSH band join. Exact Jaccard (q55) avoids the
  * naive posting-list blowup with PPJoin prefix filtering, so hot
  * shingles never drive the candidate join. IVF assigns vectors to
  * their nearest centroid once (linear), then probes only the query's
  * bucket — the candidate set shrinks by the centroid fan-out. */
object SimilarityQueries {

  private def tokens(text: Column) = split(text, " ")

  /** IVF centroid policy — the k-vs-recall contract. Centroids are the
    * vectors with vec_id % stride = 0 where
    *   stride = CentroidBaseStride × ceil(n / (MaxCentroids × CentroidBaseStride)),
    * i.e. k = n/100 while the corpus is small, hard-capped at
    * k ≤ [[MaxCentroids]] (and ≥ MaxCentroids/2 asymptotically) once it
    * isn't. Decoupling k from n is what keeps IVF a 100 TB shape: the
    * centroid table stays a bounded broadcast (4096 × 64 floats ≈ 1 MB)
    * and assignment stays O(n·k) with fixed k — a k ∝ n rule would make
    * assignment O(n²/100) with an O(n) broadcast. The recall side of the
    * contract: per-probe candidate sets average n/k vectors, so capping k
    * GROWS buckets linearly with the corpus instead of holding them at
    * 100 — recall per probed bucket rises (bigger buckets), probe cost
    * rises with n/k; deployments wanting flat probe cost raise
    * MaxCentroids (and re-cluster) rather than letting k float with n.
    * The stride stays a MULTIPLE of CentroidBaseStride=100 so every
    * centroid id satisfies % 100 = 0 ⇒ % 10 = 0 ≠ 3: centroids always
    * live in q134's base epoch A, which is what lets the grown index
    * freeze them. Mirrored verbatim in the q57/q122/q134 oracle SQL
    * (`par` CTE). */
  private[graft] val CentroidBaseStride = 100L
  private[graft] val MaxCentroids = 4096L

  /** q203: truncated (matryoshka) retrieval width. */
  val MrlDims = 16

  /** q206: fixed Lloyd-iteration count (the q87/q101 fixed-iteration
    * discipline — the gate needs a deterministic round count, and the
    * oracle unrolls one CTE layer per round). */
  val KmeansRounds = 3

  /** q212: the drift threshold (micro-units of q199's drift metric,
    * i.e. 50000 = mean drift 0.05) above which the maintenance loop
    * reclusters. Direction note: on these fixtures the corpus-weighted
    * mean drift FALLS with scale (measured, DuckDB 2026-08-15:
    * 194712 / 183642 / 86259 / 37113 micro at sf0.001/0.01/0.1/1 —
    * stride-sampled seeds sit closer to their members' means in larger
    * corpora), so the trigger fires at sf0.001–sf0.1 and does NOT fire
    * at sf1: the recluster branch is equivalence-proved at the
    * driver's primary gate scale and the skip branch at the standing
    * sf1 gate, with ≥1.35× margin to the threshold on both sides. */
  val DriftTriggerMicro = 50000L

  /** q208/q209: the slice predicate — ONE definition each side of the
    * gate: [[sliceDocs]] is the engine filter, [[SliceSrc]] its DuckDB
    * source-expression twin. Contiguous id runs (see the q208 key
    * note); editing one without the other breaks oracle parity for
    * BOTH slice keys. */
  private def sliceDocs(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 100 >= 90 || col("doc_id") < 15)
  private val SliceSrc =
    "(SELECT * FROM documents WHERE doc_id % 100 >= 90 OR doc_id < 15)"

  /** q210/q211: the SECOND, DISJOINT slice (VERDICT r15 item 1). The
    * original slice was chosen BECAUSE the known dup pairs live in its
    * id-ranges — a valid tripwire for the shared pipeline, but blind
    * to a scale bug whose trigger lives in the other 85% of id-space.
    * This one is the mid-range residue run [40,50), picked WITHOUT
    * reference to where pairs live (contiguity is kept because the
    * fixtures' dup partners are id-adjacent — any non-contiguous
    * slice is hollow by construction, which tests nothing). Fully
    * disjoint from [[sliceDocs]]: residues 40-49 never meet 90-99,
    * and every id < 15 has residue < 15. Measured pair counts are
    * PINNED (DuckDB, 2026-08-15): jaccard 0/1/2/2 and containment
    * 0/2/4/4 at sf0.001/0.01/0.1/1 — sf0.001's 0 is the "even 0"
    * pin VERDICT asked for (SliceCountSpec asserts the fixture-scale
    * counts; round_close.sh asserts the sf1 replay counts), so a
    * silently-hollow slice fails loudly instead of green-by-vacuity. */
  private def sliceDocsMid(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 100 >= 40 && col("doc_id") % 100 < 50)
  private val SliceMidSrc =
    "(SELECT * FROM documents WHERE doc_id % 100 >= 40 AND doc_id % 100 < 50)"
  /** q214: fixed min-label propagation depth over the FINGERPRINT-level
    * near-dup graph (the q87/q101 fixed-iteration discipline — both
    * engines run the identical step count whether or not converged).
    * 8 steps measured convergent (one more step is a fixed point) at
    * sf0.001/0.01/0.1/1 — and the fp graph is a function of DISTINCT
    * corpus content, so replica-grown scales (sf3) see the same graph. */
  val SurvivorIters = 8

  private[graft] def centroidStride(n: Long): Long = {
    val block = MaxCentroids * CentroidBaseStride
    CentroidBaseStride * math.max(1L, (n + block - 1L) / block)
  }

  /** q206: one Lloyd round over an assignment frame (vec_id, vq, cid,
    * pcid) — re-estimate every centroid as its members' exact int64
    * component sums, then reassign every vector to the argmax of
    * dot_int64(vq, sums)/sqrt(Σsums²) with ties to the smaller
    * centroid id (cos(v, mean) ∝ that score: the positive 1/(n·2^20)
    * mean scaling and the per-vector norm both cancel inside the
    * per-vector argmax). Returns the NEXT assignment frame; the caller
    * owns checkpointing. The plan shape PlanSpec pins: (cid, pos)
    * int64 partials map-side combined, the k-row centroid table
    * EXPLICITLY broadcast into the reassignment pass, no sort-merge
    * join anywhere. */
  private[graft] def kmeansReassign(cur: DataFrame): DataFrame = {
    import graft.plans.GraftExpressions.seq_dot_long
    // nc rides the same (cid,pos) shuffle for free (every vector
    // contributes every pos, so count per (cid,pos) = cluster size);
    // the assert_true filter makes the exactness-width bound LOUD on
    // the engine side — Spark's non-ANSI long sum/dot wraps silently,
    // so without it only the DuckDB twin's checked multiply would
    // catch an overflowing cluster (ADVICE r15). The filter shape
    // (assert IS NULL ⇒ always true on valid data) survives column
    // pruning, costs one codegen'd compare per (cid,pos) row.
    val sums = cur
      .select(col("cid"), posexplode(col("vq")).as(Seq("pos", "v")))
      .groupBy("cid", "pos").agg(sum("v").as("sq"), count(lit(1)).as("nc"))
      .filter(assert_true(col("nc") <= lit(131071L),
        lit("q206: cluster size exceeds 2^17-1 — int64 dot-product " +
          "exactness bound violated; re-cluster with more centroids"))
        .isNull)
    val cent = sums.groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("sq")))).as("a"))
      .select(col("cid").as("ncid"),
        expr("transform(a, x -> x.sq)").as("sqa"),
        aggregate(col("a"), lit(0.0), (acc, x) =>
          acc + x("sq").cast("double") * x("sq").cast("double")).as("nn"))
      .filter(col("nn") > 0.0)
    val w = Window.partitionBy("vec_id").orderBy(desc("score"), col("ncid"))
    cur.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("vq"), col("cid"), col("ncid"),
        (seq_dot_long(col("vq"), col("sqa")).cast("double")
          / sqrt(col("nn"))).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("vq"), col("ncid").as("cid"),
        col("cid").as("pcid"))
  }

  /** q199's measurement pass over ANY persisted IVF index frame
    * (vec_id, embedding, nrm, cid) — factored so q199 (one-shot index)
    * and q212 (append-grown index) run the identical drift pipeline.
    * Per centroid: member count, mean micro-cosine cohesion, and
    * drift = 1 − cos(seed centroid, member mean). Determinism notes on
    * the q199 key doc; stride is re-derived from the index row count
    * (same corpus ⇒ same stride as build time). */
  private[graft] def kmeansRefine(idx: DataFrame): DataFrame = {
    val stride = centroidStride(idx.count())
    val cent = idx.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("nrm").as("cn"))
    // two linear passes over the partitioned index (cohesion +
    // per-dim sums) — never a corpus-sized cache
    val withC = idx.join(broadcast(cent), Seq("cid"))
    val stats = withC
      .select(col("cid"),
        floor(coalesce(graft.functions.VectorOps.cosinePre(
            seqDot(col("embedding"), col("ce")), col("nrm"), col("cn")),
          lit(0.0)) * 1e6 + 1e-6).as("simq"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_assigned"), sum("simq").as("coh_q"))
    val sums = idx
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cid"), col("pos"),
        floor(col("v").cast("double") * lit(1048576.0)).as("vq"))
      .groupBy("cid", "pos").agg(sum("vq").as("sq"))
    val mean = sums.join(broadcast(stats.select("cid", "n_assigned")), "cid")
      .select(col("cid"), col("pos"),
        (col("sq").cast("double")
          / (col("n_assigned") * lit(1048576L)).cast("double")).as("m"))
    val centPos = cent
      .select(col("cid"), posexplode(col("ce")).as(Seq("pos", "cv")))
      .select(col("cid"), col("pos"), col("cv").cast("double").as("c"))
    val folds = mean.join(broadcast(centPos), Seq("cid", "pos"))
      .select(col("cid"), col("pos"),
        (col("m") * col("c")).as("mc"),
        (col("m") * col("m")).as("mm"),
        (col("c") * col("c")).as("cc"))
      .groupBy("cid")
      .agg(array_sort(collect_list(
        struct(col("pos"), col("mc"), col("mm"), col("cc")))).as("arr"))
      .select(col("cid"),
        aggregate(col("arr"), lit(0.0), (a, x) => a + x("mc")).as("dmc"),
        aggregate(col("arr"), lit(0.0), (a, x) => a + x("mm")).as("dmm"),
        aggregate(col("arr"), lit(0.0), (a, x) => a + x("cc")).as("dcc"))
    cent.select("cid")
      .join(broadcast(stats), Seq("cid"), "left")
      .na.fill(0L, Seq("n_assigned", "coh_q"))
      .join(broadcast(folds), Seq("cid"), "left")
      .select(col("cid"), col("n_assigned"),
        round(when(col("n_assigned") === 0L, lit(0.0))
          .otherwise(col("coh_q").cast("double") / 1e6
            / col("n_assigned")), 6).as("cohesion"),
        round(coalesce(
          when(col("dmm") === 0.0 || col("dcc") === 0.0, lit(0.0))
            .otherwise(lit(1.0)
              - col("dmc") / (sqrt(col("dmm")) * sqrt(col("dcc")))),
          lit(0.0)), 6).as("drift"))
      .orderBy("cid")
  }

  /** 60-bit SimHash per doc: two char-poly word hashes (bases 131/137)
    * supply bits 0..29 / 30..59; bit votes weighted by term frequency.
    * Aggregated in one pass by [[graft.plans.SimHashAgg]] (a
    * TypedImperativeAggregate with a long[60] vote buffer) — no ×60 bit
    * explode, one shuffle, map-side combine. */
  def simhash(docs: DataFrame): DataFrame = {
    import graft.plans.SimHashAgg.simhash_agg
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tk"))
      .groupBy("doc_id", "tk").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"),
        poly_hash(col("tk"), 131).as("h1"), poly_hash(col("tk"), 137).as("h2"))
      .groupBy("doc_id")
      .agg(simhash_agg(col("h1"), col("h2"), col("cnt")).as("simhash"))
  }

  /** q214: the scale-safe rendering of q54's contract — near-dup
    * CLUSTERS with one lowest-id survivor each, instead of the
    * all-pairs list (which the sf3 probe measured output-quadratic:
    * 12.8M pairs at sf1 → 115.5M at sf3, exactly 9× on 3× data).
    *
    * The quadratic is killed by collapsing EXACT fingerprints first:
    * hamming distance is a pure function of the two 60-bit SimHashes,
    * so docs sharing a fingerprint are interchangeable — one
    * representative (min doc_id) stands for the group in candidate
    * generation, verification, and component propagation, and the
    * group expands back only at the final per-doc labeling. Chunk-LSH
    * candidates, hamming verification, and the min-label loop all run
    * at DISTINCT-fingerprint granularity: on replica-grown corpora the
    * fp graph is literally constant (measured: sf0.1 and sf1 both have
    * 4,946 fps / 122,037 fp-pairs for 5k vs 50k docs) and on any
    * corpus it is bounded by distinct content, while the per-doc work
    * (SimHash, group-by, final label join) is one linear shuffle each.
    * This is exactly how a 100 TB dedup pass is shaped: exact-dup
    * collapse, then near-dup clustering over representatives.
    *
    * Components via [[GraphQueries.minLabel]] ([[SurvivorIters]] fixed
    * steps); docs whose fingerprint has ≥2 members (hamming-0 pairs)
    * or ≥1 verified fp-edge are exactly q54's pair-graph vertex set,
    * so every emitted cluster has n_docs ≥ 2. The survivor is the
    * cluster's min doc_id computed EXPLICITLY over members (not
    * assumed equal to the propagated label — equal only at
    * convergence, which the fixed step count doesn't promise). */
  def simhashSurvivors(s: SparkSession, docs: DataFrame): DataFrame = {
    val sh = simhash(docs).cache()
    // exact-fingerprint collapse: rep + member count per distinct simhash
    val grp = sh.groupBy("simhash")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n_members"))
      .cache()
    // q54's 4×15-bit chunk candidates, at fp granularity (grp is cached,
    // so the alias-renamed self-join sides recompute only the explode)
    val chunks = grp.select(col("rep"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("ck", expr("shiftright(simhash, c * 15) & 32767"))
    val ca = chunks.select(col("c").as("c_a"), col("ck").as("ck_a"),
      col("rep").as("rep_a"), col("simhash").as("sh_a"))
    val cb = chunks.select(col("c").as("c_b"), col("ck").as("ck_b"),
      col("rep").as("rep_b"), col("simhash").as("sh_b"))
    val fpPairs = ca.join(cb,
        col("c_a") === col("c_b") && col("ck_a") === col("ck_b") &&
        col("rep_a") < col("rep_b"))
      .filter(expr("bit_count(sh_a ^ sh_b)") <= 8)
      .select("rep_a", "rep_b").distinct()
    val edges = fpPairs
      .select(col("rep_a").as("src"), col("rep_b").as("dst"))
      .unionByName(fpPairs.select(col("rep_b").as("src"), col("rep_a").as("dst")))
    val labels = GraphQueries.minLabel(s, edges, SurvivorIters)
    // labels is the fp-graph node set — the same bounded-frame contract
    // the 8-partition minLabel loop already assumes — but it surfaces
    // from a localCheckpoint, whose unknown stats flip the final
    // corpus-side join to SMJ (a full corpus sort against a ≤5k-row
    // frame at every fixture scale). Broadcast keeps the one
    // corpus-sized pass map-side.
    sh.join(grp.select("simhash", "rep", "n_members"), "simhash")
      .join(broadcast(labels), col("node") === col("rep"), "left")
      .filter(col("n_members") >= 2 || col("node").isNotNull)
      .select(col("doc_id"), coalesce(col("lbl"), col("rep")).as("cluster_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("survivor_doc"))
      .withColumn("n_dropped", col("n_docs") - 1)
      .orderBy("cluster_id")
  }

  /** Build — or REUSE — q57's persisted IVF index: nearest-centroid
    * assignment (centroids per [[centroidStride]] — k capped at
    * [[MaxCentroids]]), written hive-partitioned
    * BY CENTROID under java.io.tmpdir, once per (session, sf). The path
    * is a pure function of (input dir, session) and the content a pure
    * function of the input, so a completed build (parquet `_SUCCESS`
    * marker) is reused — probes are probe-only after the first call
    * (Bench times the build separately as q57_index_build; `rebuild`
    * forces a fresh write). The build is one bounded crossJoin with the
    * broadcast centroid table + one window on vec_id (payload never
    * rides the ×C expansion — assignment is joined back). */
  def ivfIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, "graft_ivf_idx_")
    val idxPath = s"$tmp/graft_ivf_idx_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    val done = new org.apache.hadoop.fs.Path(idxPath, "_SUCCESS")
    val fs = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (rebuild || !fs.exists(done)) {
      val e = tWide(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm", graft.functions.VectorOps.l2Norm(col("embedding")))
        .persist()
      // one count on the persisted frame — a metadata-scale scalar (the
      // q98 sketch-collect class), sizing the centroid stride per the
      // k-vs-recall contract above
      val cent = e.filter(col("vec_id") % centroidStride(e.count()) === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      val wAsgn = Window.partitionBy("vec_id")
        .orderBy(desc("csim"), col("cid"))
      val buckets = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cid"),
          graft.functions.VectorOps.cosinePre(
            seqDot(col("embedding"), col("ce")), col("nrm"), col("cn"))
            .as("csim"))
        .withColumn("rn", row_number().over(wAsgn))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"))
      // repartition BY THE PARTITION COLUMN before the partitioned
      // write: without it every shuffle task writes a file into every
      // cid dir it touches — measured 6,598 files across 601 buckets at
      // sf3 (~11/bucket), and the probe's scans paid ~7× sf1's cost in
      // file opens alone (the r16 sf3 probe's one real defect). With it
      // each bucket is ONE file; a 100 TB deployment would widen that
      // to size-bounded files per bucket, same layout rule.
      graft.sources.Staging.store(
        e.join(buckets, "vec_id").repartition(col("cid")), idxPath,
        partitionBy = Seq("cid"))
      e.unpersist() // store() is an action — the build is done
    }
    idxPath
  }

  /** q134's index: the SAME content as [[ivfIndex]] but reached through
    * the append lifecycle a long-lived vector store actually runs —
    * ingest epoch A (vec_id % 10 ≠ 3) builds the hive-partitioned
    * index, epoch B (vec_id % 10 = 3) is assigned to the SAME FROZEN
    * centroid set and APPENDED (dynamic-partition append: only the
    * centroids epoch B lands in gain files; epoch A's partitions are
    * never rewritten, never re-shuffled). Nearest-centroid assignment
    * is per-vector arithmetic independent of every other vector, so
    * with frozen centroids the grown index provably equals the one-shot
    * build — q134's oracle is q57's twin VERBATIM, making the gate the
    * equivalence proof (the q113 discipline applied to ANN serving).
    * Centroids freeze at vec_id % [[centroidStride]] = 0, all of which
    * live in epoch A (stride is a multiple of 100 ⇒ % 10 = 0 ≠ 3) —
    * real deployments re-cluster offline
    * and rebuild; between re-clusterings this append IS the ingest path.
    *
    * The two-step build is not atomic, so it runs under a temp
    * directory and publishes via delete + RENAME (the grownBandIndex
    * swap discipline): a `_SUCCESS` at the FINAL path ⇒ both epochs
    * landed; a crash mid-build leaves only a temp dir the next build
    * deletes. */
  def ivfIndexGrown(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    import org.apache.hadoop.fs.Path
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, "graft_ivf_grown_")
    val idxPath = s"$tmp/graft_ivf_grown_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    val done = new Path(idxPath, "_SUCCESS")
    val fs = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (rebuild || !fs.exists(done)) {
      val bld = idxPath + "__build_tmp"
      fs.delete(new Path(bld), true)
      val e = tWide(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm", graft.functions.VectorOps.l2Norm(col("embedding")))
        .persist()
      val epochA = e.filter(col("vec_id") % 10 =!= 3)
      // stride from the FULL corpus count — the (re)clustering-time
      // parameter both builds share, so grown ≡ one-shot stays provable;
      // the stride's ×100 granularity keeps every centroid in epoch A
      val cent = epochA.filter(col("vec_id") % centroidStride(e.count()) === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      def assigned(part: DataFrame): DataFrame = {
        val wAsgn = Window.partitionBy("vec_id")
          .orderBy(desc("csim"), col("cid"))
        val buckets = part.crossJoin(broadcast(cent))
          .select(col("vec_id"), col("cid"),
            graft.functions.VectorOps.cosinePre(
              seqDot(col("embedding"), col("ce")), col("nrm"), col("cn"))
              .as("csim"))
          .withColumn("rn", row_number().over(wAsgn))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cid"))
        part.join(buckets, "vec_id")
      }
      // one file per bucket per epoch (see the ivfIndex layout note) —
      // epoch B's dynamic-partition append adds its own file only to
      // the buckets it lands in. The two epoch assignments are
      // INDEPENDENT jobs over the persisted embedding frame (already
      // materialized by the stride count) — run them concurrently into
      // SIBLING dirs (guide §2.6) and merge epoch B by per-partition
      // file move: the absorbed layout is exactly what the
      // dynamic-partition SaveMode.Append produced (same job-unique
      // part files under the same cid= dirs), without serializing
      // epoch B behind epoch A's commit (r22; A/B'd fresh-JVM).
      val bldB = bld + "_epochB"
      fs.delete(new Path(bldB), true)
      graft.Par.run(2)(Seq(
        () => graft.sources.Staging.store(
          assigned(epochA).repartition(col("cid")),
          bld, partitionBy = Seq("cid")),
        () => graft.sources.Staging.store(
          assigned(e.filter(col("vec_id") % 10 === 3))
            .repartition(col("cid")),
          bldB, partitionBy = Seq("cid"))))
      graft.sources.Staging.absorb(s, bldB, bld)
      e.unpersist()
      fs.delete(new Path(idxPath), true)
      // a silently-failed rename (dest recreated concurrently, cross-FS
      // tmpdir) would surface later as an opaque parquet read error —
      // fail AT the publish step instead
      require(fs.rename(new Path(bld), new Path(idxPath)),
        s"ivf index publish failed: rename $bld -> $idxPath")
    }
    idxPath
  }

  /** The shared q57/q134 probe against a persisted IVF index path:
    * queries (ABSOLUTELY bounded, |Q| ≤ 100 — the q45/q122 rule) name
    * their centroids, members come from a partition-PRUNED read of just
    * those buckets, and the bounded query side broadcasts into the
    * band-bucket join. */
  def ivfProbe(s: SparkSession, idxPath: String): DataFrame = {
    val idx = s.read.parquet(idxPath)
    val q = idx.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cid").as("qcid"))
    // bounded by the query count; the partition values arrive as the
    // inference-typed partition column — pass them through raw
    val qcids = q.select("qcid").distinct().collect().map(_.get(0))
    val members = idx.filter(col("cid").isin(qcids.toIndexedSeq: _*))
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("nrm").as("nn"), col("cid").as("ncid"))
    val wTop = Window.partitionBy("qid").orderBy(desc("sim_raw"), col("nid"))
    broadcast(q).join(members, col("qcid") === col("ncid") &&
        col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.functions.VectorOps.cosinePre(
          seqDot(col("qe"), col("ne")), col("qn"), col("nn")).as("sim_raw"))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("rnk"), col("nid"),
        round(col("sim_raw"), 6).as("sim"))
      .orderBy("qid", "rnk")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Quantized-vector similarity search: the memory-cut retrieval path
    // (int8 codes are ¼ of float32 — q83's storage trick applied to
    // SEARCH). Corpus and queries quantize once via the q83 formula
    // (round(x·254) clamp ±127 at scale 0.5), then top-5 per query by
    // EXACT INTEGER dot product — the codegen SeqDotLong kernel; every
    // arithmetic step is integer, so the DuckDB twin matches
    // value-for-value with no float dance at all. Query set bounded
    // (vec_id % 50 = 0), query codes broadcast, corpus side one linear
    // scan + per-query top-k — q45's exact-float twin, quantized; the
    // IVF path (q57) composes the same way at cluster scale. Coding
    // runs the interpreted int8Codes HOF once per vector (corpus-linear,
    // 100× off the pairwise hot path, and deliberately the same
    // expression VectorOpsSpec pins against the q83 kernel). Query set
    // ABSOLUTELY bounded since r11 (vec_id % 50 = 0 AND < 5000, the
    // q45/q122 rule — a modulo alone would grow |Q| with the corpus
    // and turn the linear scan quadratic-by-stealth).
    "q90_sim_quantized" -> { (s, dir) =>
      import graft.plans.GraftExpressions.seq_dot_long
      val coded = tWide(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorOps.int8Codes(col("embedding"), 0.5)
            .as("codes"))
      val q = coded.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("qid"), col("codes").as("qc"))
      val v = coded.select(col("vec_id").as("nid"), col("codes").as("vc"))
      val w = Window.partitionBy("qid").orderBy(desc("dot"), col("nid"))
      broadcast(q).crossJoin(v)
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          seq_dot_long(col("qc"), col("vc")).as("dot"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("nid"), col("dot"))
        .orderBy("qid", "rnk")
    },

    // SimHash pairs: 4×15-bit chunk candidates, hamming ≤ 8.
    // sh is consumed FOUR times (both chunk sides + both verify sides)
    // and alias-renamed consumers defeat ReuseExchange (the q55
    // finding), so uncached the two-shuffle simhash aggregation would
    // run 4×.
    "q54_simhash" -> { (s, dir) =>
      val sh = simhash(tWide(s, dir, "documents")).cache()
      val chunks = sh
        .select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("c"))
        .withColumn("ck", expr("shiftright(simhash, c * 15) & 32767"))
      val ca = chunks.toDF("doc_a", "sh_a", "c_a", "ck_a")
      val cb = chunks.toDF("doc_b", "sh_b", "c_b", "ck_b")
      val cand = ca.join(cb,
          col("c_a") === col("c_b") && col("ck_a") === col("ck_b") &&
          col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val sa = sh.toDF("doc_a", "sha")
      val sb = sh.toDF("doc_b", "shb")
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("hamming",
          expr("CAST(bit_count(sha ^ shb) AS BIGINT)"))
        .filter(col("hamming") <= 8)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    },

    // q54's gated scale twin (VERDICT r16 item 1): SimHash pairs at
    // hamming ≤ 8 → connected components → lowest-id survivor per
    // cluster, with the quadratic retired by exact-fingerprint
    // collapse — see [[simhashSurvivors]]. Output rows ∝ clusters
    // (≤ docs), never pairs.
    "q214_simhash_survivors" -> { (s, dir) =>
      simhashSurvivors(s, tWide(s, dir, "documents"))
    },

    // Exact 3-gram Jaccard ≥ 0.5 with PPJoin-style prefix filtering
    // (Xiao et al., WWW'08): shingles globally ordered by rarity; a pair
    // with J ≥ t must share one of each doc's floor((1-t)·|d|)+1 rarest
    // shingles, so only those generate candidates — hot shingles never
    // drive the join. Exact: no false negatives at the threshold.
    // All plumbing runs on 62-bit long shingle hashes (two char-poly
    // folds, bases 131/137, combined h1·2^31 + h2) instead of shingle
    // strings: long shuffles/joins are far cheaper, and because the DuckDB
    // twin computes the *same* hashes, oracle parity is exact even in the
    // (astronomically unlikely) event of a collision.
    "q55_ngram_jaccard" -> { (s, dir) =>
      ngramJaccardPairs(tWide(s, dir, "documents"))
    },

    // q55 ON A FIXED ARITHMETIC SUBCORPUS (doc_id % 100 >= 90 plus
    // the doc_id < 15 run, BOTH sides — CONTIGUOUS id runs, because
    // the fixtures' dup partners are id-adjacent: a plain modulo
    // residue separates every pair and yields a hollow 0-row key;
    // the low-id run is where the smallest fixture's scattered
    // J >= 0.5 pairs live, keeping the key non-hollow at sf0.001):
    // the pair space shrinks 100×, which is what makes the
    // DuckDB oracle replayable at sf1 in minutes — closing the one
    // sf1-oracle gap the full-corpus q55/q164 replays (quadratic
    // list_intersect, hours in DuckDB) left documented-skipped.
    // (1-4 h)/100 ≈ minutes.
    // Same operator, same engine pipeline, same thresholds; only the
    // input frame is sliced — so the sf1 gate exercises the PPJoin
    // prefix-filter semantics at 10× the doc length distribution's
    // tail without paying the full pair space. (q209 is q164's twin.)
    "q208_jaccard_slice" -> { (s, dir) =>
      ngramJaccardPairs(sliceDocs(tWide(s, dir, "documents")))
    },

    // q164's slice twin — see q208. Runs the ONE-SHOT build
    // (containmentPairs) rather than the persisted q164 index: the
    // slice is an oracle-replay instrument, not a serving path, and
    // its build is 1% of the full build's pair work.
    "q209_containment_slice" -> { (s, dir) =>
      containmentPairs(sliceDocs(tWide(s, dir, "documents")))
    },

    // The DISJOINT mid-range slice twins — same pipelines, the slice
    // nobody picked for its pairs (see the sliceDocsMid note). Their
    // pair counts are pinned per scale; 0-row results at sf0.001 are
    // intentional and asserted, not vacuous.
    "q210_jaccard_slice_mid" -> { (s, dir) =>
      ngramJaccardPairs(sliceDocsMid(tWide(s, dir, "documents")))
    },
    "q211_containment_slice_mid" -> { (s, dir) =>
      containmentPairs(sliceDocsMid(tWide(s, dir, "documents")))
    },

    // EXACT set-CONTAINMENT join — the ASYMMETRIC member of the dedup
    // family: C(sub→sup) = |S_sub ∩ S_sup| / |S_sub| ≥ 0.8 catches a
    // short doc swallowed by a longer one (quote inclusion, page
    // wrapped in boilerplate), which symmetric Jaccard (q44/q55)
    // structurally misses: J = inter/union shrinks as the big doc
    // grows while C is invariant to it. Same 3-gram/62-bit-hash
    // plumbing as q55; the prefix filter adapts to the one-sided
    // threshold: the ordered pair (A→B) needs inter ≥ α = ⌈0.8·|A|⌉,
    // so A's ⌊(1−t)|A|⌋+1 rarest shingles must hit B SOMEWHERE
    // (pigeonhole — and the first common shingle in global rarity
    // order provably sits inside A's prefix, so join keys are ONLY
    // A-prefix = rare shingles: hot inverted lists never drive the
    // join even though B contributes its full list), with the PPJoin
    // positional bound 1 + min(n_a−rn_a, n_b−rn_b) ≥ α and the
    // one-sided length filter n_b ≥ α. Verify runs the early-exit
    // SortedIntersectMin kernel at α; the −1 filter IS the threshold.
    // r13: the shingle/df/rank build persists as q164_index_build
    // (it was 4.2 s of the 4.3 s warm key, recomputed per run) — this
    // key is now probe-only against the persisted frames.
    "q164_containment" -> { (s, dir) =>
      containmentProbe(s, dir)
    },

    // Blocked (per-label) embedding pair scan: the partition-then-compare
    // dedup pattern; reports per-label pair stats. The output semantics
    // cover EVERY within-label pair, so O(n²) comparisons are inherent —
    // the scale problem is that a label-keyed self-join lands each label's
    // whole n² on ONE reducer. Fix: block-partitioned pair join (the
    // MR theta-join partitioning of Okcan & Riedewald, SIGMOD'11): salt
    // each side into B=16 id-blocks and join on (label, partner-block), so
    // a hot label's work spreads across B keys (n²/B per task, B× shuffle
    // replication of one side) with a pair set identical to the naive join.
    "q56_dedup_embed" -> { (s, dir) =>
      val B = 16
      // per-vector norm precomputed before the pair join (one seq_dot per
      // PAIR instead of three — the norm folds are per-vector quantities)
      val e = tWide(s, dir, "embeddings")
        .withColumn("nrm", graft.functions.VectorOps.l2Norm(col("embedding")))
      // A-side: replicated once per partner block pb.
      val a = e.select(col("label").as("l_a"), col("vec_id").as("id_a"),
          col("embedding").as("e_a"), col("nrm").as("n_a"))
        .withColumn("pb", explode(sequence(lit(0), lit(B - 1))))
      // B-side: tagged with its own block.
      val b = e.select(col("label").as("l_b"), col("vec_id").as("id_b"),
        col("embedding").as("e_b"), col("nrm").as("n_b"),
        pmod(col("vec_id"), lit(B)).as("blk_b"))
      a.join(b,
          col("l_a") === col("l_b") && col("pb") === col("blk_b") &&
          col("id_a") < col("id_b"))
        .select(col("l_a").as("label"),
          graft.functions.VectorOps.cosinePre(
            seqDot(col("e_a"), col("e_b")), col("n_a"), col("n_b")).as("sim"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("sim") >= 0.3, 1)).as("n_close"),
          round(max(col("sim")), 6).as("max_cos"))
        .orderBy("label")
    },

    // IVF ANN with a PERSISTED index: centroids per centroidStride
    // (k = n/100 small, capped at MaxCentroids — the k-vs-recall
    // contract documented at the top of this object);
    // every vector is assigned to its nearest centroid ONCE and the
    // index (vector + norm + assignment) is written hive-partitioned BY
    // CENTROID; probes then read ONLY the buckets their query centroids
    // name — a partition-pruned scan (the q75 discipline applied to ANN
    // serving). This is the 100 TB shape: the build is one bounded
    // crossJoin with the broadcast centroid table + one window on
    // vec_id (payload never rides the ×C expansion — assignment is
    // joined back), amortized across every query batch; each probe
    // touches corpus/C per centroid probed instead of the corpus. The
    // probe set's distinct centroid ids are metadata-scale and are
    // collected to the driver to become the pruning predicate — the
    // same routing handshake a production ANN service does to pick
    // shards (cf. q98 collecting its ~100 KB Bloom sketch).
    "q57_ann_ivf" -> { (s, dir) => ivfProbe(s, ivfIndex(s, dir)) },

    // The q57 probe against the GROWN index (epoch A build + epoch B
    // dynamic-partition append, frozen centroids). Oracle is q57's twin
    // verbatim: with frozen centroids, incremental assignment must
    // reproduce the one-shot build bit-for-bit.
    "q134_ann_grow_reprobe" -> { (s, dir) =>
      ivfProbe(s, ivfIndexGrown(s, dir))
    },

    // ANN quality evaluation — recall@3 of the IVF probe against exact
    // brute-force ground truth on the SAME bounded query set (the q45
    // rule: |Q| ≤ 100 absolutely, so the exact side stays O(n), not
    // quadratic-by-stealth). A pipeline must measure this before
    // trusting an index: IVF probes only the query's own bucket, so a
    // true neighbor assigned to a different centroid is invisible —
    // recall quantifies exactly that loss. Both sides read the SAME
    // persisted index frame (build once, shared with q57), queries
    // broadcast onto both the pruned-bucket probe and the linear exact
    // scan, and zero-hit queries still report (left join from Q).
    "q122_ann_recall" -> { (s, dir) => annRecall(s, dir) },

    // SPHERICAL K-MEANS REFINEMENT — one Lloyd update over the
    // persisted IVF index: per centroid, the member count, the mean
    // cosine of members to their centroid (cohesion — the quality the
    // index build traded for speed), and how far the centroid would
    // MOVE if re-estimated as its members' mean (drift = 1 − cos(old,
    // mean)). The stride-sampled q57 centroids are seeds, not optima;
    // this is the measurement-plus-update step a production re-cluster
    // loop runs until drift settles. Scale (100 TB): assignment is
    // REUSED from the persisted index (probe-only — the build is
    // priced as q57_index_build); the update pass is one linear scan
    // shuffling (cid, dim) partial sums — map-side combined to k·64
    // rows per partition — plus bounded k-row joins. Determinism:
    // member components quantize to int64 at 2^20 (exact — a float
    // mantissa times a power of two), so per-dim sums are exact
    // integers (width: 2^53/2^20 ≈ 8e9 unit-scale members per
    // cluster); cohesion sums quantized micro-cosines (floor(sim·1e6
    // + 1e-6), zero-norm rows pinned to 0 via coalesce); the three
    // 64-dim drift folds run in explicit pos order from a 0.0 seed
    // (sorted-fold discipline), so old-vs-mean cosine is the identical
    // double on both engines.
    "q199_kmeans_refine" -> { (s, dir) =>
      kmeansRefine(s.read.parquet(ivfIndex(s, dir))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("cid").cast("long").as("cid")))
    },

    // DRIFT-TRIGGERED RECLUSTER — the closed maintenance loop the
    // pieces existed for (VERDICT r15 item 2): grow the corpus through
    // q134's frozen-centroid append lifecycle, measure q199's drift
    // metric over the GROWN index, and when the corpus-weighted mean
    // drift exceeds [[DriftTriggerMicro]] recluster via q206's Lloyd
    // machinery. Output: a round-0 decision row (initial cluster
    // stats + the metric) plus, iff triggered, one convergence row per
    // Lloyd round. The GATE is the equivalence proof: the engine runs
    // the loop on the APPEND-GROWN index while the oracle recomputes
    // assignment FROM SCRATCH (IvfAssignCtes) — equality means the
    // drift measurement AND the triggered rebuild are identical
    // whichever lifecycle produced the index (the q113/q136 discipline
    // applied to the whole maintenance loop, not just the index).
    // Determinism: the metric is integer end-to-end —
    // sum(n_assigned · round(drift·1e6)) div sum(n_assigned) — from
    // q199's 6dp-rounded drift (already gate-proven identical), so
    // the trigger compares the same BIGINT on both engines (both
    // divisions truncate; all terms non-negative). The one collect is
    // the 1-row metric scalar (the q98/q200 metadata-scale class):
    // the recluster-or-not decision is a DRIVER decision, exactly as
    // in production. Scale: grow is q134's dynamic-partition append,
    // measure is two linear passes, recluster is q206's
    // broadcast-centroid rounds — no new shuffle shape anywhere.
    "q212_drift_recluster" -> { (s, dir) =>
      val idx = s.read.parquet(ivfIndexGrown(s, dir))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("cid").cast("long").as("cid"))
      val micro = kmeansRefine(idx)
        .select((col("n_assigned")
          * round(col("drift") * 1e6, 0).cast("long")).as("nd"),
          col("n_assigned"))
        .agg(expr("sum(nd) div sum(n_assigned)").as("micro"))
        .head().getLong(0)
      val st0 = idx.agg(countDistinct("cid").cast("long").as("n_clusters"))
        .crossJoin(broadcast(idx.groupBy("cid")
          .agg(count(lit(1)).as("c"))
          .agg(max("c").cast("long").as("max_cluster"))))
        .select(lit(0L).as("round"), lit(0L).as("n_moved"),
          col("n_clusters"), col("max_cluster"),
          lit(micro).as("drift_micro"))
      if (micro <= DriftTriggerMicro) st0
      else {
        var cur = idx.select(col("vec_id"),
            transform(col("embedding"),
              v => floor(v.cast("double") * lit(1048576.0)).cast("long"))
              .as("vq"),
            col("cid"), col("cid").as("pcid"))
          .localCheckpoint()
        val rounds = (1 to KmeansRounds).map { r =>
          cur = kmeansReassign(cur).localCheckpoint()
          cur.agg(
              count(when(col("cid") =!= col("pcid"), 1)).cast("long")
                .as("n_moved"),
              countDistinct(col("cid")).cast("long").as("n_clusters"))
            .crossJoin(broadcast(cur.groupBy("cid")
              .agg(count(lit(1)).as("c"))
              .agg(max("c").cast("long").as("max_cluster"))))
            .select(lit(r.toLong).as("round"), col("n_moved"),
              col("n_clusters"), col("max_cluster"),
              lit(micro).as("drift_micro"))
        }
        (st0 +: rounds).reduce(_ unionByName _).orderBy("round")
      }
    },

    // MULTI-ROUND SPHERICAL K-MEANS — the iterated re-cluster q199's
    // drift metric exists to trigger: [[KmeansRounds]] full Lloyd
    // rounds over the frozen-seed IVF assignment, each round
    // re-estimating every centroid as its members' mean and reassigning
    // every vector to its nearest NEW centroid (by cosine — for
    // centroid ranking, cos(v,c) ∝ dot(v,c)/|c|, the per-vector norm
    // cancels inside the argmax). Output: per-round convergence stats
    // (vectors moved, surviving clusters, largest cluster) — the
    // numbers a production re-cluster loop watches to decide when to
    // stop. Scale (100 TB): the q87/q101 fixed-iteration discipline —
    // each round's assignment frame is localCheckpoint'ed so lineage
    // stays one round deep; the update pass shuffles only (cid, pos)
    // int64 partial sums (map-side combined to k·64 rows/partition);
    // the reassignment is one linear pass against the BROADCAST k-row
    // centroid table (k ≤ MaxCentroids by the stride contract — never
    // estimator-dependent); no corpus-sized shuffle join anywhere.
    // Determinism: components quantize ONCE to int64 at 2^20, so
    // centroid sums are exact integers and the argmax score is
    // dot_int64 (exact, via the codegen seq_dot_long kernel) cast to
    // double over sqrt(Σsq²) folded in fixed pos order from a 0.0
    // seed — every score is the identical double on both engines, and
    // ties break to the smaller centroid id. Width (q171's rule):
    // |dot| ≤ 64·(2^20)²·n_c, exact while the largest cluster holds
    // n_c ≤ 2^17−1 vectors at |component| ≤ 1 (STRICT: at n_c = 2^17
    // the bound is exactly 2^63, one past Long.MaxValue — ADVICE r15;
    // fixtures: ≤ 0.58, 20k vectors at sf1 — 20× inside). The bound
    // is loud on BOTH engines: DuckDB's checked BIGINT multiply, and
    // an engine-side assert_true on cluster size inside
    // [[kmeansReassign]] (Spark's non-ANSI long arithmetic would
    // otherwise wrap silently). Empty
    // clusters drop out naturally (no member rows → no centroid row) —
    // standard Lloyd.
    "q206_kmeans_iterate" -> { (s, dir) =>
      val idx = s.read.parquet(ivfIndex(s, dir))
        .select(col("vec_id"),
          transform(col("embedding"),
            v => floor(v.cast("double") * lit(1048576.0)).cast("long"))
            .as("vq"),
          col("cid").cast("long").as("cid"))
      var cur = idx.select(col("vec_id"), col("vq"), col("cid"),
        col("cid").as("pcid")).localCheckpoint()
      val rounds = (1 to KmeansRounds).map { r =>
        cur = kmeansReassign(cur).localCheckpoint()
        cur.agg(
            count(when(col("cid") =!= col("pcid"), 1)).cast("long")
              .as("n_moved"),
            countDistinct(col("cid")).cast("long").as("n_clusters"))
          .crossJoin(broadcast(cur.groupBy("cid")
            .agg(count(lit(1)).as("c"))
            .agg(max("c").cast("long").as("max_cluster"))))
          .select(lit(r.toLong).as("round"), col("n_moved"),
            col("n_clusters"), col("max_cluster"))
      }
      rounds.reduce(_ unionByName _).orderBy("round")
    },

    // Semantic dedup over the clustered corpus (the SemDeDup recipe —
    // Abbas et al. 2023, arXiv:2303.09540: cluster embeddings, dedup
    // WITHIN clusters): reuses q57's persisted IVF index for the
    // cluster assignment (build-once discipline — Bench prices this key
    // probe-only) and drops, per cluster, every vector with a
    // lower-id semantic duplicate at exact cosine >= 0.4. The paper's
    // within-cluster step is all-pairs (fine while clusters stay
    // ~stride-sized; unbounded once MaxCentroids caps k and clusters
    // grow with the corpus), so candidates here take a SECOND, sharper
    // filter: same cluster AND same sign-LSH band (the q73 coding,
    // carried through codedBands with cid riding each band row — no
    // join-back). The (cid, band)-bucketed self-join is
    // hash-partitionable and strictly smaller than either filter
    // alone; the pair graph's "keep lowest id" rule makes the survivor
    // set deterministic without iterating components (q87 covers the
    // transitive version). Output: each dropped vector with its
    // cluster and its lowest-id in-cluster duplicate.
    "q143_semdedup" -> { (s, dir) =>
      import graft.operators.CorpusQueries.codedBands
      val idx = s.read.parquet(ivfIndex(s, dir))
        .select(col("vec_id"), col("embedding"),
          col("cid").cast("long").as("cid"))
      // both sides of the band self-join consume the coded frame and
      // alias-renamed self-join sides defeat ReuseExchange — cache (the
      // q73 discipline)
      val bands = codedBands(idx,
        graft.operators.CorpusQueries.embBandBits(s, dir),
        carry = Seq("cid")).cache()
      val ba = bands.toDF("id_a", "e_a", "n_a", "bk_a", "cid_a")
      val bb = bands.toDF("id_b", "e_b", "n_b", "bk_b", "cid_b")
      ba.join(bb,
          col("bk_a") === col("bk_b") && col("cid_a") === col("cid_b") &&
          col("id_a") < col("id_b"))
        .withColumn("sim", graft.functions.VectorOps.cosinePre(
          seqDot(col("e_a"), col("e_b")), col("n_a"), col("n_b")))
        .filter(col("sim") >= 0.4)
        .groupBy(col("cid_a").as("cid"), col("id_b").as("vec_id"))
        .agg(min(col("id_a")).as("dup_of"))
        .orderBy("vec_id")
    },

    // Streaming ANN query SERVING — the remaining lifecycle member of
    // the IVF family (q57 build+probe, q134 grow, q122 recall; this is
    // the always-on query path): query VECTORS arrive as file-source
    // micro-batches, each batch assigns its queries to the frozen
    // capped centroid set (broadcast, same arithmetic as the build —
    // per-row work, no stream-side shuffle before the probe), names
    // its centroids (the bounded routing handshake), reads ONLY those
    // partitions of the persisted index, ranks top-3 per query inside
    // the micro-batch via foreachBatch (per-query results are
    // index-side only, so per-batch top-3 IS global top-3), and
    // appends to a parquet sink. Oracle is q57's twin VERBATIM:
    // streamed serving must reproduce the one-shot probe bit-for-bit.
    "q138_stream_ann_serve" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      val idxPath = ivfIndex(s, dir)
      val idx = s.read.parquet(idxPath)
      // reconstruct the frozen centroid set from the index by the same
      // capped-stride rule the build used (one metadata-scale count)
      val stride = centroidStride(idx.count())
      val cent = idx.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("ccid"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      val base = freshBase(s, dir, "q138")
      val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      // the bounded q57 query set arrives as TWO micro-batches of RAW
      // vectors (a real serving path doesn't know its centroids yet)
      val qset = tWide(s, dir, "embeddings")
        .filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
        .select("vec_id", "embedding")
      val src = stageBatches(s, base, Seq(
        qset.filter(col("vec_id") % 100 === 0),
        qset.filter(col("vec_id") % 100 =!= 0)))
      graft.Tables.withShufflePartitions(s, 8) {
        val stream = s.readStream
          .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
        val q = stream.writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch0: DataFrame, bid: Long) =>
            val batch = batch0.persist()
            // content-derived batch key (the q174 discipline; the two
            // staged batches split on vec_id % 100 ∈ {0, 50}) → the
            // idempotent overwrite-own-subdirectory sink, so a
            // replayed batch can't double-append its top-3 rows
            val key =
              if (batch.isEmpty) -1L
              else batch.agg(min(pmod(col("vec_id"), lit(100L))))
                .head().getLong(0)
            val wAsgn = Window.partitionBy("qid")
              .orderBy(desc("csim"), col("ccid"))
            val wTop = Window.partitionBy("qid")
              .orderBy(desc("sim_raw"), col("nid"))
            val qb = batch
              .withColumn("qn",
                graft.functions.VectorOps.l2Norm(col("embedding")))
              .select(col("vec_id").as("qid"), col("embedding").as("qe"),
                col("qn"))
            val asg = qb.crossJoin(broadcast(cent))
              .select(col("qid"), col("qe"), col("qn"), col("ccid"),
                graft.functions.VectorOps.cosinePre(
                  seqDot(col("qe"), col("ce")), col("qn"), col("cn"))
                  .as("csim"))
              .withColumn("rn", row_number().over(wAsgn))
              .filter(col("rn") === 1)
              .select(col("qid"), col("qe"), col("qn"),
                col("ccid").as("qcid"))
            // routing handshake: the batch's distinct centroid ids, in
            // the PARTITION COLUMN's own inferred type so the isin
            // prunes directories rather than casting the attribute
            val cidT = idx.schema("cid").dataType
            val qcids = asg.select(col("qcid").cast(cidT)).distinct()
              .collect().map(_.get(0))
            val members = idx
              .filter(col("cid").isin(qcids.toIndexedSeq: _*))
              .select(col("vec_id").as("nid"), col("embedding").as("ne"),
                col("nrm").as("nn"), col("cid").cast("long").as("ncid"))
            val top3 = broadcast(asg)
              .join(members, col("qcid") === col("ncid") &&
                col("nid") =!= col("qid"))
              .select(col("qid"), col("nid"),
                graft.functions.VectorOps.cosinePre(
                  seqDot(col("qe"), col("ne")), col("qn"), col("nn"))
                  .as("sim_raw"))
              .withColumn("rnk", row_number().over(wTop).cast("long"))
              .filter(col("rnk") <= 3)
              .select(col("qid"), col("rnk"), col("nid"),
                round(col("sim_raw"), 6).as("sim"))
            if (key >= 0)
              graft.sources.Staging.storeBatch(top3, outDir, key, bid)
            batch.unpersist()
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      graft.sources.Staging.readBatchSink(s, outDir,
          "qid BIGINT, rnk BIGINT, nid BIGINT, sim DOUBLE")
        .orderBy("qid", "rnk")
    },

    // Quantization-quality evaluation — recall@5 of the int8 retrieval
    // path (q90's integer-dot ranking) against the EXACT float-dot
    // top-5 on the same absolutely-bounded query set: the
    // measure-before-trust discipline (q122 for IVF, q123/q132 for
    // MinHash) applied to the quantized path. Both sides rank by the
    // same metric family (raw dot product) so the number isolates PURE
    // int8 rounding loss — a cosine-vs-dot comparison would conflate
    // quantization with normalization. Both scans are one linear pass
    // with the bounded query side broadcast; ties break identically
    // (metric DESC, nid) on both engines and in the twin.
    "q137_quant_recall" -> { (s, dir) =>
      quantRecall(tWide(s, dir, "embeddings").select("vec_id", "embedding"))
    },

    // MATRYOSHKA-TRUNCATION recall — q137's measure-before-trust
    // discipline applied to DIMENSION reduction instead of integer
    // quantization: recall@5 of cosine retrieval over the first
    // [[MrlDims]] embedding dims against the exact full-width cosine
    // top-5, per query. MRL-style truncation is the other standard
    // storage/latency trade (16 of 64 dims = 4× less vector I/O, same
    // arithmetic), and like quantization it must be MEASURED per corpus
    // before a pipeline trusts it. Both sims compute in ONE bounded
    // pair pass (the truncated rep is a slice of the same row — no
    // second scan); ranks break ties identically (metric DESC, nid);
    // bounded-|Q| contract as q45/q137. A truncated-zero vector yields
    // NULL sim → ranked last on both engines (the q45 convention).
    "q203_mrl_recall" -> { (s, dir) =>
      mrlRecall(tWide(s, dir, "embeddings").select("vec_id", "embedding"))
    },
  )

  /** q203 core over any (vec_id, embedding) frame: recall@5 of
    * truncated-dim cosine against full-width cosine on the bounded
    * query set. Factored so the spec can feed vectors whose
    * information lives entirely in the first [[MrlDims]] dims (the
    * recall-1 law). */
  def mrlRecall(embIn: DataFrame): DataFrame = {
    val emb = embIn
      .select(col("vec_id"), col("embedding").as("fv"),
        slice(col("embedding"), 1, MrlDims).as("tv"))
      .withColumn("fn", graft.functions.VectorOps.l2Norm(col("fv")))
      .withColumn("tn", graft.functions.VectorOps.l2Norm(col("tv")))
    val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("fv").as("qfv"),
        col("tv").as("qtv"), col("fn").as("qfn"), col("tn").as("qtn"))
    val p = broadcast(q).crossJoin(emb)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.VectorOps.cosinePre(
          seqDot(col("qfv"), col("fv")), col("qfn"), col("fn")).as("mf"),
        graft.functions.VectorOps.cosinePre(
          seqDot(col("qtv"), col("tv")), col("qtn"), col("tn")).as("mt"))
    val wF = Window.partitionBy("qid").orderBy(desc("mf"), col("nid"))
    val wT = Window.partitionBy("qid").orderBy(desc("mt"), col("nid"))
    val full = p.withColumn("r", row_number().over(wF))
      .filter(col("r") <= 5).select("qid", "nid")
    val trunc = p.withColumn("r", row_number().over(wT))
      .filter(col("r") <= 5).select("qid", "nid")
    // trunc ≤ |Q|·5 rows, hits ≤ |Q| rows — bounded by contract,
    // invisible to the estimator: broadcast explicitly (see quantRecall)
    val hits = full.join(broadcast(trunc), Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    q.select("qid").join(broadcast(hits), Seq("qid"), "left_outer")
      .na.fill(0L, Seq("n_hit"))
      .select(col("qid"), col("n_hit").cast("long").as("n_hit"),
        round(col("n_hit") / lit(5.0), 6).as("recall"))
      .orderBy("qid")
  }

  /** q137 core over any (vec_id, embedding) frame: recall@5 of the
    * int8-dot ranking (q90's chain) against exact float-dot top-5 on
    * the absolutely-bounded query set. Factored so the spec can feed
    * synthetic well-separated vectors (the recall-1 law). */
  def quantRecall(emb: DataFrame): DataFrame = {
    import graft.plans.GraftExpressions.seq_dot_long
    val coded = emb.select(col("vec_id"),
      graft.functions.VectorOps.int8Codes(col("embedding"), 0.5)
        .as("codes"))
    val wTop = Window.partitionBy("qid").orderBy(desc("m"), col("nid"))
    // quantized side: q90's ranking verbatim
    val qq = coded.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("codes").as("qc"))
    val quant = broadcast(qq)
      .crossJoin(coded.select(col("vec_id").as("nid"), col("codes").as("vc")))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        seq_dot_long(col("qc"), col("vc")).cast("double").as("m"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 5).select("qid", "nid")
    // exact side: float-dot (same metric family, unquantized)
    val qe = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = broadcast(qe)
      .crossJoin(emb.select(col("vec_id").as("nid"), col("embedding").as("nv")))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.operators.LlmQueries.seqDot(col("qv"), col("nv")).as("m"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 5).select("qid", "nid")
    // both attach frames are ABSOLUTELY bounded (quant ≤ |Q|·5 rows,
    // hits ≤ |Q| rows) but surface from windows/aggs whose stats the
    // estimator sizes from the corpus scans beneath — broadcast
    // explicitly (the q45/q201 discipline; statically these planned as
    // SortMergeJoins, 2 Exchanges + 2 Sorts each, r21)
    val hits = exact.join(broadcast(quant), Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    qe.select("qid").join(broadcast(hits), Seq("qid"), "left_outer")
      .na.fill(0L, Seq("n_hit"))
      .select(col("qid"), col("n_hit").cast("long").as("n_hit"),
        round(col("n_hit") / lit(5.0), 6).as("recall"))
      .orderBy("qid")
  }

  /** q122 core: per-query IVF hit count vs the exact top-3 and the
    * recall ratio, ordered by qid. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val idx = s.read.parquet(ivfIndex(s, dir))
    val q = idx.filter(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cid").as("qcid"))
    val wTop = Window.partitionBy("qid").orderBy(desc("sim_raw"), col("nid"))
    // approximate: the q57 probe — pruned read of the queries' buckets
    val qcids = q.select("qcid").distinct().collect().map(_.get(0))
    val members = idx.filter(col("cid").isin(qcids.toIndexedSeq: _*))
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("nrm").as("nn"), col("cid").as("ncid"))
    val approx = broadcast(q)
      .join(members, col("qcid") === col("ncid") && col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.functions.VectorOps.cosinePre(
          seqDot(col("qe"), col("ne")), col("qn"), col("nn")).as("sim_raw"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 3).select("qid", "nid")
    // exact: one linear scan of the index frame per the bounded Q
    val v = idx.select(col("vec_id").as("nid"), col("embedding").as("ve"),
      col("nrm").as("vn"))
    val exact = broadcast(q.select("qid", "qe", "qn"))
      .join(v, col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.functions.VectorOps.cosinePre(
          seqDot(col("qe"), col("ve")), col("qn"), col("vn")).as("sim_raw"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 3).select("qid", "nid")
    // approx ≤ |Q|·3 rows, hits ≤ |Q| rows — bounded by contract,
    // invisible to the estimator: broadcast explicitly (see quantRecall)
    val hits = exact.join(broadcast(approx), Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    q.select("qid").join(broadcast(hits), Seq("qid"), "left_outer")
      .na.fill(0L, Seq("n_hit"))
      .select(col("qid"), col("n_hit").cast("long").as("n_hit"),
        round(col("n_hit") / lit(3.0), 6).as("recall"))
      .orderBy("qid")
  }

  /** q164 core: exact ordered-pair 3-gram containment ≥ 0.8 over a
    * (doc_id, text) frame — prefix-filtered candidates, early-exit
    * kernel verify; rationale and filter proofs at the q164 key. */
  /** The expensive HALF of the containment pipeline: sorted 62-bit
    * shingle arrays per doc (`arrs`) and the per-doc rarity-ranked
    * exploded shingle frame (`ranked` = (doc_id, h, rn, n), rn ranking
    * by global (df, h)). The r12 cost probe measured this build at
    * 4.2 s of q164's 4.3 s warm at sf0.1 — and it is a pure function
    * of the corpus, exactly the persist-and-price shape every sibling
    * family (q44/q57/q69/q106/q134/q190) already moved to. */
  private def containmentArrs(docs: DataFrame): DataFrame = {
    val h62 = (c: Column) =>
      poly_hash(c, 131) * 2147483648L + poly_hash(c, 137)
    // hash as a ROW expression over the exploded shingles, not inside
    // transform(): higher-order-function lambdas evaluate outside
    // whole-stage codegen, so the custom poly_hash ran INTERPRETED per
    // element — measured 36.1 -> 3.9 s for this frame at sf1, arrays
    // byte-identical (collect_list order is nondeterministic but
    // array_sort normalizes it, duplicates preserved; zero-shingle
    // docs vanish at explode exactly where the size filter dropped
    // them). The 2.6M-row doc_id regroup is noise against the 9x.
    docs.select(col("doc_id"),
      explode(LlmQueries.shingles(col("text"), 3)).as("sg"))
      .select(col("doc_id"), h62(col("sg")).as("h"))
      .groupBy("doc_id").agg(array_sort(collect_list("h")).as("arr"))
      .filter(size(col("arr")) > 0)
  }

  private def containmentRanked(arrs: DataFrame): DataFrame = {
    val sh = arrs.select(col("doc_id"),
      size(col("arr")).cast("long").as("n"), explode(col("arr")).as("h"))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy("df", "h")
    sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(wDoc).cast("long"))
      .select("doc_id", "h", "rn", "n")
  }

  /** q55 core over any documents frame: exact 3-gram Jaccard >= 0.5
    * via PPJoin prefix filtering — factored so q55 (full corpus) and
    * q208/q210 (the sf1-replayable doc_id slices) share one pipeline.
    *
    * Cache lifecycle (ADVICE r15): the two `.cache()`s below (and
    * [[containmentPairs]]'s pair) live until the session's next
    * `catalog.clearCache()` — which BOTH harnesses issue between keys
    * (Verify.scala:41, Bench.scala:48), so per-gate-run pressure is
    * one invocation's worth, not cumulative across the slice keys.
    * Callers embedding this in a longer-lived session own the
    * equivalent cleanup; unpersisting inside the function is not an
    * option because the returned frame is lazy — both caches are
    * consumed by whatever action the CALLER runs. */
  /** Docs-count cutover for q55's verify-join shape (see the ladder
    * note at the verify joins): below it the planner's SMJ is measured
    * faster in-session; above it the explicit broadcast is what
    * survives the n² candidate stream. Between the measured 50k/250k
    * points. */
  private[graft] val BroadcastVerifyDocs = 100000L

  def ngramJaccardPairs(docs: DataFrame,
      broadcastVerifyOver: Long = BroadcastVerifyDocs): DataFrame = {
    val h62 = (c: Column) =>
      poly_hash(c, 131) * 2147483648L + poly_hash(c, 137)
    // same shingle definition as q44 (incl. its short-doc guard);
    // arrays SORTED once here so pair verification can run the codegen
    // two-pointer merge (SortedIntersectCount) instead of building a
    // hash set per pair — element order affects nothing else (explode
    // and the df-ordered window see the same set)
    val arrs = docs.select(col("doc_id"),
      array_sort(transform(LlmQueries.shingles(col("text"), 3),
        sg => h62(sg))).as("arr")).cache()
    // n from size(arr) — one window pass, not two
    val sh = arrs.select(col("doc_id"),
      size(col("arr")).cast("long").as("n"), explode(col("arr")).as("h"))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy("df", "h")
    // cached like arrs: BOTH sides of the self-join consume this frame,
    // and alias-renamed self-join sides defeat ReuseExchange (different
    // exprIds → different exchange subtrees), so uncached the whole
    // explode + df-agg + window pipeline runs TWICE — measured 2× the
    // plan's Window/Generate nodes and ~1.4 s of duplicated work at
    // sf0.1. The frame is prefix tokens only (4 scalar cols, ~3% of
    // the corpus token stream) — cache cost is trivial next to the
    // recompute.
    val prefix = sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(wDoc).cast("long"))
      .filter(col("rn") <= floor(col("n") * 0.5) + 1)
      .select("doc_id", "h", "rn", "n")
      .cache()
    // Candidate generation with PPJoin's full filter set (measured 409k
    // candidates for 256 results without them):
    //  - length filter: J ≥ t bounds the size ratio to [t, 1/t]
    //  - positional filter: a match at rarity positions (rn_a, rn_b)
    //    bounds the overlap by 1 + min(n_a-rn_a, n_b-rn_b); a true pair's
    //    FIRST common token always passes, so keep-if-any is exact
    //  - alpha = ceil(t/(1+t)·(n_a+n_b)) is the J ≥ t overlap threshold
    val pa = prefix.toDF("doc_a", "h", "rn_a", "n_a")
    val pb = prefix.toDF("doc_b", "h2", "rn_b", "n_b")
    val cand = pa.join(pb,
        col("h") === col("h2") && col("doc_a") < col("doc_b") &&
        col("n_b") * 2 >= col("n_a") && col("n_b") <= col("n_a") * 2)
      .filter(lit(1L) +
        least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
        ceil((col("n_a") + col("n_b")) / lit(3.0)))
      .select("doc_a", "doc_b")
    // NO pre-verify distinct: with the filters above, duplicate candidate
    // occurrences are ~5% (measured 131k occurrences vs 125k pairs at
    // sf0.1), so deduping costs a full shuffle to save 5% of the verify
    // work. Verify every occurrence, dedup the tiny post-threshold set.
    // verify with the thresholded kernel: J >= 0.5 ⇔ 3·inter >= n_a+n_b
    // ⇔ inter >= ceil((n_a+n_b)/3) = alpha, so the kernel bails out of
    // a failing pair's merge at the provable miss point and returns -1
    // (~131k candidate verifies for 256 survivors — nearly every merge
    // ends early). Survivors carry their exact count; the -1 filter IS
    // the threshold filter.
    // VERIFY-JOIN SHAPE LADDER (r17, both branches measured): the
    // planner's choice flips at the autobroadcast threshold, and
    // NEITHER branch is right on both sides of the candidate curve —
    //  - ≤ [[BroadcastVerifyDocs]] docs: leave the joins to the
    //    planner (SMJ at sf1). The candidate sort is 18.6M×16 B ≈
    //    300 MB — in-memory — and measured CHEAPER in a long-lived
    //    session than collecting + hashing the doc-array frame twice
    //    per run (full sf1 bench, same conf, only the branch flipped:
    //    SMJ 5.2 s vs forced broadcast 15.9 s — the broadcast build's
    //    driver collect and GC churn compound across a 228-key
    //    session; isolated KeyBench can't see this cost, which is how
    //    the unconditional form shipped).
    //  - past it: broadcast EXPLICITLY. The t=0.5 candidate stream is
    //    n² (measured 499M at 250k docs, 2.0G at 500k), so the SMJ
    //    sort goes disk-quadratic — the 10×-docs probe measured a
    //    >70 GB spill ABORT on a 73 GB-free box; the broadcast keeps
    //    verification map-side at any candidate volume (500k docs
    //    completes at 71.5 s warm). The broadcast's own memory bound
    //    and the past-it fallback (arrs bucketed by doc_id) are
    //    q164's, documented there.
    // The cutover sits between the measured points (50k SMJ-faster,
    // 250k broadcast-required); `broadcastVerifyOver` is injectable so
    // PlanSpec pins BOTH branches. NOTE the branch pick runs an EAGER
    // docs.count() Spark job at DataFrame-construction time (plan-only
    // contexts — explain dumps, plan tests — trigger it too), and for
    // the q208/q210 slice callers the input is a filtered,
    // repartitioned frame, so the job is a scan+filter+shuffle, not a
    // footer read. Priced acceptable at every measured point; if it
    // ever shows in bench timings, count before tWide's repartition or
    // cache the count per (sf, dir).
    val aA = arrs.toDF("doc_a", "arr_a")
    val aB = arrs.toDF("doc_b", "arr_b")
    val big = docs.count() > broadcastVerifyOver
    cand
      .join(if (big) broadcast(aA) else aA, "doc_a")
      .join(if (big) broadcast(aB) else aB, "doc_b")
      .withColumn("inter",
        graft.plans.GraftExpressions.sorted_intersect_min(
          col("arr_a"), col("arr_b"),
          ceil((size(col("arr_a")) + size(col("arr_b")))
            / lit(3.0)).cast("long")))
      .filter(col("inter") >= 0L)
      .withColumn("uni",
        (size(col("arr_a")) + size(col("arr_b"))).cast("long") - col("inter"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  private def containmentBuild(docs: DataFrame): (DataFrame, DataFrame) = {
    val arrs = containmentArrs(docs)
    (arrs, containmentRanked(arrs))
  }

  /** Build — or REUSE — q164's persisted containment index: the
    * (arrs, ranked) pair of [[containmentBuild]] — `arrs` staged as
    * parquet, `ranked` as a catalog table BUCKETED (and sorted) on the
    * shingle hash `h`, the q106/q190 serving discipline. Bucketing is
    * what makes the probe sub-linear-feeling at scale: the candidate
    * join reads BOTH of its sides (A-prefix and full) from the same
    * bucketed layout, so the h-equi-join runs bucket-aligned with ZERO
    * exchange — the first sf1 cut of this index stored plain parquet
    * and the probe re-shuffled the 14M-row ranked frame twice per run
    * (measured 17.6 s of mostly exchange+sort at sf1). Publish order:
    * arrs first, the bucketed table last — its catalog entry is the
    * marker, so a half-landed build rebuilds both. Bench prices the
    * build as q164_index_build; the gated key reads the persisted
    * frames probe-only. At 100 TB this is the index a decontamination
    * service maintains per corpus SNAPSHOT. Unlike the LSH/band
    * indexes (per-row codes ⇒ append ≡ rebuild), this one is NOT
    * incrementally appendable: prefix positions rank by GLOBAL df, so
    * any ingest shifts every doc's rank frame — the honest lifecycle
    * is rebuild-per-snapshot, amortized across every eval-set probe
    * batch against that snapshot. */
  def containmentIndex(s: SparkSession, dir: String,
      rebuild: Boolean = false): (String, String) = {
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, "graft_containment_")
    graft.sources.Staging.vacuumStale(s,
      s.conf.get("spark.sql.warehouse.dir"), "graft_containment_rk_")
    val sfx = graft.sources.Staging.sessionSuffix(s, dir)
    val arrsPath = s"$tmp/graft_containment_$sfx/arrs"
    val tab = s"graft_containment_rk_$sfx"
    if (rebuild || !s.catalog.tableExists(tab)) {
      graft.sources.Staging.store(
        containmentArrs(graft.Tables.tWide(s, dir, "documents")), arrsPath)
      // rank from the arrs JUST WRITTEN: deriving ranked from the raw
      // documents would run the whole shingle/hash pipeline a second
      // time — reading the columnar arrs back costs one cheap scan
      graft.sources.Staging.storeBucketed(
        containmentRanked(s.read.parquet(arrsPath))
          .repartition(32, col("h")), tab, Seq("h"), 32)
    }
    (arrsPath, tab)
  }

  /** q164 probe-only: candidate generation + verify against the
    * persisted index — byte-identical output to the one-shot
    * [[containmentPairs]] (same frames, same plan from the filter on).
    * Both candidate sides scan the SAME bucketed table (exchange-free
    * h-join, PlanSpec-pinned); the two arrs verify joins exchange only
    * the candidate side. No `.cache()`: bucket-aligned scans of a
    * persisted table beat a materialization barrier, and on a cluster
    * they are partition-parallel reads, not a recompute. */
  def containmentProbe(s: SparkSession, dir: String): DataFrame = {
    val (arrsPath, tab) = containmentIndex(s, dir)
    val arrs = s.read.parquet(arrsPath)
    val ranked = s.table(tab)
    containmentVerify(arrs, ranked)
  }

  def containmentPairs(docs: DataFrame): DataFrame = {
    val (arrs0, ranked0) = containmentBuild(docs)
    // cached: BOTH join sides consume each frame (A prefix-filtered,
    // B full) and alias-renamed sides defeat ReuseExchange (the q55
    // finding) — the persisted path gets the same reuse from parquet
    containmentVerify(arrs0.cache(), ranked0.cache())
  }

  private def containmentVerify(arrs: DataFrame,
      ranked: DataFrame): DataFrame = {
    val pa = ranked
      .filter(col("rn") <= col("n") - ceil(col("n") * 0.8) + 1)
      .toDF("doc_a", "h", "rn_a", "n_a")
    val pb = ranked.toDF("doc_b", "h2", "rn_b", "n_b")
    val cand = pa.join(pb,
        col("h") === col("h2") && col("doc_a") =!= col("doc_b") &&
        col("n_b") >= ceil(col("n_a") * 0.8))
      .filter(lit(1L) +
        least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
        ceil(col("n_a") * 0.8))
      .select("doc_a", "doc_b")
    // verify via BROADCAST of the doc-array table: the r13 sf1 probe
    // measured 26.7M candidate occurrences whose cost was NOT the
    // intersect kernel (early-exit, sub-µs) but the two verify joins —
    // arrs at sf1 (~50k docs ≈ 30 MB of arrays) crosses the 10 MB
    // autobroadcast threshold, so Spark silently flipped to SMJ and
    // sorted 26.7M array-hauling rows (17 s; bucketing the candidate
    // side can't help — it's the arrs side that must not shuffle the
    // candidates). Explicit broadcast keeps verification map-side at
    // any candidate volume. Bound: one doc-array table must fit an
    // executor (~300 MB at 500k docs) — past that, the 100 TB fallback
    // is arrs bucketed by doc_id so only the candidate side exchanges
    // (the q106 shape), which this stays plan-compatible with.
    cand
      .join(broadcast(arrs.toDF("doc_a", "arr_a")), "doc_a")
      .join(broadcast(arrs.toDF("doc_b", "arr_b")), "doc_b")
      .withColumn("inter",
        graft.plans.GraftExpressions.sorted_intersect_min(
          col("arr_a"), col("arr_b"),
          ceil(size(col("arr_a")) * 0.8).cast("long")))
      .filter(col("inter") >= 0L)
      .select(col("doc_a").as("doc_sub"), col("doc_b").as("doc_sup"),
        col("inter"), size(col("arr_a")).cast("long").as("n_sub"),
        round(col("inter").cast("double") / size(col("arr_a")), 6)
          .as("containment"))
      .distinct()
      .orderBy("doc_sub", "doc_sup")
  }

  /** The portable SimHash CTE chain (tokens → char-poly word hashes →
    * tf-weighted bit votes → 60-bit fingerprint `sh(doc_id, simhash)`),
    * the exact SQL twin of [[simhash]] — shared by the q54 and q214
    * oracles so the two gates can never drift apart on the fingerprint
    * definition. */
  private val SimhashCtes: String =
    """wc AS (
      |  SELECT doc_id, tk, count(*)::BIGINT AS cnt FROM
      |    (SELECT doc_id, unnest(string_split(text,' ')) AS tk FROM documents) GROUP BY doc_id, tk),
      |wh AS (
      |  SELECT doc_id, cnt,
      |    list_reduce(list_prepend(0::BIGINT, list_transform(string_split(tk,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*131 + b) % 2147483647) AS h1,
      |    list_reduce(list_prepend(0::BIGINT, list_transform(string_split(tk,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*137 + b) % 2147483647) AS h2
      |  FROM wc),
      |bits AS (
      |  SELECT doc_id, b,
      |    sum(cnt * (2 * (CASE WHEN b < 30 THEN (h1 >> b) & 1 ELSE (h2 >> (b - 30)) & 1 END) - 1)) AS w
      |  FROM wh CROSS JOIN (SELECT unnest(range(60)) AS b) bb
      |  GROUP BY doc_id, b),
      |sh AS MATERIALIZED (
      |  SELECT doc_id, sum(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
      |  FROM bits GROUP BY doc_id)""".stripMargin

  def oracle: Map[String, String] = Map(
    // all-integer replay: same quantize formula as q83's oracle, exact
    // integer dot, same (dot DESC, nid) ranking
    "q90_sim_quantized" ->
      """WITH c AS MATERIALIZED (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> GREATEST(-127, LEAST(127,
        |      CAST(round(CAST(x AS DOUBLE) * 254.0) AS BIGINT)))) AS codes
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, codes AS qc FROM c WHERE vec_id % 50 = 0 AND vec_id < 5000),
        |p AS (
        |  SELECT qid, c.vec_id AS nid,
        |    list_reduce(list_transform(range(1, 65), i -> qc[i] * codes[i]),
        |      (a, b) -> a + b) AS dot
        |  FROM q JOIN c ON c.vec_id != qid),
        |r AS (SELECT qid, nid, dot,
        |  row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rnk
        |  FROM p)
        |SELECT qid, rnk, nid, CAST(dot AS BIGINT) AS dot
        |FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,

    "q54_simhash" ->
      s"""WITH $SimhashCtes,
        |chunks AS MATERIALIZED (
        |  SELECT doc_id, c, (simhash >> (c * 15)) & 32767 AS ck
        |  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS c) cc),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM chunks x JOIN chunks y ON x.c = y.c AND x.ck = y.ck AND x.doc_id < y.doc_id),
        |ham AS (
        |  SELECT doc_a, doc_b, bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |  FROM cand JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b)
        |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q214: the q54 fingerprint CTEs → exact-fp collapse → chunk-LSH +
    // hamming verify over DISTINCT fps → unrolled min-label (same
    // SurvivorIters step count as the engine, same MATERIALIZED
    // discipline as q87/q89) → expand groups back → one survivor
    // (min doc_id, computed over members) per cluster.
    "q214_simhash_survivors" ->
      s"""WITH $SimhashCtes,
        |grp AS MATERIALIZED (
        |  SELECT simhash, min(doc_id) AS rep, count(*)::BIGINT AS n_members
        |  FROM sh GROUP BY simhash),
        |chunks AS MATERIALIZED (
        |  SELECT rep, simhash, c, (simhash >> (c * 15)) & 32767 AS ck
        |  FROM grp CROSS JOIN (SELECT unnest(range(4)) AS c) cc),
        |fpp AS MATERIALIZED (
        |  SELECT DISTINCT x.rep AS rep_a, y.rep AS rep_b
        |  FROM chunks x JOIN chunks y ON x.c = y.c AND x.ck = y.ck AND x.rep < y.rep
        |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8),
        |edges AS MATERIALIZED (SELECT rep_a AS src, rep_b AS dst FROM fpp
        |  UNION ALL SELECT rep_b, rep_a FROM fpp),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges),
        |${GraphQueries.labelSteps(SurvivorIters)},
        |lab AS (
        |  SELECT m.doc_id, coalesce(l.lbl, m.rep) AS cluster_id,
        |    m.n_members, l.node AS lnode
        |  FROM (SELECT s.doc_id, g.rep, g.n_members
        |        FROM sh s JOIN grp g ON g.simhash = s.simhash) m
        |  LEFT JOIN l$SurvivorIters l ON l.node = m.rep)
        |SELECT cluster_id, count(*)::BIGINT AS n_docs,
        |  min(doc_id) AS survivor_doc, (count(*) - 1)::BIGINT AS n_dropped
        |FROM lab WHERE n_members >= 2 OR lnode IS NOT NULL
        |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "q55_ngram_jaccard" -> jaccardOracle("documents"),

    // q208/q209: the q55/q164 oracles verbatim over the fixed
    // arithmetic slice (contiguous 10-runs — see the q208 key note) —
    // a 100×-smaller pair space, which is what makes these the
    // sf1-REPLAYED members of the family (SURVEY §6b)
    "q208_jaccard_slice" ->
      jaccardOracle(SliceSrc),
    "q209_containment_slice" ->
      containmentOracle(SliceSrc),
    "q210_jaccard_slice_mid" ->
      jaccardOracle(SliceMidSrc),
    "q211_containment_slice_mid" ->
      containmentOracle(SliceMidSrc),

    "q164_containment" -> containmentOracle("documents"),

    "q56_dedup_embed" ->
      """WITH e AS MATERIALIZED (SELECT label, vec_id, embedding,
        |    sqrt(list_reduce(list_transform(range(1,65), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (x,y)->x+y)) AS nrm
        |  FROM embeddings),
        |p0 AS (
        |  SELECT a.label,
        |    list_reduce(list_transform(range(1,65), i -> CAST(a.embedding[i]*b.embedding[i] AS DOUBLE)), (x,y)->x+y) AS dot,
        |    a.nrm AS na, b.nrm AS nb
        |  FROM e a JOIN e b
        |    ON a.label = b.label AND a.vec_id < b.vec_id),
        |p AS (SELECT label,
        |  CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot/(na*nb) END AS sim FROM p0)
        |SELECT label, count(*) AS n_pairs,
        |  count(*) FILTER (sim >= 0.3) AS n_close,
        |  round(max(sim), 6) AS max_cos
        |FROM p GROUP BY label ORDER BY label""".stripMargin,

    // q137: quantized-dot top-5 (q90's chain) joined against exact
    // float-dot top-5 on the same bounded Q; recall = |∩| / 5. Float
    // products follow the D7 pattern (float32 product, double
    // accumulation) so the exact side replays seqDot bit-for-bit.
    "q137_quant_recall" ->
      """WITH c AS MATERIALIZED (
        |  SELECT vec_id, embedding, list_transform(embedding,
        |    x -> GREATEST(-127, LEAST(127,
        |      CAST(round(CAST(x AS DOUBLE) * 254.0) AS BIGINT)))) AS codes
        |  FROM embeddings),
        |q AS MATERIALIZED (SELECT vec_id AS qid, codes AS qc, embedding AS qv
        |  FROM c WHERE vec_id % 50 = 0 AND vec_id < 5000),
        |qp AS (
        |  SELECT qid, c.vec_id AS nid,
        |    list_reduce(list_transform(range(1, 65), i -> qc[i] * codes[i]),
        |      (a, b) -> a + b) AS m
        |  FROM q JOIN c ON c.vec_id != qid),
        |qr AS (SELECT qid, nid FROM (
        |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY m DESC, nid) AS rnk FROM qp)
        |  WHERE rnk <= 5),
        |ep AS (
        |  SELECT qid, c.vec_id AS nid,
        |    list_reduce(list_transform(range(1, 65), i -> CAST(qv[i]*c.embedding[i] AS DOUBLE)), (a,b) -> a+b) AS m
        |  FROM q JOIN c ON c.vec_id != qid),
        |er AS (SELECT qid, nid FROM (
        |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY m DESC, nid) AS rnk FROM ep)
        |  WHERE rnk <= 5),
        |hits AS (SELECT qid, count(*) AS n_hit FROM er JOIN qr USING (qid, nid) GROUP BY qid)
        |SELECT qs.qid, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
        |  round(COALESCE(n_hit, 0) / 5.0, 6) AS recall
        |FROM (SELECT DISTINCT qid FROM q) qs LEFT JOIN hits USING (qid)
        |ORDER BY qid""".stripMargin,

    "q57_ann_ivf" -> IvfProbeSql,

    // q203: both sims from one pair CTE — the truncated arm folds
    // range(1, MrlDims+1) of the SAME row, the full arm range(1,65);
    // q137's hit/recall tail verbatim
    "q203_mrl_recall" -> {
      val T = MrlDims + 1
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_transform(range(1,65), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (a,b)->a+b)) AS fn,
         |    sqrt(list_reduce(list_transform(range(1,$T), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (a,b)->a+b)) AS tn
         |  FROM embeddings),
         |q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv, fn AS qfn, tn AS qtn
         |  FROM e WHERE vec_id % 50 = 0 AND vec_id < 5000),
         |p AS MATERIALIZED (
         |  SELECT qid, e.vec_id AS nid,
         |    CASE WHEN qfn = 0 OR e.fn = 0 THEN NULL ELSE
         |      list_reduce(list_transform(range(1,65), i -> CAST(qv[i]*e.embedding[i] AS DOUBLE)), (a,b)->a+b) / (qfn * e.fn) END AS mf,
         |    CASE WHEN qtn = 0 OR e.tn = 0 THEN NULL ELSE
         |      list_reduce(list_transform(range(1,$T), i -> CAST(qv[i]*e.embedding[i] AS DOUBLE)), (a,b)->a+b) / (qtn * e.tn) END AS mt
         |  FROM q JOIN e ON e.vec_id != qid),
         |fr AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY mf DESC, nid) AS r FROM p) WHERE r <= 5),
         |tr AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY mt DESC, nid) AS r FROM p) WHERE r <= 5),
         |hits AS (SELECT qid, count(*) AS n_hit FROM fr JOIN tr USING (qid, nid) GROUP BY qid)
         |SELECT qs.qid, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
         |  round(COALESCE(n_hit, 0) / 5.0, 6) AS recall
         |FROM (SELECT DISTINCT qid FROM q) qs LEFT JOIN hits USING (qid)
         |ORDER BY qid""".stripMargin
    },

    // q199: the IVF assignment CTEs verbatim, then the Lloyd update —
    // per-dim member sums quantized at 2^20 (exact: float mantissa ×
    // power of two), micro-cosine cohesion sums, and the three drift
    // folds as explicit pos-ordered list_reduce from a 0.0 seed
    // (mirroring the engine's sorted-fold, leading 0.0 included).
    // The CTE body is [[KmeansDriftCtes]], shared verbatim with q212.
    "q199_kmeans_refine" -> (IvfAssignCtes + ",\n" + KmeansDriftCtes + "\n" +
      """SELECT c.cid, COALESCE(st.n_assigned, 0) AS n_assigned,
        |  round(CASE WHEN COALESCE(st.n_assigned, 0) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(st.coh_q AS DOUBLE) / 1e6 / st.n_assigned END, 6) AS cohesion,
        |  round(COALESCE(CASE WHEN f.dmm = 0 OR f.dcc = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE 1 - f.dmc / (sqrt(f.dmm) * sqrt(f.dcc)) END,
        |    CAST(0 AS DOUBLE)), 6) AS drift
        |FROM cent c LEFT JOIN stats st USING (cid) LEFT JOIN fold f USING (cid)
        |ORDER BY cid""".stripMargin),

    // q212: the from-scratch side of the maintenance-loop equivalence
    // proof — IVF assignment + drift CTEs VERBATIM (the engine measured
    // the append-GROWN index; equality proves grow-then-measure ≡
    // rebuild-then-measure), the integer metric, and the q206 round
    // CTEs gated by the shared threshold: round rows appear iff the
    // metric exceeds DriftTriggerMicro, mirroring the engine's
    // driver-side branch.
    "q212_drift_recluster" -> (IvfAssignCtes + ",\n" + KmeansDriftCtes + ",\n" +
      s"""drift_rows AS (
         |  SELECT COALESCE(st.n_assigned, 0) AS n_assigned,
         |    round(COALESCE(CASE WHEN f.dmm = 0 OR f.dcc = 0 THEN CAST(0 AS DOUBLE)
         |      ELSE 1 - f.dmc / (sqrt(f.dmm) * sqrt(f.dcc)) END,
         |      CAST(0 AS DOUBLE)), 6) AS drift
         |  FROM cent c LEFT JOIN stats st USING (cid) LEFT JOIN fold f USING (cid)),
         |metric AS MATERIALIZED (
         |  SELECT CAST(sum(n_assigned * CAST(round(drift * 1e6, 0) AS BIGINT))
         |      // sum(n_assigned) AS BIGINT) AS micro
         |  FROM drift_rows),
         |vq AS MATERIALIZED (
         |  SELECT vec_id, list_transform(range(1,65), i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS vq
         |  FROM e),
         |a0 AS MATERIALIZED (
         |  SELECT v.vec_id, v.vq, b.cid, b.cid AS pcid
         |  FROM vq v JOIN buckets b USING (vec_id)),
         |st0 AS (
         |  SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT) AS n_moved,
         |    CAST(count(DISTINCT cid) AS BIGINT) AS n_clusters,
         |    CAST((SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM buckets GROUP BY cid)) AS BIGINT) AS max_cluster
         |  FROM buckets),""".stripMargin + "\n" +
      (1 to KmeansRounds).map(kmeansRoundCtes).mkString(",\n") + "\n" +
      s"""SELECT round, n_moved, n_clusters, max_cluster,
         |  (SELECT micro FROM metric) AS drift_micro
         |FROM (SELECT * FROM st0
         |${(1 to KmeansRounds).map(r =>
            s"  UNION ALL SELECT * FROM st$r WHERE (SELECT micro FROM metric) > $DriftTriggerMicro")
            .mkString("\n")})
         |ORDER BY round""".stripMargin),

    // q206: the IVF assignment CTEs verbatim as round 0, then one
    // GENERATED CTE layer per Lloyd round (never hand-written per-round
    // SQL — the layer count and the engine's loop share KmeansRounds):
    // exact int64 per-dim sums → pos-ordered centroid arrays + 0.0-seed
    // norm² folds → exact-int64-dot/sqrt argmax reassignment with
    // ties to the smaller centroid id — the engine's arithmetic
    // verbatim. DuckDB's BIGINT multiply is overflow-CHECKED, so the
    // documented width bound failing would abort the oracle loudly.
    "q206_kmeans_iterate" -> (IvfAssignCtes + ",\n" +
      """vq AS MATERIALIZED (
        |  SELECT vec_id, list_transform(range(1,65), i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS vq
        |  FROM e),
        |a0 AS MATERIALIZED (
        |  SELECT v.vec_id, v.vq, b.cid, b.cid AS pcid
        |  FROM vq v JOIN buckets b USING (vec_id))""".stripMargin + ",\n" +
      (1 to KmeansRounds).map(kmeansRoundCtes).mkString(",\n") + "\n" +
      s"""SELECT round, n_moved, n_clusters, max_cluster FROM (
         |${(1 to KmeansRounds).map(r => s"SELECT * FROM st$r").mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin),

    // q134 = q57's answer from the grown index; same SQL, and the gate
    // becomes the append≡rebuild equivalence proof
    "q134_ann_grow_reprobe" -> IvfProbeSql,

    // q138 = q57's answer reached through streamed micro-batch serving;
    // same SQL, and the gate becomes the streamed ≡ one-shot proof
    "q138_stream_ann_serve" -> IvfProbeSql,

    // q122: the q57 IVF replay (bounded Q) joined against the exact
    // brute-force top-3; recall = |intersection| / 3 per query
    "q122_ann_recall" -> (IvfAssignCtes + ",\n" +
      """q AS MATERIALIZED (SELECT e.vec_id AS qid, e.embedding AS qe, e.nrm AS qn, b.cid
        |  FROM e JOIN buckets b USING (vec_id)
        |  WHERE e.vec_id % 50 = 0 AND e.vec_id < 5000),
        |probe AS (
        |  SELECT qid, nid, CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot/(na*nb) END AS sim FROM (
        |    SELECT q.qid, e.vec_id AS nid,
        |      list_reduce(list_transform(range(1,65), i -> CAST(q.qe[i]*e.embedding[i] AS DOUBLE)), (a,b)->a+b) AS dot,
        |      q.qn AS na, e.nrm AS nb
        |    FROM q JOIN buckets b ON b.cid = q.cid JOIN e ON e.vec_id = b.vec_id
        |    WHERE e.vec_id != q.qid)),
        |ar AS (SELECT qid, nid FROM (
        |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM probe)
        |  WHERE rnk <= 3),
        |exd AS (
        |  SELECT qid, e.vec_id AS nid, CASE WHEN q.qn = 0 OR e.nrm = 0 THEN NULL ELSE
        |    list_reduce(list_transform(range(1,65), i -> CAST(q.qe[i]*e.embedding[i] AS DOUBLE)), (a,b)->a+b) / (q.qn*e.nrm) END AS sim
        |  FROM q CROSS JOIN e WHERE e.vec_id != q.qid),
        |ex AS (SELECT qid, nid FROM (
        |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM exd)
        |  WHERE rnk <= 3),
        |hits AS (SELECT qid, count(*) AS n_hit FROM ex JOIN ar USING (qid, nid) GROUP BY qid)
        |SELECT qs.qid, COALESCE(n_hit, 0) AS n_hit,
        |  round(COALESCE(n_hit, 0) / 3.0, 6) AS recall
        |FROM (SELECT DISTINCT qid FROM q) qs LEFT JOIN hits USING (qid)
        |ORDER BY qid""".stripMargin),

    // q143: the IVF-assignment CTEs name each vector's cluster; the
    // spliced sign-LSH band CTEs (CorpusQueries.lshBandCtes — the SAME
    // generated plane constants as q73's twin) supply the in-cluster
    // candidate filter; survivors of exact cosine >= 0.4 drop the
    // higher-id member (dup_of = its lowest-id in-cluster duplicate)
    "q143_semdedup" -> (IvfAssignCtes + ",\n" +
      CorpusQueries.lshBandCtes + ",\n" +
      """cand AS (
        |  SELECT DISTINCT ba.cid, x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.key = y.key AND x.vec_id < y.vec_id
        |  JOIN buckets ba ON ba.vec_id = x.vec_id
        |  JOIN buckets bb ON bb.vec_id = y.vec_id AND bb.cid = ba.cid),
        |p AS (
        |  SELECT cid, id_a, id_b,
        |    CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN NULL ELSE
        |      list_reduce(list_transform(range(1,65), i -> CAST(a.embedding[i]*b.embedding[i] AS DOUBLE)), (x,y)->x+y)
        |      / (a.nrm*b.nrm) END AS sim
        |  FROM cand JOIN e a ON a.vec_id = id_a JOIN e b ON b.vec_id = id_b)
        |SELECT cid, id_b AS vec_id, min(id_a) AS dup_of
        |FROM p WHERE sim >= 0.4
        |GROUP BY cid, id_b
        |ORDER BY vec_id""".stripMargin),
  )

  /** DuckDB twin of the IVF probe — shared by q57 (one-shot index) and
    * q134 (grown index), whose contents are provably identical. */
  /** Shared IVF-assignment CTE prefix (embedding norms → capped-stride
    * centroids → nearest-centroid `buckets`): the DuckDB source of truth
    * for the assignment the persisted index materializes, spliced into
    * the q57/q134/q138 probe twin, q122's recall twin, and q143's
    * SemDeDup twin. */
  private val IvfAssignCtes: String =
    """WITH e AS MATERIALIZED (SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_transform(range(1,65), i -> CAST(embedding[i]*embedding[i] AS DOUBLE)), (a,b)->a+b)) AS nrm
      |  FROM embeddings),
      |par AS (SELECT 100 * GREATEST(1, CAST(ceil(count(*) / 409600.0) AS BIGINT)) AS stride FROM e),
      |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM e, par WHERE vec_id % stride = 0),
      |asgn AS (
      |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM (
      |    SELECT vec_id, cid, CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot/(na*nb) END AS sim FROM (
      |      SELECT e.vec_id, c.cid,
      |        list_reduce(list_transform(range(1,65), i -> CAST(e.embedding[i]*c.ce[i] AS DOUBLE)), (a,b)->a+b) AS dot,
      |        e.nrm AS na, c.cn AS nb
      |      FROM e CROSS JOIN cent c))),
      |buckets AS MATERIALIZED (SELECT vec_id, cid FROM asgn WHERE rn = 1)""".stripMargin

  /** q55's DuckDB twin parameterized by the documents source — shared
    * verbatim by q55 (full corpus) and q208 (the sf1-replayable
    * [[SliceSrc]] slice). Brute-force all-pairs over the same
    * 62-bit shingle hashes. */
  private def jaccardOracle(src: String): String =
    s"""WITH arrs AS MATERIALIZED (
       |  SELECT doc_id, list_transform(list_distinct(list_transform(
       |      range(0, len(string_split(text,' ')) - 2),
       |      i -> array_to_string(string_split(text,' ')[i+1:i+3], ' '))),
       |    sg -> list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*131 + b) % 2147483647) * 2147483648
       |        + list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*137 + b) % 2147483647)) AS arr
       |  FROM $src),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   len(list_intersect(a.arr, b.arr))::BIGINT AS inter,
       |   (len(a.arr) + len(b.arr) - len(list_intersect(a.arr, b.arr)))::BIGINT AS uni
       |  FROM arrs a JOIN arrs b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, inter, uni, round(inter::DOUBLE / uni, 6) AS jaccard
       |FROM p WHERE inter::DOUBLE / uni >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q164's DuckDB twin parameterized by the documents source — shared
    * by q164 (full corpus) and q209 (the slice). Brute-force
    * ordered-pair containment as ground truth: no prefix filter;
    * ceil(n*0.8) mirrors the engine's α in identical double
    * arithmetic; each unordered intersection serves both directions. */
  private def containmentOracle(src: String): String =
    s"""WITH arrs AS MATERIALIZED (
       |  SELECT doc_id, list_transform(list_distinct(list_transform(
       |      range(0, len(string_split(text,' ')) - 2),
       |      i -> array_to_string(string_split(text,' ')[i+1:i+3], ' '))),
       |    sg -> list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*131 + b) % 2147483647) * 2147483648
       |        + list_reduce(list_prepend(0::BIGINT, list_transform(string_split(sg,''), ch -> ascii(ch)::BIGINT)), (a,b) -> (a*137 + b) % 2147483647)) AS arr
       |  FROM $src),
       |nz AS (SELECT doc_id, arr FROM arrs WHERE len(arr) > 0),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   len(list_intersect(a.arr, b.arr))::BIGINT AS inter,
       |   len(a.arr)::BIGINT AS na, len(b.arr)::BIGINT AS nb
       |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id),
       |d AS (
       |  SELECT doc_a AS doc_sub, doc_b AS doc_sup, inter, na AS n_sub FROM p
       |  UNION ALL
       |  SELECT doc_b, doc_a, inter, nb FROM p)
       |SELECT doc_sub, doc_sup, inter, n_sub,
       |  round(inter::DOUBLE / n_sub, 6) AS containment
       |FROM d WHERE inter >= ceil(n_sub * 0.8)
       |ORDER BY doc_sub, doc_sup""".stripMargin

  /** q199/q212's drift-measurement CTE body (consumes `e`/`buckets`/
    * `cent` from [[IvfAssignCtes]]): member cohesion, exact int64
    * per-dim sums, member-mean arrays, and the three pos-ordered
    * 0.0-seed drift folds — shared VERBATIM by both oracles so the
    * q212 trigger input is definitionally q199's metric. */
  private val KmeansDriftCtes: String =
    """asg AS MATERIALIZED (
      |  SELECT b.cid, e.vec_id, e.embedding, e.nrm
      |  FROM e JOIN buckets b USING (vec_id)),
      |coh AS (
      |  SELECT cid,
      |    CAST(floor(coalesce(CASE WHEN nrm = 0 OR cn = 0 THEN NULL
      |        ELSE dot/(nrm*cn) END, CAST(0 AS DOUBLE)) * 1e6 + 1e-6)
      |      AS BIGINT) AS simq
      |  FROM (
      |    SELECT a.cid, a.nrm, c.cn,
      |      list_reduce(list_transform(range(1,65), i -> CAST(a.embedding[i]*c.ce[i] AS DOUBLE)), (x,y)->x+y) AS dot
      |    FROM asg a JOIN cent c USING (cid))),
      |stats AS MATERIALIZED (
      |  SELECT cid, count(*) AS n_assigned,
      |    CAST(sum(simq) AS BIGINT) AS coh_q
      |  FROM coh GROUP BY cid),
      |sums AS (
      |  SELECT a.cid, u.i AS pos,
      |    CAST(sum(CAST(floor(CAST(a.embedding[u.i] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS sq
      |  FROM asg a CROSS JOIN (SELECT unnest(range(1,65)) AS i) u
      |  GROUP BY a.cid, u.i),
      |mn AS (
      |  SELECT s.cid, s.pos,
      |    CAST(s.sq AS DOUBLE) / CAST(st.n_assigned * 1048576 AS DOUBLE) AS m
      |  FROM sums s JOIN stats st USING (cid)),
      |fold AS (
      |  SELECT mn.cid,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(mn.m * CAST(c.ce[mn.pos] AS DOUBLE) ORDER BY mn.pos)), (x,y)->x+y) AS dmc,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(mn.m * mn.m ORDER BY mn.pos)), (x,y)->x+y) AS dmm,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(CAST(c.ce[mn.pos] AS DOUBLE) * CAST(c.ce[mn.pos] AS DOUBLE) ORDER BY mn.pos)), (x,y)->x+y) AS dcc
      |  FROM mn JOIN cent c USING (cid) GROUP BY mn.cid)""".stripMargin

  /** q206: one unrolled Lloyd round as CTE layers over the previous
    * round's assignment `a{r-1}` — sums, centroid arrays, argmax
    * reassignment, and the round's convergence stats row. Generated
    * from the round index so the SQL is a pure function of
    * [[KmeansRounds]], mirroring the engine loop. */
  private def kmeansRoundCtes(r: Int): String = {
    val p = r - 1
    s"""s$r AS (
       |  SELECT a.cid, u.i AS pos, CAST(sum(a.vq[u.i]) AS BIGINT) AS sq
       |  FROM a$p a CROSS JOIN (SELECT unnest(range(1,65)) AS i) u
       |  GROUP BY a.cid, u.i),
       |c$r AS MATERIALIZED (SELECT * FROM (
       |  SELECT cid AS ncid, list(sq ORDER BY pos) AS sqa,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE) ORDER BY pos)), (x,y)->x+y) AS nn
       |  FROM s$r GROUP BY cid) WHERE nn > 0),
       |a$r AS MATERIALIZED (
       |  SELECT vec_id, vq, cid, pcid FROM (
       |    SELECT a.vec_id, a.vq, c.ncid AS cid, a.cid AS pcid,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |        CAST(list_reduce(list_transform(range(1,65), i -> a.vq[i]*c.sqa[i]), (x,y)->x+y) AS DOUBLE)/sqrt(c.nn) DESC, c.ncid) AS rn
       |    FROM a$p a CROSS JOIN c$r c)
       |  WHERE rn = 1),
       |st$r AS (
       |  SELECT CAST($r AS BIGINT) AS round,
       |    CAST(count(CASE WHEN cid != pcid THEN 1 END) AS BIGINT) AS n_moved,
       |    CAST(count(DISTINCT cid) AS BIGINT) AS n_clusters,
       |    CAST((SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM a$r GROUP BY cid)) AS BIGINT) AS max_cluster
       |  FROM a$r)""".stripMargin
  }

  private val IvfProbeSql: String = IvfAssignCtes + ",\n" +
    """q AS (SELECT e.vec_id AS qid, e.embedding AS qe, e.nrm AS qn, b.cid FROM e JOIN buckets b USING (vec_id) WHERE e.vec_id % 50 = 0 AND e.vec_id < 5000),
      |probe AS (
      |  SELECT qid, nid, CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot/(na*nb) END AS sim FROM (
      |    SELECT q.qid, e.vec_id AS nid,
      |      list_reduce(list_transform(range(1,65), i -> CAST(q.qe[i]*e.embedding[i] AS DOUBLE)), (a,b)->a+b) AS dot,
      |      q.qn AS na, e.nrm AS nb
      |    FROM q JOIN buckets b ON b.cid = q.cid JOIN e ON e.vec_id = b.vec_id
      |    WHERE e.vec_id != q.qid)),
      |r AS (SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM probe)
      |SELECT qid, rnk, nid, round(sim, 6) AS sim
      |FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin
}
