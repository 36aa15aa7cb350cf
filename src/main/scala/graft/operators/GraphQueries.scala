package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Iterative graph computation — the one Spark execution pattern the
  * rest of the inventory doesn't exercise: a driver-side loop of
  * DataFrame joins (the DataFrame rendering of Pregel-style synchronous
  * label propagation).
  *
  * Determinism: the iteration count is FIXED, and one synchronous
  * min-label step is a pure function of the previous labeling — so both
  * engines compute the identical k-step result whether or not the
  * labels have converged. No fixpoint detection, no nondeterminism.
  *
  * Scale notes: each step is one hash join edges⋈labels plus a min
  * aggregation — the standard iterated-shuffle shape. `labels` feeds
  * both the join and the union each step, so an untruncated plan would
  * embed the previous step's subtree TWICE — exponential re-execution.
  * The loop therefore eagerly localCheckpoints every iteration (on a
  * cluster: checkpoint to reliable storage, or use a graph framework);
  * the per-step plan is one shuffled hash join + one hash agg. */
object GraphQueries {

  private val Iters = 6
  /** q89's pair graph is near-dup chains — tiny diameters; 4 fixed
    * steps with the same unrolled-oracle discipline as q87. */
  private[operators] val ClusterIters = 4
  private val LoopShufflePartitions = 8

  /** `iters` synchronous min-label steps over a DIRECTED edge frame
    * (src, dst) — callers pass a symmetrized list for undirected
    * semantics. Returns (node, lbl). The shared iterated-Pregel
    * discipline for every graph key:
    *  - edges cached ALREADY HASH-PARTITIONED on the join key, so each
    *    iteration's join reuses the layout instead of re-exchanging the
    *    (larger) edge side — only the label frame moves per step;
    *  - `labels` feeds both the join and the union each step, so each
    *    iteration eagerly localCheckpoints (untruncated lineage would
    *    embed the previous step's subtree twice — doubling per
    *    iteration);
    *  - the loop runs at few shuffle partitions (label frames are tiny;
    *    at the session's 32 partitions each step pays 2×32 near-empty
    *    tasks of pure scheduling overhead) — every iteration fully
    *    materializes inside the scope, so the restored setting governs
    *    nothing here. On a real cluster the knob rises with data
    *    volume; the plan shape is unchanged. */
  def minLabel(s: SparkSession, edgeList: DataFrame, iters: Int): DataFrame = {
    val edges = edgeList.select(col("src"), col("dst"))
      .repartition(LoopShufflePartitions, col("src")).cache()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    // r22 NEGATIVE RESULT, measured and reverted (the q132 discipline):
    // a 2-step unroll (step∘step per localCheckpoint — halve the
    // checkpoint/job count, the VERDICT r21 item-2 candidate) was
    // implemented and A/B'd with a loop-isolating fresh-JVM probe
    // (8 iters over the fixed bipartite edge frame, n=5 × 2 interleaved
    // rounds, canaries 2.2–2.7 both sides): warm minima 2.26/2.23 s
    // before vs 2.40/2.03 s after — NEUTRAL — and cold first runs
    // CONSISTENTLY worse (5.4/5.8 → 6.8/6.4 s; the unrolled plan is 2×
    // per materialization, so codegen/plan compilation doubles). The
    // mechanism: the loop's serial chain is its EXCHANGE count, which
    // an unroll cannot change — it only removes job-submission rounds
    // (sub-noise here) while the inner step's reduce-side agg runs
    // twice per pair. Do not re-try without a cluster where job
    // round-trips are expensive relative to stages.
    graft.Tables.withShufflePartitions(s, LoopShufflePartitions) {
      for (_ <- 1 to iters) {
        val prop = edges.join(labels, col("src") === col("node"))
          .select(col("dst").as("node"), col("lbl"))
        labels = labels.unionByName(prop)
          .groupBy("node").agg(min("lbl").as("lbl"))
          .localCheckpoint(true)
      }
    }
    edges.unpersist()
    labels
  }

  /** Symmetrized bipartite customer–supplier graph: an edge per
    * distinct (custkey, suppkey) pair appearing on an order; node ids
    * disjoint by parity (customer = 2·custkey, supplier = 2·suppkey+1).
    * Shared by q87 (components) and q101 (PageRank). */
  private def bipartiteEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val e0 = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** q101: fixed PageRank steps in MICRO-UNIT integer arithmetic
    * (rank×10⁶ as BIGINT): contributions are integer divisions, the
    * damping step is (85·Σ) div 100 — every operation is exact long
    * math, so both engines agree bit-for-bit with no float-order risk.
    * 3 steps, same unrolled-oracle discipline as q87/q89. */
  private val RankIters = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Connected components of the bipartite customer–supplier graph:
    // Iters synchronous min-label steps, then component stats.
    "q87_components" -> { (s, dir) =>
      minLabel(s, bipartiteEdges(s, dir), Iters)
        .groupBy("lbl").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_components"),
          max("sz").as("max_size"),
          sum(when(col("sz") === 1, 1L).otherwise(0L)).cast("long")
            .as("n_singletons"),
          sum("sz").cast("long").as("n_nodes"),
          // Σ node-label — a fingerprint of WHICH label won each node,
          // so a wrong propagation depth fails the gate even when the
          // component count happens to converge early
          sum(col("lbl") * col("sz")).cast("long").as("label_sum"))
    },

    // Near-dup CLUSTER ASSIGNMENT — the dedup output a training
    // pipeline actually consumes: q44's MinHash near-dup pairs as an
    // undirected graph, ClusterIters min-label steps, then each
    // clustered doc labeled with its cluster's canonical (minimum)
    // doc_id. Docs in no near-dup pair are trivially their own cluster
    // and are excluded (the interesting rows are the ones where
    // keep-canonical / drop-rest decisions happen). Composition of two
    // independently-gated operators (q44 pairs × q87 propagation), so a
    // drift in either surfaces here too.
    "q89_dedup_clusters" -> { (s, dir) =>
      // pairs probe the persisted nearDupPairs frame — the shingle
      // pipeline is paid once per (session, corpus), not per consumer
      val pairs = LlmQueries.nearDupPairs(s, dir)
        .filter(col("match_cnt") >= LlmQueries.NearDupMinMatches)
        .select(col("doc_a"), col("doc_b"))
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(
          pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      minLabel(s, edges, ClusterIters)
        .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy("doc_id")
    },

    // Cluster SURVIVOR selection — the decision a curation pipeline
    // actually emits: within each near-dup cluster (q89's machinery),
    // keep the highest-QUALITY document (q51's gate-proven score,
    // rounded to 6 dp — the precision both engines provably agree on),
    // ties to the smaller doc_id. The canonical-id rule (q89's min
    // label) keeps an ARBITRARY member; real pipelines keep the best
    // one. Per-cluster window is bounded (near-dup chains are short);
    // the clusters⋈quality join keys on doc_id — both sides
    // hash-partition, nothing collects.
    "q117_cluster_survivors" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = tWide(s, dir, "documents")
      val prs = LlmQueries.nearDupPairs(s, dir)
        .filter(col("match_cnt") >= LlmQueries.NearDupMinMatches)
        .select(col("doc_a"), col("doc_b"))
      val edges = prs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(
          prs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val clusters = minLabel(s, edges, ClusterIters)
        .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      val qual = docs.select(col("doc_id"),
        graft.functions.TextOps.qualityScore(col("text")).as("q"))
      val byCluster = Window.partitionBy("cluster_id")
      val bestFirst = byCluster.orderBy(desc("q"), col("doc_id"))
      clusters.join(qual, "doc_id")
        .withColumn("rn", row_number().over(bestFirst))
        .withColumn("n_docs", count(lit(1)).over(byCluster))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("n_docs"),
          col("doc_id").as("survivor_doc"), col("q").as("survivor_quality"),
          (col("n_docs") - 1).as("n_dropped"))
        .orderBy("cluster_id")
    },

    // Split REPAIR — the fix for what q128 measures: reassign every
    // clustered doc to its cluster CANONICAL's split (the min-label
    // doc decides for the whole near-dup cluster), so no near-dup pair
    // can straddle train/test afterwards. Output is the movement
    // matrix a pipeline would execute: (from_split, to_split, n_docs).
    // Both splits are doc_id arithmetic computed inline on the
    // (node, lbl) cluster rows — no assignment join; the matrix agg
    // has a ≤ 3×3 key space. Residual-leakage-zero proven in
    // AuditSpec.
    "q129_split_repair" -> { (s, dir) =>
      val prs = LlmQueries.nearDupPairs(s, dir)
        .filter(col("match_cnt") >= LlmQueries.NearDupMinMatches)
        .select(col("doc_a"), col("doc_b"))
      val edges = prs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(
          prs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      minLabel(s, edges, ClusterIters)
        .select(CorpusQueries.splitOf(col("node")).as("from_split"),
          CorpusQueries.splitOf(col("lbl")).as("to_split"))
        .groupBy("from_split", "to_split")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("moved", col("from_split") =!= col("to_split"))
        .orderBy("from_split", "to_split")
    },

    // PageRank (damping 0.85, un-normalized per-node base) over the
    // customer–supplier graph in exact integer micro-units; top-20
    // most central nodes. Same iterated-Pregel shape as minLabel: the
    // (edge ⋈ degree) frame is cached pre-partitioned on src so each
    // step re-exchanges only the small rank frame; ranks are
    // localCheckpoint'd per step (linear lineage, kept truncated).
    // The symmetric graph has no dangling nodes, so mass handling
    // stays a per-node base term — the standard simplification.
    "q101_pagerank" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // ONE cached frame carries everything the loop needs: outdeg is
      // a count() window over the src partitioning (satisfied by the
      // repartition — no extra exchange, no separate degree join), and
      // the rank init is a distinct over the same cache. A separate
      // deg aggregate + join would materialize the heavy
      // orders⋈lineitem→distinct pipeline twice.
      val edgesDeg = bipartiteEdges(s, dir)
        .repartition(LoopShufflePartitions, col("src"))
        .withColumn("outdeg",
          count(lit(1)).over(Window.partitionBy("src")))
        .cache()
      // materialize the heavy build (join + distinct + degree window)
      // at the SESSION's full shuffle parallelism — only the loop's
      // tiny per-iteration frames belong at LoopShufflePartitions
      edgesDeg.count()
      var ranks = edgesDeg.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1000000L))
      graft.Tables.withShufflePartitions(s, LoopShufflePartitions) {
        // ranks is referenced ONCE per step (join side only — no union),
        // so the lineage is LINEAR: chaining all RankIters steps lazily
        // embeds each subtree once, and a single materialization at the
        // end truncates everything in one job (r22 — was one
        // localCheckpoint per step, each paying a job round; the
        // checkpoint-per-step guard matters only for the doubling shape
        // minLabel has). The one checkpoint stays INSIDE the conf scope
        // so the loop's exchanges execute at LoopShufflePartitions.
        for (_ <- 1 to RankIters) {
          ranks = edgesDeg.join(ranks, col("src") === col("node"))
            .select(col("dst"), expr("pr div outdeg").as("c"))
            .groupBy("dst").agg(sum("c").as("sc"))
            .selectExpr("dst AS node", "150000 + (85 * sc) div 100 AS pr")
        }
        ranks = ranks.localCheckpoint(true)
      }
      edgesDeg.unpersist()
      ranks.orderBy(desc("pr"), col("node")).limit(20)
    },
  )

  /** Unrolled min-label CTE stages over `edges`/`l0` (shared by both
    * graph oracles — DuckDB's recursive CTEs disallow aggregation in
    * the recursive term, and unrolling makes the step count visibly
    * equal to the Spark side's).
    *
    * Every step is MATERIALIZED — load-bearing, not a hint: DuckDB 1.0
    * INLINES multiply-referenced CTEs, and each step reads l(i-1)
    * twice, so unmaterialized the whole upstream pipeline re-evaluates
    * 2^iters times (q89's MinHash candidate build × 16 spilled > 80 GB
    * at sf0.1; with materialization the full oracle runs in seconds).
    * This is the SQL rendering of the Spark side's per-iteration
    * localCheckpoint — both exist to stop the same doubling. */
  private[operators] def labelSteps(iters: Int): String =
    (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM (
         |  SELECT node, lbl FROM l${i - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, l.lbl FROM l${i - 1} l
         |    JOIN edges e ON e.src = l.node) GROUP BY node)""".stripMargin
    }.mkString(",\n")

  private val q87Sql: String =
    s"""WITH eraw AS (
       |  SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges),
       |${labelSteps(Iters)},
       |c AS (SELECT lbl, count(*) AS sz FROM l$Iters GROUP BY lbl)
       |SELECT count(*) AS n_components, CAST(max(sz) AS BIGINT) AS max_size,
       |  CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
       |  CAST(sum(sz) AS BIGINT) AS n_nodes,
       |  CAST(sum(lbl * sz) AS BIGINT) AS label_sum
       |FROM c""".stripMargin

  /** q89's oracle: q44's full MinHash pair replay (shingles → portable
    * poly-hash → 32 LCG permutations → 8×4 band keys → candidate join →
    * signature agreement ≥ 26) feeding the same unrolled label steps.
    * Signatures ride THROUGH the band join (the Spark side's own shape)
    * and each candidate occurrence verifies inline, instead of a
    * `cand JOIN sig JOIN sig` re-join: at sf0.1 the re-join form made
    * DuckDB materialize full signatures against every candidate
    * occurrence and spill > 80 GB; carrying 8 band rows × one 32-slot
    * list per doc is bounded by the corpus, and the DISTINCT collapses
    * verified pairs only. */
  // The CTE chain (shingles → hashes → MinHash sig → bands → verified
  // pairs → symmetric edges → unrolled label steps) WITHOUT the WITH
  // keyword or a final SELECT — shared by q89 and q117, which differ
  // only in what they project out of l$ClusterIters.
  private def clusterCtes: String =
    s"""sh AS (
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
       |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  SELECT doc_id, b, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey, sig
       |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) bb),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |      len(list_filter(list_zip(x.sig, y.sig), z -> z[1] = z[2])) AS mc
       |    FROM bands x JOIN bands y
       |      ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
       |  WHERE mc >= ${graft.operators.LlmQueries.NearDupMinMatches}),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges),
       |${labelSteps(ClusterIters)}""".stripMargin

  private val q89Sql: String =
    s"""WITH $clusterCtes
       |SELECT node AS doc_id, lbl AS cluster_id FROM l$ClusterIters
       |ORDER BY doc_id""".stripMargin

  // q117: q89's clusters × q51's (gate-proven, 6-dp-rounded) quality
  // score; the survivor is argmax quality, ties to the smaller doc_id.
  // Rounded quality is what both engines provably agree on (q51's
  // hash gate), so it — not the raw float — is the ordering key.
  private val q117Sql: String =
    s"""WITH $clusterCtes,
       |qual AS (
       |  SELECT doc_id, round(
       |    (len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4
       |    + (len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','a','it','that','for'], t)))::DOUBLE / len(toks)) * 0.3
       |    + least(1.0, len(toks) / 50.0) * 0.3, 6) AS q
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       |j AS (
       |  SELECT c.lbl AS cluster_id, c.node AS doc_id, q.q,
       |    row_number() OVER (PARTITION BY c.lbl ORDER BY q.q DESC, c.node) AS rn,
       |    count(*) OVER (PARTITION BY c.lbl) AS n_docs
       |  FROM l$ClusterIters c JOIN qual q ON q.doc_id = c.node)
       |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
       |  doc_id AS survivor_doc, q AS survivor_quality,
       |  CAST(n_docs - 1 AS BIGINT) AS n_dropped
       |FROM j WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** Unrolled integer-PageRank stages (q101): per-edge floor-divided
    * contributions, damped with (85·Σ) // 100 — positive operands, so
    * DuckDB's floor // equals Spark's truncating `div`. */
  private def rankSteps(iters: Int): String =
    (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT e.dst AS node,
         |  150000 + (85 * CAST(sum(r.pr // d.outdeg) AS BIGINT)) // 100 AS pr
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")

  private val q101Sql: String =
    s"""WITH eraw AS (
       |  SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw),
       |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |r0 AS MATERIALIZED (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |${rankSteps(RankIters)}
       |SELECT node, pr FROM r$RankIters
       |ORDER BY pr DESC, node LIMIT 20""".stripMargin

  // q129: the cluster chain, both endpoint splits computed inline on
  // the (node, lbl) rows — the engine's exact arithmetic
  private val q129Sql: String =
    s"""WITH $clusterCtes,
       |mv AS (
       |  SELECT ${CorpusQueries.splitSql.replace("doc_id", "node")} AS from_split,
       |         ${CorpusQueries.splitSql.replace("doc_id", "lbl")} AS to_split
       |  FROM l$ClusterIters)
       |SELECT from_split, to_split, count(*) AS n_docs,
       |  from_split != to_split AS moved
       |FROM mv GROUP BY from_split, to_split
       |ORDER BY from_split, to_split""".stripMargin

  def oracle: Map[String, String] = Map(
    "q87_components" -> q87Sql,
    "q89_dedup_clusters" -> q89Sql,
    "q101_pagerank" -> q101Sql,
    "q117_cluster_survivors" -> q117Sql,
    "q129_split_repair" -> q129Sql,
  )
}
