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
  private val LoopShufflePartitions = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Connected components of the bipartite customer–supplier graph
    // (an edge per distinct (custkey, suppkey) pair appearing on an
    // order): Iters synchronous min-label steps, then component stats.
    // Node ids are disjoint by parity: customer = 2·custkey,
    // supplier = 2·suppkey + 1.
    "q87_components" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val e0 = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // symmetric edge list, reused every iteration — cache it ALREADY
      // HASH-PARTITIONED on the join key: the cached InMemoryRelation
      // reports its outputPartitioning, so each iteration's join reuses
      // the layout instead of re-exchanging the (larger) edge side —
      // only the label frame moves per step
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(LoopShufflePartitions, col("src")).cache()
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
      // The loop materializes Iters tiny shuffles (the label frame is
      // ~2·|keys| rows); at the session's 32 shuffle partitions each
      // iteration pays 2×32 near-empty tasks of pure scheduling overhead.
      // Dial partitions down for the loop ONLY (every iteration is fully
      // materialized inside by the eager checkpoint, so the restored
      // setting governs nothing here); on a real cluster this knob rises
      // with data volume — the plan shape is unchanged.
      graft.Tables.withShufflePartitions(s, LoopShufflePartitions) {
        for (_ <- 1 to Iters) {
          val prop = edges.join(labels, col("src") === col("node"))
            .select(col("dst").as("node"), col("lbl"))
          // `labels` is referenced twice per step (join input + union arm):
          // without truncation each unexecuted plan embeds TWO copies of the
          // previous step's subtree, so lineage — and re-execution cost —
          // doubles per iteration. Eagerly checkpointing every step keeps the
          // per-iteration plan one join + one agg over a materialized frame:
          // the standard iterated-Pregel discipline.
          labels = labels.unionByName(prop)
            .groupBy("node").agg(min("lbl").as("lbl"))
            .localCheckpoint(true)
        }
      }
      labels.groupBy("lbl").agg(count(lit(1)).as("sz"))
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
  )

  /** The oracle unrolls the same fixed iteration count as explicit CTE
    * stages (DuckDB's recursive CTEs disallow aggregation in the
    * recursive term, and unrolling makes the step count visibly equal
    * to the Spark side's). */
  private val q87Sql: String = {
    val steps = (1 to Iters).map { i =>
      s"""l$i AS (SELECT node, min(lbl) AS lbl FROM (
         |  SELECT node, lbl FROM l${i - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, l.lbl FROM l${i - 1} l
         |    JOIN edges e ON e.src = l.node) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS (SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw),
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
       |$steps,
       |c AS (SELECT lbl, count(*) AS sz FROM l$Iters GROUP BY lbl)
       |SELECT count(*) AS n_components, CAST(max(sz) AS BIGINT) AS max_size,
       |  CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
       |  CAST(sum(sz) AS BIGINT) AS n_nodes,
       |  CAST(sum(lbl * sz) AS BIGINT) AS label_sum
       |FROM c""".stripMargin
  }

  def oracle: Map[String, String] = Map("q87_components" -> q87Sql)
}
