package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q215 scale/convergence probe (args: fixture dirs). Prints the
  * composition's scale numbers (distinct sigs, clusters, clustered
  * docs) AND runs the convergence tripwire (ADVICE r18): the engine
  * propagates min-labels a fixed [[graft.operators.SimilarityQueries
  * .SurvivorIters]] steps and the DuckDB oracle unrolls the SAME step
  * count, so the cross-engine gate is structurally blind to a
  * sig-graph component whose diameter exceeds the step count — it
  * would silently split into several clusters with duplicate
  * survivors in BOTH engines. The independent check: one extra
  * minLabel step over the same edges must be a fixpoint
  * (l_{n+1} == l_n), and every cluster_id must equal its cluster's
  * member-min doc_id (implied at the fixpoint; a cheap second
  * witness on the output itself). Exits nonzero on violation —
  * wired into round_close.sh's sf1 section as a standing gate. */
object Probe215 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    for (dir <- args) {
      val docs = graft.Tables.tWide(spark, dir, "documents")
      val sig = graft.operators.LlmQueries.minhashSignatures(docs)
      val grp = sig.groupBy("sig")
        .agg(min("doc_id").as("rep"), count(lit(1)).as("n_members"))
      val nSig = grp.count()
      val out = graft.operators.LlmQueries.minhashSurvivors(spark, docs)
        .cache()
      val nClu = out.count()
      val nDocs = out.agg(sum("n_docs")).head().getLong(0)
      println(s"[probe215] $dir: distinct_sigs=$nSig clusters=$nClu docs_clustered=$nDocs")
      // convergence tripwire: SurvivorIters must already be a fixpoint
      val iters = graft.operators.SimilarityQueries.SurvivorIters
      val edges = graft.operators.LlmQueries.minhashSigEdges(grp)
      val ln = graft.operators.GraphQueries.minLabel(spark, edges, iters)
        .toDF("node", "l_n")
      val ln1 = graft.operators.GraphQueries.minLabel(spark, edges, iters + 1)
        .toDF("node", "l_n1")
      val drift = ln.join(ln1, "node")
        .filter(col("l_n") =!= col("l_n1")).count()
      val survivorMismatch = out
        .filter(col("cluster_id") =!= col("survivor_doc")).count()
      val ok = drift == 0 && survivorMismatch == 0
      if (!ok) bad += 1
      println(s"[probe215] $dir: fixpoint drift=$drift (iters=$iters vs " +
        s"${iters + 1}) cluster_id!=member_min=$survivorMismatch " +
        (if (ok) "CONVERGED" else "NOT-CONVERGED — raise SurvivorIters"))
      out.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
    if (bad > 0) System.exit(1)
  }
}
