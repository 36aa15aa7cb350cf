package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost probe for q164's containment probe (dev tool, the r12 probe
  * tradition): decomposes the probe into (a) the candidate h-join
  * count over the persisted ranked index and (b) the full
  * probe-and-verify, each timed warm (second run), so layout decisions
  * (bucketed vs parquet, bucket count) are made on measured splits
  * instead of guesses. */
object Probe164 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(work: => Long): Unit = {
      var last = 0L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); last = work
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe164] $tag%-28s rows=$last%12d " +
        f"cold=${times.head}%7.2fs warm=${times.last}%7.2fs")
    }
    val t0 = System.nanoTime()
    val (arrsPath, tab) =
      graft.operators.SimilarityQueries.containmentIndex(spark, sfDir)
    println(f"[probe164] index build/reuse: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val ranked = spark.table(tab)
    timed("ranked count") { ranked.count() }
    val pa = ranked
      .filter(col("rn") <= col("n") - ceil(col("n") * 0.8) + 1)
      .toDF("doc_a", "h", "rn_a", "n_a")
    val pb = ranked.toDF("doc_b", "h2", "rn_b", "n_b")
    timed("h-join raw pairs") {
      pa.join(pb, col("h") === col("h2") &&
        col("doc_a") =!= col("doc_b")).count()
    }
    timed("candidates (all filters)") {
      pa.join(pb,
          col("h") === col("h2") && col("doc_a") =!= col("doc_b") &&
          col("n_b") >= ceil(col("n_a") * 0.8))
        .filter(lit(1L) +
          least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
          ceil(col("n_a") * 0.8))
        .select("doc_a", "doc_b").count()
    }
    timed("full probe") {
      graft.operators.SimilarityQueries.containmentProbe(spark, sfDir).count()
    }
    spark.stop()
  }
}
