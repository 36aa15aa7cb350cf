package graft.tools
import org.apache.spark.sql.SparkSession

/** q44 pair-frame BUILD probe (args: fixture dirs) — times a forced
  * fresh `nearDupPairs(rebuild = true)` and prints the gate-pair count,
  * the contrast side of the q215 exact-dup-mass measurement (VERDICT
  * r18 item 4): on an exact-replica corpus the pair frame carries
  * Sum C(family,2) within-family pairs while q215's signature collapse
  * shrinks every join side to distinct content. PhaseCanary stamps
  * carry the box phase. Dev-side tooling — NOT part of the shipped
  * library. */
object Probe44Build {
  def main(args: Array[String]): Unit = {
    println(f"[canary] pre: ${PhaseCanary.measure()}%.3f s")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val t0 = System.nanoTime()
      val pairs = graft.operators.LlmQueries
        .nearDupPairs(spark, dir, rebuild = true).count()
      println(f"[probe44] $dir build: ${(System.nanoTime() - t0) / 1e9}%.3f s ($pairs pairs)")
      spark.catalog.clearCache()
    }
    spark.stop()
    println(f"[canary] post: ${PhaseCanary.measure()}%.3f s")
  }
}
