package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE key N times in a single JVM (args: key [n]
  * [sfDir]) — the controlled A/B loop Bench's full sweep is too noisy
  * for. Prints every iteration; compare medians across variants. */
object KeyBench {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q14_agg_group")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // phase stamps (VERDICT r18 item 3): every fresh-JVM adjudication
    // run carries its own multi-core phase context, pre and post
    println(f"[canary] pre: ${PhaseCanary.measure()}%.3f s")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(key)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      // rows appended AFTER the timing (existing parsers match on
      // "run N: X s") — output sizes are the adjudication currency
      // for the pair-emitting keys (VERDICT r18 item 6)
      println(f"$key run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
    println(f"[canary] post: ${PhaseCanary.measure()}%.3f s")
  }
}
