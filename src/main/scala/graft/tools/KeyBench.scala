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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(key)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"$key run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
