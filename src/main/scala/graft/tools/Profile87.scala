package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only timer for q87_components: runs the production key N times
  * (first run warms codegen/scan caches) and prints each wall-clock —
  * for isolating iteration-loop changes without a full bench sweep. */
object Profile87 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count() // warm
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q87_components")(spark, sfDir).count()
      println(f"PROF q87 run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
