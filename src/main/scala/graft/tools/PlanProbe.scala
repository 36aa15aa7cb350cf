package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print one query's executed plan (args: key [sfDir]) —
  * the quick ReuseExchange / scan-count audit loop. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q14_agg_group")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(key)(spark, sfDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
