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
    if (key == "--audit") {
      // fan over every NON-streaming key and report how many times each
      // fixture table is scanned (occurrences in the de-duplicated plan
      // text minus InMemoryRelation-internal repeats are still printed
      // per reference, so treat the number as an upper bound — a key
      // worth a look, not proof of waste)
      val skip = Set("q39", "q40", "q41", "q42", "q79", "q84", "q85",
        "q86", "q102", "q108", "q114") // streaming: plan() executes them
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        if (!skip.exists(p => n.startsWith(p + "_"))) {
          try {
            val p = fn(spark, sfDir).queryExecution.executedPlan.toString
            val scans = "FileScan parquet".r.findAllIn(p).size
            val cached = "InMemoryTableScan".r.findAllIn(p).size
            if (scans >= 3)
              println(f"$n%-34s scans=$scans%2d cached=$cached%2d")
          } catch { case e: Throwable =>
            // String.valueOf: a null-message Throwable (NPE) must not
            // abort the rest of the audit sweep
            println(s"$n FAILED ${String.valueOf(e.getMessage).take(80)}")
          }
          spark.catalog.clearCache()
        }
      }
    } else {
      println(graft.SparkEntry.queries(key)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
