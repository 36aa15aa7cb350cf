package graft.tools

/** Dev-only plan-shape dump for q55 (see Profile55). */
object Explain55 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = graft.SparkEntry.queries("q55_ngram_jaccard")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println("WINDOWS=" + "Window ".r.findAllIn(p).size)
    println("EXCH=" + "Exchange hashpartitioning".r.findAllIn(p).size)
    println("GEN=" + "Generate explode".r.findAllIn(p).size)
    println("REUSE=" + "ReusedExchange".r.findAllIn(p).size)
    println("CACHE=" + "InMemoryTableScan".r.findAllIn(p).size)
    spark.stop()
  }
}
