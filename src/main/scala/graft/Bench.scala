package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session first (parquet reader, codegen, shuffle machinery)
    // so the first timed query doesn't absorb one-time JVM costs
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // deterministic run order (Map iteration is hash-ordered), and drop
    // any per-query caches so one query's cached RDDs don't tax the next
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9  // cache teardown untimed
      spark.catalog.clearCache()
      name -> (if (ok) secs else -1.0)           // -1 marks a failed query
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries (-1 sentinel) are excluded from the total and counted
    // separately — a failure must never *shrink* the reported wall-clock
    val total = results.values.filter(_ >= 0).sum
    val failed = results.values.count(_ < 0)
    // record machine load: this box is shared, and load swings totals 2× —
    // round-over-round comparisons need the context
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"load_avg":$load,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
