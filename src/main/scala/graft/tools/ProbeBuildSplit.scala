package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe (r22): split representative index builds into COMPUTE
  * (noop sink) vs full BUILD (write + commit) so commit overhead is
  * measured, not assumed. Not part of the shipped library. */
object ProbeBuildSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    println(f"[canary] pre: ${PhaseCanary.measure()}%.3f s")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(tag: String, work: () => Unit): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      work()
      println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    // q44: minhashPairs compute vs nearDupPairs full build
    timed("q44_compute", () => noop(
      graft.operators.LlmQueries.minhashPairs(
        graft.Tables.tWide(spark, sfDir, "documents"))))
    timed("q44_build", () => {
      graft.operators.LlmQueries.nearDupPairs(spark, sfDir, rebuild = true); () })
    // q106: band-key pipeline compute vs bucketed saveAsTable build
    timed("q106_compute", () => noop(
      graft.operators.LlmQueries.bandKeys(graft.operators.LlmQueries.minhashSignatures(
        graft.Tables.tWide(spark, sfDir, "documents")
          .filter(col("doc_id") % 10 =!= 7)))))
    timed("q106_build", () => {
      graft.operators.LlmQueries.corpusBandIndex(spark, sfDir, rebuild = true); () })
    spark.stop()
    println(f"[canary] post: ${PhaseCanary.measure()}%.3f s")
  }
}
