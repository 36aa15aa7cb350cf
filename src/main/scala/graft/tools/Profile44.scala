package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for q44_dedup_near — stages mirror the
  * PRODUCTION minhashPairs shape (signatures carried through the band
  * join, codegen zip_equal verify, post-verify distinct) and pull the
  * banding constants from LlmQueries so they cannot drift. */
object Profile44 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import org.apache.spark.sql.functions._
    import graft.Tables._
    import graft.operators.LlmQueries
    import LlmQueries.shingles

    graft.SparkEntry.entry(spark).count() // warm

    println("load_avg=" + java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage)

    val docs = tWide(spark, sfDir, "documents")
    time("q44 full")(
      LlmQueries.queries("q44_dedup_near")(spark, sfDir).count())
    spark.catalog.clearCache()

    // stage breakdown of the production shape
    val shingled = docs.select(col("doc_id"),
      explode(shingles(col("text"), 3)).as("s"))
    time("shingle explode")(shingled.count())
    val hashed = shingled.select(col("doc_id"),
      graft.plans.GraftExpressions.poly_hash(col("s")).as("h"))
    time("shingle+polyhash")(hashed.count())
    import graft.plans.MinHashAgg.minhash_agg
    val sig = hashed.groupBy("doc_id").agg(minhash_agg(col("h")).as("sig"))
    time("signatures (uncached)")(sig.count())
    val sigC = sig.cache()
    time("signatures cache()")(sigC.count())

    val pairs = LlmQueries.minhashPairs(docs)
    time("banded pairs + zip_equal")(pairs.count())
    time("thresholded (production)")(
      pairs.filter(col("match_cnt") >= LlmQueries.NearDupMinMatches).count())
    spark.stop()
  }
}
