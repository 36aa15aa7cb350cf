package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for q44_dedup_near (VERDICT r2 item 1): where
  * do the 36 s go — signature build, band join, distinct, or verify? */
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
    import LlmQueries.{shingles, permHash}

    graft.SparkEntry.entry(spark).count() // warm

    println("load_avg=" + java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage)

    val docs = tWide(spark, sfDir, "documents")
    time("q44 full")(
      LlmQueries.queries("q44_dedup_near")(spark, sfDir).count())
    spark.catalog.clearCache()

    // stage breakdown
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

    val NumBands = 8; val RowsPerBand = 4
    val bands = sigC
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(NumBands - 1))).as("b"))
      .select(col("doc_id"), col("b"),
        concat_ws(",", slice(col("sig"), col("b") * RowsPerBand + 1,
          lit(RowsPerBand))).as("bkey"))
    time("bands")(bands.count())
    val ba = bands.toDF("doc_a", "b_a", "key_a")
    val bb = bands.toDF("doc_b", "b_b", "key_b")
    val candRaw = ba.join(bb,
      col("b_a") === col("b_b") && col("key_a") === col("key_b") &&
      col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    time("cand occurrences")(candRaw.count())
    time("cand distinct")(candRaw.distinct().count())
    val cand = candRaw.distinct()
    val sa = sigC.toDF("doc_a", "sig_a")
    val sb = sigC.toDF("doc_b", "sig_b")
    time("verify zip_with (current)")(
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(filter(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => x === y), p => p)).cast("long").as("match_cnt"))
        .filter(col("match_cnt") >= 26).count())
    spark.stop()
  }
}
