package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler for the q44/q55 cost centers (not part of the
  * library surface; invoked manually while optimizing). */
object Profile55 {
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
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import org.apache.spark.sql.functions._
    import graft.Tables._
    import graft.operators.LlmQueries

    // warm
    graft.SparkEntry.entry(spark).count()

    val docs = tWide(spark, sfDir, "documents")
    time("q55 full")(
      graft.operators.SimilarityQueries.queries("q55_ngram_jaccard")(spark, sfDir).count())
    spark.catalog.clearCache()
    time("q44 full")(
      LlmQueries.queries("q44_dedup_near")(spark, sfDir).count())
    spark.catalog.clearCache()

    // q55 stage breakdown
    val h62 = (c: org.apache.spark.sql.Column) =>
      graft.plans.GraftExpressions.poly_hash(c, 131) * 2147483648L +
        graft.plans.GraftExpressions.poly_hash(c, 137)
    val arrs = docs.select(col("doc_id"),
      transform(LlmQueries.shingles(col("text"), 3), sg => h62(sg)).as("arr"))
    time("arrs materialize")(arrs.cache().count())
    val sh = arrs.select(col("doc_id"),
      size(col("arr")).cast("long").as("n"), explode(col("arr")).as("h"))
    time("explode+dfreq")(sh.groupBy("h").agg(count(lit(1)).as("df")).count())
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("df", "h")
    val prefix = sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(wDoc).cast("long"))
      .filter(col("rn") <= floor(col("n") * 0.5) + 1)
      .select("doc_id", "h", "rn", "n")
    time("prefix (1 window)")(prefix.count())
    val pa = prefix.toDF("doc_a", "h", "rn_a", "n_a")
    val pb = prefix.toDF("doc_b", "h2", "rn_b", "n_b")
    val candRaw = pa.join(pb,
      col("h") === col("h2") && col("doc_a") < col("doc_b") &&
      col("n_b") * 2 >= col("n_a") && col("n_b") <= col("n_a") * 2)
      .filter(lit(1L) +
        least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
        ceil((col("n_a") + col("n_b")) / lit(3.0)))
    time("cand rows post-filter")(candRaw.count())
    // counterfactual only — production q55 does NOT dedup before verify
    time("cand distinct (counterfactual)")(
      candRaw.select("doc_a", "doc_b").distinct().count())
    // production shape: verify every candidate occurrence
    time("pair verify (occurrences)")(candRaw.select("doc_a", "doc_b")
      .join(arrs.toDF("doc_a", "arr_a"), "doc_a")
      .join(arrs.toDF("doc_b", "arr_b"), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .filter(col("inter") > 0).count())
    spark.stop()
  }
}
