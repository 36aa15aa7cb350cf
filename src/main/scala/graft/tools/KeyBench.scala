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
    // phase stamps (VERDICT r18 item 3): every fresh-JVM adjudication
    // run carries its own multi-core phase context, pre and post
    println(f"[canary] pre: ${PhaseCanary.measure()}%.3f s")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Bench (whose flags this tool adjudicates): index-build
      // pseudo-keys reading timestamp-bearing tables must compute the
      // same partition/bucket contents in a fresh-JVM pin as in the
      // flagged capture on a non-UTC box (ADVICE r20)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // bisect knob (r19 q163 adjudication): extra session confs as
    // "k=v;k=v" — lets an A/B run flip ONE conf per fresh JVM without
    // touching the key's code
    val spark = sys.env.get("SPARK_GRAFT_CONF")
      .map(_.split(';').filter(_.contains('=')))
      .getOrElse(Array.empty[String])
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        println(s"[keybench] conf $k=$v")
        b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // qNN_index_build pseudo-keys (Bench-only) are adjudicable too
    // (r20, VERDICT item 4: q57_index_build's flag needed a fresh-JVM
    // pin and KeyBench only knew SparkEntry keys)
    val work: () => Long = graft.SparkEntry.queries.get(key) match {
      case Some(fn) => () => fn(spark, sfDir).count()
      case None =>
        val fn = graft.Bench.indexBuilds(spark, sfDir).toMap.getOrElse(key,
          sys.error(s"unknown key $key: not in SparkEntry.queries or " +
            "Bench.indexBuilds"))
        () => { fn(); -1L }
    }
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = work()
      // rows appended AFTER the timing (existing parsers match on
      // "run N: X s") — output sizes are the adjudication currency
      // for the pair-emitting keys (VERDICT r18 item 6)
      println(f"$key run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
    println(f"[canary] post: ${PhaseCanary.measure()}%.3f s")
  }
}
