package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: time minLabel ALONE (fixed edge frame, 8 iters) — the
  * r22 unroll A/B instrument; not part of the shipped library. */
object ProbeLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    println(f"[canary] pre: ${PhaseCanary.measure()}%.3f s")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val e0 = graft.Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = graft.operators.GraphQueries.minLabel(spark, edges, 8).count()
      println(f"loop8 run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
    }
    spark.stop()
    println(f"[canary] post: ${PhaseCanary.measure()}%.3f s")
  }
}
