package graft.tools
import org.apache.spark.sql.SparkSession

/** q150's one-side counter-probe (VERDICT r18 item 5; args: fixture
  * dirs, each timed n times). q150's sf3 SUPER flag (7–9×) was
  * adjudicated as both-sides pair-space growth by INHERITING batch
  * q10/q193's verdict — this probe measures it on the STREAMED path
  * itself (state-store / sink growth could hide there): the window
  * side is pinned to the sf0.1 set (window_id < one replica stride,
  * exactly the q193 fixed-dim discipline) while the streamed fact
  * side scales with the fixture. Linear-in-events runtime with fixed
  * windows = the streamed machinery adds no super-linear term of its
  * own. Each run prints seconds; PhaseCanary stamps carry the box
  * phase. Dev-side tooling — NOT part of the shipped library. */
object Probe150 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val n = sys.env.getOrElse("PROBE_N", "2").toInt
    println(f"[canary] pre: ${PhaseCanary.measure()}%.3f s")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val rows = graft.operators.JoinQueries
          .streamIntervalAttribution(spark, dir,
            windowIdCap = Some(10000000L)) // one replica stride = sf0.1's windows
          .count()
        println(f"[probe150] $dir run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows windows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
    println(f"[canary] post: ${PhaseCanary.measure()}%.3f s")
  }
}
