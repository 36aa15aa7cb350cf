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
    // One replica stride = sf0.1's window set. MUST match gen_sf1.py's
    // STRIDE (10_000_000) — overridable for a stride change via env
    // (ADVICE r19: a silent generator stride change would quietly
    // unpin the window side). The assertion below makes a mismatch
    // loud regardless: the capped window count at every probed dir
    // must equal sf0.1's uncapped count.
    val stride = sys.env.getOrElse("PROBE_STRIDE", "10000000").toLong
    println(f"[canary] pre: ${PhaseCanary.measure()}%.3f s")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    val refWindows = graft.Tables.loadEvents(spark, "/root/testdata/sf0.1")
      .filter(col("event_id") % 199 === 0).count()
    for (dir <- dirs) {
      val capped = graft.Tables.loadEvents(spark, dir)
        .filter(col("event_id") % 199 === 0 && col("event_id") < stride)
        .count()
      require(capped == refWindows,
        s"[probe150] window-side pin broken at $dir: $capped capped " +
          s"windows vs sf0.1's $refWindows — stride $stride no longer " +
          "matches gen_sf1.py's STRIDE?")
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val rows = graft.operators.JoinQueries
          .streamIntervalAttribution(spark, dir,
            windowIdCap = Some(stride))
          .count()
        println(f"[probe150] $dir run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows windows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
    println(f"[canary] post: ${PhaseCanary.measure()}%.3f s")
  }
}
