package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Multi-core box-phase canary (VERDICT r18 item 3).
  *
  * This box swings ~1.5–1.8× on MULTI-core JVM throughput over tens of
  * minutes with loadavg < 0.5 and steal ~0.1% (SURVEY §6b r18 bisect:
  * the same commit measured q198 at 1.4–1.8 s and 2.5–2.9 s fifteen
  * minutes apart, fresh JVMs, idle box) — and a single-thread canary
  * reads CONSTANT across phases, so the stamp must be multi-core.
  *
  * Fixed work — [[Threads]] threads × [[ItersPerThread]] splitmix64
  * steps, independent of the box's CPU count and of any Spark conf —
  * so the seconds are directly comparable across captures and rounds.
  * Calibrated 2026-08-16: 1.7–2.1 s on this 32-CPU box (phase at
  * calibration time unknown; the ~1.7× phase signal reads well above
  * that within-run jitter). A slow phase reads proportionally higher. The accumulator drains into an
  * AtomicLong so the JIT cannot dead-code the loop.
  *
  * Used by [[graft.Bench]] (stamps `phase_canary` / `phase_canary_end`
  * into the capture JSON next to load_avg) and [[KeyBench]] (pre/post
  * lines, so fresh-JVM adjudication runs carry their phase context).
  * Dev-side instrumentation — NOT part of the shipped library.
  */
object PhaseCanary {
  val Threads = 16
  val ItersPerThread = 2000000000L
  private val sink = new AtomicLong(0L)

  /** Run the fixed workload; returns wall-clock seconds (lower = faster
    * phase). */
  def measure(): Double = {
    val t0 = System.nanoTime()
    val threads = (1 to Threads).map { i =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L * i
        var acc = 0L
        var n = ItersPerThread
        while (n > 0) {
          x += 0x9E3779B97F4A7C15L
          var z = x
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          acc ^= z ^ (z >>> 31)
          n -= 1
        }
        sink.addAndGet(acc)
      })
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Standalone: `runMain graft.tools.PhaseCanary [n]` prints n
    * measurements — the direct phase probe for adjudication sessions. */
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1)
    (1 to n).foreach { i =>
      println(f"[canary] run $i: ${measure()}%.3f s")
    }
  }
}
