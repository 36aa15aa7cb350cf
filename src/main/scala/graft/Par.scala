package graft

/** Submit independent Spark jobs concurrently from a bounded driver
  * pool (guide §2.6 — overlap independent jobs so the next job's tasks
  * back-fill the slots the previous job's tail leaves idle).
  *
  * Failure discipline (ADVICE r21): on the first task failure the
  * remaining tasks are cancelled, the pool is shut down NOW, and the
  * stragglers are awaited BEFORE the exception propagates — a caller
  * that retries or vacuums the same base must never race a sibling
  * write that is still running. The rethrown exception is the REAL
  * cause, unwrapped from the pool's ExecutionException, so failure
  * reports name the actual Spark error. */
object Par {
  def run(maxThreads: Int)(tasks: Seq[() => Unit]): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(tasks.size, maxThreads))
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      var err: Throwable = null
      futs.foreach { f =>
        if (err == null) {
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              err = if (e.getCause != null) e.getCause else e
          }
        } else f.cancel(true)
      }
      if (err != null) throw err
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
    }
  }
}
