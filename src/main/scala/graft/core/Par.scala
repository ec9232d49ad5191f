package graft.core

/** Overlap independent Spark actions (guide §2.6): actions are only
  * sequential because driver code calls them sequentially; submitting
  * independent jobs from a small thread pool lets the scheduler
  * back-fill executors freed by one job's tail with the next job's
  * tasks — and, just as important at fixture scale, overlaps the
  * per-action DRIVER cost (analysis, planning, AQE stage coordination)
  * that otherwise serializes a lifecycle of hundreds of small jobs.
  *
  * Used only for actions with NO data dependency and disjoint output
  * paths (different index artifacts); results are unchanged by
  * construction. Rethrows the first failure after cancelling the rest.
  */
object Par {
  def run(fs: (() => Unit)*): Unit = {
    if (fs.sizeIs <= 1) { fs.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    try {
      val futs = fs.map { f =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = f()
        })
      }
      futs.foreach { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally { pool.shutdownNow(): Unit }
  }
}
