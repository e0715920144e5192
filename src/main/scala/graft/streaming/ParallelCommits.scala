package graft.streaming

/** Run two INDEPENDENT Spark actions concurrently (optimization guide
  * §2.6 — "overlap independent jobs"): a maintenance trigger's
  * store-commit and sidecar-commit touch disjoint TxTables, so their
  * jobs can back-fill each other's scheduler gaps instead of paying
  * two serial job launches per trigger (and the periodic compactions
  * likewise). Both branches JOIN before returning, so the
  * commit-before-return contract of the serial form is unchanged; a
  * failure in either propagates (appendOnce tags make any replay
  * exactly-once, exactly as under the serial form's partial-failure
  * window — a crash between the two serial commits already left one
  * landed and one not).
  */
private[graft] object ParallelCommits {
  def inParallel[A, B](fa: => A, fb: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[B] {
        override def call(): B = fb
      })
      val a = fa
      val b =
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      (a, b)
    } finally pool.shutdown()
  }
}
