package graft.lake

/** Shared bounded pool for driver-side metadata fan-out (sharded-checkpoint
  * resolution, archive index listings): on an object store each item is a
  * small GET, and serial driver reads would bottleneck the listing. One
  * daemon pool for the JVM — not per call site — with the
  * ExecutionException-unwrapping fetch loop in one place. Result order
  * follows input order, so callers stay deterministic.
  */
object MetaIO {
  lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(8,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-meta-io-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })

  def fetchAll[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    // Re-entrancy guard: a callback that itself calls fetchAll (e.g. an
    // archive listing resolving per-file metadata) would otherwise deadlock
    // the fixed pool — all 8 threads blocking on futures queued behind
    // themselves. On a pool thread, run inline instead: correctness is
    // identical (order preserved), and the outer call already owns the
    // parallelism.
    if (Thread.currentThread().getName.startsWith("graft-meta-io"))
      return items.map(f)
    // abort + inFlight give failure semantics Future.cancel alone cannot:
    // cancel(false) on a RUNNING FutureTask still flips it to
    // CANCELLED/isDone while the callable keeps executing, so isDone is
    // useless as a join. Instead: a callable first registers in-flight,
    // then checks abort BEFORE doing any work — after a failure, every
    // registered callable is awaited, and any callable that slips past the
    // cancels afterward sees abort and exits without touching anything.
    val abort = new java.util.concurrent.atomic.AtomicBoolean(false)
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val futs = items.map { a =>
      pool.submit(new java.util.concurrent.Callable[B] {
        def call(): B = {
          inFlight.incrementAndGet()
          try {
            if (abort.get)
              throw new java.util.concurrent.CancellationException("sibling failed")
            f(a)
          } finally inFlight.decrementAndGet(): Unit
        }
      })
    }
    try futs.map { fu =>
      try fu.get()
      catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
    } catch {
      case t: Throwable =>
        // stop the queued remainder: a 5000-item fan-out that fails on
        // item 3 must not keep burning the SHARED pool (and starving other
        // subsystems) on thousands of doomed GETs. No interrupt: callbacks
        // are filesystem ops that should end at their own boundary.
        abort.set(true)
        futs.foreach(_.cancel(false): Unit)
        // JOIN the in-flight ones before rethrowing: callers retry against
        // the same paths (e.g. a merge retry re-promoting into the same
        // staging dir and deterministic destinations), and a zombie
        // callback racing that retry could delete/rename under its feet.
        // Bounded like the old per-call pool's awaitTermination.
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var interrupted = false
        while (!interrupted && inFlight.get() > 0 && System.nanoTime() < deadline)
          try Thread.sleep(5)
          catch {
            // an interrupt must not REPLACE the original failure `t` (the
            // root cause the caller needs) nor silently vanish: record it,
            // stop the join (the interrupter wants us gone), restore the
            // flag for the caller's own interrupt handling, rethrow t
            case _: InterruptedException =>
              interrupted = true
              Thread.currentThread().interrupt()
          }
        throw t
    }
  }
}
