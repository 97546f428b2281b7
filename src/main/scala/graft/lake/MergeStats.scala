package graft.lake

import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, TimeUnit}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Delivery plumbing for merge's `observe`-mode stats with a BOUNDED
  * footprint — the replacement for `org.apache.spark.sql.Observation`,
  * whose listener has no public unregister and therefore leaked one stale
  * `QueryExecutionListener` per starved observation (r5 verdict, "what's
  * wrong" #1: acceptable while non-default, a leak if observe mode ever
  * becomes the default for parquet-backed batches, where it measured ~2%
  * faster).
  *
  * Shape: `Dataset.observe(name: String, exprs…)` attaches a named
  * CollectMetrics node WITHOUT registering anything; ONE shared routing
  * listener per SparkSession (not per observation — registered lazily on
  * first use, tracked weakly so it dies with the session) copies each
  * completed query's `observedMetrics` into the one-slot handoff of
  * whoever declared interest in that name. `await` removes the handoff on
  * EVERY exit path — timeout included — so N starved merges leave zero
  * residue: `pendingCount` returns to 0 and `listenerCount` stays at the
  * number of live sessions, both spec-pinned (LakeSpec).
  */
object MergeStats {
  // observation name → one-slot handoff. Bounded by in-flight merges: every
  // expect() is paired with an await() whose finally removes the entry.
  private val pending = new ConcurrentHashMap[String, ArrayBlockingQueue[Row]]()

  // sessions that already carry the routing listener. Weak keys: a session
  // that becomes unreachable drops out (its listener bus died with it), so
  // long-running processes cycling sessions don't accumulate entries.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private object Router extends QueryExecutionListener {
    private def route(qe: QueryExecution): Unit =
      // a query carrying none of our names routes nothing; offer() on an
      // already-satisfied slot (duplicate delivery) is a harmless false
      try qe.observedMetrics.foreach { case (name, row) =>
        Option(pending.get(name)).foreach(_.offer(row): Unit)
      } catch { case scala.util.control.NonFatal(_) => () }
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = route(qe)
    // onFailure delivers a FAILED query's partial metrics — routing them
    // could satisfy a pending slot with stats that never committed, and the
    // merge path's discard-before-await would mask it only by luck. Failed
    // queries route nothing; their callers discard the handoff and fall
    // back to the stats scan.
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Declare interest in observation `name`, delivered on `session`'s
    * listener bus. MUST run before the observed query's action: metrics
    * arriving for an undeclared name are dropped (that is the bounded-ness).
    */
  def expect(session: SparkSession, name: String): Unit = {
    pending.putIfAbsent(name, new ArrayBlockingQueue[Row](1)): Unit
    registered.synchronized {
      if (!registered.containsKey(session)) {
        session.listenerManager.register(Router)
        registered.put(session, java.lang.Boolean.TRUE): Unit
      }
    }
  }

  /** Block (bounded) for `name`'s metrics row. The entry is removed on
    * every exit path, so a starved wait leaves no residue — the caller owns
    * the loud fallback.
    */
  def await(name: String, timeoutMs: Long): Option[Row] = {
    val q = pending.get(name)
    require(q != null, s"await('$name') without a prior expect()")
    try Option(q.poll(timeoutMs, TimeUnit.MILLISECONDS))
    finally pending.remove(name): Unit
  }

  /** Drop a declared interest without waiting — the failure-path cleanup
    * for callers whose observed query threw before `await` could run.
    * Idempotent with await's own removal.
    */
  def discard(name: String): Unit = pending.remove(name): Unit

  /** spec hooks: residue counters the hygiene contract pins */
  def pendingCount: Int = pending.size()
  def listenerCount: Int = registered.size()
}
