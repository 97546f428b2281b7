package graft

import graft.lake.MetaIO
import org.scalatest.funsuite.AnyFunSuite

/** The shared driver-side metadata pool: order preservation, failure
  * semantics (cancel the queued remainder, JOIN the in-flight), and the
  * re-entrancy guard. The join property is what protects a merge retry
  * from a zombie promote still racing the same destination paths.
  */
class MetaIOSpec extends AnyFunSuite {

  test("results preserve input order across the pool") {
    val out = MetaIO.fetchAll((1 to 100).toSeq)(i => i * 2)
    assert(out === (1 to 100).map(_ * 2))
  }

  test("a failure joins in-flight tasks before rethrowing") {
    val slowDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val slowStarted = new java.util.concurrent.CountDownLatch(1)
    val e = intercept[RuntimeException] {
      MetaIO.fetchAll(Seq("bad", "slow")) {
        case "bad" =>
          // fail only once the slow task is genuinely in flight
          slowStarted.await()
          throw new RuntimeException("boom")
        case "slow" =>
          slowStarted.countDown()
          Thread.sleep(300)
          slowDone.set(true)
          "ok"
      }
    }
    assert(e.getMessage === "boom")
    assert(slowDone.get(),
      "fetchAll must not rethrow while a task is still running — a caller " +
        "retrying against the same paths would race the zombie")
  }

  test("a failure cancels the queued remainder") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    // pool is 8 wide; 2000 queued items behind an instant failure must be
    // (mostly) cancelled, not burned through
    intercept[RuntimeException] {
      MetaIO.fetchAll((0 until 2000).toSeq) { i =>
        ran.incrementAndGet()
        if (i == 0) throw new RuntimeException("first fails")
        Thread.sleep(1)
        i
      }
    }
    assert(ran.get() < 2000, s"queued remainder must be cancelled (ran ${ran.get()})")
  }

  test("re-entrant fetchAll runs inline instead of deadlocking the pool") {
    // 16 outer items over an 8-thread pool, each nesting another fetchAll:
    // without the guard all 8 threads block on futures queued behind
    // themselves; with it the nested call runs inline on the pool thread
    val out = MetaIO.fetchAll((0 until 16).toSeq) { i =>
      MetaIO.fetchAll(Seq(i, i + 100))(_ * 10).sum
    }
    assert(out === (0 until 16).map(i => i * 10 + (i + 100) * 10))
  }
}
