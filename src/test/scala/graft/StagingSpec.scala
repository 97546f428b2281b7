package graft

import graft.queries.Staging
import org.scalatest.funsuite.AnyFunSuite

/** The staging root must be configurable (shared-FS on a cluster) and must
  * not leak across JVMs: each run's tree is pid-scoped, so without the
  * maintenance pass every Verify/Bench JVM would orphan its full footprint.
  */
class StagingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("configurable root; stale sibling trees reap; own tree survives") {
    val base = SparkTestSession.tempDir("stagingroot")
    spark.conf.set("spark.graft.staging.root", base)
    try {
      // a crashed (dead-pid, old-mtime) run's leftover tree
      val stale = new java.io.File(base, "graft-stage-987654321")
      assert(new java.io.File(stale, "x").mkdirs())
      assert(stale.setLastModified(System.currentTimeMillis() - 25L * 3600 * 1000))
      Staging.reapNowForTests(spark)
      val d = Staging.dir(spark, "t1")
      assert(d.startsWith(base), "dir must live under the configured root")
      assert(!stale.exists(), "stale dead-pid tree must be reaped")
      assert(new java.io.File(d).isDirectory, "own tree untouched by the reap")

      // cached(): not ready until marked, then reused without wiping
      val (c1, ready1) = Staging.cached(spark, "fixture")
      assert(!ready1)
      val probe = new java.io.File(c1, "probe")
      assert(probe.createNewFile())
      Staging.markReady(spark, c1)
      val (c2, ready2) = Staging.cached(spark, "fixture")
      assert(ready2 && c2 == c1 && probe.exists(), "ready fixture is reused intact")

      // dir() on the same tag wipes
      Staging.dir(spark, "t1")
      assert(new java.io.File(d).listFiles().forall(_ == null) ||
        new java.io.File(d).listFiles().isEmpty)
    } finally spark.conf.unset("spark.graft.staging.root")
  }
}
