package graft

import graft.gen.ChangeGen
import graft.pipeline.CdcPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Failure semantics of the concurrent journal ∥ merge pair: when one side
  * fails, applyBatch settles BOTH before throwing, and a retry of the same
  * batchId finds the succeeded side fenced and the failed side ready — the
  * exactly-once claim under partial failure, in either direction.
  */
class PipelineFailureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("merge failure + retry: journal is fenced, lake catches up") {
    val changes = ChangeGen.changes(spark, 800, nKeys = 80, partitions = 4)
    val p = new CdcPipeline(spark, SparkTestSession.tempDir("pfj"),
      SparkTestSession.tempDir("pfl"), chunkBytes = 4096, subBuckets = 4)

    // batch 0 is journal-valid (meta trio present) but merge-invalid (the
    // lake needs the (repo, path) key): merge fails, journal succeeds
    val bad = changes.drop("repo", "path")
    intercept[Throwable](p.applyBatch(bad, 0L))
    assert(p.journal.lastBatchId === 0L, "journal side must have committed")
    assert(p.lake.lastBatchId === -1L, "lake side must NOT have committed")

    // the "fixed" redelivery of batch 0: journal append is a fenced no-op
    // (its offset gate would also dedup), the lake applies
    p.applyBatch(changes, 0L)
    assert(p.lake.lastBatchId === 0L)
    assert(p.journal.read().count() === 800L)
    assert(p.journal.read().groupBy("partition", "offset").count()
      .filter(col("count") > 1).count() === 0L, "no duplicate journal rows")

    val got = p.lake.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want = ChangeGen.oracleFinalState(changes)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  private def journalParquets(root: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(root))
  }

  private def assertLakeMatchesOracle(p: CdcPipeline,
      changes: org.apache.spark.sql.DataFrame): Unit = {
    val got = p.lake.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want = ChangeGen.oracleFinalState(changes)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("kill between batch commit and maintenance: restart converges, replay maintenance is a no-op") {
    // the commit→maintenance window claimed idempotent in CdcPipeline's
    // comments, now crash-tested at the pipeline level: the process dies
    // AFTER a batch's data commits but BEFORE its retention cadence runs
    val changes = ChangeGen.changes(spark, 800, nKeys = 80, partitions = 4,
      deletePct = 10)
    val jr = SparkTestSession.tempDir("mkj")
    val lr = SparkTestSession.tempDir("mkl")
    val policy = graft.pipeline.RetentionPolicy(everyNBatches = 1,
      journalGraceMs = 0L, vacuumKeepLast = 1, orphanGraceMs = 0L)
    val p = new CdcPipeline(spark, jr, lr, chunkBytes = 4096, subBuckets = 4,
      retention = Some(policy))

    // die at batch 1's cadence hit (InterruptedException is NOT NonFatal,
    // so it escapes the maintenance catch exactly as a kill would)
    CdcPipeline.maintenanceHook =
      id => if (id == 1L) throw new InterruptedException("injected kill")
    try intercept[InterruptedException](p.runBatches(changes, 4))
    finally CdcPipeline.maintenanceHook = _ => ()

    // (a) no data loss: both sides of batch 1 committed before the kill...
    assert(p.journal.lastBatchId === 1L && p.lake.lastBatchId === 1L)
    // ...but its maintenance never ran, so already-merged journal bytes
    // survive (batch 0's cadence reclaimed ITS files; batch 1's are due)
    assert(journalParquets(jr) > 0, "cleanup must be pending after the kill")

    // (b) restart: batch 1 replays as a fenced no-op whose cadence hit runs
    // the deferred maintenance; batches 2-3 then apply normally
    p.runBatches(changes, 4, replayFrom = 1L)
    assert(journalParquets(jr) === 0, "deferred cleanup must converge")
    assertLakeMatchesOracle(p, changes)

    // (c) a replayed batch re-running maintenance is a no-op: same lake
    // version, still-empty journal, same final state
    val vBefore = p.lake.currentVersion
    p.runBatches(changes, 4, replayFrom = 3L)
    assert(p.lake.currentVersion === vBefore)
    assert(journalParquets(jr) === 0)
    assertLakeMatchesOracle(p, changes)
  }

  test("transient maintenance IO failure defers cleanup without failing the batch") {
    // maintenance is deferrable by design: a NonFatal failure inside the
    // retention pass must log-and-defer, never kill the stream (the batch's
    // own commits already landed) — the next cadence hit converges
    val changes = ChangeGen.changes(spark, 600, nKeys = 60, partitions = 4)
    val jr = SparkTestSession.tempDir("mtj")
    val lr = SparkTestSession.tempDir("mtl")
    val policy = graft.pipeline.RetentionPolicy(everyNBatches = 1,
      journalGraceMs = 0L, vacuumKeepLast = 1, orphanGraceMs = 0L)
    val p = new CdcPipeline(spark, jr, lr, chunkBytes = 4096, subBuckets = 4,
      retention = Some(policy))

    var hits = 0
    CdcPipeline.maintenanceHook = id => {
      hits += 1
      if (id == 0L) throw new java.io.IOException("injected transient store failure")
    }
    // batch 0's maintenance fails (caught); batch 1's succeeds and reclaims
    // BOTH batches' journal files (watermarks are cumulative)
    try p.runBatches(changes, 2)
    finally CdcPipeline.maintenanceHook = _ => ()
    assert(hits === 2, "both cadence hits must have run")
    assert(p.lake.lastBatchId === 1L, "the failed maintenance must not fail the batch")
    assert(journalParquets(jr) === 0, "the next cadence hit must converge")
    assertLakeMatchesOracle(p, changes)
  }

  test("an invariant violation in maintenance escalates immediately") {
    // deferral is for TRANSIENT failures; corrupt metadata / broken chains
    // (require, IllegalState) would fail identically every cadence hit
    // forever while history leaks — they must kill the stream at once
    val changes = ChangeGen.changes(spark, 300, nKeys = 40, partitions = 2)
    val policy = graft.pipeline.RetentionPolicy(everyNBatches = 1,
      journalGraceMs = 0L, vacuumKeepLast = 1, orphanGraceMs = 0L)
    val p = new CdcPipeline(spark, SparkTestSession.tempDir("mti-j"),
      SparkTestSession.tempDir("mti-l"), chunkBytes = 4096, subBuckets = 2,
      retention = Some(policy))
    CdcPipeline.maintenanceHook =
      _ => throw new IllegalStateException("injected broken manifest chain")
    val e = try intercept[IllegalStateException](p.runBatches(changes, 1))
            finally CdcPipeline.maintenanceHook = _ => ()
    assert(e.getMessage.contains("injected"))
    assert(p.lake.lastBatchId === 0L,
      "the batch's own commits landed before maintenance — they must stay")
  }

  test("persistent 'transient' maintenance failure escalates after N hits") {
    val changes = ChangeGen.changes(spark, 600, nKeys = 60, partitions = 2)
    val policy = graft.pipeline.RetentionPolicy(everyNBatches = 1,
      journalGraceMs = 0L, vacuumKeepLast = 1, orphanGraceMs = 0L)
    val p = new CdcPipeline(spark, SparkTestSession.tempDir("mtn-j"),
      SparkTestSession.tempDir("mtn-l"), chunkBytes = 4096, subBuckets = 2,
      retention = Some(policy))
    var hits = 0
    CdcPipeline.maintenanceHook = _ => {
      hits += 1
      throw new java.io.IOException("injected persistent store failure")
    }
    // hits 1..N-1 defer with a WARN; hit N escalates — the defer contract
    // has demonstrably not converged and history would leak unbounded
    val e = try intercept[IllegalStateException](p.runBatches(changes, 4))
            finally CdcPipeline.maintenanceHook = _ => ()
    assert(e.getMessage.contains("consecutive"))
    assert(hits === graft.pipeline.CdcPipeline.maxMaintenanceFailures)
  }
}
