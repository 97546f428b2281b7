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
}
