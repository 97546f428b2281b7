package graft

import graft.gen.ChangeGen
import graft.pipeline.CdcPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's partition-expansion system test
  * (system_test/run.py:259-329): a topic grows from 1 to 3 partitions
  * mid-stream. New partitions appearing between micro-batches must grow the
  * lake watermark map and the journal's manifest partitions object, and the
  * final per-partition state must equal the LWW oracle — no events lost or
  * misattributed around the expansion point.
  */
class PartitionExpandSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("partitions appearing mid-stream grow watermarks, journal map, and state") {
    // phase A: only partition 0 exists; phase B: partitions 0-2 (offsets
    // continue from A for partition 0, start at 0 for the new ones — exactly
    // Kafka's behavior when a topic is expanded)
    val phaseA = ChangeGen.changes(spark, 600, nKeys = 60, partitions = 1,
      seed = 7L)
    val phaseB1 = ChangeGen.changes(spark, 600, nKeys = 60, partitions = 1,
      seed = 11L, startOffset = 600L)
    val phaseB23 = ChangeGen.changes(spark, 800, nKeys = 120, partitions = 2,
      seed = 13L)
      .withColumn("partition", col("partition") + 1) // partitions 1 and 2
      // partition-local keys: ChangeGen deals keys per partition, but after
      // the shift they would collide with partition 0's keyspace — prefix
      // them so the key→partition contract holds across the union
      .withColumn("repo", concat(lit("new-"), col("repo")))
    val phaseB = phaseB1.unionByName(phaseB23)

    val root = SparkTestSession.tempDir("pexpand")
    val p = new CdcPipeline(spark, s"$root/journal", s"$root/lake",
      chunkBytes = 4096, subBuckets = 4)

    p.applyBatch(phaseA, 0L)
    assert(p.lake.watermarks().keySet === Set(0), "only partition 0 before expansion")
    assert(p.journal.nextOffsets().keySet === Set(0))

    p.applyBatch(phaseB, 1L)
    assert(p.lake.watermarks().keySet === Set(0, 1, 2),
      "watermark map must gain the new partitions")
    assert(p.journal.nextOffsets().keySet === Set(0, 1, 2),
      "journal manifest partitions object must gain the new partitions")

    // per-partition watermarks: continued for 0, fresh for 1 and 2
    val wm = p.lake.watermarks()
    assert(wm(0) === 1199L)
    assert(wm(1) === 399L && wm(2) === 399L)

    // final state equals the LWW oracle over the full expanded log
    val all = phaseA.unionByName(phaseB)
    val got = p.lake.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"), col("offset"))
    val want = ChangeGen.oracleFinalState(all)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"), col("offset"))
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)

    // journal replay sees every partition's suffix, including the new ones
    val replay = p.journal.readFrom(Map(0 -> 1000L, 1 -> 99L))
      .groupBy("partition").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(replay(0) === 199L, "partition 0 resumes past 1000")
    assert(replay(1) === 300L, "partition 1 resumes past 99")
    assert(replay(2) === 400L, "partition 2 (never committed) replays fully")
  }
}
