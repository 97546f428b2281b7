package graft

import graft.model.ChangeEvent
import graft.streaming.OffsetGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState monotonic offset gate: at-least-once redelivery in,
  * exactly-once out, state survives across micro-batches (the reference's
  * in-memory max-offset map, S3SourceTask.java:198-207, held in checkpointed
  * group state instead).
  */
class OffsetGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ev(partition: Int, offset: Long): ChangeEvent =
    ChangeEvent(partition, offset, "upsert", s"repo-$partition", s"f$offset",
      "c" * 40, "scala", s"content-$partition-$offset")

  test("redelivered and regressed offsets are dropped across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[ChangeEvent]
    val q = OffsetGate.dedup(mem.toDS())
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      // batch 0: clean delivery on two partitions
      mem.addData(ev(0, 1), ev(0, 2), ev(1, 10), ev(1, 11))
      q.processAllAvailable()
      // batch 1: full redelivery of batch 0 (crash-retry) + fresh tail;
      // partition 1 also regresses to an old offset mid-stream
      mem.addData(ev(0, 1), ev(0, 2), ev(0, 3), ev(1, 10), ev(1, 12), ev(1, 11))
      q.processAllAvailable()

      val got = spark.table("gate_out").as[ChangeEvent].collect()
        .map(e => (e.partition, e.offset)).sorted.toSeq
      assert(got === Seq((0, 1L), (0, 2L), (0, 3L), (1, 10L), (1, 11L), (1, 12L)))
    } finally q.stop()
  }

  test("batch mode: within-batch arrival order does not matter, dups drop") {
    import spark.implicits._
    // shuffle fetch order is arbitrary — the gate re-sorts per group, so the
    // out-of-order offset 4 is fresh data (admitted), the repeat of 5 is a
    // duplicate (dropped)
    val in = Seq(ev(0, 5), ev(0, 5), ev(0, 6), ev(0, 4), ev(2, 1)).toDS()
    val got = OffsetGate.dedup(in).collect().map(e => (e.partition, e.offset)).sorted.toSeq
    assert(got === Seq((0, 4L), (0, 5L), (0, 6L), (2, 1L)))
  }
}
