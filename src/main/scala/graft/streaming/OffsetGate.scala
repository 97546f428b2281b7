package graft.streaming

import graft.model.ChangeEvent
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful monotonic offset gate — the Structured Streaming re-expression of
  * the reference's forever-lived per-partition max-offset map
  * (source/.../S3SourceTask.java:96-105, 198-207: "need to maintain internal
  * offset state forever"; updateOffsets keeps the larger of stored vs seen).
  *
  * `flatMapGroupsWithState` keyed by partition holds exactly that state: one
  * Long per partition (bounded — the same O(partitions) footprint the
  * reference keeps), checkpointed by the streaming engine, surviving restarts.
  * Events at or below the high-water mark are dropped, which makes
  * at-least-once redelivery exactly-once downstream.
  *
  * This is the *operator-level* alternative to the lake's manifest watermarks
  * (LakeTable.merge dedups against persisted watermarks inside foreachBatch):
  * use the gate when the dedup must happen inside the streaming graph itself,
  * e.g. in front of a non-idempotent sink.
  */
object OffsetGate {

  /** Per-partition state: the highest offset admitted so far. */
  private def gate(
      partition: Int,
      events: Iterator[ChangeEvent],
      state: GroupState[Long]): Iterator[ChangeEvent] = {
    var hi = state.getOption.getOrElse(Long.MinValue)
    // The shuffle feeding groupByKey does NOT preserve source order, so the
    // group's events are re-sorted by offset before gating — otherwise a
    // fresh lower offset arriving after a higher one would be dropped as a
    // regression. Buffering one partition's slice of one micro-batch is the
    // same bound as the reference's put() buffer (S3SinkTask.java:106-118).
    val ordered = events.toArray.sortInPlaceBy(_.offset)
    val out = Vector.newBuilder[ChangeEvent]
    ordered.foreach { e =>
      if (e.offset > hi) { hi = e.offset; out += e }
    }
    if (state.getOption.forall(_ < hi)) state.update(hi)
    out.result().iterator
  }

  /** Gate a (streaming or batch) typed change-event Dataset. */
  def dedup(events: Dataset[ChangeEvent]): Dataset[ChangeEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.partition)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(gate)
  }
}
