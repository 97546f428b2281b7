package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Ingest observability — the Spark-native stand-in for the reference's
  * Metrics SPI (common/.../Metrics.java:10-44 meter/hist/gauge/time, Datadog
  * impl metrics/datadog/.../DatadogMetrics.java:30-158, per-topic/partition
  * tags S3SinkTask.java:180-183):
  *
  *   - [[IngestListener]]: a StreamingQueryListener capturing per-batch rows,
  *     processing time and rates from QueryProgressEvent — the engine-level
  *     meter.
  *   - [[perPartitionThroughput]]: per-partition events/sec and lag derived
  *     from the lake's lineage rows (batch × partition granularity), the
  *     "per-partition throughput, lag, lineage metrics" the north star names.
  */
final class IngestListener extends StreamingQueryListener {

  final case class BatchProgress(
      batchId: Long, numInputRows: Long, processedRowsPerSecond: Double,
      durationMs: Long)

  private val progress = new ConcurrentLinkedQueue[BatchProgress]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    // batch wall time is triggerExecution — it CONTAINS the other phases
    // (addBatch/getBatch/walCommit...), so summing the map double-counts
    val wall = Option(p.durationMs.get("triggerExecution")).map(_.longValue())
      .getOrElse(p.durationMs.values().asScala.map(_.longValue())
        .maxOption.getOrElse(0L))
    progress.add(BatchProgress(
      p.batchId, p.numInputRows,
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      wall))
  }

  def batches: Seq[BatchProgress] = progress.asScala.toSeq

  def totalRows: Long = batches.map(_.numInputRows).sum
}

object IngestMetrics {

  /** Per-partition throughput and lag from the lake's lineage table.
    * `lag` = newest offset anywhere minus this partition's high-water mark —
    * the replay-behindness signal a binlog tail monitors.
    */
  def perPartitionThroughput(
      spark: SparkSession, lineage: DataFrame, wallSeconds: Double): DataFrame = {
    val per = lineage.groupBy(col("partition"))
      .agg(sum(col("numEvents")).as("events"),
        sum(col("numUpserts")).as("upserts"),
        sum(col("numDeletes")).as("deletes"),
        max(col("lastOffset")).as("high_water"),
        countDistinct(col("batchId")).as("n_batches"))
    val highRow = lineage.agg(max(col("lastOffset"))).collect()(0)
    val globalHigh = if (highRow.isNullAt(0)) 0L else highRow.getLong(0) // empty lineage
    per
      .withColumn("events_per_sec",
        round(col("events").cast("double") / lit(math.max(wallSeconds, 1e-9)), 3))
      .withColumn("lag", lit(globalHigh) - col("high_water"))
  }
}
