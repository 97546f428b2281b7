package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The ingest boundary as a SEAM: where change events stream FROM is a
  * config-time choice, not a hard-wired call — the analogue of the
  * reference's task runtime, where the Kafka consumer/producer boundary is
  * owned by the Connect framework and the task only sees record batches
  * (sink/.../S3SinkTask.java:106-134, source/.../S3SourceTask.java:142-196).
  * A production user swaps [[FileTailSource]] for [[KafkaChangeSource]]
  * without touching the pipeline: both produce the same unbounded DataFrame
  * of change events (partition INT, offset LONG, op STRING + payload
  * columns), which CdcPipeline ingests via foreachBatch.
  */
trait ChangeSource {
  /** Build the streaming DataFrame of change events. */
  def load(spark: SparkSession): DataFrame
}

/** Tail a directory of parquet change-event files — the sandbox/test
  * boundary (no Kafka broker exists here), and a real deployment shape in
  * its own right (CDC drops landing as files on shared storage).
  */
final case class FileTailSource(
    dir: String,
    schema: StructType,
    maxFilesPerTrigger: Int = 10) extends ChangeSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
}

/** The production Kafka boundary: `format("kafka")` over a topic
  * subscription, the direct analogue of the reference sink's consumer
  * feed. The Kafka record's OWN (partition, offset) become the change
  * event's — exactly the reference's TopicPartition/offset model
  * (SURVEY.md §1.1) — and the record value is a JSON document carrying the
  * payload columns (op, repo, path, …), decoded against `schema` minus the
  * two meta columns.
  *
  * OPTIONAL at runtime: compiles against spark-sql alone (the format is
  * resolved by name), but running it requires the spark-sql-kafka connector
  * jars on the classpath — absent in this sandbox, so this impl is
  * exercised only for plan construction, never execution
  * (StreamingSpec covers the trait through FileTailSource end to end).
  */
final case class KafkaChangeSource(
    bootstrapServers: String,
    subscribe: String,
    schema: StructType,
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = None) extends ChangeSource {
  def load(spark: SparkSession): DataFrame = {
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", subscribe)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.foreach(n =>
      reader.option("maxOffsetsPerTrigger", n.toString): Unit)
    KafkaChangeSource.decodeKafkaFrame(reader.load(), schema)
  }
}

object KafkaChangeSource {
  /** The payload columns of a change-event schema: everything except the
    * two Kafka-record meta columns (partition, offset), which the broker
    * supplies.
    */
  def payloadSchema(schema: StructType): StructType = StructType(
    schema.fields.filterNot(f => f.name == "partition" || f.name == "offset"))

  /** The Kafka value-decode projection, factored off the streaming reader so
    * it runs against ANY DataFrame with kafka-shaped columns (`partition`
    * INT, `offset` LONG, `value` BINARY) — a static test frame here, the
    * connector's stream in production. This is the engine's converter
    * boundary, the role the reference delegates to its Connect converters
    * (valueConverter.toConnectData, source/.../S3SourceTask.java:184-187;
    * round-trip harness common/src/test/.../FormatTests.java:21-66): the
    * record's own (partition, offset) become the change event's, and the
    * JSON document in `value` carries the payload columns.
    *
    * Decode is SCHEMA'D (`from_json` against exactly the payload columns),
    * so it stays whole-stage-codegen'd and malformed documents surface as
    * nulls in typed columns, never as task crashes.
    */
  def decodeKafkaFrame(kafkaFrame: DataFrame, schema: StructType): DataFrame = {
    val payload = payloadSchema(schema)
    kafkaFrame
      .select(col("partition"), col("offset"),
        from_json(col("value").cast("string"), payload).as("_v"))
      .select((Seq(col("partition"), col("offset")) ++
        payload.fieldNames.toSeq.map(n => col(s"_v.$n").as(n))): _*)
  }
}
