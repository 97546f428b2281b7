package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, batch-decoded per partition.
  *
  * The actual media codecs are not present in this container, so the decode
  * kernel is a clearly marked deterministic STUB (md5-derived dimensions).
  * Everything around it — the schema, the binary column, the typed Dataset,
  * the mapPartitions batching (one decoder instance per partition, streamed
  * rows, bounded memory), the partition-count control — is the real
  * production shape: swap `decodeKernel` for a JNI/ffmpeg/libvips call and
  * nothing else changes.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      modality: String,       // "image" | "audio" | "video" | "text"
      payload: Array[Byte])   // opaque encoded bytes

  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,             // stubbed decode output
      height: Int,
      duration_ms: Long,
      sha_prefix: String)     // content fingerprint (first 16 hex of sha-256)

  /** STUB decode kernel — deterministic fake standing in for the real
    * library call. Real implementation: initialize the decoder once per
    * partition (expensive), then stream records through it.
    */
  private def decodeKernel(rec: MediaRecord,
      md: java.security.MessageDigest): MediaFeatures = {
    md.reset()
    val digest = md.digest(rec.payload)
    val hex = digest.take(8).map(b => f"$b%02x").mkString
    // ??? <- real decoder goes here; fake dims derived from the digest
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    MediaFeatures(
      rec.doc_id, rec.modality, rec.payload.length.toLong,
      width = (Math.floorMod(h, 1920L) + 1L).toInt,
      height = (Math.floorMod(h / 1920L, 1080L) + 1L).toInt,
      duration_ms = if (rec.modality == "image") 0L else Math.floorMod(h, 600000L),
      sha_prefix = hex)
  }

  /** Batch feature extraction: one kernel instance per partition, streaming.
    * (The Scala Dataset analogue of PySpark's mapInPandas batches.)
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init: ONE decoder instance reused for every record
      // (the real version initializes the codec/model weights here)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map(rec => decodeKernel(rec, md))
    }
  }

  /** Build a MediaRecord dataset from the documents table: text payloads as
    * bytes, modality assigned deterministically (the container has no real
    * media; shape over content).
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        element_at(lit(Array("image", "audio", "video", "text")),
          (pmod(col("doc_id"), lit(4L)) + 1).cast("int")).as("modality"),
        // null text ⇒ empty payload, not a null array the kernel would NPE
        // on (the same null contract as mm_frame_sample's coalesce — both
        // sides of the gate treat a null document as zero bytes)
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Feature table with per-modality partitioning — the layout a 100 TB
    * multimodal corpus wants (modality-partitioned scans, binary payloads
    * kept out of the feature table).
    */
  def featureTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // modality-clustered layout in ~4 partitions: range partitioning keeps
    // each modality contiguous (hash into 4 could collide two modalities
    // into one partition and leave others empty; into the default shuffle
    // count it would leave ~all tasks empty). Repartition BEFORE the
    // kernel: repartitionByRange runs a boundary-sampling job over its
    // child, and placed after extractFeatures that would execute the
    // expensive decode twice per record — here sampling touches only the
    // cheap doc_id-derived input.
    extractFeatures(
      fromDocuments(spark, dir).repartitionByRange(4, col("modality"))
        .as[MediaRecord]).toDF()
  }
}
