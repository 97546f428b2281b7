package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.lake.Json
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-level interop with the reference connector's on-disk archive: a
  * data file of CONCATENATED GZIP MEMBERS ("chunks", each a run of whole
  * newline-terminated records) plus a JSON chunk index that maps record
  * offsets to member byte ranges
  * (sink/src/main/java/com/spredfast/kafka/connect/s3/sink/BlockGZIPFileWriter.java:20-36).
  * The whole file still gunzips as one stream (gzip members concatenate),
  * while a reader can seek straight to the member containing a wanted
  * offset and decompress only that byte range — the ranged-GET resume the
  * reference does against object storage
  * (source/.../S3FilesReader.java:215-261).
  *
  * Naming matches the connector: `{base}-{firstOffset%012d}.gz` +
  * `{base}-{firstOffset%012d}.index.json` (BlockGZIPFileWriter.java:161-167),
  * where base is `{topic}-{partition%05d}`. Index JSON field order matches
  * the reference's serialized form byte for byte
  * (system_test/run.py:214-221 golden).
  *
  * Spark integration is CHUNK-grain: the driver reads only the index files
  * (metadata-scale), then fans each chunk's (byteOffset, byteLength) out as
  * a task row — every executor task seeks and decompresses exactly one
  * member's byte range, so a 100 TB archive parallelizes at ~chunkThreshold
  * granularity with no full-file scans and no shuffle.
  */
object GzArchive {

  /** one gzip member's index entry (json field names are the wire format) */
  final case class Chunk(
      firstRecordOffset: Long,
      numRecords: Long,
      byteOffset: Long,
      byteLength: Long,
      byteLengthUncompressed: Long)

  final case class Index(chunks: Seq[Chunk]) {
    /** compressed size of the data file = end of the last member */
    def totalSize: Long = chunks.lastOption.map(c => c.byteOffset + c.byteLength).getOrElse(0L)
    def lastOffset: Long =
      chunks.lastOption.map(c => c.firstRecordOffset + c.numRecords - 1).getOrElse(-1L)
    /** first chunk whose record range covers `offset`
      * (source/.../json/ChunksIndex.java chunkContaining) */
    def chunkContaining(offset: Long): Option[Chunk] =
      chunks.find(c => c.firstRecordOffset + c.numRecords > offset)
  }

  /** golden-order serialization: byte_length_uncompressed, num_records,
    * byte_length, byte_offset, first_record_offset — the order the
    * reference's jackson mapper emits (system_test/run.py:218 asserts this
    * exact string) */
  def indexJson(index: Index): String = {
    val root = Json.obj()
    val arr = Json.arr()
    index.chunks.foreach { c =>
      val o = Json.obj()
      o.put("byte_length_uncompressed", c.byteLengthUncompressed)
      o.put("num_records", c.numRecords)
      o.put("byte_length", c.byteLength)
      o.put("byte_offset", c.byteOffset)
      o.put("first_record_offset", c.firstRecordOffset)
      arr.add(o): Unit
    }
    root.set[com.fasterxml.jackson.databind.JsonNode]("chunks", arr)
    Json.mapper.writeValueAsString(root)
  }

  def parseIndex(s: String): Index = {
    val node = Json.parse(s)
    val it = node.get("chunks").elements()
    val buf = Seq.newBuilder[Chunk]
    while (it.hasNext) {
      val c = it.next()
      buf += Chunk(
        firstRecordOffset = c.get("first_record_offset").asLong(),
        numRecords = c.get("num_records").asLong(),
        byteOffset = c.get("byte_offset").asLong(),
        byteLength = c.get("byte_length").asLong(),
        byteLengthUncompressed = c.get("byte_length_uncompressed").asLong())
    }
    Index(buf.result())
  }

  private final class CountingOutputStream(out: OutputStream) extends OutputStream {
    var numBytes = 0L
    override def write(b: Int): Unit = { out.write(b); numBytes += 1 }
    override def write(b: Array[Byte]): Unit = { out.write(b); numBytes += b.length }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); numBytes += len
    }
    override def flush(): Unit = out.flush()
    override def close(): Unit = out.close()
  }

  /** Faithful re-expression of BlockGZIPFileWriter (sink/.../BlockGZIPFileWriter.java:103-250)
    * over a Hadoop FileSystem stream (local file, HDFS, or an object store —
    * the create/overwrite + sequential write pattern is what the reference's
    * upload needs). Chunk roll happens BEFORE a write that would push the
    * current member past chunkThreshold uncompressed bytes; an optional
    * header is written as its own leading member so readers know how many
    * bytes to skip (BlockGZIPFileWriter.java:142-150).
    */
  final class BlockGzWriter(
      fs: FileSystem,
      dir: Path,
      filenameBase: String,
      firstRecordOffset: Long = 0L,
      chunkThreshold: Long = 64L * 1024 * 1024,
      header: Array[Byte] = Array.emptyByteArray) {

    private final class MutChunk(var firstOffset: Long) {
      var rawBytes = 0L
      var byteOffset = 0L
      var compressedByteLength = 0L
      var numRecords = 0L
    }

    val dataFileName: String = f"$filenameBase-$firstRecordOffset%012d.gz"
    val indexFileName: String = f"$filenameBase-$firstRecordOffset%012d.index.json"
    def dataFilePath: Path = new Path(dir, dataFileName)
    def indexFilePath: Path = new Path(dir, indexFileName)

    private val chunks = scala.collection.mutable.ArrayBuffer(new MutChunk(firstRecordOffset))
    private val fileStream = new CountingOutputStream(fs.create(dataFilePath, true))
    private var gzipStream = new GZIPOutputStream(fileStream)
    if (header.nonEmpty) {
      gzipStream.write(header)
      gzipStream.finish()
      // record chunk 0's start BEFORE opening the next member: the
      // GZIPOutputStream constructor writes its 10-byte member header
      // immediately, so the reference's order (stream first, then
      // getNumBytesWritten — BlockGZIPFileWriter.java:147-149) records an
      // offset 10 bytes INSIDE member 1. Latent there (its reader re-reads
      // whole files for header init, S3FilesReader.java:236-243, and
      // non-header chunk offsets are derived arithmetically); fatal for our
      // ranged chunk reads, so deliberately fixed.
      chunks.head.byteOffset = fileStream.numBytes
      gzipStream = new GZIPOutputStream(fileStream)
    }

    private def current: MutChunk = chunks.last

    /** `record` must be the full encoded record INCLUDING its trailing
      * newline (the reference's formats emit delimiters themselves). */
    def write(record: Array[Byte]): Unit = {
      var ch = current
      if (ch.rawBytes + record.length > chunkThreshold) {
        finishChunk()
        gzipStream = new GZIPOutputStream(fileStream)
        val next = new MutChunk(ch.firstOffset + ch.numRecords)
        next.byteOffset = ch.byteOffset + ch.compressedByteLength
        chunks += next
        ch = next
      }
      gzipStream.write(record)
      ch.rawBytes += record.length
      ch.numRecords += 1
    }

    private def finishChunk(): Unit = {
      gzipStream.finish() // complete the member without closing the stack
      current.compressedByteLength = fileStream.numBytes - current.byteOffset
    }

    def numRecords: Long = chunks.map(_.numRecords).sum
    def numChunks: Int = chunks.size

    def index: Index = Index(chunks.toSeq.map(c =>
      Chunk(c.firstOffset, c.numRecords, c.byteOffset, c.compressedByteLength, c.rawBytes)))

    /** finish the data file, then publish the index — index-last, so a
      * reader never sees an index pointing past the data */
    def close(): Unit = {
      finishChunk()
      gzipStream.close()
      val out = fs.create(indexFilePath, true)
      out.write(indexJson(index).getBytes("UTF-8"))
      out.close()
    }
  }

  // ---------------------------------------------------------------- write

  /** Distributed archive write: `df` must have (partition INT, a sort
    * column, line STRING — newline-free). One shuffle clusters each CDC
    * partition onto one task sorted by `sortCol`; the task streams runs of
    * equal `partition` into BlockGzWriters, rolling to a new file (with the
    * connector's `-{firstOffset%012d}` name) every `recordsPerFile` records
    * — the flush-cycle analogue. Archive offsets are per-partition
    * consecutive from 0, like Kafka offsets.
    */
  def writeArchive(
      df: DataFrame,
      root: String,
      topic: String,
      sortCol: String,
      chunkThreshold: Long = 64L * 1024 * 1024,
      recordsPerFile: Long = Long.MaxValue): Unit = {
    df.select(col("partition").cast("int").as("partition"),
        col(sortCol).as("_sort"), col("line"))
      .repartition(col("partition"))
      .sortWithinPartitions(col("partition"), col("_sort"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = FileSystem.get(new java.net.URI(root), new Configuration())
        val dir = new Path(root)
        var part = -1
        var nextOffset = 0L
        var w: BlockGzWriter = null
        def closeW(): Unit = if (w != null) { w.close(); w = null }
        rows.foreach { r =>
          val p = r.getInt(0)
          if (p != part) { closeW(); part = p; nextOffset = 0L }
          if (w == null)
            w = new BlockGzWriter(fs, dir, f"$topic-$part%05d", nextOffset, chunkThreshold)
          w.write((r.getString(2) + "\n").getBytes("UTF-8"))
          nextOffset += 1
          if (nextOffset % recordsPerFile == 0) closeW()
        }
        closeW()
      }
  }

  // ----------------------------------------------------------------- read

  /** one reading task = one gzip member (+ a resume floor within it) */
  final case class ChunkTask(
      file: String,
      topic: String,
      partition: Int,
      byteOffset: Long,
      byteLength: Long,
      firstRecordOffset: Long,
      numRecords: Long,
      minOffsetExclusive: Long)

  final case class GzRecord(topic: String, partition: Int, offset: Long, value: String)

  private val FileName = """(.+)-(\d{5})-(\d{12})\.index\.json""".r

  /** driver-side index listing: metadata-scale (index files only) */
  private def listTasks(spark: SparkSession, root: String): Seq[ChunkTask] = {
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val st = fs.listStatus(new Path(root))
    st.toSeq.flatMap { s =>
      s.getPath.getName match {
        case FileName(topic, part, _) =>
          val in = fs.open(s.getPath)
          val bytes = new Array[Byte](s.getLen.toInt)
          in.readFully(0, bytes)
          in.close()
          val idx = parseIndex(new String(bytes, "UTF-8"))
          val dataFile = new Path(s.getPath.getParent,
            s.getPath.getName.stripSuffix(".index.json") + ".gz").toString
          idx.chunks.map(c => ChunkTask(dataFile, topic, part.toInt, c.byteOffset,
            c.byteLength, c.firstRecordOffset, c.numRecords, Long.MinValue))
        case _ => Nil
      }
    }
  }

  private def readTasks(spark: SparkSession, tasks: Seq[ChunkTask]): Dataset[GzRecord] = {
    import spark.implicits._
    val n = math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(tasks).repartition(n).mapPartitions { it =>
      // per-task ranged read: seek to the member, read EXACTLY byteLength
      // bytes, decompress just that member — never the whole file
      var fs: FileSystem = null
      it.flatMap { t =>
        if (fs == null) fs = FileSystem.get(new java.net.URI(t.file), new Configuration())
        val in = fs.open(new Path(t.file))
        val buf = new Array[Byte](t.byteLength.toInt)
        in.readFully(t.byteOffset, buf)
        in.close()
        val r = new BufferedReader(new InputStreamReader(
          new GZIPInputStream(new ByteArrayInputStream(buf)), "UTF-8"))
        val out = scala.collection.mutable.ArrayBuffer.empty[GzRecord]
        var line = r.readLine()
        var off = t.firstRecordOffset
        while (line != null) {
          if (off > t.minOffsetExclusive) out += GzRecord(t.topic, t.partition, off, line)
          off += 1
          line = r.readLine()
        }
        require(off - t.firstRecordOffset == t.numRecords,
          s"chunk ${t.file}@${t.byteOffset} decoded ${off - t.firstRecordOffset} records, " +
            s"index says ${t.numRecords}")
        out
      }
    }
  }

  /** full archive scan (still chunk-parallel) */
  def read(spark: SparkSession, root: String): DataFrame =
    readTasks(spark, listTasks(spark, root)).toDF()

  /** Resume past per-partition committed offsets: whole chunks at or below
    * the floor are PRUNED on the driver from the index alone (never opened
    * — the ranged-GET skip, S3FilesReader.java:215-261); only the boundary
    * chunk filters records below the floor after decode.
    */
  def readFrom(spark: SparkSession, root: String, committed: Map[Int, Long]): DataFrame = {
    val tasks = listTasks(spark, root).flatMap { t =>
      committed.get(t.partition) match {
        case None => Some(t)
        case Some(c) if t.firstRecordOffset + t.numRecords > c + 1 =>
          Some(t.copy(minOffsetExclusive = c))
        case _ => None // chunk entirely at or below the committed offset
      }
    }
    readTasks(spark, tasks).toDF()
  }
}
