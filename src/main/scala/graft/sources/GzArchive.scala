package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, ByteArrayOutputStream, InputStreamReader, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.lake.Json
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * Bucket layout matches the connector end to end:
  *   - data/index files `{topic}-{partition%05d}-{firstOffset%012d}.gz` /
  *     `….index.json` (BlockGZIPFileWriter.java:161-167), optionally nested
  *     under a date prefix like the connector's upload keys
  *     (S3Writer.java:129-136 — there derived from wall clock and explicitly
  *     "meaningless"; here the caller passes a deterministic prefix)
  *   - a cursor file `last_chunk_index.{topic}-{partition%05d}.txt` at the
  *     archive root holding the key of the newest index file, written AFTER
  *     data+index (the reference's upload order, S3Writer.java:61-81);
  *     offset recovery reads cursor → index → `first_record_offset +
  *     num_records` of the last chunk (S3Writer.java:83-127, 404 ⇒ 0)
  * so the engine reads (and resumes, and appends to) a bucket the real
  * connector wrote, and vice versa.
  *
  * Spark integration is CHUNK-grain: the driver reads only the index files
  * (metadata-scale), then fans each chunk's (byteOffset, byteLength) out as
  * a task row — every executor task seeks and decompresses exactly one
  * member's byte range, so a 100 TB archive parallelizes at ~chunkThreshold
  * granularity with no full-file scans and no shuffle. The write side is
  * FILE-grain parallel: file boundaries are pre-assigned from the archive
  * offsets, so one task writes one output file (bytes depend only on that
  * file's records) — a hot partition's backfill no longer serializes on a
  * single task.
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
    /** next offset after this file's records — the sink-resume arithmetic
      * (S3Writer.java:123-127) */
    def nextOffset: Long =
      chunks.lastOption.map(c => c.firstRecordOffset + c.numRecords).getOrElse(0L)
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

  /** Tolerant of a missing byte_length_uncompressed: the reference's sink
    * always writes it, but its own offset-recovery test fixtures omit it
    * (S3WriterTest.java:199-210) — offset arithmetic must not depend on it.
    */
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
        byteLengthUncompressed =
          Option(c.get("byte_length_uncompressed")).map(_.asLong()).getOrElse(0L))
    }
    Index(buf.result())
  }

  /** cursor key for a topic-partition (S3Writer.java:138-140) */
  def cursorFileName(topic: String, partition: Int): String =
    f"last_chunk_index.$topic-$partition%05d.txt"

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
      val firstRecordOffset: Long = 0L,
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
      // ranged chunk reads, so deliberately fixed. The read side still
      // accepts reference-written (misaligned) files — see readTasks.
      chunks.head.byteOffset = fileStream.numBytes
      gzipStream = new GZIPOutputStream(fileStream)
    }

    private def current: MutChunk = chunks.last

    /** `record` must be the full encoded record INCLUDING its trailing
      * newline (the reference's formats emit delimiters themselves). */
    def write(record: Array[Byte]): Unit = writeRaw(record, 1L)

    /** Bytes that count as `recordCount` records — the general form of the
      * reference's `write(List<byte[]>, recordCount)`
      * (BlockGZIPFileWriter.java:183-208). `recordCount = 0` is how a
      * format TRAILER lands (S3SinkTask.java:213-215: `format.finish`
      * bytes written through the record path, counted as zero records —
      * they may even roll into their own trailing zero-record chunk, same
      * as here).
      */
    def writeRaw(bytes: Array[Byte], recordCount: Long): Unit = {
      var ch = current
      if (ch.rawBytes + bytes.length > chunkThreshold) {
        finishChunk()
        gzipStream = new GZIPOutputStream(fileStream)
        val next = new MutChunk(ch.firstOffset + ch.numRecords)
        next.byteOffset = ch.byteOffset + ch.compressedByteLength
        chunks += next
        ch = next
      }
      gzipStream.write(bytes)
      ch.rawBytes += bytes.length
      ch.numRecords += recordCount
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
    * column, line STRING — newline-free). Archive offsets are per-partition
    * consecutive from `startOffsets` (default 0), like Kafka offsets,
    * assigned by rank over `sortCol` (which must therefore be unique per
    * partition for a deterministic archive).
    *
    * Parallelism is FILE-grain: file boundaries are pre-assigned from the
    * offsets (a file starts at each multiple of `recordsPerFile`), the
    * batch is shuffled on (partition, file) and each task streams one
    * file's records into a [[BlockGzWriter]] — a file's bytes depend only
    * on its own record run, so the output is byte-identical to a serial
    * per-partition writer while a hot partition's backfill fans out across
    * tasks. Task commit is temp-write + rename (data first, then index —
    * the reference's upload order, S3Writer.java:61-81), so a speculative
    * or zombie attempt racing its retry never interleaves writes into a
    * published file: attempts write attempt-scoped temp names and the
    * rename of identical bytes is idempotent.
    *
    * After the job, one cursor file per partition is published at the root
    * (`last_chunk_index.{topic}-{p%05d}.txt`, S3Writer.java:138-153)
    * pointing at the newest index key, and `.inprogress` scratch is
    * reclaimed. `datePrefix` nests data/index files one level down like the
    * connector's bucket layout — pass something deterministic (event-time
    * derived), never wall clock.
    */
  def writeArchive(
      df: DataFrame,
      root: String,
      topic: String,
      sortCol: String,
      chunkThreshold: Long = 64L * 1024 * 1024,
      recordsPerFile: Long = Long.MaxValue,
      datePrefix: String = "",
      header: Array[Byte] = Array.emptyByteArray,
      trailer: Array[Byte] = Array.emptyByteArray,
      startOffsets: Map[Int, Long] = Map.empty): Unit =
    writeArchivePayload(
      df.select(lit(topic).as("topic"), col("partition"), col(sortCol).as("_sort"),
        // text framing: record bytes = line + trailing newline, UTF-8 (the
        // reference's text format emits its own delimiter)
        encode(concat(col("line"), lit("\n")), "UTF-8").as("payload")),
      root, chunkThreshold, recordsPerFile, datePrefix, header,
      trailer, startOffsets.map { case (p, o) => (topic, p) -> o })

  /** Multi-topic archive write: one bucket holding several topics' file
    * families, the layout the reference's source reads with a topic-SET
    * filter (source/.../S3SourceTask.java:82-94; S3FilesReader.java:82-105).
    * `df` must carry (topic STRING, partition INT, `sortCol`, line STRING);
    * offsets are per-(topic, partition) consecutive, cursors publish per
    * (topic, partition) — each topic's file family is exactly what
    * [[writeArchive]] would have produced alone.
    */
  def writeArchiveTopics(
      df: DataFrame,
      root: String,
      sortCol: String,
      chunkThreshold: Long = 64L * 1024 * 1024,
      recordsPerFile: Long = Long.MaxValue,
      datePrefix: String = "",
      header: Array[Byte] = Array.emptyByteArray,
      trailer: Array[Byte] = Array.emptyByteArray,
      startOffsets: Map[(String, Int), Long] = Map.empty): Unit =
    writeArchivePayload(
      df.select(col("topic"), col("partition"), col(sortCol).as("_sort"),
        encode(concat(col("line"), lit("\n")), "UTF-8").as("payload")),
      root, chunkThreshold, recordsPerFile, datePrefix, header,
      trailer, startOffsets)

  /** `[len:int4 BE][bytes]` built inside codegen (octet_length → hex →
    * 8-wide lpad → unhex = the big-endian 4-byte length the reference's
    * ByteLengthFormat writes, common/.../ByteLengthFormat.java:43-56)
    */
  private def lenPrefixed(b: Column): Column =
    concat(unhex(lpad(hex(octet_length(b)), 8, "0")), b)

  /** The BINARY container variant: length-prefixed records (the reference's
    * `binary` format alias) inside the same block-gzip chunks — the shape
    * its binary system-test dump exercises (system_test/run.py:331-373).
    * `df` must have (partition INT, a sort column, key BINARY, value
    * BINARY); unlike the text container there is NO delimiter constraint —
    * payloads may contain any bytes, including line terminators.
    */
  def writeArchiveBinary(
      df: DataFrame,
      root: String,
      topic: String,
      sortCol: String,
      includeKeys: Boolean = true,
      chunkThreshold: Long = 64L * 1024 * 1024,
      recordsPerFile: Long = Long.MaxValue,
      datePrefix: String = "",
      startOffsets: Map[Int, Long] = Map.empty): Unit = {
    val payload =
      if (includeKeys) concat(lenPrefixed(col("key")), lenPrefixed(col("value")))
      else lenPrefixed(col("value"))
    writeArchivePayload(
      df.select(lit(topic).as("topic"), col("partition"), col(sortCol).as("_sort"),
        payload.as("payload")),
      root, chunkThreshold, recordsPerFile, datePrefix,
      Array.emptyByteArray, Array.emptyByteArray,
      startOffsets.map { case (p, o) => (topic, p) -> o })
  }

  private def writeArchivePayload(
      df: DataFrame,
      root: String,
      chunkThreshold: Long,
      recordsPerFile: Long,
      datePrefix: String,
      header: Array[Byte],
      trailer: Array[Byte],
      startOffsets: Map[(String, Int), Long]): Unit = {
    require(recordsPerFile > 0, "recordsPerFile must be positive")
    val spark = df.sparkSession
    val conf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))

    val base = df.select(col("topic").cast("string").as("topic"),
      col("partition").cast("int").as("partition"),
      col("_sort"), col("payload"))
    val withStart =
      if (startOffsets.isEmpty) base.withColumn("_start", lit(0L))
      else {
        val so = spark.createDataFrame(
          startOffsets.toSeq.map { case ((t, p), o) => (t, p, o) })
          .toDF("topic", "partition", "_start")
        base.join(broadcast(so), Seq("topic", "partition"), "left")
          .withColumn("_start", coalesce(col("_start"), lit(0L)))
      }
    val w = Window.partitionBy(col("topic"), col("partition")).orderBy(col("_sort"))
    val assigned = withStart
      .withColumn("_aoff", row_number().over(w).cast("long") - 1L + col("_start"))
      // file first-offset: aligned to multiples of recordsPerFile (for the
      // default Long.MaxValue this is 0 — one file per topic-partition).
      // pmod, not div*mul, so Long.MaxValue cannot overflow.
      .withColumn("_file", col("_aoff") - pmod(col("_aoff"), lit(recordsPerFile)))
      .select(col("topic"), col("partition"), col("_file"), col("_aoff"), col("payload"))

    val hdr = header // avoid closing over the outer args object
    val trlr = trailer
    val thr = chunkThreshold
    // JOB-COMMIT PROTOCOL (the FileOutputCommitter shape): tasks write ONLY
    // inside their own attempt directory under a job-unique staging area
    // and never touch published paths, so a zombie or speculative attempt —
    // even one that wakes up after the job finished — cannot delete or
    // clobber a published file. The DRIVER publishes after job success:
    // rename one surviving attempt's files into place (any attempt — bytes
    // are deterministic), then move cursors. Tasks report what they wrote
    // via an accumulator; the driver acknowledges ONLY those files (never a
    // bucket listing — a listing would also acknowledge ORPHANS from
    // previously crashed writers, exactly the files the cursor protocol
    // exists to exclude).
    val jobTag = java.util.UUID.randomUUID().toString
    val written = spark.sparkContext
      .collectionAccumulator[(String, Int, Long, Long)]("gzarchive-written")
    // NO second exchange: the offset window above already shuffled the
    // payload once, hash-clustered by (topic, partition) and — by WindowExec's
    // own required ordering — sorted by (topic, partition, _sort) within each
    // task. `_aoff` is the row_number over that exact order and `_file`
    // is monotone in `_aoff`, so every task already iterates contiguous
    // (topic, partition, _file) runs in ascending `_aoff` order — precisely
    // what the writer loop below needs. The previous
    // `repartition(topic, partition, _file) + sortWithinPartitions` moved
    // every payload byte through a SECOND full shuffle and sort only to
    // re-establish a clustering the first exchange already guarantees
    // (guide §2.4/§8: heavy bytes cross the wire once). Parallelism is one
    // task per hash bucket of (topic, partition) — the Kafka-shaped
    // per-partition writer the reference runs anyway; a backfill that needs
    // finer fan-out can pre-split its input partitions upstream.
    assigned
      .foreachPartition { rows: Iterator[Row] =>
        val fs = new Path(root).getFileSystem(conf.value.value)
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val tmpDir = new Path(root, s".inprogress/job-$jobTag/attempt-$attempt")
        var curTopic: String = null
        var curPart = -1
        var curFile = -1L
        var bw: BlockGzWriter = null
        def commitW(): Unit = if (bw != null) {
          if (trlr.nonEmpty) bw.writeRaw(trlr, 0L) // format trailer, 0 records
          bw.close() // data then index, inside the attempt dir only
          written.add((curTopic, curPart, bw.firstRecordOffset, attempt))
          bw = null
        }
        rows.foreach { r =>
          val t = r.getString(0)
          val p = r.getInt(1)
          val file = r.getLong(2)
          val aoff = r.getLong(3)
          if (t != curTopic || p != curPart || file != curFile) {
            commitW()
            // topics now arrive as DATA (writeArchiveTopics), not a caller
            // literal: validate at the file boundary (cheap — once per
            // file). Kafka's own topic charset; anything else (null, a
            // '/', spaces) would break the flat bucket layout or the
            // FileName/CursorName parse and silently lose the topic's
            // records from cursor-trusted reads.
            require(t != null && t.matches("[A-Za-z0-9._-]+"),
              s"invalid archive topic name '$t' — must match [A-Za-z0-9._-]+")
            curTopic = t; curPart = p; curFile = file
            // the file is NAMED by its first actual record offset (= `file`
            // except for the very first file of a partition with a non-zero
            // start, which begins mid-boundary)
            bw = new BlockGzWriter(fs, tmpDir, f"$t-$p%05d", aoff, thr, hdr)
          }
          val payload = r.getAs[Array[Byte]](4) // full framed record bytes
          require(payload != null,
            "null archive record payload — a null line (text container) or " +
              "null key/value (binary container); coalesce upstream")
          bw.write(payload)
        }
        commitW()
      }

    // Driver-side job commit: publish exactly one attempt per file (data
    // first, then index — the reference's upload order), fanned out on the
    // metadata pool, then advance cursors atomically. Partitions this job
    // did not write keep their existing cursors, and pre-existing orphans
    // stay unacknowledged.
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val destDir = if (datePrefix.isEmpty) new Path(root) else new Path(root, datePrefix)
    import scala.jdk.CollectionConverters._
    val acks = written.value.asScala.toSeq
      .groupBy(t => (t._1, t._2, t._3)) // a retried task reports twice; pick one
      .map { case ((t, p, first), reports) => (t, p, first, reports.map(_._4).max) }
      .toSeq.sortBy(a => (a._1, a._2, a._3))
    if (acks.nonEmpty) fs.mkdirs(destDir)
    // rename-with-OVERWRITE (FileContext is thread-safe), never
    // delete-then-rename: a crash between the two would leave a
    // cursor-acknowledged index pointing at a vanished data file
    val fc = org.apache.hadoop.fs.FileContext
      .getFileContext(fs.getUri, spark.sparkContext.hadoopConfiguration)
    graft.lake.MetaIO.fetchAll(acks) { case (t, p, first, attempt) =>
      val attemptDir = new Path(root, s".inprogress/job-$jobTag/attempt-$attempt")
      Seq(f"$t-$p%05d-$first%012d.gz", f"$t-$p%05d-$first%012d.index.json")
        .foreach { name =>
          val tmp = new Path(attemptDir, name)
          val dst = new Path(destDir, name)
          require(fs.exists(tmp), s"attempt $attempt reported $name but left no file")
          fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        }
    }
    // atomic cursor swap: readers trust only the cursor, so there must
    // never be a truncated or missing one. TableIO.writeAtomic supplies the
    // per-attempt-unique tmp + rename-with-overwrite — a FIXED tmp name
    // would let two racing writers (zombie + fenced successor) interleave
    // into one tmp and publish a torn cursor.
    val tio = new graft.lake.TableIO(root, spark)
    acks.groupBy(a => (a._1, a._2)).foreach { case ((t, p), files) =>
      val latest = files.maxBy(_._3)
      val rel = f"$t-$p%05d-${latest._3}%012d.index.json"
      val key = if (datePrefix.isEmpty) rel else s"$datePrefix/$rel"
      tio.writeAtomic(new Path(root, cursorFileName(t, p)), key)
    }
    fs.delete(new Path(root, s".inprogress/job-$jobTag"), true)
    // reap stale job dirs from FAILED/crashed writers: each job's staging is
    // UUID-named, so nothing else would ever reclaim it — without this
    // sweep a flaky pipeline accumulates dead .gz bytes forever (the same
    // lazy-reap pattern as Staging.maintain and the journal's tombstones)
    val inprog = new Path(root, ".inprogress")
    if (fs.exists(inprog)) {
      val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
      // staleness = the NEWEST mtime anywhere under the job dir, not the
      // top-level dir's (which goes stale as soon as its attempt dirs are
      // created — a long-running concurrent writer's live staging must not
      // be swept from under it)
      def newestMtime(p: Path): Long = {
        val sts = fs.listStatus(p)
        (fs.getFileStatus(p).getModificationTime +: sts.toSeq.map { s =>
          if (s.isDirectory) newestMtime(s.getPath) else s.getModificationTime
        }).max
      }
      fs.listStatus(inprog).foreach { st =>
        if (newestMtime(st.getPath) < cutoff) fs.delete(st.getPath, true): Unit
      }
    }
  }

  // ----------------------------------------------------------------- read

  /** one reading task = one gzip member (+ a resume floor within it).
    * `headerLen` > 0 marks a file whose leading member is a format header
    * occupying bytes [0, headerLen) — the init-required replay of
    * S3FilesReader.java:236-243.
    */
  final case class ChunkTask(
      file: String,
      topic: String,
      partition: Int,
      byteOffset: Long,
      byteLength: Long,
      firstRecordOffset: Long,
      numRecords: Long,
      minOffsetExclusive: Long,
      headerLen: Long,
      isLast: Boolean)

  final case class GzRecord(topic: String, partition: Int, offset: Long, value: String)
  final case class GzRecordH(topic: String, partition: Int, offset: Long,
      value: String, header: String)
  /** per-FILE format metadata: header and trailer are init/finish hooks of
    * the file's format (S3RecordsWriter.java:16-31), not record properties
    */
  final case class FileMeta(file: String, topic: String, partition: Int,
      firstRecordOffset: Long, numRecords: Long, header: String, trailer: String)

  private val FileName = """(.+)-(\d{5})-(\d{12})\.index\.json""".r
  private val CursorName = """last_chunk_index\.(.+)-(\d{5})\.txt""".r

  private final case class IndexFile(
      status: FileStatus, rel: String, topic: String, partition: Int, firstOffset: Long)

  /** Recursive metadata-scale listing of index files: a real connector
    * bucket nests data/index under `yyyy-MM-dd` prefixes (S3Writer.java:129-136),
    * and its source lists across prefixes (S3FilesReader.java:140-157) — so
    * recurse through subdirectories (dot-dirs like `.inprogress` excluded).
    */
  private def listIndexFiles(fs: FileSystem, root: Path): Seq[IndexFile] = {
    if (!fs.exists(root)) return Nil
    val qRoot = fs.makeQualified(root)
    def walk(p: Path): Seq[FileStatus] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) {
          if (s.getPath.getName.startsWith(".")) Nil else walk(s.getPath)
        } else Seq(s)
      }
    walk(root).flatMap { s =>
      s.getPath.getName match {
        case FileName(topic, part, off) =>
          val rel = qRoot.toUri.relativize(fs.makeQualified(s.getPath).toUri).getPath
          Some(IndexFile(s, rel, topic, part.toInt, off.toLong))
        case _ => None
      }
    }
  }

  /** driver-side index parse → chunk task rows (metadata-scale). Index
    * fetches fan out on a bounded pool: a 100 TB archive has thousands of
    * index files, and on an object store each is a small GET — serial
    * driver reads would be the listing's bottleneck (the same pattern as
    * the lake's sharded-checkpoint cold resolution). Order is restored
    * from the listing sequence, so the result stays deterministic.
    */
  private def listTasks(spark: SparkSession, root: String): Seq[ChunkTask] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fetchTasks(fs, root, listIndexFiles(fs, new Path(root)))
  }

  private def fetchTasks(fs: FileSystem, root: String,
      files: Seq[IndexFile]): Seq[ChunkTask] =
    graft.lake.MetaIO.fetchAll(files)(f => tasksOf(fs, root, f)).flatten

  private def tasksOf(fs: FileSystem, root: String, f: IndexFile): Seq[ChunkTask] = {
    val len = f.status.getLen
    require(len <= Int.MaxValue, s"index file ${f.rel} larger than 2 GiB")
    val in = fs.open(f.status.getPath)
    val bytes = new Array[Byte](len.toInt)
    in.readFully(0, bytes)
    in.close()
    val idx = parseIndex(new String(bytes, "UTF-8"))
    val dataFile = new Path(f.status.getPath.getParent,
      f.status.getPath.getName.stripSuffix(".index.json") + ".gz").toString
    val headerLen = idx.chunks.headOption.map(_.byteOffset).getOrElse(0L)
    idx.chunks.zipWithIndex.map { case (c, i) =>
      ChunkTask(dataFile, f.topic, f.partition, c.byteOffset,
        c.byteLength, c.firstRecordOffset, c.numRecords, Long.MinValue,
        headerLen, isLast = i == idx.chunks.size - 1)
    }
  }

  private def gzipMagic(buf: Array[Byte]): Boolean =
    buf.length >= 2 && (buf(0) & 0xff) == 0x1f && (buf(1) & 0xff) == 0x8b

  /** Pluggable chunk decode — the reference reader's input-filter seam
    * (source/.../S3FilesReader.java:333-337: the reader takes an
    * `InputFilter` with GUNZIP merely the default). [[GunzipFilter]] is
    * this engine's default (the archive WRITER is Block-GZIP like the
    * reference sink's, so gzip is what this engine produces);
    * [[IdentityFilter]] reads uncompressed archives written by other tools
    * against the same index/cursor protocol; any FQCN implementing the
    * trait loads via props key `input.filter` ([[inputFilter]]), mirroring
    * the format registry's reflective contract. Implementations run inside
    * executor tasks — they must be Serializable and stateless.
    */
  trait InputFilter extends Serializable {
    /** Wrap one chunk's raw byte stream with the decode — the STREAMING
      * primitive: the text read path consumes records straight off this
      * stream, so executor memory stays at buffer scale even for a chunk
      * whose UNCOMPRESSED size exceeds the 2 GiB array bound (only the
      * compressed range is materialized; the ranged-read guard bounds
      * that side).
      */
    def wrap(in: java.io.InputStream): java.io.InputStream

    /** strict full decode of one chunk, derived from [[wrap]] — used only
      * where the record format needs the whole array (the binary
      * length-prefixed decode)
      */
    def decode(chunk: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val in = wrap(new ByteArrayInputStream(chunk))
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { out.write(b, 0, n); n = in.read(b) }
      out.toByteArray
    }
    /** tolerant variant for ranged HEADER reads, which on reference-written
      * gzip files may end on a bare member boundary (the off-by-10 case);
      * encodings without that failure shape keep the strict default
      */
    def decodeTolerant(chunk: Array[Byte]): Array[Byte] = decode(chunk)
    /** does `chunk` begin a frame of this encoding? Drives the
      * reference-off-by-10 index-offset correction probe; encodings without
      * a frame marker return true (no probe possible, none needed).
      */
    def framed(chunk: Array[Byte]): Boolean = true
  }

  /** default: the Block-GZIP decode (multi-member tolerant-header gzip) */
  object GunzipFilter extends InputFilter {
    def wrap(in: java.io.InputStream): java.io.InputStream =
      new GZIPInputStream(in)
    override def decodeTolerant(chunk: Array[Byte]): Array[Byte] =
      gunzipTolerant(chunk)
    override def framed(chunk: Array[Byte]): Boolean = gzipMagic(chunk)
  }

  /** uncompressed archives: index byte ranges ARE the record bytes */
  object IdentityFilter extends InputFilter {
    def wrap(in: java.io.InputStream): java.io.InputStream = in
    override def decode(chunk: Array[Byte]): Array[Byte] = chunk
  }

  /** Config-driven filter resolution (`input.filter` = `gzip` | `none` |
    * FQCN implementing [[InputFilter]]); absent = gzip, the reference's
    * default-GUNZIP contract.
    */
  def inputFilter(props: Map[String, String]): InputFilter =
    props.get("input.filter") match {
      case None | Some("gzip") => GunzipFilter
      case Some("none") | Some("identity") => IdentityFilter
      case Some(fqcn) =>
        Class.forName(fqcn).getDeclaredConstructor().newInstance() match {
          case f: InputFilter => f
          case _ => throw new IllegalArgumentException(
            s"input.filter class $fqcn does not implement " +
              s"${classOf[InputFilter].getName}")
        }
    }

  /** Decompress a (possibly multi-member) gzip byte range, tolerating ONLY
    * a bare trailing member START: a reference-written header file's
    * recorded header region is 10 bytes too long (the off-by-10 documented
    * at the BlockGzWriter header fix), so the range ends with exactly one
    * 10-byte gzip member header and no deflate data — everything before it
    * decodes fine. Any OTHER truncation (EOF mid-deflate, a cut trailer) is
    * genuine corruption and raises, matching the repo's loud-corruption
    * convention — a silent partial header would otherwise flow downstream
    * as a wrong-but-plausible string.
    */
  private[graft] def gunzipTolerant(buf: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(buf))
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { out.write(b, 0, n); n = in.read(b) }
    } catch {
      case e: java.io.EOFException =>
        // tolerated iff the range ends with a bare member header: gzip
        // magic + CM=deflate at exactly len-10 (the 10-byte fixed header
        // the next GZIPOutputStream wrote before the range was cut)
        val L = buf.length
        val bareTrailingHeader = L >= 10 &&
          (buf(L - 10) & 0xff) == 0x1f && (buf(L - 9) & 0xff) == 0x8b &&
          (buf(L - 8) & 0xff) == 0x08
        if (!bareTrailingHeader) throw new java.io.IOException(
          s"truncated gzip data (${L}B range, EOF mid-member) — corrupt " +
            "archive bytes or index; not the tolerated bare-trailing-header case", e)
    }
    out.toByteArray
  }

  /** ranged read with the 2 GiB buffer guard */
  private def rangedRead(fs: FileSystem, file: String, off: Long, len: Long): Array[Byte] = {
    require(len <= Int.MaxValue,
      s"chunk $file@$off is ${len}B compressed — past the 2 GiB buffer " +
        "bound; re-archive with a smaller chunkThreshold (a single " +
        "record larger than 2 GiB compressed cannot be ranged-read)")
    val in = fs.open(new Path(file))
    val buf = new Array[Byte](len.toInt)
    in.readFully(off, buf)
    in.close()
    buf
  }

  /** Read one chunk's compressed bytes, correcting reference-written
    * header-bearing files: BlockGZIPFileWriter records chunk 0's
    * byte_offset AFTER opening the next gzip member — 10 bytes (one member
    * header) inside it (BlockGZIPFileWriter.java:147-149) — and byte_length
    * correspondingly 10 short. Later chunks derive arithmetically and stay
    * correct. A range that does not start with the gzip magic is re-read
    * 10 bytes earlier and re-checked.
    */
  private def chunkBytes(fs: FileSystem, file: String, off: Long, len: Long,
      filter: InputFilter = GunzipFilter): Array[Byte] = {
    var buf = rangedRead(fs, file, off, len)
    if (!filter.framed(buf) && off >= 10)
      buf = rangedRead(fs, file, off - 10, len + 10)
    require(filter.framed(buf) || buf.isEmpty,
      s"chunk $file@$off does not start a member frame of the configured " +
        "input filter (corrupt index or data)")
    buf
  }

  private def readTasks(spark: SparkSession, tasks: Seq[ChunkTask],
      withHeader: Boolean = false,
      filter: InputFilter = GunzipFilter): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val n = math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val ds: Dataset[GzRecordH] =
      spark.createDataset(tasks).repartition(n).mapPartitions { it =>
        // per-task ranged read: seek to the member, read EXACTLY byteLength
        // bytes, decompress just that member — never the whole file
        var fs: FileSystem = null
        // headers are per FILE but tasks are per CHUNK: memoize the decoded
        // header per file within the task partition, or a thousand-chunk
        // file would re-GET and re-gunzip its header a thousand times
        val headerCache = scala.collection.mutable.HashMap.empty[String, String]
        it.flatMap { t =>
          if (fs == null)
            fs = new Path(t.file).getFileSystem(conf.value.value)
          val buf = chunkBytes(fs, t.file, t.byteOffset, t.byteLength, filter)
          val header =
            if (!withHeader || t.headerLen == 0) ""
            else headerCache.getOrElseUpdate(t.file, new String(
              filter.decodeTolerant(rangedRead(fs, t.file, 0L, t.headerLen)),
              "UTF-8"))
          val r = new BufferedReader(new InputStreamReader(
            filter.wrap(new ByteArrayInputStream(buf)), "UTF-8"))
          val out = scala.collection.mutable.ArrayBuffer.empty[GzRecordH]
          // Lines past num_records in the file's LAST chunk are FORMAT
          // TRAILER bytes, not records: the reference writes `format.finish`
          // through the record path with recordCount 0
          // (S3SinkTask.java:213-215), so they share the chunk's byte space
          // but not its record count — skipped here, surfaced per file by
          // [[fileMeta]]. In any NON-last chunk surplus lines can only mean
          // corruption (a trailer lives at file end by construction), and
          // decoding FEWER lines than the index declares is corruption
          // anywhere — both stay loud.
          var line = r.readLine()
          var off = t.firstRecordOffset
          var surplus = 0L
          while (line != null) {
            if (off - t.firstRecordOffset < t.numRecords) {
              if (off > t.minOffsetExclusive)
                out += GzRecordH(t.topic, t.partition, off, line, header)
              off += 1
            } else surplus += 1
            line = r.readLine()
          }
          require(off - t.firstRecordOffset == t.numRecords,
            s"chunk ${t.file}@${t.byteOffset} decoded ${off - t.firstRecordOffset} records, " +
              s"index says ${t.numRecords}")
          require(t.isLast || surplus == 0L,
            s"chunk ${t.file}@${t.byteOffset} decoded $surplus surplus lines " +
              "in a non-final chunk — corrupt data (an embedded line " +
              "terminator?); only the last chunk may carry trailer bytes")
          out
        }
      }
    if (withHeader) ds.toDF() else ds.drop("header")
  }

  /** full archive scan (still chunk-parallel) */
  def read(spark: SparkSession, root: String,
      filter: InputFilter = GunzipFilter): DataFrame =
    readTasks(spark, listTasks(spark, root), withHeader = false, filter)

  /** like [[read]], plus each record carries its file's decoded format
    * header (empty when the file has none) — the distributed analogue of
    * the reference's header replay for init-required formats
    * (S3FilesReader.java:236-243).
    */
  def readWithHeader(spark: SparkSession, root: String,
      filter: InputFilter = GunzipFilter): DataFrame =
    readTasks(spark, listTasks(spark, root), withHeader = true, filter)

  final case class FileMetaTask( // public: Dataset encoder codegen needs access
      file: String, topic: String, partition: Int, firstRecordOffset: Long,
      headerLen: Long, lastByteOffset: Long, lastByteLength: Long,
      lastNumRecords: Long, totalRecords: Long)

  /** Per-FILE format metadata: decoded header member and trailer bytes
    * (the init/finish hooks, S3RecordsWriter.java:16-31). One task per
    * file, touching only the header member and the LAST chunk — this is
    * where a trailer lives even when it rolled into its own zero-record
    * trailing chunk, which per-record reads can never surface.
    */
  def fileMeta(spark: SparkSession, root: String,
      filter: InputFilter = GunzipFilter): DataFrame = {
    import spark.implicits._
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metas = graft.lake.MetaIO.fetchAll(listIndexFiles(fs, new Path(root))) { f =>
      val ts = tasksOf(fs, root, f)
      val last = ts.maxBy(_.byteOffset)
      FileMetaTask(last.file, f.topic, f.partition, f.firstOffset,
        last.headerLen, last.byteOffset, last.byteLength, last.numRecords,
        ts.map(_.numRecords).sum)
    }
    val conf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val n = math.max(1, math.min(metas.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(metas).repartition(n).mapPartitions { it =>
      var fsx: FileSystem = null
      it.map { m =>
        if (fsx == null) fsx = new Path(m.file).getFileSystem(conf.value.value)
        val header =
          if (m.headerLen == 0) ""
          else new String(filter.decodeTolerant(
            rangedRead(fsx, m.file, 0L, m.headerLen)), "UTF-8")
        val r = new BufferedReader(new InputStreamReader(
          filter.wrap(new ByteArrayInputStream(
            chunkBytes(fsx, m.file, m.lastByteOffset, m.lastByteLength, filter))),
          "UTF-8"))
        val trailer = new StringBuilder
        var i = 0L
        var line = r.readLine()
        while (line != null) {
          if (i >= m.lastNumRecords) trailer.append(line).append('\n')
          i += 1
          line = r.readLine()
        }
        FileMeta(m.file, m.topic, m.partition, m.firstRecordOffset,
          m.totalRecords, header, trailer.toString)
      }
    }.toDF()
  }

  /** Resume past per-partition committed offsets: whole chunks at or below
    * the floor are PRUNED on the driver from the index alone (never opened
    * — the ranged-GET skip, S3FilesReader.java:215-261); only the boundary
    * chunk filters records below the floor after decode.
    */
  def readFrom(spark: SparkSession, root: String, committed: Map[Int, Long],
      filter: InputFilter = GunzipFilter): DataFrame = {
    val tasks = listTasks(spark, root).flatMap { t =>
      committed.get(t.partition) match {
        case None => Some(t)
        case Some(c) if t.firstRecordOffset + t.numRecords > c + 1 =>
          Some(t.copy(minOffsetExclusive = c))
        case _ => None // chunk entirely at or below the committed offset
      }
    }
    readTasks(spark, tasks, withHeader = false, filter)
  }

  /** [[readFrom]] keyed by (topic, partition) — the resume shape of a
    * multi-topic bucket ([[writeArchiveTopics]]): per-topic-partition
    * committed floors, whole chunks at or below a floor pruned from the
    * index alone. A (topic, partition) absent from the map replays fully;
    * restrict to a topic set by passing floors only for those topics and
    * filtering the result on `topic` (records carry it).
    */
  def readFromTopics(spark: SparkSession, root: String,
      committed: Map[(String, Int), Long],
      filter: InputFilter = GunzipFilter): DataFrame = {
    val tasks = listTasks(spark, root).flatMap { t =>
      committed.get((t.topic, t.partition)) match {
        case None => Some(t)
        case Some(c) if t.firstRecordOffset + t.numRecords > c + 1 =>
          Some(t.copy(minOffsetExclusive = c))
        case _ => None
      }
    }
    readTasks(spark, tasks, withHeader = false, filter)
  }

  final case class GzBinRecord(topic: String, partition: Int, offset: Long,
      key: Array[Byte], value: Array[Byte])

  private def readBinaryTasks(spark: SparkSession, tasks: Seq[ChunkTask],
      includeKeys: Boolean, filter: InputFilter = GunzipFilter): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val n = math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(tasks).repartition(n).mapPartitions { it =>
      var fs: FileSystem = null
      val fmt = new graft.functions.RecordFormats.ByteLengthFormat(includeKeys)
      it.flatMap { t =>
        if (fs == null) fs = new Path(t.file).getFileSystem(conf.value.value)
        val data = filter.decode(
          chunkBytes(fs, t.file, t.byteOffset, t.byteLength, filter))
        // bounded decode: bytes past num_records in the LAST chunk are
        // format trailer (same rule as the text read); anywhere else, or a
        // short decode, is loud corruption
        val (records, consumed) = fmt.decodeUpTo(data, t.numRecords)
        require(records.length.toLong == t.numRecords,
          s"chunk ${t.file}@${t.byteOffset} decoded ${records.length} binary " +
            s"records, index says ${t.numRecords}")
        require(t.isLast || consumed == data.length,
          s"chunk ${t.file}@${t.byteOffset} has ${data.length - consumed} " +
            "surplus bytes in a non-final chunk — corrupt data")
        records.iterator.zipWithIndex.collect {
          case (rec, i) if t.firstRecordOffset + i > t.minOffsetExclusive =>
            GzBinRecord(t.topic, t.partition, t.firstRecordOffset + i,
              rec.key, rec.value)
        }
      }
    }.toDF()
  }

  /** full scan of a BINARY-format archive (length-prefixed records —
    * [[writeArchiveBinary]]'s output or a reference `binary`-format bucket),
    * chunk-parallel like [[read]]
    */
  def readBinary(spark: SparkSession, root: String,
      includeKeys: Boolean = true,
      filter: InputFilter = GunzipFilter): DataFrame =
    readBinaryTasks(spark, listTasks(spark, root), includeKeys, filter)

  /** [[readFrom]] for binary archives: index-pruned ranged resume */
  def readBinaryFrom(spark: SparkSession, root: String, committed: Map[Int, Long],
      includeKeys: Boolean = true,
      filter: InputFilter = GunzipFilter): DataFrame = {
    val tasks = listTasks(spark, root).flatMap { t =>
      committed.get(t.partition) match {
        case None => Some(t)
        case Some(c) if t.firstRecordOffset + t.numRecords > c + 1 =>
          Some(t.copy(minOffsetExclusive = c))
        case _ => None
      }
    }
    readBinaryTasks(spark, tasks, includeKeys, filter)
  }

  /** Cursor-derived per-partition NEXT offsets — the port of
    * S3Writer.fetchOffset (S3Writer.java:83-127): cursor file → index key →
    * last chunk's `first_record_offset + num_records`. A partition with no
    * cursor is absent from the map (the 404 ⇒ start-from-0 case,
    * S3Writer.java:101-107). Pass the result as `startOffsets` to
    * [[writeArchive]] to continue an existing bucket.
    */
  def fetchOffsets(spark: SparkSession, root: String, topic: String): Map[Int, Long] =
    fetchOffsetsTopics(spark, root, Set(topic)).map { case ((_, p), o) => p -> o }

  /** one bucket's cursor files for a topic SET (empty = every topic) — the
    * reference's source task reads topic sets per task
    * (S3SourceTask.java:82-94, topic filter S3FilesReader.java:82-105)
    */
  private def cursorFiles(fs: FileSystem, rootPath: Path,
      topics: Set[String]): Seq[(String, Int, Path)] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.flatMap { s =>
      s.getPath.getName match {
        case CursorName(t, p) if !s.isDirectory && (topics.isEmpty || topics(t)) =>
          Some((t, p.toInt, s.getPath))
        case _ => None
      }
    }.sortBy(c => (c._1, c._2))

  /** [[fetchOffsets]] over a topic set: per-(topic, partition) next offsets.
    * Cursor + index reads fan out on the shared metadata pool — at the
    * reference's own 200-partition cap each cursor is two small object-store
    * GETs, and a serial driver loop would be 400 round-trips before any
    * task launches.
    */
  def fetchOffsetsTopics(spark: SparkSession, root: String,
      topics: Set[String] = Set.empty): Map[(String, Int), Long] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.lake.MetaIO.fetchAll(cursorFiles(fs, rootPath, topics)) {
      case (t, p, path) =>
        val key = readSmall(fs, path).trim
        (t, p) -> parseIndex(readSmall(fs, new Path(rootPath, key))).nextOffset
    }.toMap
  }

  /** Cursor-trusted read: only files the cursor acknowledges — i.e. files
    * whose first offset is at or below the cursor's index key — are read;
    * later files are unpublished orphans from a crashed writer (data+index
    * uploaded, cursor never updated) and are EXCLUDED, because "readers
    * only trust the cursor" is the publish protocol's whole correctness
    * story (S3Writer.java:61-81; SURVEY.md §1.3). Partitions with no cursor
    * contribute nothing.
    */
  def readCommitted(spark: SparkSession, root: String, topic: String,
      filter: InputFilter = GunzipFilter): DataFrame =
    readCommittedTopics(spark, root, Set(topic), filter)

  /** [[readCommitted]] over a topic SET (empty = every topic in the bucket):
    * the records of every cursor-acknowledged file whose topic is in the
    * set, in one chunk-parallel read — each record carries its topic, so
    * callers split downstream with an ordinary filter. Cursor reads fan out
    * on the shared metadata pool (two sequential fan-outs — cursors, then
    * index fetches — never nested).
    */
  def readCommittedTopics(spark: SparkSession, root: String,
      topics: Set[String] = Set.empty,
      filter: InputFilter = GunzipFilter): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ackFirstOffset: Map[(String, Int), Long] =
      graft.lake.MetaIO.fetchAll(cursorFiles(fs, rootPath, topics)) {
        case (t, p, path) =>
          val key = readSmall(fs, path).trim
          new Path(key).getName match {
            case FileName(_, _, off) => Some((t, p) -> off.toLong)
            case _ => None
          }
      }.flatten.toMap
    val acked = listIndexFiles(fs, rootPath)
      .filter(f => ackFirstOffset.get((f.topic, f.partition)).exists(f.firstOffset <= _))
    readTasks(spark, fetchTasks(fs, root, acked), withHeader = false, filter)
  }

  /** The reference source's per-topic OUTPUT remap, config shape
    * `targetTopic.{original} = target` (S3SourceTask.java:40,223-225;
    * README.md:176 — "targetTopic.foo=bar would send messages originally in
    * topic foo to topic bar"): parse a properties map down to the
    * original→target pairs. Topics without an entry pass through unchanged,
    * exactly the reference's `getOrDefault(..., originalTopic)`.
    */
  def topicRemap(props: Map[String, String]): Map[String, String] =
    props.collect {
      case (k, v) if k.startsWith("targetTopic.") &&
          k.length > "targetTopic.".length =>
        k.stripPrefix("targetTopic.") -> v
    }

  /** Apply a topic remap to any topic-carrying frame. The map rides the
    * plan as a broadcast-free LITERAL map lookup (a handful of configured
    * topics, like the reference's in-memory `topicMapping`), so the rename
    * stays inside whole-stage codegen — no per-row driver logic, no UDF.
    */
  def remapTopics(df: DataFrame, remap: Map[String, String]): DataFrame =
    if (remap.isEmpty) df
    else {
      val entries = remap.toSeq.sortBy(_._1)
        .flatMap { case (o, t) => Seq(lit(o), lit(t)) }
      df.withColumn("topic",
        coalesce(element_at(map(entries: _*), col("topic")), col("topic")))
    }

  /** [[readCommittedTopics]] with the reference's config-driven remap
    * composed over it: records land under their TARGET topic names. The
    * `topics` restriction and the bucket's cursor protocol operate on
    * ORIGINAL names (the bucket's own file families); only the emitted
    * column is renamed — same order of operations as the reference, which
    * filters/lists by original topic and remaps at record construction
    * (S3SourceTask.java:183).
    */
  def readCommittedTopics(spark: SparkSession, root: String,
      topics: Set[String], props: Map[String, String]): DataFrame =
    remapTopics(readCommittedTopics(spark, root, topics, inputFilter(props)),
      topicRemap(props))

  /** [[readFromTopics]] with the config-driven remap. `committed` floors
    * key on ORIGINAL (topic, partition) — resume state tracks the bucket's
    * layout, the rename is output-side only.
    */
  def readFromTopics(spark: SparkSession, root: String,
      committed: Map[(String, Int), Long],
      props: Map[String, String]): DataFrame =
    remapTopics(readFromTopics(spark, root, committed, inputFilter(props)),
      topicRemap(props))

  private def readSmall(fs: FileSystem, p: Path): String = {
    val len = fs.getFileStatus(p).getLen
    require(len <= (16 << 20), s"$p unreasonably large for a metadata file")
    val in = fs.open(p)
    val bytes = new Array[Byte](len.toInt)
    in.readFully(0, bytes)
    in.close()
    new String(bytes, "UTF-8")
  }
}
