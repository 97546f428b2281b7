package graft

import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.util.zip.GZIPInputStream

import graft.sources.GzArchive
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level interop with the reference connector's block-gzip archive.
  *
  * Golden constants come from the reference's own system test
  * (system_test/run.py:214-221): 100 records of
  * `{"foo": "bar", "counter":N}` must produce index JSON exactly
  * `{"chunks":[{"byte_length_uncompressed":2890,"num_records":100,
  * "byte_length":275,"byte_offset":0,"first_record_offset":0}]}` and a
  * 275-byte data file that gunzips back to the newline-joined records.
  *
  * The chunked-write invariants port BlockGZIPFileWriterTest.java:59-160:
  * small threshold ⇒ ≥10 chunks; every chunk is independently readable as
  * its own gzip stream from (byte_offset, byte_length); chunks tile the
  * record and byte spaces exactly.
  */
class GzArchiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def localFs = FileSystem.get(new java.net.URI("file:///"), new Configuration())

  private def gunzipAll(bytes: Array[Byte]): Seq[String] = {
    val r = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(new ByteArrayInputStream(bytes)), "UTF-8"))
    Iterator.continually(r.readLine()).takeWhile(_ != null).toSeq
  }

  private def readFileBytes(p: Path, off: Long, len: Int): Array[Byte] = {
    val in = localFs.open(p)
    val buf = new Array[Byte](len)
    in.readFully(off, buf)
    in.close()
    buf
  }

  test("golden bytes: the reference system test's 100-record file") {
    val dir = new Path(SparkTestSession.tempDir("gzgold"))
    val w = new GzArchive.BlockGzWriter(localFs, dir, "system-test-00000")
    val records = (0 until 100).map(i => s"""{"foo": "bar", "counter":$i}""")
    records.foreach(r => w.write((r + "\n").getBytes("UTF-8")))
    w.close()

    assert(w.dataFileName === "system-test-00000-000000000000.gz")
    assert(w.indexFileName === "system-test-00000-000000000000.index.json")

    // index JSON is byte-identical to the reference's golden string
    val idxBytes = readFileBytes(w.indexFilePath, 0,
      localFs.getFileStatus(w.indexFilePath).getLen.toInt)
    assert(new String(idxBytes, "UTF-8") ===
      """{"chunks":[{"byte_length_uncompressed":2890,"num_records":100,""" +
        """"byte_length":275,"byte_offset":0,"first_record_offset":0}]}""")

    // data file is exactly the golden compressed length and decodes back
    val st = localFs.getFileStatus(w.dataFilePath)
    assert(st.getLen === 275L)
    assert(gunzipAll(readFileBytes(w.dataFilePath, 0, 275)) === records)
  }

  test("filenames carry the first record offset, zero-padded to 12 digits") {
    val dir = new Path(SparkTestSession.tempDir("gznames"))
    val w = new GzArchive.BlockGzWriter(localFs, dir, "foo", firstRecordOffset = 123456L)
    assert(w.dataFileName === "foo-000000123456.gz")
    assert(w.indexFileName === "foo-000000123456.index.json")
    w.write("x\n".getBytes("UTF-8"))
    w.close()
  }

  test("chunked write: every chunk independently gunzips from its byte range") {
    val dir = new Path(SparkTestSession.tempDir("gzchunks"))
    val pad = "0123456789" * 20
    val w = new GzArchive.BlockGzWriter(localFs, dir, "write-test",
      firstRecordOffset = 987654321L, chunkThreshold = 1000L)
    val lines = (0 until 50).map(i => s"Record $i $pad")
    lines.foreach(l => w.write((l + "\n").getBytes("UTF-8")))
    assert(w.numRecords === 50L)
    assert(w.numChunks >= 10, "50 × ~210B at 1000B threshold must give ≥10 chunks")
    w.close()

    val idx = GzArchive.parseIndex(new String(readFileBytes(w.indexFilePath, 0,
      localFs.getFileStatus(w.indexFilePath).getLen.toInt), "UTF-8"))
    assert(idx.chunks.size === w.numChunks)

    var expectOffset = 987654321L
    var recordIdx = 0
    var totalBytes = 0L
    idx.chunks.foreach { c =>
      assert(c.firstRecordOffset === expectOffset)
      assert(c.byteLength > 0 && c.byteOffset >= 0)
      val got = gunzipAll(readFileBytes(w.dataFilePath, c.byteOffset, c.byteLength.toInt))
      assert(got.size.toLong === c.numRecords)
      got.foreach { line => assert(line === lines(recordIdx)); recordIdx += 1 }
      totalBytes += c.byteLength
      expectOffset = c.firstRecordOffset + c.numRecords
    }
    assert(recordIdx === 50)
    assert(totalBytes === localFs.getFileStatus(w.dataFilePath).getLen,
      "chunks must cover all bytes in the file")

    // and the whole file still reads as ONE valid gzip stream
    assert(gunzipAll(readFileBytes(w.dataFilePath, 0,
      localFs.getFileStatus(w.dataFilePath).getLen.toInt)) === lines)
  }

  test("header is its own leading gzip member; chunk 0 starts after it") {
    // port of the header-as-own-chunk behavior
    // (BlockGZIPFileWriter.java:142-150): readers that need the header know
    // exactly how many bytes to skip because chunk 0's byte_offset excludes it
    val dir = new Path(SparkTestSession.tempDir("gzheader"))
    val header = "format=text v1\n".getBytes("UTF-8")
    val w = new GzArchive.BlockGzWriter(localFs, dir, "hdr", 0L, 1000L, header)
    val lines = (0 until 5).map(i => s"rec $i")
    lines.foreach(l => w.write((l + "\n").getBytes("UTF-8")))
    w.close()

    val idx = GzArchive.parseIndex(new String(readFileBytes(w.indexFilePath, 0,
      localFs.getFileStatus(w.indexFilePath).getLen.toInt), "UTF-8"))
    val c0 = idx.chunks.head
    assert(c0.byteOffset > 0, "chunk 0 must start after the header member")
    // bytes [0, c0.byteOffset) are the header member, independently gunzippable
    assert(gunzipAll(readFileBytes(w.dataFilePath, 0, c0.byteOffset.toInt))
      === Seq("format=text v1"))
    // chunk 0 decodes the records from its recorded range
    assert(gunzipAll(readFileBytes(w.dataFilePath, c0.byteOffset, c0.byteLength.toInt))
      === lines)
    // and the whole file still reads as one stream: header + records
    val total = localFs.getFileStatus(w.dataFilePath).getLen.toInt
    assert(gunzipAll(readFileBytes(w.dataFilePath, 0, total))
      === ("format=text v1" +: lines))
  }

  test("distributed roundtrip with file roll + index-pruned resume") {
    import spark.implicits._
    val root = SparkTestSession.tempDir("gzdist")
    val df = (0 until 2).flatMap { p =>
      (0 until 120).map(i => (p, i.toLong * 7, s"p$p line $i"))
    }.toDF("partition", "k", "line")
    GzArchive.writeArchive(df, root, "t", "k",
      chunkThreshold = 256, recordsPerFile = 50)

    // file roll: 120 records / 50 per file = 3 files per partition, named by
    // their first archive offset
    val names = localFs.listStatus(new Path(root)).map(_.getPath.getName).sorted
    assert(names.count(_.endsWith(".gz")) === 6)
    assert(names.contains("t-00000-000000000000.gz"))
    assert(names.contains("t-00000-000000000050.gz"))
    assert(names.contains("t-00001-000000000100.gz"))

    val back = GzArchive.read(spark, root)
    assert(back.count() === 240L)
    val rows = back.orderBy("partition", "offset")
      .select("partition", "offset", "value").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val (p, off) = (i / 120, i % 120)
      assert(r.getInt(0) === p)
      assert(r.getLong(1) === off.toLong)
      assert(r.getString(2) === s"p$p line $off") // sort key order = k = 7i
    }

    // resume: partition 0 from offset 100 (boundary chunk filtered after
    // decode), partition 1 from 29 (whole leading chunks pruned via index)
    val resumed = GzArchive.readFrom(spark, root, Map(0 -> 100L, 1 -> 29L))
    val byPart = resumed.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("first"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byPart(0) === ((19L, 101L)))
    assert(byPart(1) === ((90L, 30L)))

    // a fully caught-up partition reads nothing
    assert(GzArchive.readFrom(spark, root, Map(0 -> 119L, 1 -> 119L)).count() === 0L)
  }
}
