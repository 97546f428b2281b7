package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** Filesystem plumbing shared by the journal and the lake table: snapshot
  * pointer swap + manifest read/write, via the Hadoop FileSystem API so the
  * same code runs on local disk here and on HDFS/S3A on a real cluster.
  *
  * This is the generalization of the reference's publish protocol
  * (sink/.../S3Writer.java:61-81: upload data, then index, then overwrite the
  * `last_chunk_index.{topic}-{partition}.txt` cursor; readers trust only the
  * cursor). Our cursor is `snapshot.json`, swapped by atomic rename; data and
  * manifest files that lost a race are unreferenced garbage, exactly like the
  * reference's orphaned uploads (SURVEY.md §4 caveat).
  */
object TableIO {
  /** Test seam: invoked before every attempt of a retried commit-boundary
    * op; specs throw an IOException from here to simulate a transient
    * object-store failure. Production never touches it.
    */
  @volatile private[graft] var faultHook: String => Unit = _ => ()
}

/** The atomic-publish primitive as a SEAM. Every durable mutation this
  * engine's commit protocol performs reduces to two operations — publish a
  * complete small object at a known name (snapshot/manifest/cursor swap) and
  * publish a staged data file at its deterministic name — and WHICH
  * filesystem mutation implements them atomically differs by store:
  * rename-with-overwrite on HDFS/local (the default below), a whole-object
  * overwrite PUT on S3 (the one mutation S3 does atomically — the
  * reference's entire publish protocol is built on it,
  * sink/.../S3Writer.java:142-153). Readers' contract is the seam's
  * contract: at `dest` they must only ever observe the previous complete
  * content or the new complete content, never absence-after-existence or a
  * torn prefix.
  *
  * Implementations receive the owning [[TableIO]] for its FileSystem
  * handles; they perform ONE logical publish per call and may throw — retry
  * policy (bounded, jittered) stays in TableIO, store-agnostic.
  */
trait CommitStore {
  /** Atomically materialize `content` at `dest`, overwriting any previous
    * version.
    */
  def putAtomic(io: TableIO, dest: Path, content: String): Unit

  /** Publish the staged file `src` at `dest`, overwriting. The staged
    * source is consumed on success; on failure it may survive as
    * unreferenced garbage for the staging sweep (never referenced by any
    * manifest, so harmless — the reference's orphaned-upload story).
    */
  def publishFile(io: TableIO, src: Path, dest: Path): Unit
}

/** Default store: single rename-with-OVERWRITE, atomic on HDFS and local
  * filesystems (a posix/HDFS rename either fully happens or doesn't).
  */
object RenameCommitStore extends CommitStore {
  def putAtomic(io: TableIO, dest: Path, content: String): Unit = {
    // The tmp name is unique per attempt: a FIXED tmp name would let two
    // racing writers (a zombie and its fenced successor both commit here by
    // design) interleave writes into one tmp file and rename a torn mix
    // over the destination — the exact torn-read failure this method
    // exists to prevent. A failed attempt best-effort reclaims its own tmp.
    val tmp = new Path(dest.getParent, dest.getName +
      s".tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      io.writeString(tmp, content)
      io.renameOverwrite(tmp, dest)
    } catch {
      case t: Throwable =>
        try io.fs.delete(tmp, false): Unit catch { case _: Throwable => () }
        throw t
    }
  }

  def publishFile(io: TableIO, src: Path, dest: Path): Unit = {
    io.fs.delete(dest, false)
    if (!io.fs.rename(src, dest))
      throw new java.io.IOException(s"rename $src -> $dest failed")
  }
}

final class TableIO(val root: String, spark: SparkSession,
    store: CommitStore = RenameCommitStore) {
  private val conf = spark.sparkContext.hadoopConfiguration
  val rootPath = new Path(root)
  val fs: FileSystem = rootPath.getFileSystem(conf)

  /** Bounded retry with jittered exponential backoff for driver-side FS
    * calls at the commit boundary (promote renames, snapshot swaps). Spark's
    * task retries don't cover these, and on an object store one flaky
    * copy/rename would otherwise fail the whole batch — the reference
    * retries its uploads the same way (common/.../S3.java:41-47, retry
    * count/backoff config S3ConfigurationConfig.java:108-110). Only
    * IOExceptions (transient-IO shaped) retry; contract violations
    * (IllegalArgument/IllegalState) propagate immediately.
    */
  private def retry[T](tag: String, attempts: Int = 4)(body: => T): T = {
    var delay = 100L
    var n = 0
    while (true) {
      n += 1
      try {
        TableIO.faultHook(tag)
        return body
      } catch {
        case e: java.io.IOException =>
          if (n >= attempts) throw e
          Thread.sleep(delay / 2 +
            java.util.concurrent.ThreadLocalRandom.current().nextLong(delay / 2 + 1))
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def snapshotPath = new Path(rootPath, "snapshot.json")

  def readString(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  def writeString(p: Path, s: String): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private lazy val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)

  /** Single rename-with-OVERWRITE (FileContext — FileSystem.rename has no
    * overwrite flag). Exposed for [[RenameCommitStore]]; atomic on HDFS and
    * local fs.
    */
  private[lake] def renameOverwrite(src: Path, dest: Path): Unit =
    fc.rename(fs.makeQualified(src), fs.makeQualified(dest),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)

  /** Atomic write via the [[CommitStore]] seam — there is never a window
    * with the destination missing or truncated. (The previous
    * delete-then-rename had a crash window that left NO snapshot, silently
    * resetting the table to "brand new" and orphaning all history.) The
    * default store renames (atomic on HDFS/local); an object-store backend
    * plugs in its own atomic publish (on S3, the whole-object overwrite PUT
    * — the reference's cursor overwrite, S3Writer.java:142-153). The whole
    * publish retries as a unit.
    */
  def writeAtomic(dest: Path, s: String): Unit = retry("writeAtomic") {
    store.putAtomic(this, dest, s)
  }

  def swapSnapshot(json: String): Unit = writeAtomic(snapshotPath, json)

  /** Current snapshot, or None for a brand-new table — the 404 ⇒ offset 0
    * case (S3Writer.java:101-107).
    */
  def readSnapshot(): Option[com.fasterxml.jackson.databind.JsonNode] =
    if (fs.exists(snapshotPath)) Some(Json.parse(readString(snapshotPath))) else None

  def delete(rel: String): Unit = fs.delete(new Path(rootPath, rel), true)

  def exists(rel: String): Boolean = fs.exists(new Path(rootPath, rel))

  /** Move the single parquet part-file Spark wrote under `srcDir` to the
    * deterministic, offset-keyed destination name. Deterministic names are
    * load-bearing: re-running a batch overwrites the same keys instead of
    * appending, which is the reference's whole dedup story
    * (offset-named S3 keys, BlockGZIPFileWriter.java:161-163).
    */
  def promoteSingleFile(srcDir: Path, dest: Path): Unit = retry("promote") {
    val parts = fs.listStatus(srcDir).filter(_.getPath.getName.startsWith("part-"))
    if (parts.isEmpty && fs.exists(dest)) {
      // a previous attempt's publish already consumed the staged file
      // (failure happened after the move) — the retry is a no-op, the
      // destination is complete
    } else {
      require(parts.length == 1,
        s"expected exactly one part file in $srcDir, got ${parts.length}")
      fs.mkdirs(dest.getParent)
      store.publishFile(this, parts.head.getPath, dest)
    }
  }

  /** Exact row count from the parquet footer — manifest stats without a
    * Spark job (the footer is the file's own ChunkDescriptor: the writer
    * already recorded per-block row counts, so a count(*) scan would be
    * redundant work).
    */
  def parquetRowCount(p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}
