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

  private val knownCodecs = Set("snappy", "zstd", "lz4", "gzip", "uncompressed")

  /** Write-time Hadoop overrides for the engine's STAGING parquet writes
    * (merge/append/compact). These dirs are consumed solely by our own
    * promote protocol, which re-wipes staging on any retry and requires
    * exactly one part file per bucket dir — so the committer can take the
    * fast path: no `_SUCCESS` marker (one create per write saved) and
    * algorithm v2 (tasks publish straight into the staging dir at task
    * commit instead of a second driver-side merge-rename pass over every
    * file at job commit — with one file per touched bucket that pass was
    * O(touched buckets) serial renames per batch, and on an object store
    * each one is a copy). v1's extra safety only protects readers of the
    * job's output dir from partially-committed jobs, which our staged →
    * promote → CAS pipeline never exposes.
    */
  private[graft] val stagingWriteOptions: Map[String, String] = Map(
    "mapreduce.fileoutputcommitter.marksuccessfuljobs" -> "false",
    "mapreduce.fileoutputcommitter.algorithm.version" -> "2")

  /** Parquet codec for DATA files (`graft.lake.codec`, default zstd).
    * A 100-TB lever: storage cost and scan IO trade against write CPU.
    * Measured on the full pipeline shape (CodecBench, BENCH/BASELINE.md
    * r07): zstd stores 43% fewer bytes than snappy at indistinguishable
    * ingest and scan time — on an object store those bytes are also the
    * transfer and request cost, so zstd dominates. Manifests and snapshots
    * are tiny JSON and unaffected.
    */
  private[lake] def dataCodec: String = {
    val c = sys.props.getOrElse("graft.lake.codec", "zstd").toLowerCase
    require(knownCodecs(c),
      s"graft.lake.codec must be one of ${knownCodecs.mkString(", ")}; got '$c'")
    c
  }
}

/** A conditional snapshot publish lost its compare-and-swap: another writer
  * committed the version this writer expected to claim. The failed batch did
  * NOT commit (its staged data and manifest are unreferenced garbage for the
  * vacuum sweep); the caller must re-read the table state before retrying.
  * Loud by design — the reference never needs this because Kafka Connect
  * guarantees one task per partition (the cursor overwrite at
  * sink/.../S3Writer.java:142-153 is safe only under that exclusivity); a
  * shared lake table earns the same safety with a CAS commit instead.
  */
final class ConcurrentCommitException(msg: String)
  extends IllegalStateException(msg)

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

  /** Compare-and-swap publish for the table's commit point. `dest` holds a
    * small JSON object carrying a monotonically increasing numeric
    * `version`; publish `content` (whose version is `expected + 1`) ONLY if
    * the version currently at `dest` equals `expected` (`-1` = dest must
    * not exist — a brand-new table). Returns false when the precondition
    * fails — another writer committed first — and the store must make the
    * check-and-publish atomic against its own concurrent callers.
    *
    * Idempotency contract: if `dest` already holds exactly `content` (a
    * retried publish that had in fact succeeded), return true — a retry of
    * one's own completed swap is success, not a lost race.
    */
  def putIfVersion(io: TableIO, dest: Path, content: String, expected: Long): Boolean

  /** Exclusive create: materialize `content` at `dest` ONLY if nothing
    * exists there, atomically against the store's own concurrent callers —
    * If-None-Match on an object store, no-overwrite rename on HDFS. Returns
    * false when `dest` already exists (some writer — possibly a crashed
    * one — claimed the name first). This is the claim primitive for
    * version-NAMED meta files (`manifest-v{N}`): [[putIfVersion]] guards
    * the pointer, but the pointer CAS alone cannot stop a raced loser from
    * overwriting the WINNER'S version-named file before its own swap fails
    * — the file write itself must be exclusive (Delta's LogStore
    * `putIfAbsent` is this exact primitive).
    */
  def putIfAbsent(io: TableIO, dest: Path, content: String): Boolean
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

  // Per-destination JVM locks: same-process writers (the spec's race, or two
  // pipelines in one driver) serialize the check-and-claim exactly; the
  // version-named marker rename below is the cross-PROCESS backstop (atomic
  // exclusive on HDFS; on a raw local fs the no-overwrite rename has the
  // usual check-then-act window, which is why the lock exists — the same
  // split Delta's single-driver LogStore documents for local/dev use).
  private val casLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** CAS markers retained below the published version (see the GC note in
    * [[putIfVersion]]): the roll-forward repair needs a surviving marker.
    */
  private[lake] val markerRetain = 8L

  /** Exclusive create: complete tmp + no-overwrite rename (same primitive
    * as the CAS markers below — atomic on HDFS, JVM-lock-backstopped on a
    * raw local fs). A crash mid-write leaves only an unreferenced tmp, so
    * an existing `dest` is always COMPLETE — the invariant the orphan
    * roll-forward in [[TableIO.resolveLostVersionClaim]] relies on.
    */
  def putIfAbsent(io: TableIO, dest: Path, content: String): Boolean = {
    // lock key = the PARENT dir, not the (version-unique) dest: claims are
    // one-per-commit, so per-dest interning would grow the JVM-singleton
    // map by one dead entry per commit forever. Per-table serialization is
    // exactly the putIfVersion granularity anyway (commits serialize on
    // the one snapshot path).
    val q = io.fs.makeQualified(dest.getParent).toString
    val lock = casLocks.computeIfAbsent(q, _ => new Object)
    lock.synchronized {
      // no exists() pre-check: the no-overwrite rename is the authority
      // (throws FileAlreadyExists on both HDFS and local FileContext), and
      // the commit path pays for every metadata RPC here (measured:
      // CommitProtocolBench)
      val tmp = new Path(dest.getParent, dest.getName +
        s".tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      try {
        io.writeString(tmp, content)
        io.renameNoOverwrite(tmp, dest)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          try io.fs.delete(tmp, false): Unit
          catch { case _: Throwable => () }
          false // a cross-process writer claimed the name first
        case t: Throwable =>
          try io.fs.delete(tmp, false): Unit
          catch { case _: Throwable => () }
          throw t
      }
    }
  }

  /** CAS via version-named claim markers + roll-forward.
    *
    * Claiming version v = expected+1 is a rename WITHOUT overwrite of a
    * complete tmp file onto `_cas/<dest>.v{v}` — exactly one claimer can
    * win, and a crash mid-write leaves no marker (the tmp is unreferenced
    * garbage), so an existing marker is always complete. The marker IS the
    * commit point: a writer that crashed between claiming and publishing
    * left a durable commit that the next caller ROLLS FORWARD into `dest`
    * before judging its own precondition — no committed version is ever
    * lost, and the crashed writer's restart sees its own commit (and is
    * deduped by the batch fence). Markers at or below the published
    * version are inert and GC'd opportunistically.
    */
  def putIfVersion(io: TableIO, dest: Path, content: String,
      expected: Long): Boolean = {
    val q = io.fs.makeQualified(dest).toString
    val lock = casLocks.computeIfAbsent(q, _ => new Object)
    lock.synchronized {
      val casDir = new Path(dest.getParent, "_cas")
      val prefix = dest.getName + ".v"
      def markerVersion(p: Path): Option[Long] = {
        val n = p.getName
        if (n.startsWith(prefix))
          scala.util.Try(n.drop(prefix.length).toLong).toOption
        else None
      }
      // list-and-catch / read-and-catch, not exists-then-act: each probe
      // is one metadata RPC the commit path pays every swap
      // (CommitProtocolBench), and the catch closes the probe→act TOCTOU
      def listMarkers(): Seq[(Path, Long)] =
        try io.fs.listStatus(casDir).toSeq.map(_.getPath)
          .flatMap(p => markerVersion(p).map(p -> _))
        catch { case _: java.io.FileNotFoundException => Nil }
      val markers = listMarkers()
      def destVersion(): Long =
        try Json.parse(io.readString(dest)).get("version").asLong
        catch { case _: java.io.FileNotFoundException => -1L }
      // Publish `content` (version v) only if dest is still BEHIND v,
      // re-reading immediately before the PUT: in-JVM callers are
      // serialized by casLocks, but a peer PROCESS may have published a
      // newer version since our listing — an unconditional PUT here could
      // move the pointer BACKWARD (violating the snapshot-only-moves-
      // forward contract readers rely on). The re-read shrinks that TOCTOU
      // window to the read→PUT gap, and a regression that still slips
      // through is repaired IMMEDIATELY after the PUT: the newer version's
      // marker is retained (markerRetain below keeps the last K, so a
      // delayed PUT can no longer outlive its repair source — the r7
      // ADVICE sticky-regression mode), and the newest marker above the
      // re-read pointer is rolled forward on the spot. The repair's own
      // read→PUT gap shrinks the window again by the same argument; any
      // residue self-heals at the next putIfVersion. True cross-process
      // serialization needs a store-level conditional PUT — exactly what
      // an object-store CommitStore supplies.
      def publishIfBehind(v: Long, c: String): Unit =
        if (destVersion() < v) {
          putAtomic(io, dest, c)
          val cur2 = destVersion()
          listMarkers().filter(_._2 > cur2).sortBy(_._2).lastOption.foreach {
            case (p, mv) =>
              val mc = try Some(io.readString(p))
                       catch { case _: java.io.FileNotFoundException => None }
              mc.foreach(c2 => if (destVersion() < mv) putAtomic(io, dest, c2))
          }
        }
      var cur = destVersion()
      // roll forward the highest committed-but-unpublished marker
      markers.filter(_._2 > cur).sortBy(_._2).lastOption.foreach {
        case (p, v) => publishIfBehind(v, io.readString(p)); cur = v
      }
      if (cur == expected + 1 && io.readString(dest) == content)
        return true // idempotent retry of our own completed publish
      if (cur != expected) return false
      val v = expected + 1
      val marker = new Path(casDir, f"$prefix$v%012d")
      val tmp = new Path(casDir, marker.getName +
        s".tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      try {
        io.writeString(tmp, content)
        io.renameNoOverwrite(tmp, marker)
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          try io.fs.delete(tmp, false): Unit
          catch { case _: Throwable => () }
          return false // a cross-process claimer beat us to v
        case t: Throwable =>
          try io.fs.delete(tmp, false): Unit
          catch { case _: Throwable => () }
          throw t
      }
      // our marker IS the commit point; the pointer publish is conditional
      // too (a peer that rolled our marker forward and committed v+1 must
      // not be regressed by our own delayed PUT)
      publishIfBehind(v, content)
      // GC only markers OLDER than the last `markerRetain` versions, never
      // everything at or below `expected`: a retained marker is the repair
      // source for publishIfBehind's post-PUT roll-forward — GC'ing at the
      // published version made a sufficiently delayed peer PUT a STICKY
      // pointer regression with nothing left to heal from (r7 ADVICE).
      // K small files of retention cost nothing; the sweep stays one
      // already-listed pass.
      markers.filter(_._2 <= expected - RenameCommitStore.markerRetain)
        .foreach { case (p, _) =>
          try io.fs.delete(p, false): Unit catch { case _: Throwable => () }
        }
      true
    }
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
    // no mkdirs: FileSystem.create makes parents (Hadoop contract, all
    // impls here), and the commit path pays 3 writeStrings per commit —
    // the redundant mkdirs was one metadata RPC each (CommitProtocolBench)
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

  /** Rename that FAILS (FileAlreadyExistsException) if `dest` exists — the
    * exclusive-claim primitive for [[RenameCommitStore.putIfVersion]]
    * (atomic on HDFS; see the casLocks note for local fs).
    */
  private[graft] def renameNoOverwrite(src: Path, dest: Path): Unit =
    fc.rename(fs.makeQualified(src), fs.makeQualified(dest),
      org.apache.hadoop.fs.Options.Rename.NONE)

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

  /** Compare-and-swap snapshot publish — the table's ONE commit point for
    * concurrent-writer safety. `expected` is the snapshot version this
    * writer planned against (`-1` for a brand-new table); if another writer
    * committed in between, the swap fails LOUDLY with
    * [[ConcurrentCommitException]] and nothing was published (the staged
    * manifest/data are unreferenced garbage for vacuum). Retries as a unit:
    * the store's idempotency contract makes a retry of an own completed
    * swap read as success, never as a lost race.
    */
  def swapSnapshot(json: String, expected: Long): Unit = {
    val won = retry("swapSnapshot") {
      store.putIfVersion(this, snapshotPath, json, expected)
    }
    if (!won) {
      val cur = readSnapshot()
      val curV = cur.map(_.get("version").asLong).getOrElse(-1L)
      val curApp = cur.flatMap(s => Option(s.get("appId")).map(_.asText))
        .getOrElse("?")
      throw new ConcurrentCommitException(
        s"lost commit race at $root: expected snapshot version $expected " +
          s"but found $curV (appId=$curApp); this batch did NOT commit — " +
          "re-read the table state before retrying")
    }
  }

  /** Current snapshot, or None for a brand-new table — the 404 ⇒ offset 0
    * case (S3Writer.java:101-107).
    */
  def readSnapshot(): Option[com.fasterxml.jackson.databind.JsonNode] =
    // read-and-catch, not exists-then-read: one RPC instead of two on the
    // per-commit plan-coherence check, and no TOCTOU between the probe and
    // the open (a concurrent first commit between them read as a crash)
    try Some(Json.parse(readString(snapshotPath)))
    catch { case _: java.io.FileNotFoundException => None }

  /** The plan-coherence guard at the door of every commit — ONE
    * implementation for both tables (the protocol's most safety-critical
    * check must never fork between copies). The caller's plan (state read,
    * watermark gate, schema ladder, staged files) is valid only against
    * `plannedVersion`; a foreign commit that landed mid-batch makes it
    * stale — fail LOUDLY here, before anything is written. The exclusive
    * manifest claim and the pointer CAS close the remaining windows.
    * Returns the snapshot it judged, for the caller's own use.
    */
  def requirePlanCoherent(plannedVersion: Long, what: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    val prev = readSnapshot()
    val current = prev.map(_.get("version").asLong).getOrElse(-1L)
    if (current != plannedVersion) {
      val who = prev.flatMap(s => Option(s.get("appId")).map(_.asText))
        .getOrElse("?")
      throw new ConcurrentCommitException(
        s"$what $root advanced while this batch was planned/written: " +
          s"planned against version $plannedVersion, found $current " +
          s"(appId=$who); this batch did NOT commit — re-read and retry")
    }
    prev
  }

  /** The snapshot pointer's canonical serialization. ONE builder for every
    * producer (lake commit, journal commit, orphan roll-forward): the CAS
    * idempotency contract compares CONTENT byte-for-byte, so a roll-forward
    * that publishes on a live claimer's behalf must produce exactly the
    * bytes that claimer's own retry will present.
    */
  def snapshotJson(version: Long, manifestRel: String, batchId: Long,
      appId: String): String = {
    val snap = Json.obj()
    snap.put("version", version)
    snap.put("manifest", manifestRel)
    snap.put("batchId", batchId)
    snap.put("appId", appId)
    Json.write(snap)
  }

  /** Exclusively claim the version-named meta file `dest` (manifest). True
    * = ours (including the idempotent retry of an own completed create);
    * false = another writer holds the name — resolve with
    * [[resolveLostVersionClaim]]. The pointer CAS ([[swapSnapshot]]) alone
    * cannot give this safety: a loser that wrote `manifest-v{N}` with a
    * plain overwrite before failing its swap would CORRUPT the winner's
    * already-published commit, since the winner's snapshot references that
    * very name.
    */
  def createVersioned(dest: Path, content: String): Boolean =
    retry("createVersioned") {
      store.putIfAbsent(this, dest, content) ||
        // a transient failure AFTER our create succeeded retries into
        // "already exists" — identical content means it is ours
        (fs.exists(dest) && readString(dest) == content)
    }

  /** A version-named manifest claim was lost: either a concurrent writer
    * committed this version, or a writer CRASHED between creating its
    * manifest and swapping the pointer. Disambiguate by the pointer: if it
    * already advanced past `plannedVersion`, simply lose; if it still reads
    * `plannedVersion`, the existing manifest is a complete crashed commit
    * (exclusive creates are all-or-nothing, and every caller promotes data
    * files BEFORE committing) — ROLL IT FORWARD so the table never wedges
    * on a dead writer's claim. Either way this writer's batch did not
    * commit: always throws [[ConcurrentCommitException]].
    */
  def resolveLostVersionClaim(manifestRel: String, version: Long,
      plannedVersion: Long): Nothing = {
    val cur = readSnapshot()
    val curV = cur.map(_.get("version").asLong).getOrElse(-1L)
    if (curV == plannedVersion) {
      val m = Json.parse(readString(new Path(rootPath, manifestRel)))
      val who = Option(m.get("appId")).map(_.asText).getOrElse("?")
      try {
        swapSnapshot(snapshotJson(version, manifestRel,
          m.get("batchId").asLong, who), plannedVersion)
        System.err.println(s"[graft] WARN: rolled forward writer $who's " +
          s"committed-but-unpublished version $version at $root (claimed " +
          "but never swapped — a crash, or a live writer mid-publish)")
      } catch {
        // the claimer was alive after all and swapped first — same outcome
        case _: ConcurrentCommitException => ()
      }
    }
    val who = readSnapshot()
      .flatMap(s => Option(s.get("appId")).map(_.asText)).getOrElse("?")
    throw new ConcurrentCommitException(
      s"lost the claim on $manifestRel at $root: another writer " +
        s"(appId=$who) holds version $version; this batch did NOT commit " +
        "— re-read the table state before retrying")
  }

  def delete(rel: String): Unit = fs.delete(new Path(rootPath, rel), true)

  def exists(rel: String): Boolean = fs.exists(new Path(rootPath, rel))

  /** ONE recursive listing of a staged write tree → relative bucket dir
    * (e.g. `_pp=3/_ss=7`, or `_p=2` for the journal) → that dir's single
    * part file. Replaces the per-bucket exists + listStatus probes the
    * promote loop used to pay — O(touched buckets) metadata round-trips per
    * batch collapse into one paged LIST on an object store. Exactly-one
    * part file per bucket dir is REQUIRED here (same invariant the old
    * per-dir listing enforced): a second part would mean the write lost its
    * one-task-per-bucket clustering.
    */
  def listStagedParts(staging: Path): Map[String, Path] = {
    // plain listStatus recursion over the (two-level) staging tree, NOT
    // FileSystem.listFiles(recursive=true): the generic recursive iterator
    // materializes LocatedFileStatus — block locations per file — and
    // measured ~230 ms per merge batch on a 32-bucket local tree vs ~5 ms
    // for this walk (the exact regression the promote-phase counter
    // caught). An object-store backend would implement this seam as one
    // flat prefix LIST; the structural point — one sweep, no per-bucket
    // probes — is what the promote callers rely on.
    val base = fs.makeQualified(staging).toString
    val out = scala.collection.mutable.HashMap.empty[String, Path]
    def walk(dir: Path): Unit = {
      val entries =
        try fs.listStatus(dir)
        catch { case _: java.io.FileNotFoundException => return }
      entries.foreach { st =>
        val p = st.getPath
        if (st.isDirectory) {
          if (p.getName != "_temporary") walk(p)
        } else if (p.getName.startsWith("part-")) {
          val parent = fs.makeQualified(p.getParent).toString
          require(parent.startsWith(base),
            s"staged part $p resolved outside $staging")
          val rel = parent.drop(base.length).stripPrefix("/")
          require(!out.contains(rel),
            s"expected exactly one part file under $staging/$rel, found more")
          out(rel) = p
        }
      }
    }
    walk(staging)
    out.toMap
  }

  /** Publish a staged part file (already located by [[listStagedParts]] —
    * no per-file probes) at its deterministic, offset-keyed destination
    * name. Deterministic names are load-bearing: re-running a batch
    * overwrites the same keys instead of appending, which is the
    * reference's whole dedup story (offset-named S3 keys,
    * BlockGZIPFileWriter.java:161-163). The caller creates `dest`'s parent
    * dir ONCE per batch, not per file. A RETRY that finds the source gone
    * and the destination present treats the previous attempt's publish as
    * complete (failure hit after the move) — the old per-dir listing's
    * no-op case, reached here only on the failure path where the extra
    * probes are free.
    */
  def promoteListedFile(src: Path, dest: Path): Unit = {
    var attempt = 0
    retry("promote") {
      attempt += 1
      if (attempt > 1 && !fs.exists(src)) {
        if (!fs.exists(dest)) throw new java.io.IOException(
          s"staged $src vanished mid-promote and $dest is absent")
      } else store.publishFile(this, src, dest)
    }
  }

  /** Opportunistic reclamation of ABANDONED staging (crashed writers'
    * leftovers under `_staging/`): only entries past the grace window — a
    * live peer's in-flight staging is always younger than its own batch.
    * Replaces the old wholesale `_staging` delete, which was safe only
    * under single-writer exclusivity (it would nuke a concurrent writer's
    * in-flight promote sources mid-batch).
    *
    * An entry's age is the NEWEST DESCENDANT FILE, never the top-level
    * directory mtime: object stores have no real directories (an S3A
    * fake-dir prefix reports mtime 0 or probe time — trusting it would
    * either reclaim a live peer's in-flight staging or never reclaim at
    * all), and a long-running job that is still writing keeps its staging
    * alive file by file, so the grace window no longer needs to outlast
    * the longest believable job. Unknown age (no files, no trustworthy
    * mtime) never reclaims. Staging is transient and small next to the
    * data it produces; reclaiming it a week late costs nothing, and the
    * per-entry recursive listing runs at maintenance cadence, not on the
    * commit path (CommitProtocolBench).
    */
  def sweepStaleStaging(graceMs: Long = 7L * 24 * 3600 * 1000): Unit = {
    // crashed writers also leak `*.tmp-{pid}-{nanos}` files from the
    // atomic-publish primitives (putAtomic / putIfAbsent / the CAS marker
    // claim) in _cas/ and next to their destinations at the root; nothing
    // referenced them, and until r8 nothing ever reclaimed them (ADVICE r7:
    // unbounded residue across crashes). Same grace window, same
    // maintenance cadence — a live writer's in-flight tmp is always
    // younger than its own publish.
    val cutoff = System.currentTimeMillis() - graceMs
    Seq(rootPath, new Path(rootPath, "_cas")).foreach { d =>
      val listed =
        try fs.listStatus(d)
        catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
      listed.foreach { st =>
        if (st.isFile && st.getPath.getName.matches(""".*\.tmp-\d+-\d+""") &&
            st.getModificationTime < cutoff)
          try fs.delete(st.getPath, false): Unit catch { case _: Throwable => () }
      }
    }
    val dir = new Path(rootPath, "_staging")
    val entries =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException => return }
    entries.foreach { st =>
      // files are the SOLE age authority when any exist: folding in a
      // fake-dir mtime that reports probe time would read as forever-fresh
      // and the entry would never reclaim. The top-level mtime is only the
      // fallback for a file-less entry (real dirs on local/HDFS).
      var newest = 0L
      try {
        val it = fs.listFiles(st.getPath, true)
        while (it.hasNext)
          newest = math.max(newest, it.next().getModificationTime)
      } catch { // the owner's own cleanup raced the walk: nothing to reclaim
        case _: java.io.FileNotFoundException => newest = Long.MaxValue
      }
      if (newest == 0L) newest = math.max(0L, st.getModificationTime)
      if (newest > 0 && newest < cutoff)
        try fs.delete(st.getPath, true): Unit catch { case _: Throwable => () }
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
