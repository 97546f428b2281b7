package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.gen.ChangeGen
import graft.lake.{LakeTable, TableIO}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-boundary reliability:
  *   - transient FS failures at promote/snapshot-swap retry with backoff and
  *     still commit (the reference's jittered upload retry,
  *     common/.../S3.java:41-47, config S3ConfigurationConfig.java:108-110);
  *   - vacuum never reclaims another writer's in-flight promotes: only
  *     known-superseded files delete unconditionally, unreferenced orphans
  *     wait out an mtime grace window.
  */
class ReliabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withFault[T](hook: String => Unit)(body: => T): T =
    try { TableIO.faultHook = hook; body }
    finally TableIO.faultHook = _ => ()

  test("one transient promote failure per file still commits the merge") {
    val changes = ChangeGen.changes(spark, 500, nKeys = 80, partitions = 2)
    val lake = new LakeTable(SparkTestSession.tempDir("retrylake"), spark, subBuckets = 2)
    val failures = new AtomicInteger(0)
    val failedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    withFault { tag =>
      // first attempt of every promote (per thread) fails
      if (tag == "promote" && failedOnce.add(Thread.currentThread().getId)) {
        failures.incrementAndGet()
        throw new java.io.IOException("injected transient promote failure")
      }
    } {
      lake.merge(changes, 0L)
    }
    assert(failures.get() >= 1, "the fault must actually have fired")
    assert(lake.lastBatchId === 0L)
    assert(lake.read().count() > 0L)
  }

  test("one transient snapshot-swap failure still commits") {
    val changes = ChangeGen.changes(spark, 300, nKeys = 50, partitions = 2)
    val lake = new LakeTable(SparkTestSession.tempDir("retrysnap"), spark, subBuckets = 2)
    val fired = new AtomicInteger(0)
    withFault { tag =>
      if (tag == "swapSnapshot" && fired.getAndIncrement() == 0)
        throw new java.io.IOException("injected transient rename failure")
    } {
      lake.merge(changes, 0L)
    }
    assert(fired.get() >= 2, "retry must have re-attempted the swap")
    assert(lake.lastBatchId === 0L)
  }

  test("a persistent failure surfaces after bounded attempts") {
    val changes = ChangeGen.changes(spark, 200, nKeys = 30, partitions = 1)
    val lake = new LakeTable(SparkTestSession.tempDir("retryfail"), spark, subBuckets = 1)
    val attempts = new AtomicInteger(0)
    val e = intercept[java.io.IOException] {
      withFault { tag =>
        if (tag == "promote") {
          attempts.incrementAndGet()
          throw new java.io.IOException("injected permanent failure")
        }
      } {
        lake.merge(changes, 0L)
      }
    }
    assert(e.getMessage.contains("injected"))
    assert(attempts.get() === 4, "exactly `attempts` tries, then give up")
    assert(lake.lastBatchId === -1L, "a failed batch must not commit")
  }

  test("vacuum spares in-flight promotes; orphans reclaim only past grace") {
    val changes = ChangeGen.changes(spark, 800, nKeys = 100, partitions = 2)
    val root = SparkTestSession.tempDir("vacgrace")
    val lake = new LakeTable(root, spark, subBuckets = 2)
    lake.merge(changes.filter(col("offset") < 200), 0L)
    lake.merge(changes.filter(col("offset") >= 200), 1L)

    // simulate a CONCURRENT writer that has promoted a file into data/ but
    // has not yet committed its manifest (fresh mtime, referenced nowhere)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inflight = new Path(root, "data/part-00000-s0001-b000000000099.parquet")
    val out = fs.create(inflight, true)
    out.write("pretend-parquet".getBytes("UTF-8"))
    out.close()

    val (dataGone, _) = lake.vacuum(keepLast = 1)
    assert(dataGone > 0, "superseded v0 bucket files must be reclaimed")
    assert(fs.exists(inflight),
      "an unreferenced FRESH file (another writer's in-flight promote) must survive")

    // with the grace window elapsed (forced to 0), the orphan is reclaimed
    val (orphanGone, _) = lake.vacuum(keepLast = 1, orphanGraceMs = 0L)
    assert(orphanGone === 1)
    assert(!fs.exists(inflight))

    // table state is intact throughout
    assert(lake.read().count() > 0L)
  }

  test("checkpoint commit rewrites reused shards a concurrent vacuum reclaimed") {
    import scala.jdk.CollectionConverters._
    val changes = ChangeGen.changes(spark, 600, nKeys = 100, partitions = 2)
    val root = SparkTestSession.tempDir("shardverify")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lake = new LakeTable(root, spark, subBuckets = 4,
      checkpointEvery = 1, shardGroupSize = 1)
    lake.merge(changes.filter(col("offset") < 250), 0L) // v0: all shards fresh
    lake.merge(changes.filter(col("offset") === 250), 1L) // 1 event/partition
    def shardMap(v: Long): Map[String, String] = {
      val m = graft.lake.Json.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, f"manifest-$v%012d.json")), "UTF-8"))
      m.get("shards").fields().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }
    // v1 (tiny batch) must have reused some v0 shard
    val reused = shardMap(1).values.filter(_.contains("-v000000000000")).toSeq
    assert(reused.nonEmpty, "the fixture must exercise shard reuse")
    // simulate a concurrent vacuum's shard GC racing the next commit
    fs.delete(new Path(root, reused.head), false)
    lake.merge(changes.filter(col("offset") === 251), 2L)
    // the new checkpoint must reference only shards that exist…
    shardMap(2).values.foreach(rel =>
      assert(fs.exists(new Path(root, rel)), s"$rel referenced but missing"))
    // …and a COLD reader (no caches) resolves it without FileNotFound
    val cold = new LakeTable(root, spark, subBuckets = 4,
      checkpointEvery = 1, shardGroupSize = 1)
    assert(cold.read().count() > 0L)
  }

  test("lineage archives to parquet segments; legacy json folds in; dedup holds") {
    val changes = ChangeGen.changes(spark, 600, nKeys = 80, partitions = 2)
    val root = SparkTestSession.tempDir("linseg")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lake = new LakeTable(root, spark, subBuckets = 2, checkpointEvery = 2)
    lake.merge(changes.filter(col("offset") < 100), 0L)
    lake.merge(changes.filter(col("offset") >= 100 && col("offset") < 200), 1L)
    lake.merge(changes.filter(col("offset") >= 200), 2L)
    val before = lake.lineage().collect().toSet
    assert(before.nonEmpty)

    // a legacy single-JSON-array archive (the pre-segment layout) with one
    // extra synthetic row must be folded into the segment and removed
    val legacy = new Path(root, "lineage-archive.json")
    val out = fs.create(legacy, true)
    out.write(
      """[{"batchId":999,"partition":0,"firstOffset":1,"lastOffset":2,
        |"numEvents":2,"numUpserts":2,"numDeletes":0,"appId":"old"}]"""
        .stripMargin.replace("\n", "").getBytes("UTF-8"))
    out.close()

    lake.vacuum(keepLast = 1)
    assert(!fs.exists(legacy), "legacy archive must be converted and removed")
    val segs = fs.listStatus(new Path(root, "_lineage"))
      .filter(_.getPath.getName.startsWith("seg-"))
    assert(segs.nonEmpty, "vacuum must have written a parquet segment")
    val after = lake.lineage().collect().toSet
    assert(after.size === before.size + 1, "all rows survive GC, plus the legacy one")

    // duplicate rows across segments (crashed-then-rerun vacuum) dedup away
    val dupSrc = spark.read.parquet(segs.head.getPath.toString)
    dupSrc.write.mode("overwrite")
      .parquet(new Path(root, "_lineage/seg-999999999999.parquet").toString)
    assert(lake.lineage().collect().toSet === after)

    // idempotent rerun with nothing to GC changes nothing
    lake.vacuum(keepLast = 1)
    assert(lake.lineage().collect().toSet === after)
  }

  /** S3-semantics commit store: no atomic rename exists. `putAtomic` is a
    * whole-object overwrite PUT (the one mutation S3 does atomically —
    * readers see the old object or the new object, never a torn prefix;
    * S3Writer.java:142-153 builds the reference's whole publish protocol on
    * it), and `publishFile` is the non-atomic copy-then-delete that
    * "rename" means on an object store. A crash can land BETWEEN the copy
    * and the delete — injectable below — leaving the staged source as an
    * orphan; the destination itself is still all-or-nothing because the
    * copy creates a complete object or none.
    */
  private final class SimulatedObjectStore extends graft.lake.CommitStore {
    val puts = new AtomicInteger(0)
    val copies = new AtomicInteger(0)
    @volatile var crashAfterCopy: Boolean = false

    def putAtomic(io: TableIO, dest: Path, content: String): Unit = {
      puts.incrementAndGet()
      // local-fs stand-in for the atomic whole-object PUT (the simulation
      // trusts S3's documented object-level atomicity; what it REMOVES is
      // the rename primitive the default store depends on)
      io.writeString(dest, content)
    }

    def publishFile(io: TableIO, src: Path, dest: Path): Unit = {
      copies.incrementAndGet()
      val in = io.fs.open(src)
      val out = io.fs.create(dest, true)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally { in.close(); out.close() }
      if (crashAfterCopy)
        throw new java.io.IOException("injected crash between copy and delete")
      io.fs.delete(src, false): Unit
    }

    /** Conditional PUT — S3's If-Match/If-None-Match preconditions (the
      * primitive Iceberg's S3 commit uses): the server serializes the
      * precondition check with the PUT, which the lock stands in for.
      */
    private val casLock = new Object
    def putIfVersion(io: TableIO, dest: Path, content: String,
        expected: Long): Boolean = casLock.synchronized {
      val cur =
        if (io.fs.exists(dest))
          graft.lake.Json.parse(io.readString(dest)).get("version").asLong
        else -1L
      if (cur == expected + 1 && io.readString(dest) == content) true
      else if (cur != expected) false
      else { putAtomic(io, dest, content); true }
    }

    /** If-None-Match conditional PUT — the server serializes the existence
      * check with the PUT, which the lock stands in for.
      */
    def putIfAbsent(io: TableIO, dest: Path, content: String): Boolean =
      casLock.synchronized {
        if (io.fs.exists(dest)) false
        else { putAtomic(io, dest, content); true }
      }
  }

  test("the full commit protocol runs on S3 semantics (no atomic rename)") {
    // the seam's whole point: nothing in the journal+lake commit protocol
    // may secretly depend on rename atomicity beyond CommitStore — swap in
    // copy+delete / overwrite-PUT semantics and the pipeline must still be
    // exactly-once with the lake equal to the oracle
    val changes = ChangeGen.changes(spark, 800, nKeys = 80, partitions = 2,
      deletePct = 10)
    val store = new SimulatedObjectStore
    // through the DEPLOYMENT surface (CdcPipeline plumbs the one store into
    // both tables), not hand-built tables — the composition a production
    // object-store user actually runs
    val p = new graft.pipeline.CdcPipeline(spark, SparkTestSession.tempDir("s3j"),
      SparkTestSession.tempDir("s3l"), chunkBytes = 4096, subBuckets = 4,
      commitStore = store)
    p.runBatches(changes, 2)
    assert(store.puts.get() > 0 && store.copies.get() > 0,
      "the simulated store must actually have carried the commits")
    val (journal, lake) = (p.journal, p.lake)
    assert(journal.read().count() === 800L)
    val got = lake.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want = ChangeGen.oracleFinalState(changes)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("S3 semantics: crash between copy and delete fails loudly, retry converges") {
    val changes = ChangeGen.changes(spark, 400, nKeys = 50, partitions = 2)
    val store = new SimulatedObjectStore
    val lake = new LakeTable(SparkTestSession.tempDir("s3crash"), spark,
      subBuckets = 2, commitStore = store)
    store.crashAfterCopy = true
    // LOUD failure (after the bounded retries), never a silent half-commit:
    // the batch did not commit, the snapshot still points nowhere
    intercept[java.io.IOException](lake.merge(changes, 0L))
    assert(lake.lastBatchId === -1L, "a failed publish must not commit")
    // the copy side of the crash left complete (never torn) destination
    // objects plus orphaned staged sources — exactly the reference's
    // crashed-upload garbage; the retried batch overwrites the same
    // deterministic names and commits
    store.crashAfterCopy = false
    lake.merge(changes, 0L)
    assert(lake.lastBatchId === 0L)
    val got = lake.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want = ChangeGen.oracleFinalState(changes)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  // ---- concurrent-writer commit safety: CAS on the snapshot swap --------
  //
  // The reference never faces this — Kafka Connect guarantees one task per
  // partition, so its cursor overwrite (S3Writer.java:142-153) is safe by
  // exclusivity. A lake TABLE is a shared resource: two pipelines pointed at
  // the same root must never silently clobber each other's snapshot. The
  // contract: exactly one commit wins a version; the loser fails LOUDLY
  // with ConcurrentCommitException and committed nothing.

  /** Deterministic interleave: writer A is paused at its snapshot swap (the
    * faultHook fires before each swap attempt) while writer B attempts the
    * same version underneath it. A already holds the EXCLUSIVE claim on the
    * version's manifest (the claim is taken at manifest create, before the
    * swap), so B loses loudly — and B's loss rolls the paused A forward: a
    * live claimer at this point is indistinguishable from a crashed one,
    * and publishing its complete commit is correct either way (A's own swap
    * then reads as idempotent success). B's retry wins the next version.
    */
  private def raceLoserFailsLoudly(store: Option[graft.lake.CommitStore],
      tag: String): Unit = {
    val root = SparkTestSession.tempDir(s"race-$tag")
    def mk(app: String) = store match {
      case Some(s) =>
        new LakeTable(root, spark, subBuckets = 2, appId = app, commitStore = s)
      case None => new LakeTable(root, spark, subBuckets = 2, appId = app)
    }
    val a = mk("writer-a")
    val b = mk("writer-b")
    // B's offsets sit ABOVE A's: after losing the race, B's retry must pass
    // the watermarks A committed (sub-watermark offsets are redelivery by
    // contract and would be deduped away, which is not what this tests)
    val batchA = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 1)
    val batchB = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 2, startOffset = 5000L)
    val interleaved = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var bLoss: Option[graft.lake.ConcurrentCommitException] = None
    withFault { t =>
      if (t == "swapSnapshot" && interleaved.compareAndSet(false, true))
        bLoss = Some(intercept[graft.lake.ConcurrentCommitException] {
          b.merge(batchB, 0L)
        })
    } {
      a.merge(batchA, 0L)
    }
    assert(interleaved.get(), "the interleave must actually have happened")
    assert(bLoss.get.getMessage.contains("writer-a"),
      s"the loser's error must name the winner: ${bLoss.get.getMessage}")
    // A's commit is intact — published exactly once (by B's roll-forward,
    // then A's own swap reading as its idempotent success)
    assert(a.lastBatchId === 0L)
    val want = ChangeGen.oracleFinalState(batchA)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val got0 = a.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got0.exceptAll(want).isEmpty && want.exceptAll(got0).isEmpty)
    // the loser re-reads and retries against the NEW version: now it wins
    // (different appId, so A's fence does not eat B's batch 0)
    b.merge(batchB, 0L)
    val wantBoth = ChangeGen.oracleFinalState(batchA.unionAll(batchB))
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val got1 = b.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got1.exceptAll(wantBoth).isEmpty && wantBoth.exceptAll(got1).isEmpty)
  }

  test("two writers racing one root: loser fails loudly (rename store)") {
    raceLoserFailsLoudly(None, "rename")
  }

  test("two writers racing one root: loser fails loudly (object store)") {
    raceLoserFailsLoudly(Some(new SimulatedObjectStore), "s3")
  }

  test("putIfVersion: N concurrent claimers of one version — exactly one wins") {
    for ((store, tag) <- Seq(
        (graft.lake.RenameCommitStore: graft.lake.CommitStore, "rename"),
        (new SimulatedObjectStore: graft.lake.CommitStore, "s3"))) {
      val io = new TableIO(SparkTestSession.tempDir(s"casrace-$tag"), spark, store)
      assert(store.putIfVersion(io, io.snapshotPath,
        """{"version":0,"appId":"seed"}""", -1L))
      val n = 8
      val barrier = new java.util.concurrent.CyclicBarrier(n)
      val wins = new AtomicInteger(0)
      val threads = (0 until n).map { i =>
        new Thread(() => {
          barrier.await()
          if (store.putIfVersion(io, io.snapshotPath,
              s"""{"version":1,"appId":"racer-$i"}""", 0L))
            wins.incrementAndGet(): Unit
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(wins.get() === 1, s"[$tag] exactly one claimer may win version 1")
      val winner = graft.lake.Json.parse(io.readString(io.snapshotPath))
      assert(winner.get("version").asLong === 1L)
    }
  }

  test("putIfVersion: crashed claimer rolls forward, retry reads as success") {
    val io = new TableIO(SparkTestSession.tempDir("casroll"), spark)
    val store = graft.lake.RenameCommitStore
    val v0 = """{"version":0,"appId":"w0"}"""
    val v1 = """{"version":1,"appId":"crashed"}"""
    assert(store.putIfVersion(io, io.snapshotPath, v0, -1L))
    // simulate a writer that died between claiming v1 and publishing it:
    // the complete marker exists, snapshot.json still reads v0
    io.writeString(new Path(new Path(io.rootPath, "_cas"),
      f"snapshot.json.v${1L}%012d"), v1)
    assert(io.readString(io.snapshotPath) === v0)
    // another writer planning against v0 must LOSE — the crashed claim is a
    // durable commit — and the loss must publish it (roll-forward)
    assert(!store.putIfVersion(io, io.snapshotPath,
      """{"version":1,"appId":"other"}""", 0L))
    assert(io.readString(io.snapshotPath) === v1,
      "the crashed claimer's commit must never be lost")
    // the crashed writer's own retry of its completed swap reads as success
    assert(store.putIfVersion(io, io.snapshotPath, v1, 0L))
    // and the table moves on: version 2 commits normally
    assert(store.putIfVersion(io, io.snapshotPath,
      """{"version":2,"appId":"w2"}""", 1L))
  }

  test("putIfAbsent: a second process's claim of a held name fails, content intact") {
    // The in-JVM race tests above serialize on casLocks, so they never
    // exercise the cross-process claim path. Here the second claim comes
    // through a SEPARATE TableIO (a second process's handle) with the lock
    // uncontended — the primitive's own exists→fail branch must carry the
    // exclusivity, for both stores.
    for ((store, tag) <- Seq(
        (graft.lake.RenameCommitStore: graft.lake.CommitStore, "rename"),
        (new SimulatedObjectStore: graft.lake.CommitStore, "s3"))) {
      val root = SparkTestSession.tempDir(s"claim-$tag")
      val io1 = new TableIO(root, spark, store)
      val io2 = new TableIO(root, spark, store)
      val dest = new Path(io1.rootPath, "manifest-000000000001.json")
      assert(io1.createVersioned(dest, """{"owner":"p1"}"""), s"[$tag]")
      assert(!store.putIfAbsent(io2, dest, """{"owner":"p2"}"""), s"[$tag]")
      assert(io2.readString(dest) === """{"owner":"p1"}""",
        s"[$tag] a lost claim must never touch the winner's bytes")
      // idempotent retry of the OWN completed create reads as success
      assert(io1.createVersioned(dest, """{"owner":"p1"}"""), s"[$tag]")
    }
    // and the raw rename primitive itself refuses an existing destination
    val io = new TableIO(SparkTestSession.tempDir("claim-raw"), spark)
    val d = new Path(io.rootPath, "claimed")
    io.writeString(d, "first")
    val tmp = new Path(io.rootPath, "tmp")
    io.writeString(tmp, "second")
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      io.renameNoOverwrite(tmp, d)
    }
    assert(io.readString(d) === "first")
  }

  test("a commit landing MID-MERGE fails the stale plan loudly, before any write") {
    // Not the at-the-swap race (covered above): writer B commits while A is
    // still WRITING — after A's plan (state read, watermark gate, schema
    // ladder) but before A's commit(). A's plan is stale; committing it
    // would resolve A's Delta against state that never saw B's rows. The
    // plan-time CAS baseline must catch this at the door of commit().
    val root = SparkTestSession.tempDir("midmerge")
    val a = new LakeTable(root, spark, subBuckets = 2, appId = "writer-a")
    val b = new LakeTable(root, spark, subBuckets = 2, appId = "writer-b")
    val batchA = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 1, startOffset = 5000L)
    val batchB = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 2)
    val interleaved = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[graft.lake.ConcurrentCommitException] {
      withFault { t =>
        // A's first data-file promote = A is mid-write, plan long since
        // frozen; B commits underneath (B's own promotes re-fire this hook
        // — the guard lets them through)
        if (t == "promote" && interleaved.compareAndSet(false, true))
          b.merge(batchB, 0L)
      } {
        a.merge(batchA, 0L)
      }
    }
    assert(interleaved.get(), "the interleave must actually have happened")
    assert(e.getMessage.contains("advanced while this batch was planned"),
      s"must fail the EARLY plan-coherence check, not the swap: ${e.getMessage}")
    // B intact, and only B: A must not have claimed any manifest name
    assert(b.lastBatchId === 0L)
    val want = ChangeGen.oracleFinalState(batchB)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val got0 = b.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got0.exceptAll(want).isEmpty && want.exceptAll(got0).isEmpty)
    // the loser re-plans and wins
    a.merge(batchA, 0L)
    val wantBoth = ChangeGen.oracleFinalState(batchB.unionAll(batchA))
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val got1 = a.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got1.exceptAll(wantBoth).isEmpty && wantBoth.exceptAll(got1).isEmpty)
  }

  test("raced manifest claim: the loser never overwrites the winner's manifest") {
    // The narrowest window: B commits AFTER A passed the plan-coherence
    // check, while A is about to create its version-named manifest. Before
    // the exclusive claim, A's plain write would CORRUPT B's
    // already-published manifest (B's snapshot references that very name)
    // even though A's own swap then failed loudly.
    val root = SparkTestSession.tempDir("manifestrace")
    val a = new LakeTable(root, spark, subBuckets = 2, appId = "writer-a")
    val b = new LakeTable(root, spark, subBuckets = 2, appId = "writer-b")
    val batchA = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 1, startOffset = 5000L)
    val batchB = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 2)
    val interleaved = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[graft.lake.ConcurrentCommitException] {
      withFault { t =>
        if (t == "createVersioned" && interleaved.compareAndSet(false, true))
          b.merge(batchB, 0L)
      } {
        a.merge(batchA, 0L)
      }
    }
    assert(interleaved.get(), "the interleave must actually have happened")
    assert(e.getMessage.contains("lost the claim") &&
      e.getMessage.contains("writer-b"), e.getMessage)
    // THE assertion: the raced version's manifest still carries B's commit
    val io = new TableIO(root, spark)
    val m = graft.lake.Json.parse(
      io.readString(new Path(io.rootPath, "manifest-000000000000.json")))
    assert(m.get("appId").asText === "writer-b",
      "the raced loser overwrote the winner's version-named manifest")
    val want = ChangeGen.oracleFinalState(batchB)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val got = b.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("a writer crashed between manifest create and swap rolls forward, never wedges") {
    // A dies AFTER its exclusive manifest claim but BEFORE the pointer CAS
    // (its data files are durable — promotes precede commit). The claimed
    // name would block every later writer's create forever; instead the
    // loser ROLLS the complete orphan forward — A's commit is published,
    // the thrower re-plans on top. No committed work lost, no wedged table.
    val root = SparkTestSession.tempDir("rollfwd")
    val a = new LakeTable(root, spark, subBuckets = 2, appId = "writer-a")
    val b = new LakeTable(root, spark, subBuckets = 2, appId = "writer-b")
    val batchA = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 1)
    val batchB = ChangeGen.changes(spark, 150, nKeys = 25, partitions = 2,
      seed = 2, startOffset = 5000L)
    final class Died extends RuntimeException("simulated death before swap")
    intercept[Died] {
      withFault { t => if (t == "swapSnapshot") throw new Died } {
        a.merge(batchA, 0L)
      }
    }
    // A's claim is durable but unpublished
    val io = new TableIO(root, spark)
    assert(io.exists("manifest-000000000000.json"))
    assert(io.readSnapshot().isEmpty, "the crash precedes the first publish")
    // B plans against the EMPTY table, loses the claim, rolls A forward
    val e = intercept[graft.lake.ConcurrentCommitException] {
      b.merge(batchB, 0L)
    }
    assert(e.getMessage.contains("writer-a"), e.getMessage)
    assert(a.lastBatchId === 0L && a.currentVersion === 0L,
      "the crashed writer's commit must have been rolled forward")
    // B's retry re-plans against A's rolled-forward version and wins
    b.merge(batchB, 0L)
    val wantBoth = ChangeGen.oracleFinalState(batchA.unionAll(batchB))
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val got = b.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(wantBoth).isEmpty && wantBoth.exceptAll(got).isEmpty)
  }

  test("soak: three writers racing one root under injected faults converge to the oracle") {
    // The real multi-pipeline deployment shape: each writer owns its
    // PARTITION and key space (Connect's one-task-per-partition model), the
    // TABLE is shared — so commits race while data never does. Randomized
    // (seeded) transient faults compose the retry ladder with the CAS
    // protocol: losers re-plan on ConcurrentCommitException, exhausted
    // retries replay the whole batch, and the offset gate + batch fence
    // make every replay idempotent. The invariant is schedule-independent:
    // the final table equals the LWW oracle of all nine batches.
    val root = SparkTestSession.tempDir("cassoak")
    val writers = 3
    val batchesPerWriter = 3
    def batch(w: Int, b: Int) =
      ChangeGen.changes(spark, 120, nKeys = 24, partitions = 1,
          seed = 100L * w + b, startOffset = b * 1000L)
        .withColumn("partition", lit(w))
        .withColumn("path", concat(lit(s"w$w/"), col("path")))
    val rnd = new java.util.Random(42)
    def maybeFault(): Unit = rnd.synchronized {
      if (rnd.nextDouble() < 0.25)
        throw new java.io.IOException("soak: injected transient fault")
    }
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val replays = new AtomicInteger(0)
    val lostRaces = new AtomicInteger(0)
    withFault { _ => maybeFault() } {
      val threads = (0 until writers).map { w =>
        new Thread(() => {
          try {
            val lake = new LakeTable(root, spark, subBuckets = 2,
              appId = s"soak-w$w")
            for (b <- 0 until batchesPerWriter) {
              var attempts = 0
              var done = false
              while (!done) {
                attempts += 1
                require(attempts <= 40, s"writer $w batch $b never converged")
                try { lake.merge(batch(w, b), b.toLong); done = true }
                catch {
                  case _: graft.lake.ConcurrentCommitException =>
                    lostRaces.incrementAndGet() // lost the CAS: re-plan
                  case _: java.io.IOException =>
                    replays.incrementAndGet() // retries exhausted: replay
                }
              }
            }
          } catch { case t: Throwable => errors.add(t) }
        }, s"soak-w$w")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
    }
    assert(errors.isEmpty,
      s"soak writers failed: ${errors.toArray.mkString("; ")}")
    assert(lostRaces.get() >= 1,
      "three writers on one root must actually have raced")
    val all = (0 until writers).flatMap(w =>
      (0 until batchesPerWriter).map(b => batch(w, b))).reduce(_ unionAll _)
    val reader = new LakeTable(root, spark, subBuckets = 2, appId = "soak-r")
    assert(reader.currentVersion >= (writers * batchesPerWriter - 1).toLong,
      "every batch must have committed at least once")
    val want = ChangeGen.oracleFinalState(all).select(col("partition"),
      col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    def got() = reader.read().select(col("partition"),
      col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got().exceptAll(want).isEmpty && want.exceptAll(got()).isEmpty,
      "final state must equal the LWW oracle regardless of schedule")
    // maintenance next to the converged multi-writer history stays correct
    reader.vacuum()
    assert(got().exceptAll(want).isEmpty && want.exceptAll(got()).isEmpty)
  }

  test("staging sweep honors the grace window and stays off the commit hot path") {
    val root = SparkTestSession.tempDir("sweeplake")
    val lake = new LakeTable(root, spark, subBuckets = 2)
    // a crashed peer's abandoned staging (newest file past the 7-day
    // grace), a live peer's fresh staging, and a long-running job whose
    // staging dir is OLD but which is still writing (fresh file) — aged by
    // the newest descendant file, only the first may reclaim
    val past = System.currentTimeMillis() - 8L * 24 * 3600 * 1000
    val stale = new java.io.File(root, "_staging/merge-deadapp-42")
    val fresh = new java.io.File(root, "_staging/merge-liveapp-43")
    val slow = new java.io.File(root, "_staging/compact-slowapp-44")
    assert(stale.mkdirs() && fresh.mkdirs() && slow.mkdirs())
    val staleFile = new java.io.File(stale, "part-crashed.parquet")
    assert(staleFile.createNewFile())
    assert(staleFile.setLastModified(past) && stale.setLastModified(past))
    assert(new java.io.File(slow, "part-inflight.parquet").createNewFile())
    assert(slow.setLastModified(past)) // dir old, file fresh: still writing

    // commits must NOT sweep — the listStatus was measured off the hot path
    // (CommitProtocolBench; the sweep belongs with the maintenance GC passes)
    lake.merge(ChangeGen.changes(spark, 200, nKeys = 40, partitions = 2), 0L)
    assert(stale.exists, "merge must not pay the staging sweep")
    assert(fresh.exists)

    // maintenance reclaims only the entry past grace: a live writer's
    // in-flight staging must never be deleted out from under its promote
    lake.vacuum()
    assert(!stale.exists, "vacuum reclaims abandoned staging past the grace window")
    assert(fresh.exists, "young staging survives the sweep (in-flight peer)")
    assert(slow.exists,
      "a still-writing job's staging survives: age = newest file, not dir mtime")
  }
}
