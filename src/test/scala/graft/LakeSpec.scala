package graft

import graft.gen.ChangeGen
import graft.lake.{LakeTable, SchemaEvolution}
import graft.pipeline.CdcPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE semantics + exactly-once + schema evolution, verified against the
  * independent batch oracle (FIXTURES.md §5) by per-row sha256(content)
  * equality — the port of the reference's restart/no-duplicates integration
  * assertions (S3ConnectorIntegrationTest.binaryWithKeys:173-212,
  * system_test/run.py:224-257).
  */
class LakeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** compare lake state vs oracle by (repo, path, sha256(content), offset) */
  private def assertMatchesOracle(lake: LakeTable,
      changes: org.apache.spark.sql.DataFrame): Unit = {
    val got = lake.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"),
        col("offset"))
    val want = ChangeGen.oracleFinalState(changes)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"),
        col("offset"))
    val extra = got.exceptAll(want).count()
    val missing = want.exceptAll(got).count()
    assert(extra === 0L && missing === 0L,
      s"lake != oracle: $extra extra rows, $missing missing rows")
  }

  test("single merge equals the LWW oracle (upserts + deletes)") {
    val changes = ChangeGen.changes(spark, 2000, nKeys = 300, partitions = 4,
      deletePct = 15)
    val lake = new LakeTable(SparkTestSession.tempDir("lake1"), spark, subBuckets = 4)
    lake.merge(changes, 0L)
    assertMatchesOracle(lake, changes)
  }

  test("observe stats mode: identical state, watermarks, and lineage") {
    // the measured-alternative stats path (LakeTable.merge `observe` mode:
    // 3-column distinct pre-pass + Observation riding the write job) must be
    // indistinguishable from the default `agg` pre-pass in everything the
    // commit records — state rows, per-partition watermarks, lineage counts.
    // Runs multi-batch through the pipeline (state-present merges), then
    // one merge whose BATCH rides a CLONED session against state from the
    // constructor session — the streaming-foreachBatch delivery case the
    // merge's union order exists for (Observation delivery is per-session).
    // A regression of that order starves the observation; the 30s loud
    // fallback keeps the result correct, so the wall-clock bound below is
    // what actually pins the fix.
    val changes = ChangeGen.changes(spark, 2500, nKeys = 200, partitions = 4,
      deletePct = 15)
    def run(mode: String, tag: String) = {
      System.setProperty("graft.merge.stats", mode)
      try {
        val p = new CdcPipeline(spark, SparkTestSession.tempDir(s"jo-$tag"),
          SparkTestSession.tempDir(s"lo-$tag"), chunkBytes = 4096,
          subBuckets = 4, journalEnabled = false)
        p.runBatches(changes, 5)
        p.lake
      } finally System.clearProperty("graft.merge.stats"): Unit
    }
    val aggLake = run("agg", "agg")
    val obsLake = run("observe", "obs")
    assertMatchesOracle(obsLake, changes)
    assert(obsLake.watermarks() === aggLake.watermarks())
    def lineage(l: LakeTable) = l.lineage()
      .select("batchId", "partition", "firstOffset", "lastOffset",
        "numEvents", "numUpserts", "numDeletes")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(lineage(obsLake).toSeq === lineage(aggLake).toSeq)

    // cloned-session delivery: ChangeGen is a pure function of (seed, id),
    // so the 3500-event log is a strict superset of the 2500 already merged
    // — the suffix survives watermark dedup and merges against real state.
    // LWW over (2500 ∪ 3500) == LWW over 3500, so `more` alone is the oracle.
    // cloneSession is private[sql]; newSession() gives the same structure
    // the delivery filter keys on — a second session with its own UUID
    val clone = spark.newSession()
    val more = ChangeGen.changes(clone, 3500, nKeys = 200, partitions = 4,
      deletePct = 15)
    System.setProperty("graft.merge.stats", "observe")
    val t0 = System.nanoTime()
    try obsLake.merge(more, 99L): Unit
    finally System.clearProperty("graft.merge.stats"): Unit
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 25.0, s"cloned-session observation starved ($sec s — the " +
      "30s fallback engaged; union order regressed?)")
    assertMatchesOracle(obsLake, more)
  }

  test("observe stats plumbing leaves zero residue, bounded listeners, even starved") {
    // the r5 "what's wrong #1" closed: Observation leaked one unregisterable
    // listener per starved observation; MergeStats keeps ONE routing
    // listener per session and removes the per-observation handoff on every
    // exit path — N starved waits leave zero residue
    import graft.lake.MergeStats
    val pendingBefore = MergeStats.pendingCount
    MergeStats.expect(spark, "starved-probe")
    val listeners = MergeStats.listenerCount
    assert(MergeStats.await("starved-probe", 1) === None)
    (1 to 20).foreach { i =>
      MergeStats.expect(spark, s"starved-$i")
      assert(MergeStats.await(s"starved-$i", 1) === None, "must starve")
      assert(MergeStats.listenerCount === listeners,
        "starved observations must not grow the listener set")
    }
    assert(MergeStats.pendingCount === pendingBefore, "zero handoff residue")

    // the delivered path routes by name and cleans up the same way
    MergeStats.expect(spark, "delivered-1")
    spark.range(10).observe("delivered-1", count(lit(1)).as("n")).collect(): Unit
    val row = MergeStats.await("delivered-1", 30000)
    assert(row.exists(_.getAs[Long]("n") === 10L), s"metrics must deliver: $row")
    assert(MergeStats.pendingCount === pendingBefore)
    assert(MergeStats.listenerCount === listeners)

    // a failed OBSERVED MERGE (write throws before the await) must discard
    // its declared interest too — the real engine path, not just plumbing
    System.setProperty("graft.merge.stats", "observe")
    try {
      val lake = new LakeTable(SparkTestSession.tempDir("obsfail"), spark,
        subBuckets = 2)
      val bad = ChangeGen.changes(spark, 100, nKeys = 20, partitions = 2)
        .withColumn("content", // evaluation-time failure inside the write job
          when(col("offset") >= 0, raise_error(lit("injected write failure")))
            .otherwise(col("content")))
      intercept[Throwable](lake.merge(bad, 0L))
      assert(MergeStats.pendingCount === pendingBefore,
        "a failed observed write must not strand its handoff")
    } finally System.clearProperty("graft.merge.stats"): Unit
  }

  test("observe mode over the partition bound falls back with REAL stats") {
    // CollectMetrics carries 4 interpreted aggregates per touched partition;
    // past the bound the merge must fall back to a dedicated scan — and the
    // fallback must commit real watermarks/lineage, never empty stats
    // (empty stats would freeze watermarks and re-admit merged offsets)
    val changes = ChangeGen.changes(spark, 600, nKeys = 80, partitions = 4,
      deletePct = 10)
    System.setProperty("graft.merge.stats", "observe")
    System.setProperty("graft.merge.observe.maxPartitions", "2") // 4 > 2
    try {
      val lake = new LakeTable(SparkTestSession.tempDir("obsbound"), spark,
        subBuckets = 2)
      lake.merge(changes, 0L)
      assert(lake.watermarks().size === 4, "fallback must advance all watermarks")
      assert(lake.watermarks().values.forall(_ >= 0L))
      assertMatchesOracle(lake, changes)
      // a second batch's dedup depends on those watermarks being real
      assert(lake.merge(changes, 1L) === 0L,
        "a full redelivery must dedup to zero applied rows")
      assertMatchesOracle(lake, changes)
    } finally {
      System.clearProperty("graft.merge.stats")
      System.clearProperty("graft.merge.observe.maxPartitions"): Unit
    }
  }

  test("multi-batch merge equals oracle; watermarks advance") {
    val changes = ChangeGen.changes(spark, 3000, nKeys = 200, partitions = 4,
      deletePct = 20)
    val p = new CdcPipeline(spark, SparkTestSession.tempDir("j2"),
      SparkTestSession.tempDir("lake2"), chunkBytes = 4096, subBuckets = 4)
    p.runBatches(changes, 6)
    assertMatchesOracle(p.lake, changes)
    val wm = p.lake.watermarks()
    val maxOff = changes.groupBy("partition").agg(max("offset")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(wm === maxOff)
  }

  test("time travel reads any kept snapshot; vacuum prunes history") {
    val changes = ChangeGen.changes(spark, 2000, nKeys = 150, partitions = 4,
      deletePct = 15)
    val lake = new LakeTable(SparkTestSession.tempDir("laketv"), spark, subBuckets = 4)
    val half0 = changes.filter(col("offset") < 150)
    lake.merge(half0, 0L)
    lake.merge(changes.filter(col("offset") >= 150), 1L)
    assert(lake.currentVersion === 1L)

    // AS OF version 0 == oracle over the first batch only
    val got = lake.readVersion(0L)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want = ChangeGen.oracleFinalState(half0)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // vacuum to the current snapshot: superseded v0-only files and the v0
    // manifest go away; current state is untouched; v0 is no longer readable
    val liveCount = lake.read().count()
    val lineageBefore = lake.lineage().count()
    val (dataGone, manifestsGone) = lake.vacuum(keepLast = 1)
    assert(dataGone > 0, "vacuum must delete superseded bucket files")
    assert(manifestsGone === 1)
    assert(lake.read().count() === liveCount)
    assertMatchesOracle(lake, changes)
    intercept[IllegalArgumentException](lake.readVersion(0L))
    // the audit trail outlives snapshot GC (archived from doomed manifests)
    assert(lake.lineage().count() === lineageBefore)
    // idempotent: nothing left to collect
    assert(lake.vacuum(keepLast = 1) === ((0, 0)))
    assert(lake.lineage().count() === lineageBefore)
  }

  test("delta manifests: commits record only touched buckets; chains resolve") {
    import graft.lake.Json
    val changes = ChangeGen.changes(spark, 2400, nKeys = 200, partitions = 4,
      deletePct = 10)
    val root = SparkTestSession.tempDir("lakedelta")
    val lake = new LakeTable(root, spark, subBuckets = 4, checkpointEvery = 4)
    val n = 6 // v0 ckpt, v1-v3 deltas, v4 ckpt (cadence), v5 delta
    (0 until n).foreach { b =>
      lake.merge(changes.filter(col("offset") >= b * 100 && col("offset") < (b + 1) * 100), b.toLong)
    }
    def manifestJson(v: Int) = Json.parse(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, f"manifest-$v%012d.json"))))
    // cadence: full (sharded checkpoint) at 0 and 4, deltas elsewhere
    assert(!manifestJson(0).has("touched") && manifestJson(0).has("shards"))
    (1 to 3).foreach(v => assert(manifestJson(v).has("touched") &&
      !manifestJson(v).has("shards"), s"v$v must be a delta"))
    assert(!manifestJson(4).has("touched"), "v4 must checkpoint (cadence 4)")
    assert(manifestJson(5).has("touched"))
    // a delta's JSON is O(touched buckets), and added ⊆ touched
    val d = manifestJson(5)
    import scala.jdk.CollectionConverters._
    val touched = d.get("touched").elements().asScala
      .map(t => (t.get(0).asInt, t.get(1).asInt)).toSet
    val added = d.get("added").elements().asScala
      .map(f => (f.get("partition").asInt, f.get("sub").asInt)).toSet
    assert(added.subsetOf(touched))
    assert(touched.size <= 16, "touched is bounded by partitions × subBuckets")
    // current state equals the oracle (resolution folds the chain correctly)
    assertMatchesOracle(lake,
      changes.filter(col("offset") < (n * 100).toLong))
    // time travel to a mid-chain delta version resolves too
    val got2 = lake.readVersion(2L)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want2 = ChangeGen.oracleFinalState(changes.filter(col("offset") < 300))
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got2.exceptAll(want2).isEmpty && want2.exceptAll(got2).isEmpty)
    // a FRESH instance (cold cache, resolution from disk only) reads the same
    val cold = new LakeTable(root, spark, subBuckets = 4, checkpointEvery = 4)
    assertMatchesOracle(cold, changes.filter(col("offset") < (n * 100).toLong))
    // vacuum to keepLast=1: keepFrom=5 is a delta -> materialized in place;
    // all manifests below are deleted, table still reads, audit trail intact
    val lineageBefore = lake.lineage().count()
    val (dataGone, manifestsGone) = lake.vacuum(keepLast = 1)
    assert(manifestsGone === 5)
    assert(dataGone > 0)
    assert(!manifestJson(5).has("touched") && manifestJson(5).has("shards"),
      "vacuum must materialize the oldest kept delta as a checkpoint")
    assertMatchesOracle(lake, changes.filter(col("offset") < (n * 100).toLong))
    assert(lake.lineage().count() === lineageBefore)
    // and a new writer over the vacuumed table keeps working
    val after = new LakeTable(root, spark, subBuckets = 4, checkpointEvery = 4)
    after.merge(changes.filter(col("offset") >= (n * 100).toLong), n.toLong)
    assertMatchesOracle(after, changes)
  }

  test("sharded checkpoints reuse untouched partitions' shards") {
    import graft.lake.Json
    import scala.jdk.CollectionConverters._
    val changes = ChangeGen.changes(spark, 1200, nKeys = 120, partitions = 4,
      deletePct = 0)
    val root = SparkTestSession.tempDir("lakeshard")
    val lake = new LakeTable(root, spark, subBuckets = 4, checkpointEvery = 3)
    // v0: all partitions; v1, v2: ONLY partition 0; v3: checkpoint (cadence)
    lake.merge(changes.filter(col("offset") < 100), 0L)
    lake.merge(changes.filter(col("offset") >= 100 && col("offset") < 150)
      .filter(col("partition") === 0), 1L)
    lake.merge(changes.filter(col("offset") >= 150 && col("offset") < 200)
      .filter(col("partition") === 0), 2L)
    lake.merge(changes.filter(col("offset") >= 200 && col("offset") < 250)
      .filter(col("partition") === 0), 3L)
    def shards(v: Int): Map[String, String] = Json.parse(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, f"manifest-$v%012d.json"))))
      .get("shards").fields().asScala
      .map(e => e.getKey -> e.getValue.asText).toMap
    val s0 = shards(0)
    val s3 = shards(3)
    assert(s3("0-0") !== s0("0-0"), "touched partition 0 must get a fresh shard")
    (1 to 3).foreach { p =>
      assert(s3(s"$p-0") === s0(s"$p-0"),
        s"untouched partition $p must reuse the v0 shard")
    }
    // resolution through reused shards still equals the oracle
    val want = changes.filter(col("offset") < 250 &&
      (col("partition") === 0 || col("offset") < 100))
    assertMatchesOracle(lake, want)
  }

  test("delta cadence is unobservable: delta lake ≡ full-manifest lake") {
    // model-based check of the whole §4.1 machinery: the SAME operation
    // sequence (merges, a re-bucketing compact, a vacuum) applied to a lake
    // committing deltas (cadence 3, tiny shard groups) and to one
    // committing a full checkpoint every time must yield identical state,
    // watermarks, and lineage at every step — the manifest representation
    // must never be observable through the API.
    val changes = ChangeGen.changes(spark, 2400, nKeys = 160, partitions = 4,
      deletePct = 15)
    val a = new LakeTable(SparkTestSession.tempDir("lakeEqA"), spark,
      subBuckets = 4, checkpointEvery = 3, shardGroupSize = 2)
    val b = new LakeTable(SparkTestSession.tempDir("lakeEqB"), spark,
      subBuckets = 4, checkpointEvery = 1)
    def assertSame(): Unit = {
      val sa = a.read().select(col("repo"), col("path"), col("offset"),
        sha2(col("content"), 256))
      val sb = b.read().select(col("repo"), col("path"), col("offset"),
        sha2(col("content"), 256))
      assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
        "state diverged between delta and full-manifest lakes")
      assert(a.watermarks() === b.watermarks())
      assert(a.lineage().count() === b.lineage().count())
    }
    (0 until 5).foreach { i =>
      val batch = changes.filter(
        col("offset") >= i * 120 && col("offset") < (i + 1) * 120)
      a.merge(batch, i.toLong); b.merge(batch, i.toLong)
      assertSame()
    }
    a.compact(8); b.compact(8)
    assertSame()
    val batch5 = changes.filter(col("offset") >= 600 && col("offset") < 720)
    a.merge(batch5, 5L); b.merge(batch5, 5L)
    assertSame()
    a.vacuum(keepLast = 2); b.vacuum(keepLast = 2)
    assertSame()
    // time travel to the post-compact version agrees too
    val va = a.readVersion(a.currentVersion - 1)
      .select(col("repo"), col("path"), sha2(col("content"), 256))
    val vb = b.readVersion(b.currentVersion - 1)
      .select(col("repo"), col("path"), sha2(col("content"), 256))
    assert(va.exceptAll(vb).isEmpty && vb.exceptAll(va).isEmpty)
  }

  test("a new writer's restarted batch numbering is not swallowed as replays") {
    val changes = ChangeGen.changes(spark, 1000, nKeys = 100, partitions = 4)
    val root = SparkTestSession.tempDir("lakeapp")
    val a = new LakeTable(root, spark, subBuckets = 4, appId = "ckpt-A")
    a.merge(changes.filter(col("offset") < 100), 0L)
    a.merge(changes.filter(col("offset") >= 100 && col("offset") < 150), 1L)
    // same app, same batchId => fenced replay
    assert(a.merge(changes.filter(col("offset") < 100), 1L) === -1L)
    // NEW app (fresh checkpoint) restarts numbering at 0 with genuinely new
    // data — must apply, not fence; overlap rows dedup on watermarks
    val b = new LakeTable(root, spark, subBuckets = 4, appId = "ckpt-B")
    val applied = b.merge(changes.filter(col("offset") >= 100), 0L)
    assert(applied > 0L, "fresh-app batch 0 must not be fenced")
    assertMatchesOracle(b, changes)
  }

  test("compact re-buckets; new layout is table metadata and survives merges") {
    val changes = ChangeGen.changes(spark, 2000, nKeys = 150, partitions = 4,
      deletePct = 10)
    val lake = new LakeTable(SparkTestSession.tempDir("lakecp"), spark, subBuckets = 4)
    val half0 = changes.filter(col("offset") < 150)
    lake.merge(half0, 0L)
    assert(lake.layoutSubBuckets === 4)

    lake.compact(8)
    assert(lake.layoutSubBuckets === 8)
    // state unchanged by the layout change
    val got = lake.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want = ChangeGen.oracleFinalState(half0)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // a NEW pipeline instance constructed with the stale default must merge
    // against the committed layout, not its constructor arg
    val lake2 = new LakeTable(lake.root, spark, subBuckets = 4)
    lake2.merge(changes.filter(col("offset") >= 150), 1L)
    assert(lake2.layoutSubBuckets === 8)
    assertMatchesOracle(lake2, changes)
  }

  test("recommendSubBuckets pins the measured sizing rule's arithmetic") {
    import graft.lake.LakeTable.recommendSubBuckets
    val MiB = 1L << 20
    // the rule's own published example (BENCH/BASELINE.md r06): 100 TiB
    // over 256 partitions at a 256 MiB target ⇒ 1600 sub-buckets
    assert(recommendSubBuckets(100L << 40, 256, 256 * MiB) === 1600)
    // a 512 MiB target halves the count
    assert(recommendSubBuckets(100L << 40, 256, 512 * MiB) === 800)
    // the 64 MB file floor wins over the target: 96 MiB per partition at a
    // 64 MiB target would round to 2 buckets of 48 MiB — the floor caps at 1
    assert(recommendSubBuckets(4 * 96 * MiB, 4, 64 * MiB) === 1)
    // tiny tables never go below one bucket
    assert(recommendSubBuckets(10 * MiB, 4) === 1)
    assert(recommendSubBuckets(0L, 1) === 1)
    // malformed inputs fail loudly, never mis-size silently
    intercept[IllegalArgumentException](recommendSubBuckets(1L << 40, 0))
    intercept[IllegalArgumentException](
      recommendSubBuckets(1L << 40, 4, 32 * MiB)) // below the 64 MB floor
  }

  test("compactToTargetFileSize applies the rule where compact re-buckets") {
    val changes = ChangeGen.changes(spark, 2000, nKeys = 150, partitions = 4,
      deletePct = 10)
    val lake = new LakeTable(SparkTestSession.tempDir("lakecpt"), spark,
      subBuckets = 8)
    lake.merge(changes, 0L)
    assert(lake.layoutSubBuckets === 8)
    // sf-gate-scale live bytes are far below one 256 MB target file per
    // partition, so the rule must collapse the layout to 1 bucket — and the
    // applied count must be table metadata like any compact()
    val applied = lake.compactToTargetFileSize()
    assert(applied === 1)
    assert(lake.layoutSubBuckets === 1)
    assertMatchesOracle(lake, changes)
  }

  test("crash + restart + full replay is exactly-once (fenced, idempotent)") {
    val changes = ChangeGen.changes(spark, 2000, nKeys = 150, partitions = 4,
      deletePct = 10)
    val jr = SparkTestSession.tempDir("j3")
    val lr = SparkTestSession.tempDir("lake3")
    val p1 = new CdcPipeline(spark, jr, lr, chunkBytes = 4096, subBuckets = 4)
    p1.runBatches(changes, 8, crashAfter = Some(2L)) // die after batch 2
    val p2 = new CdcPipeline(spark, jr, lr, chunkBytes = 4096, subBuckets = 4)
    p2.runBatches(changes, 8) // cold restart, replays everything from batch 0
    assertMatchesOracle(p2.lake, changes)
    // journal too: every offset exactly once
    val dupes = p2.journal.read().groupBy("partition", "offset").count()
      .filter(col("count") > 1).count()
    assert(dupes === 0L)
    assert(p2.journal.read().count() === 2000L)
  }

  test("hot-key skew (80% one repo) merges correctly") {
    val changes = ChangeGen.changes(spark, 3000, nKeys = 100, partitions = 4,
      hotPct = 80, deletePct = 10)
    val lake = new LakeTable(SparkTestSession.tempDir("lake4"), spark, subBuckets = 4)
    lake.merge(changes, 0L)
    assertMatchesOracle(lake, changes)
  }

  test("schema evolution: column add + int->long widen mid-stream") {
    val base = ChangeGen.changes(spark, 600, nKeys = 80, partitions = 2, deletePct = 0)
    val b0 = base.filter(col("offset") < 100)
      .withColumn("stars", (pmod(col("offset"), lit(100L))).cast("int"))
    // keys whose keyId ends in 1 never appear in b1, so some rows survive
    // under the old schema (license absent) — the mixed-file read path
    val b1 = base.filter(col("offset") >= 100 && !col("path").rlike("File\\d*1\\."))
      .withColumn("stars", col("offset") * 1000000L) // widened to long
      .withColumn("license", concat(lit("apache-"), pmod(col("offset"), lit(2L)))) // added
    val lake = new LakeTable(SparkTestSession.tempDir("lake5"), spark, subBuckets = 4)
    lake.merge(b0, 0L)
    assert(lake.currentSchema.get("stars").dataType === IntegerType)
    lake.merge(b1, 1L)
    val sch = lake.currentSchema.get
    assert(sch("stars").dataType === LongType, "stars must widen int->long")
    assert(sch.fieldNames.contains("license"), "license must be added")
    val rows = lake.read()
    // old rows (only in b0) readable under the evolved schema with null license
    val oldRows = rows.filter(col("offset") < 100)
    assert(oldRows.count() > 0)
    assert(oldRows.filter(col("license").isNotNull).count() === 0)
    // values survived the widen
    val sample = rows.filter(col("offset") >= 100).limit(1).collect()(0)
    assert(sample.getAs[Long]("stars") === sample.getAs[Long]("offset") * 1000000L)

    // ---- soft drop extends the ladder: no file rewrite, reads project the
    // column away, history keeps it, and the tail's still-sent column stays
    // dropped -------------------------------------------------------------
    val preDropVersion = lake.currentVersion
    val filesBefore = new java.io.File(lake.root, "data").listFiles().map(_.getName).toSet
    lake.dropColumn("stars")
    assert(!lake.currentSchema.get.fieldNames.contains("stars"))
    assert(new java.io.File(lake.root, "data").listFiles().map(_.getName).toSet
      === filesBefore, "a soft drop must rewrite no data file")
    assert(!lake.read().columns.contains("stars"),
      "reads must no longer project the dropped column")
    assert(lake.read().count() === rows.count(), "all rows stay readable")
    // time travel to the pre-drop snapshot still shows the column's values
    val old = lake.readVersion(preDropVersion)
    assert(old.columns.contains("stars") &&
      old.filter(col("stars").isNotNull).count() > 0)
    // the CDC tail keeps sending the dropped column: merge must IGNORE it,
    // not resurrect it (while still applying the batch's other columns)
    val b2 = base.filter(col("offset") < 50)
      .withColumn("offset", col("offset") + 10000L) // past the watermarks
      .withColumn("stars", col("offset") * 7L)
      .withColumn("license", lit("mit"))
    lake.merge(b2, 2L)
    assert(!lake.currentSchema.get.fieldNames.contains("stars"),
      "a still-sent dropped column must not re-enter the schema")
    assert(!lake.read().columns.contains("stars"))
    assert(lake.read().filter(col("license") === "mit").count() > 0,
      "the batch's surviving columns must still apply")

    // guard rails: merge identity and unknown columns refuse to drop
    intercept[IllegalArgumentException](lake.dropColumn("repo"))
    intercept[IllegalArgumentException](lake.dropColumn("no_such_column"))
  }

  test("incompatible schema change fails fast") {
    val m = intercept[IllegalArgumentException] {
      SchemaEvolution.merge(
        StructType(Seq(StructField("x", LongType))),
        StructType(Seq(StructField("x", StringType))))
    }
    assert(m.getMessage.contains("incompatible"))
  }

  test("widen ladder") {
    assert(SchemaEvolution.widen(IntegerType, LongType) === Some(LongType))
    assert(SchemaEvolution.widen(FloatType, DoubleType) === Some(DoubleType))
    assert(SchemaEvolution.widen(IntegerType, DoubleType) === Some(DoubleType))
    assert(SchemaEvolution.widen(LongType, IntegerType) === Some(LongType))
    assert(SchemaEvolution.widen(StringType, LongType) === None)
  }

  test("schema merge resolves case-insensitively, keeps lake spelling") {
    // a case-drifted binlog column is the SAME column (Spark's own default
    // resolution), never a duplicate and never silently nulled
    val cur = StructType(Seq(StructField("lang", StringType, nullable = true)))
    val in = StructType(Seq(StructField("Lang", StringType, nullable = true)))
    val merged = SchemaEvolution.merge(cur, in)
    assert(merged.fieldNames.toSeq === Seq("lang"))
    // align maps the drifted spelling onto the target's
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row("scala"))), in)
    val aligned = SchemaEvolution.align(df, merged)
    assert(aligned.columns.toSeq === Seq("lang"))
    assert(aligned.collect()(0).getString(0) === "scala")
    // true case conflicts within ONE schema fail fast
    val conflicted = StructType(Seq(
      StructField("x", LongType), StructField("X", LongType)))
    intercept[IllegalArgumentException] { SchemaEvolution.merge(cur, conflicted) }
  }

  test("a lake column absent from the batch flips to nullable") {
    // the batch fabricates nulls for the missing column; a non-nullable
    // schema over null-bearing files would be a false constraint Catalyst
    // trusts for filter simplification
    val cur = StructType(Seq(
      StructField("content", StringType, nullable = true),
      StructField("score", LongType, nullable = false)))
    val in = StructType(Seq(StructField("content", StringType, nullable = true)))
    val merged = SchemaEvolution.merge(cur, in)
    assert(merged("score").nullable, "absent-in-batch column must be nullable")
  }

  // r8: the per-partition offset gate became an O(1) array-literal lookup
  // (LakeTable.offsetGate) instead of a broadcast join — pin its semantics
  // against the join formulation across the shapes that differ: gated vs
  // ungated partitions, a partition ABOVE the array bound (mid-stream
  // expansion), boundary offsets under strict (>) and non-strict (>=), and
  // the sparse-key fallback path.
  test("offsetGate literal lookup equals the join formulation") {
    import org.apache.spark.sql.DataFrame
    val rows = Seq(
      (0, 0L), (0, 10L), (0, 11L), // gated at 10
      (1, 5L), (1, 6L),            // gated at 6 (boundary)
      (2, 99L),                    // ungated partition inside the array
      (7, 3L),                     // partition past the gate map entirely
      // out-of-domain partitions: the join formulation ADMITS them (left-
      // join null gate), so the literal path must too — without its domain
      // guard, -1 threw (element_at index 0), -2 silently resolved FROM THE
      // END of the array (gated against partition maxP's watermark), and
      // Int.MaxValue overflowed in `partition + 1` under ANSI mode
      (-1, 4L), (-2, 0L), (Int.MaxValue, 1L))
    val batch = spark.createDataFrame(rows).toDF("partition", "offset")
    val gate = Map(0 -> 10L, 1 -> 6L)
    def joinGate(df: DataFrame, g: Map[Int, Long], strict: Boolean): DataFrame = {
      val gDf = broadcast(spark.createDataFrame(g.toSeq).toDF("partition", "_g"))
      df.join(gDf, Seq("partition"), "left")
        .filter(col("_g").isNull ||
          (if (strict) col("offset") > col("_g") else col("offset") >= col("_g")))
        .drop("_g")
    }
    def rowsOf(df: DataFrame): Set[(Int, Long)] =
      df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    for (strict <- Seq(true, false)) {
      val got = rowsOf(LakeTable.offsetGate(batch, gate, strict))
      val want = rowsOf(joinGate(batch, gate, strict))
      assert(got === want, s"strict=$strict: literal gate diverged from join")
    }
    assert(rowsOf(LakeTable.offsetGate(batch, gate, strict = true)) ===
      Set((0, 11L), (2, 99L), (7, 3L), (-1, 4L), (-2, 0L), (Int.MaxValue, 1L)),
      "strict gate: only strictly-newer, ungated and out-of-domain rows survive")
    // sparse keys force the broadcast-join fallback; same semantics
    val sparse = Map(0 -> 10L, 1000000 -> 5L)
    assert(rowsOf(LakeTable.offsetGate(batch, sparse, strict = true)) ===
      rowsOf(joinGate(batch, sparse, strict = true)),
      "sparse-key fallback diverged from join")
  }
}
