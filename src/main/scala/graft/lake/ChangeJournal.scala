package graft.lake

import com.fasterxml.jackson.databind.JsonNode
import graft.operators.Chunker
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The chunked, offset-keyed change journal — the Spark-native port of the
  * reference sink's storage trio (SURVEY.md §1.3):
  *
  *   - data file per (partition, append): `data/part-{p:05d}-{appId}-{firstOffset:012d}.parquet`
  *     ↔ `{topic}-{partition:05d}-{firstOffset:012d}.gz`
  *     (BlockGZIPFileWriter.java:161-163; zero-padded fixed width so
  *     lexicographic = numeric order, load-bearing in the reference's
  *     resume skip, S3FilesReader.java:167)
  *   - manifest JSON with per-file ChunkDescriptor lists
  *     ↔ `…index.json` (BlockGZIPFileWriter.java:242-250)
  *   - `snapshot.json` pointer, atomically swapped
  *     ↔ `last_chunk_index.{topic}-{partition}.txt` cursor (S3Writer.java:138-153)
  *
  * Exactly-once story, identical to the reference's: file names derive only
  * from (partition, firstOffset) — never wall clock (fixing the reference's
  * date-prefix nondeterminism, S3Writer.java:129-136) — so a retried batch
  * overwrites the same files with the same bytes instead of appending, and
  * the snapshot pointer is the single source of truth.
  */
final class ChangeJournal(
    val root: String,
    spark: SparkSession,
    val chunkBytes: Long = 64L * 1024 * 1024,
    val appId: String = "graft",
    val checkpointEvery: Int = 16,
    commitStore: CommitStore = RenameCommitStore) {
  require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
  // appId is interpolated into durable relative paths (data files, staging
  // dirs) and into the CAS protocol's identity: a '/', '=' or whitespace
  // would silently change the layout (nested dirs under data/ break the
  // sweep's name comparisons), so fail loudly at construction (ADVICE r7)
  require(appId.matches("[A-Za-z0-9._-]+"),
    s"appId must match [A-Za-z0-9._-]+ (it names durable paths); got '$appId'")

  private val io = new TableIO(root, spark, commitStore)

  // ---- snapshot / manifest ---------------------------------------------

  /** committed batch id, or -1 for a fresh table */
  def lastBatchId: Long = io.readSnapshot().map(_.get("batchId").asLong).getOrElse(-1L)

  private def currentVersion: Long =
    io.readSnapshot().map(_.get("version").asLong).getOrElse(-1L)

  /** Replay fence against a PINNED snapshot (see LakeTable.isReplayOf):
    * same writer AND batch id at or below committed — a new appId's
    * restarted numbering must not be swallowed as replays; the offset gate
    * still dedups its rows.
    */
  private def isReplayOf(snap: Option[JsonNode], batchId: Long): Boolean =
    snap.flatMap(s => Option(s.get("appId")).map(_.asText))
      .getOrElse(appId) == appId &&
      batchId <= snap.map(_.get("batchId").asLong).getOrElse(-1L)

  // current-manifest cache keyed by snapshot version (same rationale as
  // LakeTable: checkpoint manifests are O(history) JSON — parse once per
  // version, not once per accessor)
  @volatile private var manifestCache: Option[(Long, JsonNode)] = None

  private def manifest(): Option[JsonNode] = manifestOf(io.readSnapshot())

  /** manifest of a SPECIFIC snapshot node — the plan-consistency primitive
    * (see LakeTable.manifestOf): append/commit read the snapshot once and
    * derive every plan input from that node.
    */
  private def manifestOf(snap: Option[JsonNode]): Option[JsonNode] = snap.map { s =>
    val v = s.get("version").asLong
    manifestCache match {
      case Some((cv, m)) if cv == v => m
      case _ =>
        val m = Json.parse(
          io.readString(new Path(io.rootPath, s.get("manifest").asText)))
        manifestCache = Some((v, m))
        m
    }
  }

  /** Per-partition next offset to write — the port of S3Writer.fetchOffset
    * (S3Writer.java:83-127): last chunk's `first_record_offset + num_records`;
    * missing table ⇒ empty map ⇒ 0 everywhere (the 404 case, :101-107).
    */
  def nextOffsets(): Map[Int, Long] = nextOffsetsOf(manifest())

  /** the manifest's partitions→nextOffset map — the ONE place that knows
    * the `partitions` JSON shape (nextOffsets / append / truncate all
    * route through it, each against its own pinned manifest)
    */
  private def nextOffsetsOf(m: Option[JsonNode]): Map[Int, Long] = m match {
    case None => Map.empty
    case Some(mm) => mm.get("partitions").properties().asScala
      .map(e => e.getKey.toInt -> e.getValue.get("nextOffset").asLong).toMap
  }

  // read-and-catch, not exists-then-read (one RPC per chain step; see
  // LakeTable.manifestAt)
  private def manifestAt(version: Long): Option[JsonNode] = {
    val p = new Path(io.rootPath, f"manifest-$version%012d.json")
    try Some(Json.parse(io.readString(p)))
    catch { case _: java.io.FileNotFoundException => None }
  }

  /** A delta manifest records only this commit's change: `added` (an
    * append's new files) and/or `removed` (a truncate's dropped paths) —
    * SURVEY.md §4.1 applied to the journal: commit JSON is O(change), never
    * O(journal history). Truncation in particular stays O(dead), not
    * O(kept): at long retention the kept set is the big one. Every
    * `checkpointEvery`-th commit writes the full listing so readers fold a
    * bounded chain.
    */
  private def isDelta(m: JsonNode): Boolean = m.has("added")

  private def filesOf(m: JsonNode): Seq[JsonNode] = {
    if (!isDelta(m)) return m.get("files").elements().asScala.toSeq
    var chain = List(m)
    while (isDelta(chain.head)) {
      val pv = chain.head.get("version").asLong - 1
      chain = manifestAt(pv).getOrElse(throw new IllegalStateException(
        s"journal manifest chain broken at version $pv under $root")) :: chain
    }
    chain.tail.foldLeft(chain.head.get("files").elements().asScala.toSeq) {
      (acc, d) =>
        val rem = Option(d.get("removed"))
          .map(_.elements().asScala.map(_.asText).toSet)
          .getOrElse(Set.empty[String])
        val base = if (rem.isEmpty) acc
                   else acc.filterNot(f => rem(f.get("path").asText))
        base ++ d.get("added").elements().asScala
    }
  }

  // resolved listing cached per snapshot version (chain resolution reads up
  // to checkpointEvery JSONs; an external writer bumps the version, which
  // invalidates the cache for free)
  @volatile private var filesCache: Option[(Long, Seq[JsonNode])] = None

  private def liveFiles(): Seq[JsonNode] = liveFilesOf(io.readSnapshot())

  private def liveFilesOf(snap: Option[JsonNode]): Seq[JsonNode] = snap match {
    case None => Seq.empty
    case Some(s) =>
      val v = s.get("version").asLong
      filesCache match {
        case Some((cv, fs)) if cv == v => fs
        case _ =>
          val fs = filesOf(manifestOf(snap).get)
          filesCache = Some((v, fs))
          fs
      }
  }

  // ---- append (the sink) ------------------------------------------------

  /** Append one batch of change events. Idempotent per `batchId` (epoch
    * fencing: a batch id at or below the committed one is a replay and is
    * skipped — the foreachBatch analogue of Connect redelivering after a
    * RetriableException, S3SinkTask.java:222-224). Rows at offsets already
    * journaled are dropped (at-least-once dedup, the monotonic gate of
    * S3SourceTask.updateOffsets:198-207).
    *
    * Returns the number of rows appended.
    */
  def append(batch: DataFrame, batchId: Long): Long = {
    // journal stores exactly the batch's schema (schema-flexible: evolved
    // payload columns flow straight through; only the meta trio is required
    // — validate BEFORE any plan references the columns)
    val required = Seq("partition", "offset", "op")
    require(required.forall(batch.columns.contains),
      s"change batch must carry ${required.mkString(",")}; got ${batch.columns.mkString(",")}")

    // ONE snapshot read pins the whole plan (fence, CAS baseline, previous
    // schema, resume offsets) — see LakeTable.merge / manifestOf for why
    // per-accessor re-reads are both a plan-consistency race next to a
    // concurrent writer and wasted metadata RPCs
    val snap0 = io.readSnapshot()
    if (isReplayOf(snap0, batchId)) return 0L // fenced replay: already durable

    // CAS baseline: every read below plans against this version
    val plannedVersion = snap0.map(_.get("version").asLong).getOrElse(-1L)
    val m0 = manifestOf(snap0)

    // the journal's current schema is KNOWN at every commit (this batch's
    // columns merged additively over the previous manifest's schema), so
    // persist it — a caught-up reader must not have to open parquet footers
    // to learn it (that scan grows O(total journal files) with history)
    val mergedSchema = m0
      .flatMap(m => Option(m.get("schema")).map(_.asText))
      .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .map(prev => SchemaEvolution.merge(prev, batch.schema))
      .getOrElse(batch.schema)

    val next = nextOffsetsOf(m0)

    // offset-skip gate (P2): drop rows the journal already has — an
    // O(1)-per-row literal lookup, not a broadcast join (the join shipped a
    // fresh broadcast per job: the chunk-stats pass AND the data write);
    // rationale in LakeTable.offsetGate
    val fresh0 = LakeTable.offsetGate(batch, next, strict = false)

    // deterministic chunk assignment; chunks restart per file (= per append
    // per partition), exactly like the reference where every flushed .gz file
    // carries its own chunk list starting at byte 0 (BlockGZIPFileWriter is
    // created anew per PartitionWriter, S3SinkTask.java:173-178).
    // Scanned twice (chunk stats collect + data-file write) but NOT
    // persisted: the stats pass computes its window over 4 pruned columns,
    // while a persist materializes every column into the cache — a full
    // extra memory-bandwidth pass that measured slower and scaled worse
    // than the recompute on the scaling bench (same finding as
    // LakeTable.merge). Recompute is safe: sources are deterministic.
    val fresh = Chunker.assignChunks(fresh0, chunkBytes)

    // per-file (= per partition per append) and per-chunk stats, one pass
    val chunkStats = fresh.groupBy(col("partition"), col("chunk_id")).agg(
      min(col("offset")).as("first_record_offset"),
      count(lit(1)).as("num_records"),
      max(col("offset")).as("max_offset"),
      sum(col("bytes_uncompressed")).as("byte_length_uncompressed"))
      .collect()
    if (chunkStats.isEmpty) {
      commitManifest(Nil, next, batchId, mergedSchema, plannedVersion)
      return 0L
    }

    val dataCols = batch.columns.toSeq
    val staging = new Path(io.rootPath, s"_staging/append-$appId-$batchId")
    io.fs.delete(staging, true)
    // `_p` duplicates `partition` for the directory layout only: partitionBy
    // strips its column from file contents, and promoted files must stay
    // self-contained (the manifest, not the path, is the source of truth).
    // The repartition DECLARES the one-task-per-partition clustering the
    // one-file-per-directory contract needs. (It cannot be inherited from
    // the chunk window: this select uses no window column, so Catalyst
    // rightly prunes the window AND its exchange from this job's plan —
    // relying on it worked only while a persist froze the window output.)
    // The explicit sort satisfies FileFormatWriter's required ordering for
    // dynamic partitions (prefix `_p`), so no second, UNSTABLE sort is
    // inserted — and files stay offset-ordered, which is what gives parquet
    // row-group min/max stats their pruning power on resume reads
    fresh
      .select((dataCols.map(col) :+ col("partition").as("_p")).toIndexedSeq: _*)
      // explicit count = touched partitions (capped by the session's tuned
      // parallelism): one output FILE per partition, and AQE's byte-based
      // coalescing would serialize them into one task (see LakeTable.merge)
      .repartition(math.min(chunkStats.iterator.map(_.getInt(0)).toSet.size,
        spark.sessionState.conf.numShufflePartitions).max(1), col("_p"))
      .sortWithinPartitions(col("_p"), col("offset"))
      .write.mode("overwrite").partitionBy("_p")
      .option("compression", TableIO.dataCodec)
      .options(TableIO.stagingWriteOptions).parquet(staging.toString)

    // promote each partition's single part file to its offset-keyed name —
    // located by ONE recursive staging listing (no per-partition
    // exists/listStatus probes; see TableIO.listStagedParts)
    val stagedParts = io.listStagedParts(staging)
    io.fs.mkdirs(new Path(io.rootPath, "data"))
    val byPartition = chunkStats.groupBy(_.getInt(0))
    var appended = 0L
    val newFiles = byPartition.toSeq.sortBy(_._1).map { case (p, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1))
      val firstOffset = sorted.map(_.getLong(2)).min
      // appId-qualified like the lake's data files: deterministic for THIS
      // writer's retry (same name overwrites, the reference's offset-keyed
      // dedup story) but never collidable with a raced peer, whose promote
      // would otherwise overwrite a committed, manifest-referenced file
      // before its own commit loses the CAS
      val rel = f"data/part-$p%05d-$appId-$firstOffset%012d.parquet"
      val src = stagedParts.getOrElse(s"_p=$p", throw new IllegalStateException(
        s"journal append staged no file for partition $p (stats saw rows) — " +
          "batch source must be deterministic across scans"))
      io.promoteListedFile(src, new Path(io.rootPath, rel))
      // The write evaluated the batch a second time (no persist): the
      // parquet footer must agree with the stats pass's row count, else the
      // source violated the determinism precondition and the manifest's
      // chunk descriptors would silently disagree with the file. Footer
      // read is one metadata fetch — cheap insurance that turns silent
      // corruption into a loud failure.
      val statRows = chunks.map(_.getLong(3)).sum
      val footerRows = io.parquetRowCount(new Path(io.rootPath, rel))
      require(footerRows == statRows,
        s"journal append stats/write divergence on partition $p: stats saw " +
          s"$statRows rows, write produced $footerRows — batch source must " +
          "be deterministic across scans")
      val fileNode = Json.obj()
      fileNode.put("partition", p)
      fileNode.put("path", rel)
      fileNode.put("first_record_offset", firstOffset)
      fileNode.put("num_records", sorted.map(_.getLong(3)).sum)
      fileNode.put("max_offset", sorted.map(_.getLong(4)).max)
      val arr = fileNode.putArray("chunks")
      var byteOffset = 0L // chunks tile the file's byte space from 0
      sorted.foreach { r =>
        val c = Json.obj()
        c.put("first_record_offset", r.getLong(2))
        c.put("num_records", r.getLong(3))
        c.put("byte_offset", byteOffset)
        c.put("byte_length_uncompressed", r.getLong(5))
        byteOffset += r.getLong(5)
        arr.add(c)
      }
      appended += sorted.map(_.getLong(3)).sum
      fileNode
    }
    io.fs.delete(staging, true)

    val newNext = next ++ byPartition.map { case (p, chunks) =>
      p -> (chunks.map(_.getLong(4)).max + 1L)
    }
    commitManifest(newFiles, newNext, batchId, mergedSchema, plannedVersion)
    appended
  }

  /** Retention truncation — the Kafka log-retention / S3 lifecycle analogue
    * (the reference's archives are bounded the same way: by bucket lifecycle
    * policy, not by the connector). Drops whole journal files whose every
    * offset is at or below the per-partition watermark — typically the
    * lake's committed watermarks after a MERGE, when the events are durable
    * downstream; without this the journal grows without bound at 10^10
    * events. Files straddling the watermark are kept whole (readFrom's row
    * filter handles the overlap). Resume offsets (`nextOffsets`) are
    * untouched. Returns the number of files dropped from the manifest.
    *
    * Physical reclamation is DEFERRED: dropping a file from the manifest is
    * immediate (a `removed` DELTA commit — O(dead paths) JSON, independent
    * of how many files are kept, so long-retention journals truncate in
    * constant metadata cost), but its bytes — and manifests that fell below
    * the current checkpoint, which otherwise accumulate forever — are
    * recorded as tombstones stamped with the DROP time and reclaimed only
    * once `graceMs` has passed since the drop. A concurrent reader that
    * resolved the previous snapshot's listing can therefore finish its
    * scan; an mtime cutoff could not give that guarantee, because a journal
    * file's mtime says when it was WRITTEN, not when a reader could last
    * have planned to read it. A crash between the commit and the tombstone
    * write leaves only unreferenced orphans, never a manifest referencing
    * missing files.
    *
    * Tombstones are APPEND-ONLY: each truncate writes its own immutable
    * file under `pending-delete/` (all entries share that truncate's drop
    * time, so reaping is per-file all-or-nothing). Two concurrent
    * truncators — a zombie writer racing its fenced successor, the exact
    * scenario TableIO.writeAtomic defends — write distinct files and can
    * never clobber each other's tombstones, which a read-modify-write list
    * could (the same reasoning as the lineage archive's segments).
    */
  def truncate(watermarks: Map[Int, Long],
      graceMs: Long = 24L * 3600 * 1000): Int = {
    // one pinned snapshot for the whole pass (see LakeTable.merge)
    val snap0 = io.readSnapshot()
    val plannedVersion = snap0.map(_.get("version").asLong).getOrElse(-1L)
    val (dead, kept) = liveFilesOf(snap0).partition { f =>
      watermarks.get(f.get("partition").asInt)
        .exists(w => f.get("max_offset").asLong <= w)
    }
    if (dead.nonEmpty) {
      val m0 = manifestOf(snap0)
      val next0 = nextOffsetsOf(m0)
      commitManifest(Nil, next0,
        snap0.map(_.get("batchId").asLong).getOrElse(-1L), journalSchema(kept),
        plannedVersion, removed = dead.map(_.get("path").asText))
      // Manifests strictly below the NEW current checkpoint version are
      // unreachable from any live fold chain. Their names are DERIVED, not
      // listed: versions are sequential, so the not-yet-tombstoned range is
      // exactly [W, ckpt) where W rides a tiny watermark file — no root
      // listStatus per truncate (previously the one per-truncate cost that
      // grew with unreaped history). Synthesizing a name whose manifest
      // never landed or was already reaped is harmless — reap's deletes are
      // idempotent — and the watermark advances only AFTER the tombstones
      // are durable, so a crash in between merely re-covers the same range
      // next truncate (deduped below, bounded by the grace window). The
      // first truncate of a pre-watermark journal migrates with one root
      // listing.
      val ckpt = manifest()
        .map(m => Option(m.get("checkpointVersion")).map(_.asLong)
          .getOrElse(m.get("version").asLong))
        .getOrElse(0L)
      // a regressed/ancient watermark could derive a range of millions of
      // synthetic names (driver memory + delete-RPC cliff the old bounded
      // listing could never hit) — past this bound the listing, bounded by
      // what actually exists, is the cheaper and safer source
      val maxDerivedRange = 4096L
      // w > ckpt is INVALID state (journal dir restored from a backup while
      // a newer tombstone-watermark.json survived): ckpt - w goes negative,
      // which would satisfy the bound, derive an empty range, then rewrite
      // the watermark to ckpt below — permanently leaking every pre-restore
      // superseded manifest the listing would have reclaimed. An ahead
      // watermark therefore falls through to the root listing, and the
      // rewrite after it self-heals the watermark back to ckpt.
      val supersededManifests = tombstoneWatermark() match {
        case Some(w) if w <= ckpt && ckpt - w <= maxDerivedRange =>
          (w until ckpt).map(v => f"manifest-$v%012d.json")
        case _ => io.fs.listStatus(io.rootPath).toSeq
          .map(_.getPath.getName)
          .filter(_.matches("""manifest-\d{12,}\.json""")) // %012d grows past 12 digits
          .filter(_.stripPrefix("manifest-").stripSuffix(".json").toLong < ckpt)
      }
      // dedupe against tombstones already pending: unreaped manifests stay
      // on disk for the whole grace window, and re-naming them every
      // truncate would pile up duplicate tombstone files at a
      // truncate-per-batch cadence (the old single-list code deduped the
      // same way via its known set)
      pendingAdd((dead.map(_.get("path").asText) ++ supersededManifests)
        .filterNot(alreadyPending()))
      io.writeAtomic(tombstoneWatermarkPath, s"""{"manifestsBelow":$ckpt}""")
    }
    reapPending(graceMs)
    // crashed peers' abandoned staging reclaims at maintenance cadence,
    // not per-append — off the commit hot path (CommitProtocolBench)
    io.sweepStaleStaging()
    dead.size
  }

  private def pendingDir = new Path(io.rootPath, "pending-delete")
  private def legacyPendingPath = new Path(io.rootPath, "pending-delete.json")
  private def tombstoneWatermarkPath =
    new Path(io.rootPath, "tombstone-watermark.json")

  /** manifest versions strictly below this are already tombstoned (or
    * reaped); absent on journals that have never truncated post-upgrade.
    * Concurrency is forgiving by construction: a zombie writer regressing
    * the watermark only widens the next truncate's range over
    * already-handled versions, which dedup + idempotent reap absorb.
    */
  private def tombstoneWatermark(): Option[Long] =
    // read-and-catch (one RPC, no probe). ANY unreadable state — absent
    // file, torn file on a non-atomic-rename fs, missing field, foreign
    // content — degrades to the root-listing path, which self-heals: the
    // next truncate rewrites the file. A throw here would fail every
    // retention pass (and, wired into CdcPipeline's cadence, the streaming
    // query itself) until someone hand-deletes the file.
    try Option(Json.parse(io.readString(tombstoneWatermarkPath))
      .get("manifestsBelow")).map(_.asLong)
    catch { case scala.util.control.NonFatal(_) => None }

  /** paths already named by a pending tombstone (so truncates don't re-name
    * the same unreaped garbage every pass); bounded by the grace window
    */
  private def alreadyPending(): Set[String] =
    if (!io.fs.exists(pendingDir)) Set.empty
    else MetaIO.fetchAll(io.fs.listStatus(pendingDir).toSeq
      .filter(_.getPath.getName.matches("""del-.*\.json"""))) { st => // not .tmp-*
        // fanned out on the shared metadata pool: at a truncate-per-batch
        // cadence with a day's grace this is hundreds of small GETs on an
        // object store. A concurrent reaper may delete a ripe tombstone
        // between our listing and this read — its paths are then simply
        // not "pending".
        try Json.parse(io.readString(st.getPath))
          .get("paths").elements().asScala.map(_.asText).toSeq
        catch { case _: java.io.FileNotFoundException => Nil }
      }.flatten.toSet

  /** record paths that just became unreferenced as ONE immutable tombstone
    * file stamped with the drop time — append-only, concurrency-safe.
    * writeAtomic (unique tmp + rename), never a bare create: a torn del-*
    * file would poison every later reap's JSON parse.
    */
  private def pendingAdd(paths: Seq[String]): Unit = {
    if (paths.isEmpty) return
    val now = System.currentTimeMillis()
    val o = Json.obj()
    o.put("droppedAt", now)
    val arr = o.putArray("paths")
    paths.distinct.foreach(arr.add)
    io.writeAtomic(new Path(pendingDir,
      f"del-$now%013d-${java.util.UUID.randomUUID()}.json"), Json.write(o))
  }

  /** reclaim tombstone files whose grace window has fully elapsed (all of a
    * file's entries share one droppedAt, so per-file reaping is exact);
    * deletes are idempotent, so concurrent reapers are safe
    */
  private def reapPending(graceMs: Long): Unit = {
    migrateLegacyPending()
    if (!io.fs.exists(pendingDir)) return
    val cutoff = System.currentTimeMillis() - graceMs
    io.fs.listStatus(pendingDir).toSeq
      // exact .json names only: a crash-leaked writeAtomic tmp
      // (del-*.json.tmp-*) must not be parsed — or reaped as if complete
      .filter(_.getPath.getName.matches("""del-.*\.json""")).foreach { st =>
        // a concurrent reaper may have taken this tombstone already —
        // its deletes were idempotent with ours, nothing left to do
        val node = try Json.parse(io.readString(st.getPath))
                   catch { case _: java.io.FileNotFoundException => null }
        if (node != null && node.get("droppedAt").asLong <= cutoff) {
          node.get("paths").elements().asScala.foreach(p =>
            io.fs.delete(new Path(io.rootPath, p.asText), false): Unit)
          io.fs.delete(st.getPath, false): Unit
        }
      }
    // cosmetic empty-dir cleanup, best-effort ONLY: a concurrent truncator
    // may add a tombstone between our listing and the delete (non-recursive
    // delete of a non-empty dir throws), and a concurrent reaper may have
    // removed the dir already — both races are benign
    try {
      if (io.fs.exists(pendingDir) && io.fs.listStatus(pendingDir).isEmpty)
        io.fs.delete(pendingDir, false): Unit
    } catch { case _: java.io.IOException => () }
  }

  /** one-time migration of the old read-modify-write pending-delete.json:
    * rewrite each drop-time group as its own immutable tombstone file
    */
  private def migrateLegacyPending(): Unit = {
    if (!io.fs.exists(legacyPendingPath)) return
    Json.parse(io.readString(legacyPendingPath)).elements().asScala.toSeq
      .groupBy(_.get("droppedAt").asLong).foreach { case (at, entries) =>
        val o = Json.obj()
        o.put("droppedAt", at)
        val arr = o.putArray("paths")
        entries.map(_.get("path").asText).distinct.foreach(arr.add)
        io.writeAtomic(new Path(pendingDir,
          f"del-$at%013d-${java.util.UUID.randomUUID()}.json"), Json.write(o))
      }
    io.fs.delete(legacyPendingPath, false): Unit
  }

  /** The journal's schema: from the manifest when persisted (every commit
    * since the schema field landed), else inferred from the newest file per
    * partition (O(partitions) footers), else the minimal meta trio.
    */
  private def journalSchema(all: Seq[JsonNode]): org.apache.spark.sql.types.StructType =
    manifest()
      .flatMap(m => Option(m.get("schema")).map(_.asText))
      .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse {
        if (all.isEmpty) org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("partition",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("offset",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("op",
            org.apache.spark.sql.types.StringType)))
        else {
          val newestPerPartition = all
            .groupBy(_.get("partition").asInt)
            .values.map(_.maxBy(_.get("max_offset").asLong).get("path").asText)
            .toSeq
          spark.read.option("mergeSchema", "true")
            .parquet(newestPerPartition.map(r => new Path(io.rootPath, r).toString): _*)
            .schema
        }
      }

  /** Commit this batch's change — `added` files and/or `removed` paths
    * (truncation) — on top of the current listing, written as a delta
    * except at checkpoint cadence or first commit.
    */
  private def commitManifest(
      added: Seq[JsonNode], next: Map[Int, Long], batchId: Long,
      schema: org.apache.spark.sql.types.StructType,
      plannedVersion: Long,
      removed: Seq[String] = Nil): Unit = {
    val prev = io.requirePlanCoherent(plannedVersion, "journal")
    val version = plannedVersion + 1
    // pinned to `prev` (the coherence-checked node) — a peer committing
    // right after the check must fail the claim/CAS, not leak its state
    // into this commit's bookkeeping (see LakeTable.commit)
    val prevCkpt = prev.map { _ =>
      val pm = manifestOf(prev).get
      Option(pm.get("checkpointVersion")).map(_.asLong)
        .getOrElse(pm.get("version").asLong)
    }
    val removedSet = removed.toSet
    val base = if (removedSet.isEmpty) liveFilesOf(prev)
               else liveFilesOf(prev).filterNot(f => removedSet(f.get("path").asText))
    val resolved = base ++ added
    val writeFull = prev.isEmpty || version - prevCkpt.get >= checkpointEvery
    val m = Json.obj()
    m.put("version", version)
    m.put("batchId", batchId)
    m.put("appId", appId)
    m.put("schema", schema.json)
    m.put("checkpointVersion", if (writeFull) version else prevCkpt.get)
    val pn = m.putObject("partitions")
    next.keySet.toSeq.sorted.foreach { p =>
      val o = pn.putObject(p.toString)
      o.put("nextOffset", next.getOrElse(p, 0L))
    }
    val fa = m.putArray(if (writeFull) "files" else "added")
    (if (writeFull) resolved else added).foreach(fa.add)
    if (!writeFull && removed.nonEmpty) {
      val ra = m.putArray("removed")
      removed.foreach(ra.add)
    }
    // exclusive claim + CAS, exactly the lake's commit discipline (see
    // LakeTable.commit): a raced loser must never overwrite the winner's
    // version-named manifest, and a crashed claimer's commit rolls forward
    val manifestRel = f"manifest-$version%012d.json"
    if (!io.createVersioned(new Path(io.rootPath, manifestRel), Json.write(m)))
      io.resolveLostVersionClaim(manifestRel, version, plannedVersion)
    io.swapSnapshot(
      io.snapshotJson(version, manifestRel, batchId, appId), version - 1)
    filesCache = Some((version, resolved))
    manifestCache = Some((version, m))
  }

  // ---- read / replay (the source) ---------------------------------------

  /** Read the whole journal in (partition, offset) order-independent form.
    * Callers order explicitly — Spark must never rely on listing order
    * (the reference leans on S3 lexicographic listing, S3FilesReader.java:54-59;
    * we make ordering a declared property of the plan instead).
    */
  def read(): DataFrame = readFrom(Map.empty)

  /** Resume read: everything after `committed` (exclusive) per partition.
    * File-level pruning via manifest max_offset replaces the reference's
    * skip-whole-files-behind-the-cursor (S3FilesReader.java:164-171); the
    * residual row filter replaces its in-file record-skip loop (:256-260) —
    * parquet row-group stats prune the rest.
    */
  def readFrom(committed: Map[Int, Long]): DataFrame = {
    val all = liveFiles()
    val files = all.filter { f =>
      committed.get(f.get("partition").asInt)
        .forall(c => f.get("max_offset").asLong > c)
    }
    if (files.isEmpty) {
      // fully-caught-up resume must still carry the journal's schema, not a
      // zero-column frame (downstream selects/aggs would fail to resolve).
      // The schema comes from the MANIFEST (persisted at every commit) — a
      // caught-up consumer polling frequently must not pay an O(total
      // journal files) parquet footer scan per call. Footer fallback (newest
      // file per partition only, O(partitions)) covers pre-schema manifests.
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], journalSchema(all))
    }
    val pathsAbs = files.map(f => new Path(io.rootPath, f.get("path").asText).toString)
    // mergeSchema: appends may add payload columns over time (additive only;
    // type widening is the lake table's job, which tracks schema versions)
    val df = spark.read.option("mergeSchema", "true").parquet(pathsAbs: _*)
    // residual row filter as the O(1) literal gate (LakeTable.offsetGate):
    // no broadcast join in the resume-read plan, and the predicate stays in
    // the scan's own stage
    if (committed.isEmpty) df
    else LakeTable.offsetGate(df, committed, strict = true)
  }

  /** Manifest chunk descriptors as a DataFrame (for tests and metrics). */
  def chunkIndex(): DataFrame = {
    val rows = for {
      f <- liveFiles()
      c <- f.get("chunks").elements().asScala.toSeq
    } yield (f.get("partition").asInt, f.get("path").asText,
      c.get("first_record_offset").asLong, c.get("num_records").asLong,
      c.get("byte_offset").asLong, c.get("byte_length_uncompressed").asLong)
    spark.createDataFrame(rows).toDF(
      "partition", "path", "first_record_offset", "num_records",
      "byte_offset", "byte_length_uncompressed")
  }
}
