package graft.bench

import graft.gen.ChangeGen
import graft.pipeline.CdcPipeline
import org.apache.spark.sql.SparkSession

/** Measure MERGE rewrite amplification against the `subBuckets` knob — the
  * parameter that governs 100 TB write cost. The merge rewrites each
  * touched (partition, subBucket) file WHOLE (copy-on-write,
  * LakeTable.merge); with small batches over big buckets most rewritten
  * bytes are carried state, not new data, so amplification =
  * totalBytesWrittenToData / finalLiveBytes is the number to size buckets
  * by. Bytes are DETERMINISTIC (unlike wall time on this VM —
  * BENCH/BASELINE.md environment notes), so one sequential JVM is a valid
  * measurement harness; wall time is reported as secondary color only.
  *
  * Protocol: for each (subBuckets × nBatches) cell, ingest the same
  * deterministic change log (merge only — the journal is append-only and
  * does not amplify) with vacuum OFF, so data/ retains every superseded
  * file version and its total size IS the cumulative bytes ever written.
  *
  * Usage: runMain graft.bench.AmplificationBench [events] [subBucketsCsv]
  *   [batchesCsv] [keyMode]   (defaults 2000000 / 4,16,64,256 / 4,16 /
  *   uniform)
  *
  * keyMode governs WHICH amplification regime the run measures:
  *   - `uniform`: every batch's events spray over the whole key space (the
  *     generator's default). A batch with k distinct keys touches
  *     ~B·(1-(1-1/B)^k) of B buckets — for k ≫ B that is ALL of them, so
  *     every batch rewrites the whole table and amp_vs_live ≈ nBatches
  *     regardless of bucket count. This regime sizes COMPACTION cadence,
  *     not buckets.
  *   - `clustered`: keys are contiguous offset blocks (20 events per key,
  *     back to back), the shape of a CDC tail whose batch covers minutes of
  *     changes over a huge key space — each batch touches a small key
  *     subset, and bucket count becomes the real knob: amplification falls
  *     once B grows past the per-batch distinct-key count.
  * Emits one JSON line per cell plus a closing summary line; results and
  * sizing guidance land in BENCH/BASELINE.md.
  */
object AmplificationBench {
  def main(args: Array[String]): Unit = {
    val events = args.headOption.map(_.toLong).getOrElse(2000000L)
    val subBucketsList = args.lift(1).getOrElse("4,16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val batchesList = args.lift(2).getOrElse("4,16")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_SCALE_CPUS", "8")}]")
      .appName("graft-amplification-bench")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .config("spark.sql.parquet.compression.codec", "snappy")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val keyMode = args.lift(3).getOrElse("uniform")
      require(keyMode == "uniform" || keyMode == "clustered",
        s"keyMode must be uniform|clustered, got '$keyMode'")
      val base = sys.env.getOrElse("GRAFT_SCALING_ROOT", "/tmp")
      val root = s"$base/graft-amp/run-${System.nanoTime()}"
      val inputDir = s"$root/input"
      // same generator shape as LargeScaleCheck: ~20 events per key, 10%
      // deletes — a realistic steady-state CDC mix where most of a touched
      // bucket's rewrite is carried state
      val gen = ChangeGen.changes(spark, events,
        nKeys = (events / 20).toInt.max(100), partitions = 8,
        deletePct = 10, minLen = 64, maxLen = 256)
      // clustered mode: rewrite the key as a contiguous block of 20 offsets
      // (keys still hash uniformly over buckets — clustering shrinks each
      // BATCH's distinct-key set, which is what makes bucket pruning bite)
      val log = if (keyMode == "uniform") gen else {
        import org.apache.spark.sql.functions.{col, concat, lit}
        // partition prefix keeps the key→partition contract (a key lives in
        // exactly ONE partition for its lifetime — LakeTable's precondition)
        val kid = concat(col("partition"), lit("-"),
          (col("offset") / 20L).cast("long"))
        gen.withColumn("repo", concat(lit("r"), kid))
          .withColumn("path", concat(lit("p"), kid))
      }
      log.write.mode("overwrite").parquet(inputDir)
      val changes = spark.read.parquet(inputDir)
      val inputBytes = dirBytes(new java.io.File(inputDir))

      val rows = for (sb <- subBucketsList; nb <- batchesList) yield {
        val lakeRoot = s"$root/lake-sb$sb-nb$nb"
        val p = new CdcPipeline(spark, journalRoot = s"$root/j-unused",
          lakeRoot = lakeRoot, subBuckets = sb, journalEnabled = false)
        val t0 = System.nanoTime()
        p.runBatches(changes, nb)
        val wall = (System.nanoTime() - t0) / 1e9
        val dataDir = new java.io.File(lakeRoot, "data")
        // vacuum never ran: data/ holds every version ever written
        val written = dirBytes(dataDir)
        val liveBytes = p.lake.read().inputFiles
          .map(f => new java.io.File(new java.net.URI(f)).length()).sum
        val liveFilesN = p.lake.read().inputFiles.length
        val line =
          s"""{"events":$events,"sub_buckets":$sb,"batches":$nb,""" +
            s""""bytes_written":$written,"live_bytes":$liveBytes,""" +
            s""""amp_vs_live":${r2(written.toDouble / liveBytes)},""" +
            s""""amp_vs_input":${r2(written.toDouble / inputBytes)},""" +
            s""""live_files":$liveFilesN,"wall_sec":${r2(wall)}}"""
        println(line)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lakeRoot))
        (sb, nb, written, liveBytes, wall)
      }
      println(s"""{"summary":"amplification","events":$events,""" +
        s""""input_bytes":$inputBytes,"cells":${rows.size}}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    } finally spark.stop()
  }

  private def r2(v: Double): Double = math.rint(v * 100) / 100

  private def dirBytes(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    else f.length()
}
