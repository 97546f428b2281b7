package graft.bench

import graft.gen.ChangeGen
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies vacuum's lineage-archiving cost as history accumulates.
  *
  * The r02 design kept ONE JSON array (`lineage-archive.json`) that every
  * vacuum parsed and rewrote in full — O(total archived history) driver
  * work per vacuum, growing forever. The parquet-segment design writes one
  * segment per vacuum containing only that pass's GC'd rows, so per-vacuum
  * cost must stay FLAT while the cumulative archive grows linearly. This
  * bench runs R rounds of (merge a few batches → vacuum keepLast=1) and
  * prints, per round: vacuum wall time, bytes written into `_lineage/` by
  * that vacuum, and the cumulative archive size — the first column is the
  * claim under test.
  *
  * Usage: runMain graft.bench.LineageBench [rounds] [batchesPerRound]
  */
object LineageBench {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(10)
    val perRound = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-lineage-bench")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val partitions = 4
      val eventsPerBatch = 2000L
      val total = rounds * perRound * eventsPerBatch
      val changes = ChangeGen.changes(spark, total,
        nKeys = 4000, partitions = partitions, deletePct = 10)
        .persist()
      changes.count(): Unit
      val root = java.nio.file.Files.createTempDirectory("lineage-bench").toString
      val lake = new LakeTable(root, spark, subBuckets = 8, checkpointEvery = 4)
      val segDir = java.nio.file.Paths.get(root, "_lineage")
      def archiveBytes: Long =
        if (!java.nio.file.Files.isDirectory(segDir)) 0L
        else {
          val s = java.nio.file.Files.walk(segDir)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      val offsetsPerPartition = total / partitions
      val span = offsetsPerPartition / (rounds * perRound)
      var batchId = 0L
      println(f"${"round"}%-6s ${"vacuum(s)"}%-10s ${"seg KiB"}%-9s " +
        f"${"cum KiB"}%-9s ${"rows"}%-7s")
      (0 until rounds).foreach { r =>
        (0 until perRound).foreach { b =>
          val lo = (r * perRound + b) * span
          lake.merge(changes.filter(
            col("offset") >= lo && col("offset") < lo + span), batchId)
          batchId += 1
        }
        val before = archiveBytes
        val t0 = System.nanoTime()
        lake.vacuum(keepLast = 1, orphanGraceMs = 0L)
        val dt = (System.nanoTime() - t0) / 1e9
        val after = archiveBytes
        println(f"$r%-6d $dt%-10.2f ${(after - before) / 1024.0}%-9.1f " +
          f"${after / 1024.0}%-9.1f ${lake.lineage().count()}%-7d")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    } finally spark.stop()
  }
}
