package graft.bench

import graft.gen.ChangeGen
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Quantifies the driver-side commit cost of the manifest machinery
  * (SURVEY.md §4.1) in the shape that matters at 100 TB: a DENSE table
  * (seed backfill populating every bucket) followed by small incremental
  * CDC batches, each touching a few % of buckets. Runs the same merge
  * sequence twice — `checkpointEvery = 1` (a sharded checkpoint at EVERY
  * commit: group-grained shard reuse, the worst case for the current code)
  * vs the default delta cadence — and reports manifest+shard JSON bytes
  * per INCREMENTAL commit. NOTE: neither side is the r01 pre-delta inline
  * listing (that code path no longer exists); the 295 KiB/commit figure in
  * BENCH/BASELINE.md was measured against it before shards landed, and is
  * kept there as the historical baseline. The Spark work is identical on
  * both sides; the difference is what the commit serializes.
  *
  * Usage: runMain graft.bench.ManifestBench [subBuckets] [partitions] [incBatches]
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val subBuckets = args.headOption.map(_.toInt).getOrElse(256)
    val partitions = args.lift(1).map(_.toInt).getOrElse(8)
    val incBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-manifest-bench")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val buckets = subBuckets * partitions
      val nKeys = buckets * 8          // dense: ~8 keys per bucket
      val seedPerPart = nKeys * 3 / partitions // ~3 touches per key seeds all buckets
      val incPerPart = math.max(1, buckets / 40 / partitions) // ~2.5% of buckets per batch
      val totalPerPart = seedPerPart + incBatches * incPerPart
      val changes = ChangeGen.changes(spark, totalPerPart * partitions,
        nKeys = nKeys, partitions = partitions, deletePct = 5)
      def run(ckptEvery: Int, tag: String): Unit = {
        val root = java.nio.file.Files.createTempDirectory(s"mb-$tag").toString
        val lake = new LakeTable(root, spark, subBuckets = subBuckets,
          checkpointEvery = ckptEvery, shardGroupSize = 8)
        lake.merge(changes.filter(col("offset") < seedPerPart), 0L)
        (0 until incBatches).foreach { b =>
          val lo = seedPerPart + b * incPerPart
          lake.merge(changes.filter(
            col("offset") >= lo && col("offset") < lo + incPerPart), (b + 1).toLong)
        }
        // per-commit driver JSON = root manifest + shard files written AT
        // that version (reused shards cost nothing; names carry the version)
        val shardDir = java.nio.file.Paths.get(root, "shards")
        val shardSizes: Map[Long, Long] =
          if (!java.nio.file.Files.isDirectory(shardDir)) Map.empty
          else {
            val s = java.nio.file.Files.list(shardDir)
            try s.iterator().asScala.toSeq
              .filter(_.getFileName.toString.matches("""p\d+-g\d+-v\d+\.json"""))
              .groupBy { p =>
                p.getFileName.toString
                  .replaceAll("""^p\d+-g\d+-v(\d+)\.json$""", "$1").toLong
              }.map { case (v, ps) => v -> ps.map(java.nio.file.Files.size).sum }
            finally s.close()
          }
        val incSizes = (1 to incBatches).map { v =>
          java.nio.file.Files.size(
            java.nio.file.Paths.get(root, f"manifest-$v%012d.json")) +
            shardSizes.getOrElse(v.toLong, 0L)
        }
        println(f"$tag%-22s incremental-commit JSON: " +
          f"mean=${incSizes.sum / incBatches / 1024.0}%8.1f KiB  " +
          f"max=${incSizes.max / 1024.0}%8.1f KiB")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
      println(s"subBuckets=$subBuckets partitions=$partitions (=$buckets buckets) " +
        s"incBatches=$incBatches events/incBatch=${incPerPart * partitions}")
      run(1, "ckpt-every(sharded)")
      run(16, "delta(ckptEvery=16)")
    } finally spark.stop()
  }
}
