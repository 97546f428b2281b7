package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.ChangeGen
import graft.pipeline.CdcPipeline

/** Measure the `graft.lake.codec` trade on the production shape: the same
  * materialized log ingested through the full pipeline (journal append +
  * lake MERGE) once per codec, interleaved across reps so window drift
  * cancels. Reports ingest wall time, a timed full-scan read, and bytes on
  * disk for the lake data and the journal — the three quantities the codec
  * actually moves at 100 TB (write CPU, scan IO, storage cost).
  *
  * Caveat recorded with the results: ChangeGen content is md5-hex text
  * (4 bits/char entropy), denser than real prose or code, so absolute
  * ratios understate what a codec achieves on real corpora; the RELATIVE
  * ordering is the decision input.
  *
  * Usage: runMain graft.bench.CodecBench [events] [batches] [reps]
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val events = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val codecs = Seq("snappy", "zstd", "lz4")
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-codec-bench")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val base = sys.env.getOrElse("GRAFT_SCALING_ROOT", "/tmp")
      val run = s"$base/graft-codec/run-${System.nanoTime()}"
      val inputDir = s"$run/input"
      ChangeGen.changes(spark, events,
        nKeys = (events / 20).toInt.max(100), partitions = 32,
        deletePct = 10, minLen = 64, maxLen = 256)
        .write.mode("overwrite").parquet(inputDir)
      val changes = spark.read.parquet(inputDir)

      def treeBytes(p: String): Long = {
        val f = new java.io.File(p)
        if (!f.exists) 0L
        else if (f.isFile) f.length
        else f.listFiles.map(x => treeBytes(x.getPath)).sum
      }
      // warm the whole path once (codegen, JIT, file-index caches)
      System.setProperty("graft.lake.codec", "snappy")
      new CdcPipeline(spark, s"$run/warm/journal", s"$run/warm/lake",
        chunkBytes = 16L * 1024 * 1024, subBuckets = 8)
        .runBatches(changes, batches)

      for (rep <- 1 to reps; codec <- codecs) {
        System.setProperty("graft.lake.codec", codec)
        val root = s"$run/$codec-$rep"
        val p = new CdcPipeline(spark, s"$root/journal", s"$root/lake",
          chunkBytes = 16L * 1024 * 1024, subBuckets = 8)
        val t0 = System.nanoTime()
        p.runBatches(changes, batches)
        val ingestSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val rows = p.lake.read()
          .agg(count(lit(1)), sum(length(coalesce(col("content"), lit("")))))
          .collect()(0).getLong(0)
        val readSec = (System.nanoTime() - t1) / 1e9
        val lakeBytes = treeBytes(s"$root/lake/data")
        val journalBytes = treeBytes(s"$root/journal/data")
        println(s"""{"bench":"codec","codec":"$codec","rep":$rep,""" +
          s""""events":$events,"rows":$rows,""" +
          f""""ingest_sec":$ingestSec%.2f,"read_sec":$readSec%.3f,""" +
          s""""lake_bytes":$lakeBytes,"journal_bytes":$journalBytes}""")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(run))
    } finally spark.stop()
  }
}
