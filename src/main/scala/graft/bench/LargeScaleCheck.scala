package graft.bench

import graft.gen.ChangeGen
import graft.pipeline.CdcPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Correctness self-check at generator scale — orders of magnitude above
  * the sf0.01 driver gate, where a skew- or overflow-class bug could hide
  * behind small volumes: run the FULL exactly-once ingest (journal append ∥
  * lake MERGE in micro-batches) over millions of events, then compare the
  * final lake state row-for-row against the in-repo LWW oracle
  * (ChangeGen.oracleFinalState: groupBy key → max_by offset → drop
  * deletes), by (repo, path, sha256(content)) set equality both ways.
  * Not a timing bench — run it outside the graded window and record the
  * verdict in BENCH/BASELINE.md.
  *
  * Usage: runMain graft.bench.LargeScaleCheck [nEvents] [nBatches] [hotPct]
  *   hotPct > 0 routes that percentage of events to ONE key (the skew
  *   regime the salted merge must survive).
  */
object LargeScaleCheck {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(8000000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val hotPct = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-large-scale-check")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val base = sys.env.getOrElse("GRAFT_SCALING_ROOT", "/tmp")
      val root = s"$base/graft-lsc/run-${System.nanoTime()}"
      // materialize the log (a CDC tail reads a durable source; also makes
      // the pipeline's double-scan determinism precondition trivially true)
      val inputDir = s"$root/input"
      ChangeGen.changes(spark, nEvents,
        nKeys = (nEvents / 20).toInt.max(100), partitions = 32,
        hotPct = hotPct, deletePct = 10, minLen = 64, maxLen = 256)
        .write.mode("overwrite").parquet(inputDir)
      val changes = spark.read.parquet(inputDir)
      val p = new CdcPipeline(spark, s"$root/journal", s"$root/lake",
        chunkBytes = 16L * 1024 * 1024, subBuckets = 8)
      val t0 = System.nanoTime()
      p.runBatches(changes, nBatches)
      val ingestSec = (System.nanoTime() - t0) / 1e9

      def keyed(df: org.apache.spark.sql.DataFrame) = df.select(
        col("repo"), col("path"), sha2(coalesce(col("content"), lit("")), 256).as("sha"))
      val got = keyed(p.lake.read())
      val want = keyed(ChangeGen.oracleFinalState(changes))
      val gotN = got.count()
      val wantN = want.count()
      val missing = want.exceptAll(got).count()
      val extra = got.exceptAll(want).count()
      val ok = gotN == wantN && missing == 0L && extra == 0L
      println(s"""{"check":"large_scale_lww","events":$nEvents,"batches":$nBatches,""" +
        s""""hot_pct":$hotPct,"lake_rows":$gotN,"oracle_rows":$wantN,""" +
        s""""missing":$missing,"extra":$extra,"ingest_sec":$ingestSec,""" +
        s""""pass":$ok}""")
      // keep the lake/journal/input on a FAIL — they are the diagnosis
      if (ok) org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      else {
        System.err.println(s"[large-scale-check] FAILED — state kept at $root")
        sys.exit(1)
      }
    } finally spark.stop()
  }
}
