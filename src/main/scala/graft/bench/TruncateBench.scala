package graft.bench

import graft.gen.ChangeGen
import graft.lake.ChangeJournal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence that journal retention truncation is O(dead), not O(kept):
  * build journals with different KEPT-file counts, truncate the same small
  * dead set out of each, and report the truncate commit's manifest bytes.
  * With the `removed`-delta commit the bytes must be flat across kept
  * sizes (a full-manifest truncate would grow linearly with the kept
  * listing — at long retention the kept set is the big one).
  *
  * Usage: runMain graft.bench.TruncateBench [appendsSmall] [appendsLarge]
  */
object TruncateBench {
  def main(args: Array[String]): Unit = {
    val small = args.headOption.map(_.toInt).getOrElse(8)
    val large = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-truncate-bench")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for (appends <- Seq(small, large)) {
        val root = java.nio.file.Files.createTempDirectory(s"tb-$appends").toString
        // checkpointEvery high: measure the DELTA path (the steady state;
        // cadence checkpoints amortize over checkpointEvery commits)
        val j = new ChangeJournal(root, spark, 1L << 20, checkpointEvery = 1000)
        val per = 50L
        val changes = ChangeGen.changes(spark, appends * per * 2, partitions = 2)
        (0 until appends).foreach { b =>
          j.append(changes.filter(
            col("offset") >= b * per && col("offset") < (b + 1) * per), b.toLong): Unit
        }
        // drop exactly the FIRST append's files (2: one per partition);
        // grace far in the future so reap cost stays out of the number
        val t0 = System.nanoTime()
        val dropped = j.truncate(Map(0 -> (per - 1), 1 -> (per - 1)),
          graceMs = Long.MaxValue / 2)
        val sec = (System.nanoTime() - t0) / 1e9
        val manifestBytes = java.nio.file.Files.size(
          java.nio.file.Paths.get(root, f"manifest-$appends%012d.json"))
        val fullBytes = java.nio.file.Files.size( // what O(kept) would cost
          java.nio.file.Paths.get(root, f"manifest-${0}%012d.json")) *
          (appends * 2 - dropped) / 2
        println(f"kept=${appends * 2 - dropped}%4d files  dropped=$dropped  " +
          f"truncate-commit=${manifestBytes / 1024.0}%6.2f KiB  " +
          f"(full listing would be ~${fullBytes / 1024.0}%7.2f KiB)  " +
          f"wall=$sec%5.2f s")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
    } finally spark.stop()
  }
}
