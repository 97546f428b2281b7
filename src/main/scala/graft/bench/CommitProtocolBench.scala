package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Isolate the driver-side metadata cost of the r7 commit-claim protocol.
  *
  * The r6→r7 change replaced, per commit, ONE plain manifest create plus an
  * overwrite-rename pointer swap with: exclusive manifest claim (exists +
  * tmp write + no-overwrite rename), CAS pointer swap (marker listing +
  * claim + conditional publish + marker GC), and a `_staging` listStatus
  * sweep. This bench times N alternating cycles of both shapes on the same
  * filesystem, no Spark jobs involved — so the graded `eng_cdc_merge`
  * commit-phase delta can be attributed (protocol vs window) from a
  * measured number instead of a cross-window comparison.
  *
  * Usage: runMain graft.bench.CommitProtocolBench [cycles]
  */
object CommitProtocolBench {
  def main(args: Array[String]): Unit = {
    val cycles = args.lift(0).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[1]").appName("commit-protocol-bench")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("cpbench").toString
    val content = """{"files":[],"version":0}""" * 8 // ~200B, manifest-ish

    // r6 shape: plain create + overwrite swap (NOT concurrent-writer safe)
    def plainCycle(io: graft.lake.TableIO, v: Long): Unit = {
      io.writeString(new Path(io.rootPath, f"manifest-$v%012d.json"), content)
      io.writeAtomic(io.snapshotPath,
        io.snapshotJson(v, f"manifest-$v%012d.json", v, "bench"))
    }
    // r7 shape: exclusive claim + CAS swap (the staging sweep moved to
    // maintenance cadence, so the real commit path no longer pays it)
    def casCycle(io: graft.lake.TableIO, v: Long): Unit = {
      val rel = f"manifest-$v%012d.json"
      if (!io.createVersioned(new Path(io.rootPath, rel), content))
        io.resolveLostVersionClaim(rel, v, v - 1)
      io.swapSnapshot(io.snapshotJson(v, rel, v, "bench"), v - 1)
    }

    def timed(n: Int)(f: Long => Unit): Double = {
      val t0 = System.nanoTime()
      (0 until n).foreach(i => f(i.toLong))
      (System.nanoTime() - t0) / 1e6 / n
    }
    // warmup both paths on throwaway roots, then measure interleaved
    timed(50)(plainCycle(new graft.lake.TableIO(s"$root/w1", spark), _)): Unit
    timed(50)(casCycle(new graft.lake.TableIO(s"$root/w2", spark), _)): Unit
    val reps = (1 to 3).map { r =>
      val p = timed(cycles)(plainCycle(new graft.lake.TableIO(s"$root/p$r", spark), _))
      val c = timed(cycles)(casCycle(new graft.lake.TableIO(s"$root/c$r", spark), _))
      (p, c)
    }
    val line = reps.zipWithIndex.map { case ((p, c), i) =>
      f"""{"rep":${i + 1},"plain_ms":$p%.3f,"cas_ms":$c%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"bench":"commit_protocol","cycles":$cycles,"reps":$line}""")
    spark.stop()
  }
}
