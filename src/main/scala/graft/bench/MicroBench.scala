package graft.bench

import org.apache.spark.sql.SparkSession

/** Single-query micro-benchmark for interleaved fresh-JVM A/B studies
  * (BENCH/BASELINE.md protocol: one JVM per sample, warmup pass untimed,
  * repeated timed passes printed individually so drift is visible).
  *
  * Modes:
  *   archiveread <sfDir> [reps]  — stage the shared block-gzip archive
  *     (untimed), one untimed warm read, then `reps` timed runs of the
  *     cdc_gz_archive_read gate query. Used for the r7 seam-vs-r5-bytecode
  *     A/B of the InputFilter indirection (VERDICT r6 task 4): the same
  *     source file compiles against both trees.
  *   merge <sfDir> [reps]  — untimed eng pipeline warm pass, then `reps`
  *     timed eng_cdc_merge runs with per-phase breakdowns. Honors
  *     GRAFT_MERGE_STATS=agg|observe for the r7 observe-mode re-measure
  *     (VERDICT r6 task 6).
  *
  * Prints one line per rep: MICRO {"mode":…,"rep":…,"sec":…,"phases":{…}}
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    sys.env.get("GRAFT_MERGE_STATS")
      .foreach(v => System.setProperty("graft.merge.stats", v))
    // pin the DATA codec to the session codec pinned below: the r5-vs-r7
    // bytecode A/B compiles this file against both trees, and the r7 tree's
    // .option("compression", TableIO.dataCodec) default (zstd) would
    // override the session conf — confounding the seam measurement with the
    // codec change (ADVICE r7). GRAFT_CODEC overrides for codec studies.
    System.setProperty("graft.lake.codec",
      sys.env.getOrElse("GRAFT_CODEC", "snappy"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(body: => Unit): Unit = (1 to reps).foreach { i =>
      graft.lake.LakeTable.phaseSnapshotAndReset(): Unit
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      val phases = graft.lake.LakeTable.phaseSnapshotAndReset()
      val pj = phases.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
        .mkString("{", ",", "}")
      println(s"""MICRO {"mode":"$name","rep":$i,""" +
        s""""sec":${math.round(dt * 1000) / 1000.0},"phases":$pj}""")
    }

    mode match {
      case "archiveread" =>
        graft.queries.CdcQueries.sharedArchive(spark, sfDir): Unit // stage
        val q = graft.SparkEntry.queries("cdc_gz_archive_read")
        q(spark, sfDir).count(): Unit // warm (codegen, file index, JIT)
        timed("archiveread")(q(spark, sfDir).count(): Unit)
      case "merge" =>
        val q = graft.SparkEntry.queries("eng_cdc_merge")
        q(spark, sfDir).count(): Unit // warm the whole pipeline path
        timed("merge")(q(spark, sfDir).count(): Unit)
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
