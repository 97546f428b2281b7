package graft.bench

import graft.queries.CdcQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r01 experiment: the LWW reduce compiles `max_by(struct)` to
  * SortAggregate (struct aggregation buffers are not UnsafeRow-mutable, so
  * HashAggregate is off the table for it). Measure the realistic
  * alternatives at sf0.1 and keep the winner:
  *
  *   maxby    — current: one exchange, SortAggregate over max_by(struct)
  *   twophase — hash-aggregable max(offset) per key (pure HashAggregate),
  *              then join the winning offsets back to the rows. Same single
  *              exchange (HashPartitioning(repo,path) serves both sides),
  *              but the join's SMJ sorts BOTH full inputs — it trades one
  *              sort of the data for two.
  *   window   — row_number over (repo,path ORDER BY offset DESC): one
  *              exchange + one sort, but WindowExec materializes frames and
  *              filters after, no partial aggregation map-side.
  *
  * Run: sbt "runMain graft.bench.LwwExperiment /root/testdata/sf0.1 5"
  * Results land in BENCH/lww-experiment.txt and PLANS.md's bench note.
  */
object LwwExperiment {

  private def shapeResult(df: DataFrame): DataFrame =
    df.filter(col("op") === "upsert")
      .select(col("repo"), col("path"), col("partition"),
        col("offset").as("last_offset"), col("content"))

  def maxby(c: DataFrame): DataFrame =
    shapeResult(c.groupBy(col("repo"), col("path"))
      .agg(max_by(struct(col("op"), col("partition"), col("offset"), col("content")),
        col("offset")).as("_s"))
      .select(col("repo"), col("path"), col("_s.partition").as("partition"),
        col("_s.offset").as("offset"), col("_s.content").as("content"),
        col("_s.op").as("op")))

  def twophase(c: DataFrame): DataFrame = {
    val wins = c.groupBy(col("repo"), col("path"))
      .agg(max(col("offset")).as("offset"))
    shapeResult(c.join(wins, Seq("repo", "path", "offset")))
  }

  def window(c: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("repo"), col("path")).orderBy(col("offset").desc)
    shapeResult(c.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val variants: Seq[(String, DataFrame => DataFrame)] =
      Seq("maxby" -> maxby, "twophase" -> twophase, "window" -> window)

    val c = CdcQueries.changes(spark, sfDir)
      .select("partition", "offset", "op", "repo", "path", "content")

    // all variants must agree before any timing counts
    val counts = variants.map { case (n, f) => n -> f(c).count() }
    require(counts.map(_._2).distinct.size == 1, s"variants disagree: $counts")

    // warmup pass each, then reps timed alternating (so drift hits all
    // variants equally — see BENCH/BASELINE.md on sandbox noise)
    variants.foreach { case (_, f) => f(c).count(): Unit }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f(c).count(): Unit
        times(n) = ((System.nanoTime() - t0) / 1e9) :: times.getOrElse(n, Nil)
      }
    }
    val report = new StringBuilder
    report ++= s"LWW reduce variants at $sfDir, local[32], $reps reps (median | min | max, sec)\n"
    variants.foreach { case (n, _) =>
      val ts = times(n).sorted
      report ++= f"  $n%-9s ${ts(ts.size / 2)}%.3f | ${ts.head}%.3f | ${ts.last}%.3f\n"
    }
    print(report)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH/lww-experiment.txt"), report.toString): Unit
    spark.stop()
  }
}
