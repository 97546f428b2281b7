package graft.bench

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** r08 evidence: dumps the merge foreachBatch write-job plan (via
  * LakeTable.planHook) and the archive-write frame plan to plans/r08/.
  */
object DumpPlansR08 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    def put(name: String, plan: String): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r08/${name}_$suffix.txt"), plan)
      println(s"$name: exchanges=" + "Exchange".r.findAllIn(plan).length +
        " sorts=" + "\\bSort \\(".r.findAllIn(plan).length)
    }

    // merge write job, state non-empty (same fixture as ExplainAudit)
    val changes = graft.gen.ChangeGen.changes(spark, 4000, nKeys = 300,
      partitions = 4, deletePct = 10)
    val lake = new graft.lake.LakeTable(
      java.nio.file.Files.createTempDirectory("plans-merge").toString,
      spark, subBuckets = 4)
    lake.merge(changes.filter(col("offset") < 300), 0L)
    @volatile var captured = "(planHook never fired)"
    graft.lake.LakeTable.planHook = (tag, df) =>
      if (tag == "merge-write") captured = fmt(df)
    try lake.merge(changes.filter(col("offset") >= 300), 1L)
    finally graft.lake.LakeTable.planHook = (_, _) => ()
    put("eng_cdc_merge_write", captured)

    // archive write frame: what feeds the foreachPartition writer
    val lines = graft.queries.CdcQueries.changes(spark, "/root/testdata/sf0.001")
      .select(col("partition"), col("offset"),
        concat(col("repo"), lit("/"), col("path")).as("line"))
    val base = lines.select(lit("changes").as("topic"), col("partition"),
      col("offset").as("_sort"),
      encode(concat(col("line"), lit("\n")), "UTF-8").as("payload"))
      .withColumn("_start", lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("topic"), col("partition")).orderBy(col("_sort"))
    val assigned = base
      .withColumn("_aoff", row_number().over(w).cast("long") - 1L + col("_start"))
      .withColumn("_file", col("_aoff") - pmod(col("_aoff"), lit(5000L)))
      .select(col("topic"), col("partition"), col("_file"), col("_aoff"), col("payload"))
    put("cdc_gz_archive_write_frame", fmt(assigned))
    put("cdc_gz_archive_write_frame_before_r7shape", fmt(assigned
      .repartition(col("topic"), col("partition"), col("_file"))
      .sortWithinPartitions(col("topic"), col("partition"), col("_file"), col("_aoff"))))
    spark.stop()
  }
}
