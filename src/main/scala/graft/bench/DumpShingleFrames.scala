package graft.bench

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

object DumpShingleFrames {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    def put(name: String, plan: String): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r08/$name.txt"), plan)
      println(s"$name: exchanges=" + "Exchange".r.findAllIn(plan).length)
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
    val tf = "transform(sequence(1, size(w) - 2), " +
      "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))"
    // BEFORE: row-level distinct after the explode (what the staged shingle
    // write paid in r7)
    put("txt_ngram_jaccard_staging_before",
      fmt(base.select(col("doc_id"), explode(expr(tf)).as("shingle")).distinct()))
    // AFTER: per-doc array_distinct before the explode — no exchange
    put("txt_ngram_jaccard_staging_after",
      fmt(base.select(col("doc_id"),
        explode(array_distinct(expr(tf))).as("shingle"))))
    spark.stop()
  }
}
