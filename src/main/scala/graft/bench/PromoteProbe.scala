package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

object PromoteProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("promoteprobe").toString
    val io = new graft.lake.TableIO(root, spark)
    val staging = new Path(io.rootPath, "_staging/probe")
    // stage a merge-shaped tree: 4 partitions x 8 subBuckets
    val df = spark.range(0, 10000)
      .select((col("id") % 4).cast("int").as("_pp"),
        (col("id") % 8).cast("int").as("_ss"), col("id"))
    // the engine's own staging committer options: the probe must measure
    // the exact promote path the merge write uses
    df.repartition(32, col("_pp"), col("_ss"))
      .write.mode("overwrite").partitionBy("_pp", "_ss")
      .options(graft.lake.TableIO.stagingWriteOptions)
      .parquet(staging.toString)
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e6}%.1f ms"); r
    }
    val parts = t("listStagedParts")(io.listStagedParts(staging))
    println(s"parts=${parts.size}")
    io.fs.mkdirs(new Path(io.rootPath, "data"))
    val dests = parts.toSeq.sortBy(_._1).zipWithIndex.map { case ((rel, src), i) =>
      (src, new Path(io.rootPath, f"data/probe-$i%04d.parquet"))
    }
    t("promoteListedFile x" + dests.size) {
      graft.lake.MetaIO.fetchAll(dests) { case (src, dest) =>
        io.promoteListedFile(src, dest) }
    }
    t("parquetRowCount x" + dests.size) {
      graft.lake.MetaIO.fetchAll(dests) { case (_, dest) => io.parquetRowCount(dest) }
    }
    t("delete staging")(io.fs.delete(staging, true))
    spark.stop()
  }
}
