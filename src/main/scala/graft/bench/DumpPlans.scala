package graft.bench

import graft.SparkEntry
import org.apache.spark.sql.execution.ExplainMode

/** r08 plan dumper: writes explain(formatted) for the named queries to
  * plans/r08/<query>_<suffix>.txt. Usage:
  *   runMain graft.bench.DumpPlans <suffix> <query> [query...]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r08/${n}_$suffix.txt"), plan)
      println(s"$n: exchanges=" + "Exchange".r.findAllIn(plan).length)
    }
    spark.stop()
  }
}
