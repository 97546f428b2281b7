package graft

import graft.gen.ChangeGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The generator must be a pure function of (seed, config): identical at any
  * parallelism, dense monotonic per-partition offsets, skew knob honored.
  */
class GenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("deterministic across parallelism") {
    val a = ChangeGen.changes(spark, 500, partitions = 4).repartition(1)
    val b = ChangeGen.changes(spark, 500, partitions = 4).repartition(13)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("offsets dense and monotonic per partition") {
    val c = ChangeGen.changes(spark, 1000, partitions = 4)
    val stats = c.groupBy("partition")
      .agg(min("offset").as("lo"), max("offset").as("hi"),
        count(lit(1)).as("n"), countDistinct("offset").as("nd"))
      .collect()
    assert(stats.length === 4)
    stats.foreach { r => // columns: partition, lo, hi, n, nd
      assert(r.getLong(1) === 0L)                       // starts at 0
      assert(r.getLong(2) === r.getLong(3) - 1)         // dense
      assert(r.getLong(3) === r.getLong(4))             // unique
    }
  }

  test("hot-repo skew knob concentrates events") {
    val hot = ChangeGen.changes(spark, 2000, nKeys = 100, hotPct = 80)
      .filter(col("repo") === "org-0/repo-0")
      .count()
    assert(hot > 1200L, s"expected >60% on the hot repo, got $hot/2000")
  }

  test("deletes carry null content; upserts never do") {
    val c = ChangeGen.changes(spark, 500, deletePct = 20)
    assert(c.filter(col("op") === "delete" && col("content").isNotNull).count() === 0)
    assert(c.filter(col("op") === "upsert" && col("content").isNull).count() === 0)
  }
}
