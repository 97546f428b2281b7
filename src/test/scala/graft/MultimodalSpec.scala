package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("binary payload plumbing: schema, determinism, bounded dims") {
    val feats = Multimodal.featureTable(spark, "/root/testdata/sf0.001")
    assert(feats.columns.toSet === Set(
      "doc_id", "modality", "n_bytes", "width", "height", "duration_ms", "sha_prefix"))
    val rows = feats.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("sha_prefix").length === 16)
    }
    // deterministic across runs and parallelism
    val again = Multimodal.featureTable(spark, "/root/testdata/sf0.001")
      .repartition(7)
    assert(feats.exceptAll(again).isEmpty && again.exceptAll(feats).isEmpty)
    // images have zero duration (kernel contract)
    assert(feats.filter(col("modality") === "image" && col("duration_ms") =!= 0)
      .count() === 0)
  }
}
